-- Adaptation of /root/reference/flink-cdc/sql/users-cdc.sql (same notes as
-- tickets-cdc.sql).
SET 'execution.runtime-mode' = 'streaming';
SET 'execution.checkpointing.mode' = 'EXACTLY_ONCE';
SET 'execution.checkpointing.interval' = '5s';
SET 'execution.checkpointing.max-concurrent-checkpoints' = '1';

CREATE CATALOG fluss_catalog WITH ('type' = 'fluss', 'bootstrap.servers' = 'localhost:9123,localhost:9124');
USE CATALOG fluss_catalog;
CREATE DATABASE IF NOT EXISTS osb_staging;
USE osb_staging;

-- reference users-cdc.sql:18-32
CREATE TABLE IF NOT EXISTS users_staging (
    user_id bigint,
    username STRING,
    email STRING,
    full_name STRING,
    created_at timestamp(3),
    WATERMARK FOR created_at AS created_at - INTERVAL '5' SECOND,
    PRIMARY KEY (user_id) NOT ENFORCED
)
WITH ('bucket.num' = '4', 'table.datalake.enabled' = 'true', 'table.datalake.freshness' = '30s');

-- reference users-cdc.sql:35-56
CREATE TEMPORARY TABLE pg_osb_users (
  user_id BIGINT,
  username STRING,
  email STRING,
  full_name STRING,
  created_at TIMESTAMP(3),
  WATERMARK FOR created_at AS created_at - INTERVAL '5' SECOND,
  PRIMARY KEY (user_id) NOT ENFORCED
) WITH ('connector' = 'postgres-cdc', 'table-name' = 'users');

-- reference users-cdc.sql:59-68
INSERT INTO users_staging
SELECT user_id, username, email, full_name, created_at
FROM pg_osb_users;
