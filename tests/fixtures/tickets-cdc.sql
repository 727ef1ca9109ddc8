-- Adaptation of /root/reference/flink-cdc/sql/tickets-cdc.sql for the
-- PySpark engine's SQL front-end. Structure and semantics preserved;
-- the postgres-cdc connector is bound at runtime to a changelog source
-- (Engine.bind_source), standing in for the WAL tail.
SET 'execution.runtime-mode' = 'streaming';
SET 'execution.checkpointing.mode' = 'EXACTLY_ONCE';
SET 'execution.checkpointing.interval' = '5s';

CREATE CATALOG fluss_catalog WITH (
    'type' = 'fluss',
    'bootstrap.servers' = 'localhost:9123'
);
USE CATALOG fluss_catalog;

CREATE DATABASE IF NOT EXISTS osb_staging;
USE osb_staging;

-- staging PK table (reference tickets-cdc.sql:23-37)
CREATE TABLE IF NOT EXISTS tickets_staging (
    ticket_id BIGINT,
    movie_id BIGINT,
    user_id BIGINT,
    cost DECIMAL(10, 2),
    status STRING,
    purchased_at TIMESTAMP(3),
    WATERMARK FOR purchased_at AS purchased_at - INTERVAL '3' SECOND,
    PRIMARY KEY (ticket_id) NOT ENFORCED
)
WITH (
    'bucket.num' = '4',
    'table.datalake.enabled' = 'true',
    'table.datalake.freshness' = '30s'
);

-- CDC source (reference tickets-cdc.sql:43-64)
CREATE TEMPORARY TABLE pg_osb_tickets (
  ticket_id BIGINT,
  movie_id BIGINT,
  user_id BIGINT,
  cost DECIMAL(10,2),
  status STRING,
  purchased_at TIMESTAMP(3),
  WATERMARK FOR purchased_at AS purchased_at - INTERVAL '3' SECOND,
  PRIMARY KEY (ticket_id) NOT ENFORCED
) WITH (
  'connector' = 'postgres-cdc',
  'database-name' = 'source_db',
  'schema-name' = 'osb',
  'table-name' = 'tickets',
  'scan.incremental.snapshot.enabled' = 'true'
);

-- replication stream (reference tickets-cdc.sql:68-77)
INSERT INTO tickets_staging
SELECT
    ticket_id,
    movie_id,
    user_id,
    cost,
    status,
    purchased_at
FROM
    pg_osb_tickets;
