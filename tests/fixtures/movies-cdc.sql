-- Adaptation of /root/reference/flink-cdc/sql/movies-cdc.sql (same notes as
-- tickets-cdc.sql).
SET 'execution.runtime-mode' = 'streaming';

CREATE CATALOG fluss_catalog WITH ('type' = 'fluss', 'bootstrap.servers' = 'localhost:9123');
USE CATALOG fluss_catalog;
CREATE DATABASE IF NOT EXISTS osb_staging;
USE osb_staging;

-- reference movies-cdc.sql:18-32
CREATE TABLE IF NOT EXISTS movies_staging (
    movie_id BIGINT,
    title STRING,
    description STRING,
    duration_minutes INT,
    start_date TIMESTAMP(3),
    created_at TIMESTAMP(3),
    WATERMARK FOR created_at AS created_at - INTERVAL '5' SECOND,
    PRIMARY KEY (movie_id) NOT ENFORCED
)
WITH ('bucket.num' = '4', 'table.datalake.enabled' = 'true', 'table.datalake.freshness' = '60s');

-- reference movies-cdc.sql:35-56
CREATE TEMPORARY TABLE pg_osb_movies (
  movie_id BIGINT,
  title STRING,
  description STRING,
  duration_minutes INT,
  start_date TIMESTAMP(3),
  created_at TIMESTAMP(3),
  WATERMARK FOR created_at AS created_at - INTERVAL '5' SECOND,
  PRIMARY KEY (movie_id) NOT ENFORCED
) WITH ('connector' = 'postgres-cdc', 'table-name' = 'movies');

-- reference movies-cdc.sql:59-68
INSERT INTO movies_staging
SELECT movie_id, title, description, duration_minutes, start_date, created_at
FROM pg_osb_movies;
