-- Adaptation of /root/reference/flink-cdc/flink-gen.sh's generated
-- sql/init-catalogs.sql (the S4 betting-tickets + kinesis ingest shape) for
-- the engine's reference-dialect front-end. Connector endpoints are
-- placeholders: tests bind cdc_tickets/kinesis_events to file-replay
-- changelog dirs via Engine.bind_source.

CREATE CATALOG IF NOT EXISTS paimon_catalog WITH (
    'type' = 'paimon',
    'metastore' = 'jdbc',
    'uri' = 'jdbc:postgresql://postgres-catalog:5432/paimon_catalog',
    'jdbc.user' = 'root',
    'jdbc.password' = 'root',
    'warehouse' = 's3://warehouse/paimon',
    's3.endpoint' = 'http://garage:3900',
    's3.path-style-access' = 'true',
    's3.access-key' = 'placeholder-access-key',
    's3.secret-key' = 'placeholder-secret-key'
);

USE CATALOG paimon_catalog;
CREATE DATABASE IF NOT EXISTS lakehouse;
USE lakehouse;

CREATE CATALOG IF NOT EXISTS fluss_catalog WITH (
    'type' = 'fluss',
    'bootstrap.servers' = 'fluss-coordinator:9123'
);

USE CATALOG default_catalog;
USE default_database;

-- CDC Source Table: osb.tickets (the 18-column betting shape)
CREATE TABLE IF NOT EXISTS cdc_tickets (
    id STRING NOT NULL,
    user_id STRING NOT NULL,
    status STRING NOT NULL,
    cancel_reason STRING,
    entry_amount BIGINT NOT NULL,
    winning_amount BIGINT,
    transactions_entry_transaction STRING,
    transactions_winning_transaction STRING,
    transactions_cancel_transaction STRING,
    status_updated_at TIMESTAMP(3) WITH LOCAL TIME ZONE NOT NULL,
    created_at TIMESTAMP(3) WITH LOCAL TIME ZONE NOT NULL,
    updated_at TIMESTAMP(3) WITH LOCAL TIME ZONE NOT NULL,
    deleted_at TIMESTAMP(3) WITH LOCAL TIME ZONE,
    free_ticket_promotion_id STRING,
    booster_promotion_id STRING,
    booster_promotion_change_reason STRING,
    accept_odds_change BOOLEAN,
    promo_id STRING,
    PRIMARY KEY (id) NOT ENFORCED
) WITH (
    'connector' = 'postgres-cdc',
    'hostname' = 'postgres-source',
    'port' = '5432',
    'username' = 'root',
    'password' = 'root',
    'database-name' = 'source_db',
    'schema-name' = 'osb',
    'table-name' = 'tickets',
    'slot.name' = 'tickets_slot',
    'decoding.plugin.name' = 'pgoutput'
);

-- Kinesis Source Table: events (JSON format)
CREATE TABLE IF NOT EXISTS kinesis_events (
    event_id STRING,
    event_type STRING,
    payload STRING,
    event_time TIMESTAMP(3),
    WATERMARK FOR event_time AS event_time - INTERVAL '5' SECOND
) WITH (
    'connector' = 'kinesis',
    'stream.arn' = 'arn:aws:kinesis:us-east-1:000000000000:stream/events',
    'aws.region' = 'us-east-1',
    'source.init.position' = 'TRIM_HORIZON',
    'format' = 'json'
);

USE CATALOG paimon_catalog;
USE lakehouse;

-- Paimon Sink Table: tickets (deduplicate merge-engine, 4 hash buckets)
CREATE TABLE IF NOT EXISTS tickets (
    id STRING NOT NULL,
    user_id STRING NOT NULL,
    status STRING NOT NULL,
    cancel_reason STRING,
    entry_amount BIGINT NOT NULL,
    winning_amount BIGINT,
    transactions_entry_transaction STRING,
    transactions_winning_transaction STRING,
    transactions_cancel_transaction STRING,
    status_updated_at TIMESTAMP(3) WITH LOCAL TIME ZONE NOT NULL,
    created_at TIMESTAMP(3) WITH LOCAL TIME ZONE NOT NULL,
    updated_at TIMESTAMP(3) WITH LOCAL TIME ZONE NOT NULL,
    deleted_at TIMESTAMP(3) WITH LOCAL TIME ZONE,
    free_ticket_promotion_id STRING,
    booster_promotion_id STRING,
    booster_promotion_change_reason STRING,
    accept_odds_change BOOLEAN,
    promo_id STRING,
    PRIMARY KEY (id) NOT ENFORCED
) WITH (
    'merge-engine' = 'deduplicate',
    'changelog-producer' = 'input',
    'bucket' = '4'
);

-- Kinesis events land in a staging table for event-time analytics
CREATE TABLE IF NOT EXISTS events_staging (
    event_id STRING,
    event_type STRING,
    payload STRING,
    event_time TIMESTAMP(3),
    PRIMARY KEY (event_id) NOT ENFORCED
) WITH (
    'merge-engine' = 'deduplicate',
    'bucket' = '4'
);

INSERT INTO paimon_catalog.lakehouse.tickets SELECT * FROM cdc_tickets;

INSERT INTO paimon_catalog.lakehouse.events_staging SELECT * FROM kinesis_events;
