"""Declared queries for the changelog/upsert operator family (K1/K2, A11).

These are the batch-checkable forms of the reference's CDC semantics: the
driver's `events` table plays the role of the Postgres WAL changelog, keyed
by user_id with `ts` as the event-time ordering (event_id as tie-break).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_cdc_fluss_quickstart_spark.operators.changelog import (
    apply_changelog,
    changelog_from_events,
    latest_by_key,
)
from flink_cdc_fluss_quickstart_spark.plans.registry import register
from flink_cdc_fluss_quickstart_spark.tables import load_table


@register(
    "upsert_latest_snapshot",
    oracle="""
    SELECT event_id, ts, user_id, event_type, value
    FROM (
      SELECT event_id, ts, user_id, event_type, value,
             ROW_NUMBER() OVER (PARTITION BY user_id
                                ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1
    """,
    description="K1 batch form: latest row per key (PK-table snapshot"
    " materialization from an append log).",
)
def upsert_latest_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    return latest_by_key(ev, ["user_id"], ["ts", "event_id"]).select(
        "event_id", "ts", "user_id", "event_type", "value"
    )


@register(
    "changelog_apply_snapshot",
    oracle="""
    SELECT ts, event_id, user_id, value
    FROM (
      SELECT
        CASE WHEN event_type = 'signup' THEN 'I'
             WHEN event_type = 'error'  THEN 'D'
             ELSE 'U' END AS op,
        ts, event_id, user_id, value,
        ROW_NUMBER() OVER (PARTITION BY user_id
                           ORDER BY ts DESC, event_id DESC) AS rn
      FROM events
    )
    WHERE rn = 1 AND op <> 'D'
    """,
    description="K1/K2 full semantics: I/U/D changelog applied last-write-wins;"
    " keys whose final op is a delete vanish from the snapshot.",
)
def changelog_apply_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    log = changelog_from_events(ev)
    return apply_changelog(log, ["user_id"], ["ts", "event_id"]).select(
        "ts", "event_id", "user_id", "value"
    )


@register(
    "changelog_aware_aggregation",
    oracle="""
    WITH snapshot AS (
      SELECT event_id, ts, user_id, event_type, value
      FROM (
        SELECT event_id, ts, user_id, event_type, value,
               ROW_NUMBER() OVER (PARTITION BY user_id
                                  ORDER BY ts DESC, event_id DESC) AS rn
        FROM events
      )
      WHERE rn = 1
    )
    SELECT event_type,
           COUNT(*) AS user_count,
           CAST(SUM(CAST(value AS DECIMAL(18,6))) AS DOUBLE) AS total_value,
           MAX(ts) AS last_event_at
    FROM snapshot
    GROUP BY event_type
    """,
    description="A11: aggregation whose input is an updating (changelog) table"
    " -- aggregate the materialized snapshot, not the raw log, so upstream"
    " updates retract from their old group (Flink retraction semantics).",
)
def changelog_aware_aggregation(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    snapshot = latest_by_key(ev, ["user_id"], ["ts", "event_id"])
    return snapshot.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("user_count"),
        F.sum(F.col("value").cast("decimal(18,6)")).cast("double").alias("total_value"),
        F.max("ts").alias("last_event_at"),
    )
