"""Temporal operators over the events stream table: as-of join, session
windows, range (interval) joins.

Beyond-reference operators (SURVEY.md section 2.4/2.6 records none of these in
the reference's SQL); all three are standard in event-analytics pipelines and
each is implemented shuffle-minimally for the 100 TB posture:

- as-of join: union-tag + one window pass (single hash shuffle on the key),
  never a `l.ts >= r.ts` theta join (quadratic blowup at scale).
- sessionization: gaps-and-islands with one window pass per user -- the same
  single shuffle, and the plan Spark's own `session_window` lowers to.
- range join: bin both sides to coarse buckets and equi-join on the bin, so
  Catalyst gets a hash join instead of a broadcast-nested-loop theta join.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.window import Window

from flink_cdc_fluss_quickstart_spark.operators.asof import asof_join
from flink_cdc_fluss_quickstart_spark.plans.registry import register
from flink_cdc_fluss_quickstart_spark.tables import load_table


@register(
    "asof_view_before_purchase",
    oracle="""
    WITH v AS (
      SELECT user_id, ts, event_id, value FROM (
        SELECT user_id, ts, event_id, value,
               row_number() OVER (PARTITION BY user_id, ts ORDER BY event_id DESC) AS rn
        FROM events WHERE event_type = 'view') WHERE rn = 1
    ),
    p AS (SELECT event_id, user_id, ts, value FROM events WHERE event_type = 'purchase')
    SELECT p.event_id, p.user_id, p.ts, p.value,
           v.event_id AS view_event_id, v.value AS view_value
    FROM p ASOF LEFT JOIN v
      ON p.user_id = v.user_id AND p.ts >= v.ts
    """,
    description="As-of (temporal) join: each purchase event picks the most"
    " recent view event by the same user at or before it. Union-tag +"
    " last_value window implementation -- one shuffle, no theta join.",
)
def asof_view_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    events = load_table(spark, sf_dir, "events")
    purchases = events.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts", "value"
    )
    # right side deduped to one row per (user_id, ts) so the as-of pick is
    # deterministic regardless of engine-internal ordering
    w = Window.partitionBy("user_id", "ts").orderBy(F.col("event_id").desc())
    views = (
        events.filter(F.col("event_type") == "view")
        .select("event_id", "user_id", "ts", "value")
        .withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
        .withColumnRenamed("event_id", "view_event_id")
        .withColumnRenamed("value", "view_value")
    )
    return asof_join(
        purchases,
        views,
        on=["user_id"],
        left_ts="ts",
        right_ts="ts",
        right_cols=["view_event_id", "view_value"],
        right_order=("view_event_id",),
    ).select("event_id", "user_id", "ts", "value", "view_event_id", "view_value")
