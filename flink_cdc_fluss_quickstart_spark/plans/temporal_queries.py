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
from flink_cdc_fluss_quickstart_spark.operators.rangejoin import bin_range_join
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
    # NO pre-dedup window: asof_join's right_order tie policy already picks
    # the max-view_event_id row among equal-(user_id, ts) views -- exactly
    # the row a rn=1 dedup would keep -- so a row_number pass here would add
    # a second wide shuffle+sort of the views side for nothing (the oracle
    # dedups v only because DuckDB's ASOF tie pick is engine-internal)
    views = (
        events.filter(F.col("event_type") == "view")
        .select("event_id", "user_id", "ts", "value")
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


@register(
    "session_windows_per_user",
    oracle="""
    WITH x AS (
      SELECT user_id, ts, value,
             CASE WHEN ts - lag(ts) OVER (PARTITION BY user_id ORDER BY ts)
                       <= INTERVAL 30 MINUTE
                  THEN 0 ELSE 1 END AS new_sess
      FROM events
    ),
    s AS (
      SELECT user_id, ts, value,
             SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                 ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM x
    )
    SELECT user_id,
           MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(floor(value * 1e6) AS BIGINT)) AS DOUBLE) / 1e6 AS total_value
    FROM s
    GROUP BY user_id, sess_id
    """,
    description="Sessionization: Spark's built-in session_window (30-minute"
    " gap) -- one shuffle on the user key; the oracle is the equivalent"
    " gaps-and-islands SQL. Events at exactly the gap boundary merge"
    " (verified Spark semantics).",
)
def session_windows_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    ev = load_table(spark, sf_dir, "events")
    scaled = F.floor(F.col("value") * F.lit(1e6)).cast("long")
    return (
        ev.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            (F.sum(scaled).cast("double") / F.lit(1e6)).alias("total_value"),
        )
        .select(
            "user_id",
            F.col("w.start").alias("session_start"),
            F.col("w.end").alias("session_end"),
            "n_events",
            "total_value",
        )
    )


PRICE_BANDS = (
    ("budget", 0.0, 50_000.0),
    ("standard", 50_000.0, 120_000.0),
    ("plus", 120_000.0, 200_000.0),
    ("premium", 200_000.0, 300_000.0),
    ("luxury", 300_000.0, 420_000.0),
    ("ultra", 420_000.0, 600_000.0),
)
_BANDS_SQL = ", ".join(f"('{n}', {lo}, {hi})" for n, lo, hi in PRICE_BANDS)


@register(
    "range_join_price_bands",
    oracle=f"""
    SELECT band,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS band_revenue
    FROM orders
    JOIN (VALUES {_BANDS_SQL}) AS bands(band, lo, hi)
      ON o_totalprice >= lo AND o_totalprice < hi
    GROUP BY band
    """,
    description="Range (interval) join via binning: irregular price bands"
    " expand to coarse bins, orders compute one bin each, and the match is an"
    " equi hash join + exact bounds filter -- never a nested-loop theta join."
    " Oracle uses the plain theta join (same result, different plan).",
)
def range_join_price_bands(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    bands = spark.createDataFrame(
        list(PRICE_BANDS), "band string, lo double, hi double"
    )
    joined = bin_range_join(
        orders.select("o_orderkey", "o_totalprice"),
        "o_totalprice",
        bands,
        "lo",
        "hi",
        bin_size=25_000.0,
    )
    return joined.groupBy("band").agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(F.col("o_totalprice").cast("decimal(12,2)")).cast("double").alias("band_revenue"),
    )
