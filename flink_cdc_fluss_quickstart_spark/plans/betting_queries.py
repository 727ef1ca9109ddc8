"""S4 (betting-tickets shape) analytics under the driver's oracle gate.

The real S4 ingest is CDC-only (sources/betting.py + the init-catalogs.sql
front-end test); the driver gate runs over the standard parquet tables, so
this query derives the ticket shape deterministically from `orders` -- same
type surface as cdc_tickets (flink-cdc/flink-gen.sh:58-77): lifecycle
statuses, BOOLEAN accept_odds_change, integer-cents amounts with a NULLABLE
winning_amount -- then runs the per-status settlement rollup a betting
operator would serve.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_cdc_fluss_quickstart_spark.plans.registry import register
from flink_cdc_fluss_quickstart_spark.tables import load_table


@register(
    "betting_tickets_analytics",
    oracle="""
    WITH t AS (
      SELECT CASE WHEN o_orderstatus = 'O' THEN 'PENDING'
                  WHEN o_orderstatus = 'P' THEN 'CANCELLED'
                  WHEN o_orderkey % 2 = 0 THEN 'WON'
                  ELSE 'LOST' END AS status,
             CAST(floor(o_totalprice * 100) AS BIGINT) AS entry_amount,
             (o_orderkey % 3 = 0) AS accept_odds_change,
             o_orderdate
      FROM orders
    ),
    t2 AS (
      SELECT t.*,
             CASE WHEN status = 'WON'
                  THEN entry_amount * 185 // 100 END AS winning_amount
      FROM t
    )
    SELECT status,
           COUNT(*) AS n_tickets,
           CAST(SUM(entry_amount) AS BIGINT) AS total_entry,
           CAST(SUM(winning_amount) AS BIGINT) AS total_winnings,
           CAST(SUM(CASE WHEN accept_odds_change THEN 1 ELSE 0 END) AS BIGINT)
             AS accepted_odds_changes,
           CAST(SUM(winning_amount) AS DOUBLE) / CAST(SUM(entry_amount) AS DOUBLE)
             AS payout_ratio,
           MAX(o_orderdate) AS last_ticket_at
    FROM t2
    GROUP BY status
    """,
    description="S4 betting-ticket settlement rollup: per-status counts,"
    " integer-cents entry totals (exact BIGINT sums -- the reference stores"
    " amounts as BIGINT cents, not decimals), NULL-skipping winnings sums"
    " (only WON tickets carry winning_amount), BOOLEAN conditional counts,"
    " and a DOUBLE payout ratio computed from the exact integer totals.",
)
def betting_tickets_analytics(spark: SparkSession, sf_dir: str) -> DataFrame:
    orders = load_table(spark, sf_dir, "orders")
    status = (
        F.when(F.col("o_orderstatus") == "O", "PENDING")
        .when(F.col("o_orderstatus") == "P", "CANCELLED")
        .when(F.col("o_orderkey") % 2 == 0, "WON")
        .otherwise("LOST")
    )
    t = orders.select(
        status.alias("status"),
        F.floor(F.col("o_totalprice") * F.lit(100)).cast("bigint").alias("entry_amount"),
        (F.col("o_orderkey") % 3 == 0).alias("accept_odds_change"),
        "o_orderdate",
    )
    # integer division stays exact in both engines (Spark `div` / DuckDB `//`)
    t = t.withColumn(
        "winning_amount",
        F.expr("CASE WHEN status = 'WON' THEN entry_amount * 185 div 100 END"),
    )
    return t.groupBy("status").agg(
        F.count(F.lit(1)).alias("n_tickets"),
        F.sum("entry_amount").alias("total_entry"),
        F.sum("winning_amount").alias("total_winnings"),
        F.sum(F.when(F.col("accept_odds_change"), 1).otherwise(0)).alias(
            "accepted_odds_changes"
        ),
        (
            F.sum("winning_amount").cast("double")
            / F.sum("entry_amount").cast("double")
        ).alias("payout_ratio"),
        F.max("o_orderdate").alias("last_ticket_at"),
    )
