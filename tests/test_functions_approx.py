"""Accuracy check for the approximate-distinct query (it has no SQL oracle:
HLL sketch estimates are engine-specific)."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_cdc_fluss_quickstart_spark.plans.registry import all_specs
from flink_cdc_fluss_quickstart_spark.tables import load_table


def test_approx_distinct_within_rsd_bound(spark, sf_dir):
    approx = {
        r["day"]: r["approx_users"]
        for r in all_specs()["approx_distinct_users_daily"].builder(spark, sf_dir).collect()
    }
    exact = {
        r["day"]: r["exact_users"]
        for r in load_table(spark, sf_dir, "events")
        .groupBy(F.date_trunc("day", "ts").alias("day"))
        .agg(F.countDistinct("user_id").alias("exact_users"))
        .collect()
    }
    assert approx.keys() == exact.keys()
    for day, est in approx.items():
        # rsd=0.02 -> generous 10% acceptance band
        assert abs(est - exact[day]) <= max(1, 0.1 * exact[day]), (day, est, exact[day])
