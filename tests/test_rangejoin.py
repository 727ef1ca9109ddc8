"""Unit tests for the binned range join operator."""

from __future__ import annotations

from flink_cdc_fluss_quickstart_spark.operators.rangejoin import bin_range_join


def _fixtures(spark):
    left = spark.createDataFrame(
        [(1, 5.0), (2, 10.0), (3, 19.99), (4, 20.0), (5, -3.0), (6, 100.0)],
        "id long, v double",
    )
    intervals = spark.createDataFrame(
        [("a", 0.0, 10.0), ("b", 10.0, 20.0), ("c", -5.0, 0.0)],
        "name string, lo double, hi double",
    )
    return left, intervals


def test_bin_range_join_bounds(spark):
    left, intervals = _fixtures(spark)
    out = bin_range_join(left, "v", intervals, "lo", "hi", bin_size=7.0)
    got = {r["id"]: r["name"] for r in out.collect()}
    # lo inclusive, hi exclusive; negatives work; out-of-range rows drop
    assert got == {1: "a", 2: "b", 3: "b", 5: "c"}


def test_bin_range_join_is_equi_hash_join(spark):
    left, intervals = _fixtures(spark)
    out = bin_range_join(left, "v", intervals, "lo", "hi", bin_size=7.0)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
