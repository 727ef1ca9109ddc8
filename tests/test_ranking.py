"""operators.ranking.global_rank: correctness and skew behavior of the
range-partitioned distributed rank (the curriculum_order base operator)."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_cdc_fluss_quickstart_spark.operators.ranking import global_rank


def _skewed_frame(spark, n=1000, tied=900, tie_score=5.0):
    """90% of rows share ONE exact score (the dup-heavy-corpus pathology the
    old fixed-width value-bucket rank funneled through a single window
    partition); the rest get distinct scores above and below it."""
    rows = [(i, tie_score) for i in range(tied)]
    rows += [(tied + j, tie_score + (j - 50) / 10.0) for j in range(n - tied)]
    return spark.createDataFrame(rows, "id bigint, score double")


def test_global_rank_matches_single_ordering_under_heavy_ties(spark):
    df = _skewed_frame(spark)
    got = {
        r.id: r.rank
        for r in global_rank(df, ["score", "id"], out_col="rank").collect()
    }
    expected = {
        row_id: pos
        for pos, (score, row_id) in enumerate(
            sorted((r.score, r.id) for r in df.collect())
        )
    }
    assert got == expected


def test_global_rank_deterministic_across_runs(spark):
    df = _skewed_frame(spark, n=500, tied=450)
    a = {r.id: r.rank for r in global_rank(df, ["score", "id"]).collect()}
    b = {r.id: r.rank for r in global_rank(df, ["score", "id"]).collect()}
    assert a == b


def test_range_partitioner_splits_tied_mass(spark):
    """The mechanism assumption: because the composite key (score, id) is
    unique, repartitionByRange is free to split the 90%-tied score across
    partitions -- no partition holds the whole tied block."""
    df = _skewed_frame(spark)
    sizes = [
        r.cnt
        for r in df.repartitionByRange(8, "score", "id")
        .groupBy(F.spark_partition_id().alias("pid"))
        .agg(F.count(F.lit(1)).alias("cnt"))
        .collect()
    ]
    assert max(sizes) < 900  # the tied block did not land in one partition
    assert len(sizes) > 1


def test_global_rank_plan_has_no_global_window(spark):
    """No Window node may order the full frame through one partition: every
    corpus-sized window must be partitioned by the stamped partition id (the
    only unpartitioned window is the metadata-sized per-partition base
    prefix sum)."""
    df = _skewed_frame(spark, n=200, tied=150)
    plan = (
        global_rank(df, ["score", "id"])
        ._jdf.queryExecution()
        .optimizedPlan()
        .toString()
    )
    windows = [ln for ln in plan.splitlines() if "Window" in ln]
    assert windows, "expected window nodes in the rank plan"
    row_number_windows = [ln for ln in windows if "row_number" in ln]
    assert row_number_windows
    for ln in row_number_windows:
        assert "__pid" in ln  # partitioned by the range-partition id
