"""Distributed global rank over an arbitrary total order.

`Window.orderBy(...)` with no partition key funnels the whole frame through
ONE task -- the classic global-sort scale killer. The hash-sub-bucket
two-level rank used elsewhere (training_shuffle_order, length_bucket_batches,
fixed_count_sample_by_source) does not apply here: it needs level-2 groups
that are CONTIGUOUS in the sort order, which a hash prefix only provides when
the sort key IS the hash. For a data-dependent value order (e.g. rank by LM
surprisal, ties broken by doc_id), contiguous balanced groups require
data-dependent range boundaries.

This module uses Spark's own range partitioner for exactly that:

1. `repartitionByRange(order_by)` splits the frame into contiguous key
   ranges with sampled boundaries -- balanced BY CONSTRUCTION, even when the
   score mass concentrates on one value (the composite key including the
   unique tie-break column has no duplicate keys, so the partitioner is free
   to split the tied mass across partitions);
2. the partition id is stamped as a column and the frame is PERSISTED, so
   the (sampled, run-varying) partition assignment is decided exactly once
   -- both the in-partition rank and the base-offset aggregate read the same
   materialized assignment, never two independent samplings;
3. `row_number` ranks within each partition id in parallel windows, and a
   metadata-sized prefix sum over the per-partition counts (one row per
   partition) supplies base offsets, broadcast back.

The OUTPUT is deterministic across runs regardless of where the sampled
boundaries fall: rank = |rows with smaller key| is a pure function of the
data because ranges are contiguous and the composite key is unique. Only the
physical layout varies run to run -- the same contract as any shuffle.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window

from flink_cdc_fluss_quickstart_spark.functions.dedup import track_cache


def global_rank(df: DataFrame, order_by: Sequence[str | Column],
                out_col: str = "rank") -> DataFrame:
    """Append 0-based dense global row rank `out_col` ordered by `order_by`.

    The final `order_by` column must make the composite key unique (a
    tie-break id); with duplicate composite keys the rank among equals would
    depend on partition placement.
    """
    spark = df.sparkSession
    # "spark.sql.shuffle.partitions" may be unset or the AQE idiom "auto";
    # fall back to the cluster's default parallelism rather than erroring
    try:
        n_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        n_parts = spark.sparkContext.defaultParallelism
    ranged = df.repartitionByRange(n_parts, *order_by)
    # persist pins ONE sampled partition assignment for both consumers (the
    # range sampler is seeded per-RDD: two separate exchanges of the same
    # subtree may pick different boundaries, which would mis-pair sub-ranks
    # with base offsets)
    part = track_cache(
        ranged.withColumn("__pid", F.spark_partition_id()).persist()
    )
    w_in = Window.partitionBy("__pid").orderBy(*order_by)
    pos = part.withColumn("__sub", (F.row_number().over(w_in) - 1).cast("bigint"))
    # one row per partition: metadata-sized, so the single-partition ordered
    # prefix-sum window is bounded at any data scale
    wb = Window.orderBy("__pid").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        part.groupBy("__pid")
        .agg(F.count(F.lit(1)).alias("__cnt"))
        .select(
            "__pid",
            F.coalesce(F.sum("__cnt").over(wb), F.lit(0)).cast("bigint").alias("__base"),
        )
    )
    return (
        pos.join(F.broadcast(bases), "__pid")
        .withColumn(out_col, (F.col("__sub") + F.col("__base")).cast("bigint"))
        .drop("__pid", "__sub", "__base")
    )
