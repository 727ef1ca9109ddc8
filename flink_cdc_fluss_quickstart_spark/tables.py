"""Table loading / catalog registration over the driver-generated parquet.

Mirrors the reference's catalog surface (CREATE CATALOG / USE / table scans,
SURVEY.md section 2.1 S6-S7): the same physical table serves both batch scans
and streaming reads. Here the batch side is a plain parquet scan -- Catalyst
pushes filters and prunes columns into the scan, which is what the reference's
lakehouse tier (Paimon/Iceberg parquet on S3) relies on too.
"""

from __future__ import annotations

import os
import re
import urllib.parse

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

TABLE_NAMES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)

DEFAULT_SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def table_path(sf_dir: str, name: str) -> str:
    return os.path.join(sf_dir, f"{name}.parquet")


def table_row_count(sf_dir: str, name: str) -> int:
    """Exact row count from parquet FOOTER metadata -- a driver-side file
    read, not a Spark job. Plan-building code that needs a corpus size to
    pick a partitioning (e.g. winnow_overlap_pairs) uses this so that
    building/explaining a plan costs zero cluster work; row counts in
    parquet footers are exact by format contract."""
    import pyarrow.dataset as ds

    dataset = ds.dataset(table_path(sf_dir, name), format="parquet")
    return sum(frag.metadata.num_rows for frag in dataset.get_fragments())


def _ensure_session_confs(spark: SparkSession) -> None:
    """Self-heal confs the queries depend on, so every registered query runs
    on ANY SparkSession -- including one the caller built without our
    session.get_spark() factory (e.g. a verification harness).

    Both are runtime-settable SQL confs:
    - nanosAsLong: events.parquet stores TIMESTAMP(NANOS), which Spark rejects
      at scan time without it (PARQUET_TYPE_ILLEGAL).
    - session.timeZone=UTC: the NTZ cast below renders through the session TZ;
      the oracle (DuckDB) always sees UTC wall-clock values.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """Batch scan of one table. Plain `spark.read.parquet` so that predicate
    pushdown / column pruning reach the file scan (verify via .explain)."""
    _ensure_session_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        # events.ts encoding varies across generator versions: parquet
        # TIMESTAMP(NANOS) surfaces as LongType (via nanosAsLong), a
        # logical-type-less INT64 micros column ALSO surfaces as LongType,
        # and TIMESTAMP(MICROS) surfaces as a timestamp type directly.
        # Normalize all to timestamp_ntz so downstream plans and the DuckDB
        # oracle see identical UTC wall-clock values. The long case
        # disambiguates ns-vs-us row-locally by magnitude: plausible epochs
        # are ~1.7e18 ns vs ~1.7e15 us -- three orders apart -- so 1e17
        # splits them cleanly for any date from 1973 to 5138; an unconditional
        # `div 1000` would silently shift micros-encoded values 1000x.
        ts_type = df.schema["ts"].dataType.typeName()
        if ts_type == "long":
            df = df.withColumn(
                "ts",
                F.expr(
                    "cast(timestamp_micros(CASE WHEN abs(ts) >= 100000000000000000"
                    " THEN ts div 1000 ELSE ts END) as timestamp_ntz)"
                ),
            )
        elif ts_type != "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp_ntz"))
    return df


_SIZE_UNITS = {"": 1, "b": 1, "k": 1 << 10, "kb": 1 << 10, "m": 1 << 20,
               "mb": 1 << 20, "g": 1 << 30, "gb": 1 << 30, "t": 1 << 40, "tb": 1 << 40}


def _parse_bytes(s: str) -> int:
    """Spark size-string ('128MB', '134217728b', '64m') -> bytes."""
    m = re.fullmatch(r"\s*(\d+)\s*([a-zA-Z]*)\s*", s)
    if not m:
        return 128 << 20
    return int(m.group(1)) * _SIZE_UNITS.get(m.group(2).lower(), 1)


def spread(df: DataFrame, min_parts: int | None = None) -> DataFrame:
    """Ensure enough partitions before CPU-heavy row-local work (hashing,
    shingling, vector math, pandas UDFs).

    Small single-file scans otherwise run one task (a 600 KB parquet is one
    split under maxPartitionBytes), serializing work that is embarrassingly
    parallel. At production scale inputs already have >= cores partitions and
    this is a no-op -- the check keeps the extra exchange out of big plans.

    The split estimate is plan-free: `df.inputFiles()` queries the relation's
    FileIndex (no RDD conversion -- `df.rdd.getNumPartitions()` would force a
    DeserializeToObject plan per call), and file sizes come from the local
    filesystem when available. Non-file-backed or remote inputs fall back to
    "assume already parallel" (skip the repartition), which is the correct
    bias at scale.

    The per-file `max(1, ...)` floor deliberately ignores small-file packing:
    when file count >= target, Spark's own maxSplitBytes shrinks to
    totalBytes/defaultParallelism (floored at openCostInBytes), so the real
    scan still lands ~defaultParallelism partitions -- skipping the
    repartition there is correct, not an overestimate bug.
    """
    spark = df.sparkSession
    target = min_parts or spark.sparkContext.defaultParallelism
    try:
        files = df.inputFiles()
    except Exception:
        return df
    if not files:
        return df
    max_split = _parse_bytes(spark.conf.get("spark.sql.files.maxPartitionBytes", "128MB"))
    est_splits = 0
    for f in files:
        if f.startswith("file:"):
            # inputFiles() returns URIs: percent-decode before stat'ing, or a
            # path with a space/'%' raises and silently disables the spread
            path = urllib.parse.unquote(f[len("file:"):])
            try:
                size = os.path.getsize(path)
            except OSError:
                return df
            est_splits += max(1, -(-size // max_split))
        else:
            return df  # remote storage: scans there are already split-parallel
    if est_splits < target:
        return df.repartition(target)
    return df


def load_tables(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> dict[str, DataFrame]:
    return {name: load_table(spark, sf_dir, name) for name in TABLE_NAMES
            if os.path.exists(table_path(sf_dir, name))}


def register_views(spark: SparkSession, sf_dir: str = DEFAULT_SF_DIR) -> None:
    """Register every table as a temp view so `spark.sql` works against the
    same namespace DuckDB's oracle sees (tables pre-registered as views)."""
    for name, df in load_tables(spark, sf_dir).items():
        df.createOrReplaceTempView(name)
