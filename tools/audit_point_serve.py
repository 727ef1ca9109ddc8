"""r15 serving-path decade: point-read cost vs table size, and the
rescale lever.

The 100 TB claim behind PKTable.lookup() is that a k-key point read costs
O(touched_buckets/n_buckets of the table) -- INDEPENDENT of total table
size at a fixed per-bucket size, and tunable via rescale() when the table
outgrows its creation-time count. This audit measures, at growing base
sizes (same bucket count, so per-bucket size grows with the table):

  - lookup(k=8 keys): wall clock, files read (inputFiles), rows scanned
    bound (= the touched buckets' share of the table);
  - the full-scan alternative (snapshot().filter(isin)): wall clock --
    what serving would cost WITHOUT bucket routing;
  - after rescale(4x buckets) at the largest size: lookup wall + files --
    the read fraction drops ~4x, the knob a grown table turns.

Usage: python tools/audit_point_serve.py [rows_small] (default 1_000_000;
sizes run at 1x / 4x / 16x that).
"""

from __future__ import annotations

import os
import sys
import tempfile
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from flink_cdc_fluss_quickstart_spark.session import get_spark  # noqa: E402
from flink_cdc_fluss_quickstart_spark.streaming.pk_table import PKTable  # noqa: E402

N_BUCKETS = 64
PROBE_KEYS = 8


def _build(spark, root: str, tag: str, rows: int) -> PKTable:
    t = PKTable(spark, os.path.join(root, tag), keys=["k"], order_by=["seq"],
                n_buckets=N_BUCKETS)
    t.overwrite(
        spark.range(rows).select(
            F.col("id").alias("k"),
            F.lit(0).cast("long").alias("seq"),
            F.md5(F.col("id").cast("string")).alias("v"),
        )
    )
    return t


def _median3(fn) -> float:
    times = []
    for _ in range(3):
        t0 = time.time()
        fn()
        times.append(time.time() - t0)
    return sorted(times)[1]


def _mb(files) -> float:
    total = 0
    for f in files:
        p = f.replace("file:", "")
        try:
            total += os.path.getsize(p)
        except OSError:
            pass
    return total / 1e6


def _measure(spark, t: PKTable, rows: int, label: str) -> None:
    probe = spark.createDataFrame(
        [(int(rows * (i + 0.5) / PROBE_KEYS),) for i in range(PROBE_KEYS)],
        "k long",
    )
    out = t.lookup(probe)
    n_files = len(out.inputFiles())
    read_mb = _mb(out.inputFiles())
    table_mb = _mb(t.snapshot().inputFiles())
    got = [0]

    def run_lookup():
        got[0] = len(t.lookup(probe).collect())

    run_lookup()  # warm (JVM/page-cache) before the medians
    lk = _median3(run_lookup)

    keys = [r["k"] for r in probe.collect()]

    def run_scan():
        t.snapshot().filter(F.col("k").isin(keys)).collect()

    run_scan()
    sc = _median3(run_scan)
    # wall clock in local[32] is dominated by fixed driver-job overhead
    # (lookup runs 3 tiny jobs); BYTES READ is the size-independent signal
    # that scales -- at 100 TB the scan term dominates both paths
    print(f"  {label}: {rows:>10,} rows  lookup={lk:6.3f}s"
          f" ({got[0]} rows, {n_files} files, {read_mb:8.1f} MB"
          f" of {table_mb:8.1f} MB = {100 * read_mb / table_mb:4.1f}%"
          f" <= {min(PROBE_KEYS, t.n_buckets)}/{t.n_buckets})"
          f"  full-scan-filter={sc:6.3f}s (reads 100%)")


def main() -> None:
    rows_small = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    spark = get_spark("audit-point-serve")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="audit_point_serve_")

    print(f"== point-serve decade: {PROBE_KEYS}-key lookup vs full-scan"
          f" filter, {N_BUCKETS} buckets ==")
    tables = {}
    for mult in (1, 4, 16):
        rows = rows_small * mult
        tables[mult] = _build(spark, root, f"x{mult}", rows)
        _measure(spark, tables[mult], rows, f"x{mult:<2}")

    big = tables[16]
    big.rescale(N_BUCKETS * 4)
    print(f"== after rescale {N_BUCKETS} -> {N_BUCKETS * 4} buckets at x16"
          " (the lever a grown table turns) ==")
    _measure(spark, big, rows_small * 16, "x16")


if __name__ == "__main__":
    main()
