"""r14 audit: the merge-on-read snapshot plan at max delta depth vs
compacted, at x100-scale table size.

Pins two things the LSM read path must hold at 100 TB:
1. the resolve's SHUFFLE VOLUME is bounded by the pending ingests, not the
   table -- untouched base rows stream through an anti join with no
   table-sized exchange (when the delta key set broadcasts, the plan adds
   ZERO exchange over the compacted fast path);
2. the wall-clock penalty of reading at depth 8 (the compact_threshold
   maximum) vs compacted stays a bounded constant, erased by compaction.

Usage: python tools/audit_delta_read.py [base_rows] [batch_rows]
"""

from __future__ import annotations

import io
import os
import re
import sys
import tempfile
import time
from collections import Counter
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F  # noqa: E402

from flink_cdc_fluss_quickstart_spark.session import get_spark  # noqa: E402
from flink_cdc_fluss_quickstart_spark.streaming.pk_table import PKTable  # noqa: E402


def plan_of(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def audit(plan: str) -> str:
    joins = Counter(
        re.findall(r"\b(BroadcastHashJoin \w+|SortMergeJoin \w+)\b", plan)
    )
    n_hash = len(re.findall(r"Arguments: hashpartitioning", plan))
    return f"joins={dict(joins)} hash_exchanges={n_hash}"


def timed_count(df) -> tuple[float, int]:
    # checksum agg, not count(): a count over the compacted pure-scan path
    # short-circuits to parquet footer stats and reads no data, which would
    # overstate the depth-8 penalty; the xxhash64 sum forces both paths to
    # read and fold every row
    t0 = time.time()
    n = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.expr("bit_xor(xxhash64(k, v))").alias("cs"),  # no ANSI overflow
    ).collect()[0]["n"]
    return time.time() - t0, n


def main() -> None:
    base_rows = int(sys.argv[1]) if len(sys.argv) > 1 else 4_000_000
    batch_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 50_000
    spark = get_spark("audit-delta-read")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="audit_delta_read_")
    # bucket.num sized like a serving table (the Fluss analogue) so the
    # lookup arm's pruning is visible: 10 probe keys touch <= 10/64 buckets
    t = PKTable(spark, root + "/t", keys=["k"], order_by=["seq"], n_buckets=64)
    t.overwrite(
        spark.range(base_rows).select(
            F.col("id").alias("k"),
            F.lit(0).cast("long").alias("seq"),
            F.md5(F.col("id").cast("string")).alias("v"),
        )
    )
    # 8 ingests (the compact_threshold maximum) of update batches whose keys
    # stride the table uniformly -- every bucket accumulates depth-8 deltas
    for i in range(1, 9):
        t.ingest(
            spark.range(batch_rows).select(
                ((F.col("id") * 79 + i) % base_rows).alias("k"),
                F.lit(i).cast("long").alias("seq"),
                F.lit(f"u{i}").alias("v"),
                F.lit("I").alias("op"),
            ),
            batch_id=i, writer_id="audit",
            compact_threshold=10_000,  # hold compaction off: we want depth 8
        )
    snap = t.snapshot()
    print(f"== depth-8 snapshot plan ({base_rows:,} base rows,"
          f" 8 x {batch_rows:,}-row deltas)")
    print("  " + audit(plan_of(snap)))
    w1, n1 = timed_count(t.snapshot())
    w1b, _ = timed_count(t.snapshot())

    # A/B arm: the pre-r14 resolve (whole base + deltas through one
    # latest-by-key window = a full-table shuffle at any delta depth)
    from flink_cdc_fluss_quickstart_spark.operators.changelog import latest_by_key

    m = t._read_manifest()
    base_dirs = [os.path.join(t.path, v) for k, v in m["buckets"].items()
                 if "#" not in k]
    delta_dirs = [os.path.join(t.path, v) for k, v in m["buckets"].items()
                  if "#" in k]
    legacy = (
        spark.read.parquet(*base_dirs)
        .withColumn("__op", F.lit("I"))
        .withColumn("__dv", F.lit(0).cast("long"))
        .unionByName(spark.read.parquet(*delta_dirs))
    )
    legacy = latest_by_key(legacy, ["k"], ["__dv"]).filter(
        F.col("__op") != "D").drop("__op", "__dv")
    print("== depth-8 LEGACY (pre-r14 full-window) plan")
    print("  " + audit(plan_of(legacy)))
    wl, _ = timed_count(legacy)
    wlb, _ = timed_count(legacy)

    # point-read arm: a 10-key lookup() vs the full snapshot, at depth 8
    probe = spark.range(10).select((F.col("id") * 997 + 13).alias("k"))
    t0 = time.time()
    n_lk = t.lookup(probe).count()
    wk8 = time.time() - t0
    t0 = time.time()
    t.lookup(probe).count()
    wk8b = time.time() - t0
    files8 = len(t.lookup(probe).inputFiles())
    t.compact()
    wc, nc = timed_count(t.snapshot())
    wcb, _ = timed_count(t.snapshot())
    print("== compacted snapshot plan")
    print("  " + audit(plan_of(t.snapshot())))
    t0 = time.time()
    t.lookup(probe).count()
    wkc = time.time() - t0
    filesc = len(t.lookup(probe).inputFiles())
    print(f"depth-8 read: {w1:.2f}s / {w1b:.2f}s ({n1:,} rows);"
          f" legacy depth-8: {wl:.2f}s / {wlb:.2f}s;"
          f" compacted: {wc:.2f}s / {wcb:.2f}s ({nc:,} rows);"
          f" penalty {w1b / max(wcb, 1e-9):.2f}x (legacy"
          f" {wlb / max(wcb, 1e-9):.2f}x)")
    print(f"10-key lookup: depth-8 {wk8:.2f}s / {wk8b:.2f}s"
          f" ({n_lk} rows, {files8} files); compacted {wkc:.2f}s"
          f" ({filesc} files) -- vs full-snapshot reads above")


def wide() -> None:
    """r15 audit (r14 verdict item 5): a BULK-BACKFILL backlog -- ONE
    pending ingest the size of the table itself. The resolve's anti join
    broadcasts its distinct-delta-key side when small (correct for daily
    ingest); distinct() is an AGGREGATE, the exact static-estimate class
    the r13/r14 lessons flagged for undershoot. This prints the join
    strategy the planner picks at daily size vs table size, BOTH as the
    static plan and as the AQE-final executed plan: the distinct's own
    shuffle gives AQE a true-size re-plan point, so the question is
    whether the runtime plan abandons the broadcast past the threshold."""
    base_rows = int(sys.argv[2]) if len(sys.argv) > 2 else 4_000_000
    spark = get_spark("audit-delta-read-wide")
    spark.sparkContext.setLogLevel("ERROR")
    root = tempfile.mkdtemp(prefix="audit_wide_delta_")

    def run_case(tag: str, batch_rows: int) -> None:
        t = PKTable(spark, f"{root}/{tag}", keys=["k"], order_by=["seq"],
                    n_buckets=64)
        t.overwrite(
            spark.range(base_rows).select(
                F.col("id").alias("k"),
                F.lit(0).cast("long").alias("seq"),
                F.md5(F.col("id").cast("string")).alias("v"),
            )
        )
        t.ingest(
            spark.range(batch_rows).select(
                ((F.col("id") * 79 + 1) % (base_rows * 2)).alias("k"),
                F.lit(1).cast("long").alias("seq"),
                F.lit("u").alias("v"),
                F.lit("I").alias("op"),
            ),
            batch_id=1, writer_id="audit", compact_threshold=10_000,
        )
        snap = t.snapshot()
        print(f"== {tag}: {base_rows:,} base rows, ONE {batch_rows:,}-row"
              " pending delta")
        print(f"  static: {audit(plan_of(snap))}")
        t0 = time.time()
        snap.write.format("noop").mode("overwrite").save()
        w = time.time() - t0
        # the same QueryExecution now carries the AQE-final plan
        print(f"  final:  {audit(plan_of(snap))}  wall={w:.2f}s")

    run_case("daily", 50_000)              # the designed-for cadence
    run_case("backfill", base_rows)        # delta == table-sized backlog
    # a backlog whose DISTINCT KEY SET alone exceeds the 64m broadcast
    # threshold: the strategy must abandon the broadcast here, or the
    # build side scales with the backlog and OOMs at 100 TB
    run_case("mega-backfill", base_rows * 4)


if __name__ == "__main__":
    if len(sys.argv) > 1 and sys.argv[1] == "--wide":
        wide()
    else:
        main()
