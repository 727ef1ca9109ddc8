"""One-off r14 audit: do the incremental census paths plan a broadcast of a
corpus-sized side at x100? (The r13 multiclass lesson: static size estimates
through explode/aggregate chains undershoot, and the planner then broadcasts
a frame that scales with the corpus -- plans/text_queries._corpus_side.)

For each op this prints every broadcast-ish node of the FORMATTED plan at an
x100-replicated corpus, plus which leaf scans feed it, so a corpus-sized
build side is visible by construction (the batch predicates are %-residue
filters; a broadcast subtree WITHOUT the batch filter reads the corpus).

Usage: SPARK_GRAFT_DRIVER_MEM=16g python tools/audit_incremental_joins.py [factor]
"""

from __future__ import annotations

import io
import os
import re
import sys
import tempfile
from contextlib import redirect_stdout

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tools")

from flink_cdc_fluss_quickstart_spark.session import get_spark  # noqa: E402
from flink_cdc_fluss_quickstart_spark.plans.registry import all_specs  # noqa: E402
from scale_smoke import build_scaled  # noqa: E402

OPS = ("minhash_incremental_pairs", "span_dedup_incremental",
       "line_dedup_incremental")


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    spark = get_spark("audit-incr")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    tmp = tempfile.mkdtemp(prefix="audit_incr_")
    d = os.path.join(tmp, f"x{factor}")
    os.makedirs(d, exist_ok=True)
    build_scaled(d, factor)
    for op in OPS:
        df = specs[op].builder(spark, d)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        plan = buf.getvalue()
        print(f"== {op} (x{factor})")
        joins = re.findall(r"\b(BroadcastHashJoin|SortMergeJoin|"
                           r"ShuffledHashJoin|BroadcastNestedLoopJoin|"
                           r"CartesianProduct)\b", plan)
        from collections import Counter

        print("  join nodes:", dict(Counter(joins)))
        if "--full" in sys.argv:
            print(plan.split("\n\n")[0])
        else:
            tree = plan.split("\n\n")[0]
            for i, line in enumerate(tree.splitlines()):
                if "Broadcast" in line:
                    print("  " + line.rstrip())
        sys.stdout.flush()


if __name__ == "__main__":
    main()
