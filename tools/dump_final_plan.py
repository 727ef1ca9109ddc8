"""Execute named queries and dump the POST-EXECUTION adaptive plan
(`AdaptiveSparkPlan isFinalPlan=true`) to plans/<round>/<name>_final_adaptive.txt.

This is the runtime-plan evidence static explains cannot show: AQE
decisions (SMJ -> shuffled-hash rewrite under
spark.sql.adaptive.maxShuffledHashJoinLocalMapThreshold, coalesced
AQEShuffleReads, runtime join-strategy changes) only appear after the query
has run (VERDICT r15 item 3: the r15 SHJ-rewrite evidence was timing-only;
this closes it).

Usage: python tools/dump_final_plan.py <query> [query ...]
       (sf dir from $SPARK_GRAFT_SF_DIR; round dir from $SPARK_GRAFT_ROUND,
       default r16)
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

from flink_cdc_fluss_quickstart_spark.session import get_spark  # noqa: E402
from flink_cdc_fluss_quickstart_spark.plans.registry import all_specs  # noqa: E402


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    round_dir = os.environ.get("SPARK_GRAFT_ROUND", "r16")
    out_dir = os.path.join(_REPO_ROOT, "plans", round_dir)
    os.makedirs(out_dir, exist_ok=True)
    spark = get_spark("dump-final-plan")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    for name in names:
        df = specs[name].builder(spark, sf_dir)
        # collect(), not count(): count() wraps df in a NEW Dataset whose
        # own AdaptiveSparkPlan finalizes instead, leaving df's top-level
        # plan isFinalPlan=false. collect() runs df's own QueryExecution.
        n = len(df.collect())
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain()  # post-execution: prints the final adaptive plan
        txt = buf.getvalue()
        path = os.path.join(out_dir, f"{name}_final_adaptive.txt")
        with open(path, "w") as f:
            f.write(txt)
        final = "isFinalPlan=true" in txt
        print(
            f"{name}: {path} ({n} rows, isFinalPlan={final}, "
            f"SortMergeJoin x{txt.count('SortMergeJoin')}, "
            f"ShuffledHashJoin x{txt.count('ShuffledHashJoin')}, "
            f"BroadcastHashJoin x{txt.count('BroadcastHashJoin')})"
        )
        spark.catalog.clearCache()


if __name__ == "__main__":
    main()
