"""Plan audit: print the physical-plan summary of every declared query --
join strategies, exchanges, scan pushdown -- so plan regressions are visible
at a glance (the per-query twin of tests/test_plans.py).

Usage: python tools/explain_all.py [sf_dir] [query ...]
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from flink_cdc_fluss_quickstart_spark.session import get_spark  # noqa: E402
from flink_cdc_fluss_quickstart_spark.plans.registry import all_specs  # noqa: E402

MARKERS = (
    "BroadcastHashJoin",
    "SortMergeJoin",
    "ShuffledHashJoin",
    "BroadcastNestedLoopJoin",
    "CartesianProduct",
    "Exchange hashpartitioning",
    "Window",
    "HashAggregate",
    "Expand",
    "ArrowEvalPython",
    "FlatMapGroupsInPandas",
    "MapInPandas",
)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    names = sys.argv[2:] or sorted(all_specs())
    spark = get_spark("explain")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        spec = all_specs()[name]
        df = spec.builder(spark, sf_dir)
        qe = df._jdf.queryExecution()
        plan = qe.executedPlan().toString()
        counts = {m: plan.count(m) for m in MARKERS if plan.count(m)}
        formatted = qe.explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        pushed = [
            re.sub(r"\s+", " ", ln.strip())[:110]
            for ln in formatted.splitlines()
            if "PushedFilters" in ln and "PushedFilters: []" not in ln
        ]
        print(f"== {name}")
        print("   ", ", ".join(f"{k}x{v}" for k, v in counts.items()) or "(scan-only)")
        for p in pushed:
            print("   ", p)


if __name__ == "__main__":
    main()
