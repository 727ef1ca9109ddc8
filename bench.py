"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from flink_cdc_fluss_quickstart_spark.session import get_spark  # noqa: E402
from flink_cdc_fluss_quickstart_spark.plans.registry import all_specs  # noqa: E402

# headline set: the flagship + the heavy relational queries + the operator
# families (dedup / text / similarity / changelog / temporal / multimodal)
HEADLINE = (
    "revenue_analytics",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q5_region_revenue",
    "q17_below_avg_quantity_revenue",
    "q7_nation_trade_flows",
    "upsert_latest_snapshot",
    "changelog_aware_aggregation",
    "event_time_tumbling_hourly",
    "dedup_exact",
    "minhash_lsh_pairs",
    "ngram_jaccard_neardup",
    "simhash_neardup_pairs",
    "text_quality",
    "quality_filter_route",
    "dataset_split_assign",
    "token_stats_by_lang",
    "repetition_signals",
    "decontamination_ngrams",
    "betting_tickets_analytics",
    "embedding_cosine_topk",
    "embedding_ann_lsh",
    "embedding_ann_ivf",
    "asof_view_before_purchase",
    "session_windows_per_user",
    "range_join_price_bands",
    "multimodal_feature_extract",
)


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    specs = all_specs()
    timings: dict[str, float] = {}
    # warm the JVM + file listing once with the cheapest query, and the
    # Python daemon workers with a no-op mapInPandas (one-time session costs,
    # not per-query costs)
    specs["q1_pricing_summary"].builder(spark, sf_dir).count()
    spark.range(64, numPartitions=32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    for name in HEADLINE:
        spec = specs[name]
        t0 = time.time()
        df = spec.builder(spark, sf_dir)
        n = df.count()  # forces full execution; avoids driver-side collect cost
        timings[name] = round(time.time() - t0, 3)
        print(f"# {name}: {timings[name]:.3f}s ({n} rows)", file=sys.stderr)

    total = round(sum(timings.values()), 3)
    print(json.dumps({
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": sf,
    }))


if __name__ == "__main__":
    main()
