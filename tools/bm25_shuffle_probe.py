"""Planted-skew shuffle-bytes probe for the bm25 pre-shuffle stop-term
filter (r16, guide 3.2 / VERDICT r15 item 4).

The filter is bench-invisible at sf0.1 (the eligible join broadcasts at
test vocab sizes and the tiny corpus carries no over-cap token), so the
evidence must be shuffle BYTES under the conditions where the filter
exists to help: a corpus whose Zipf head exceeds the df cap, joined in the
non-broadcast regime a real corpus's vocabulary forces. This probe:

1. derives a x<factor> corpus from the sf0.1 documents (the scale_smoke
   recipe: replicated rows, shifted doc_ids, per-copy token prefix) and
   PLANTS a fixed set of head tokens appended to every document, so their
   df = n_docs blows past max(FLOOR, n_docs // DENOM);
2. forces the at-scale plan shape with autoBroadcastJoinThreshold=-1
   (at a real vocabulary the eligible frame cannot broadcast; the dtf
   side then keys through a tok exchange);
3. executes the postings subtree WITH and WITHOUT the heavy anti-filter
   through a noop-equivalent full materialization and reports per-variant
   total shuffle write bytes (Spark UI REST, summed over the job group's
   stages) plus rows/wall.

Row-identity is asserted: both variants must produce the same postings
row count (the filter only drops rows the eligible join drops anyway).

Usage: python tools/bm25_shuffle_probe.py [factor] [n_head_tokens]
       (defaults: factor 100, 8 planted head tokens)
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

import pyspark.sql.functions as F  # noqa: E402

from flink_cdc_fluss_quickstart_spark.session import get_spark  # noqa: E402
from flink_cdc_fluss_quickstart_spark.tables import load_table, spread  # noqa: E402
from flink_cdc_fluss_quickstart_spark.plans.text_queries import (  # noqa: E402
    BM25_DF_CAP_DENOM,
    BM25_DF_CAP_FLOOR,
)

BASE_SF = "/root/testdata/sf0.1"


def _shuffle_bytes(spark, group: str) -> tuple[int, int]:
    """(shuffle_write_bytes, n_stages) summed over a job group's stages via
    the UI REST API (the Python StageInfo carries no byte metrics)."""
    sc = spark.sparkContext
    tracker = sc.statusTracker()
    stage_ids = set()
    for jid in tracker.getJobIdsForGroup(group):
        jinfo = tracker.getJobInfo(jid)
        if jinfo:
            stage_ids.update(jinfo.stageIds)
    base = sc.uiWebUrl
    app_id = sc.applicationId
    with urllib.request.urlopen(f"{base}/api/v1/applications/{app_id}/stages") as r:
        stages = json.loads(r.read())
    total = 0
    seen = 0
    for st in stages:
        if st["stageId"] in stage_ids:
            total += st.get("shuffleWriteBytes", 0)
            seen += 1
    return total, seen


def main() -> None:
    factor = int(sys.argv[1]) if len(sys.argv) > 1 else 100
    n_head = int(sys.argv[2]) if len(sys.argv) > 2 else 8
    spark = get_spark("bm25-shuffle-probe")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext

    base = spread(load_table(spark, BASE_SF, "documents")).select("doc_id", "text")
    n_base = base.count()
    copies = spark.range(factor).select(F.col("id").alias("copy"))
    head_suffix = " " + " ".join(f"zzhead{i}" for i in range(n_head))
    docs = (
        base.crossJoin(copies)
        .select(
            (F.col("doc_id") + F.col("copy") * 10_000_000).alias("doc_id"),
            F.concat(
                F.concat_ws("", F.lit("c"), F.col("copy").cast("string"), F.lit("_")),
                F.col("text"),
                F.lit(head_suffix),
            ).alias("text"),
        )
    )
    docs = docs.persist()
    n_docs = docs.count()
    cap_val = max(BM25_DF_CAP_FLOOR, n_docs // BM25_DF_CAP_DENOM)
    print(f"# corpus: {n_docs} docs (x{factor} of {n_base}); df cap {cap_val}; "
          f"{n_head} planted head tokens at df={n_docs}", file=sys.stderr)

    prev_bcast = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    results = {}
    try:
        for variant in ("unfiltered", "prefiltered"):
            toks = docs.select(
                "doc_id", F.explode(F.split("text", " ")).alias("tok")
            )
            dtf = toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf"))
            dl = dtf.groupBy("doc_id").agg(F.sum("tf").alias("dl"))
            stats = dl.agg(
                F.count(F.lit(1)).alias("n_docs"),
                (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias("avgdl"),
            )
            dfx = dtf.groupBy("tok").agg(F.count(F.lit(1)).alias("df")).crossJoin(
                F.broadcast(stats)
            )
            cap = F.greatest(
                F.lit(BM25_DF_CAP_FLOOR), F.expr(f"n_docs div {BM25_DF_CAP_DENOM}")
            )
            eligible = dfx.filter(F.col("df") <= cap).select("tok")
            src = dtf
            if variant == "prefiltered":
                heavy = dfx.filter(F.col("df") > cap).select("tok")
                src = dtf.join(F.broadcast(heavy), "tok", "left_anti")
            postings = src.join(eligible, "tok").join(dl, "doc_id")
            group = f"probe-{variant}"
            sc.setJobGroup(group, group)
            t0 = time.time()
            # noop-sink materialization (guide 1.4): every column computed
            postings.write.format("noop").mode("overwrite").save()
            wall = time.time() - t0
            n_rows = postings.count()
            sc.setLocalProperty("spark.jobGroup.id", None)
            sbytes, n_stages = _shuffle_bytes(spark, group)
            results[variant] = {
                "shuffle_write_bytes": sbytes,
                "stages": n_stages,
                "wall_sec": round(wall, 3),
                "postings_rows": n_rows,
            }
            print(f"# {variant}: {results[variant]}", file=sys.stderr)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev_bcast)
    assert (
        results["unfiltered"]["postings_rows"]
        == results["prefiltered"]["postings_rows"]
    ), "variants disagree on postings rows -- the filter changed results!"
    u, p = (results["unfiltered"]["shuffle_write_bytes"],
            results["prefiltered"]["shuffle_write_bytes"])
    print(json.dumps({
        "metric": "bm25_postings_shuffle_probe",
        "factor": factor,
        "n_docs": n_docs,
        "df_cap": cap_val,
        "planted_head_tokens": n_head,
        "unfiltered": results["unfiltered"],
        "prefiltered": results["prefiltered"],
        "shuffle_bytes_ratio": round(p / u, 4) if u else None,
    }))


if __name__ == "__main__":
    main()
