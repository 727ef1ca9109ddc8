"""Run the trained-model + serving-index LIFECYCLE end-to-end:

    python examples/run_model_lifecycle.py [sf_dir] [warehouse_dir]

The production story the in-pipeline queries can't show by themselves:
everything a curation deployment must keep between sessions lives in the
lakehouse (the reference stack's one durable store, README.md:81-95), and
every serving step below runs from a RELOADED artifact in a fresh session.

    day 1 (training session)
      1. fit the logreg quality scorer, publish it WITH its validation-time
         score histogram                      -> models.save_logreg_model
      2. fit the hashed-gram langid           -> models.save_langid_model
      3. build the MinHash dedup band index   -> models.save_minhash_index
      4. train the PQ index (books + codes)   -> models.save_pq_index
    -- session boundary (newSession + fresh PKTable handles) --
    day 2 (serving session)
      5. reload the scorer, score the corpus, PSI-compare the serving
         scores against the STORED day-1 baseline histogram (quiet for the
         same distribution, loud for a planted junk batch)
      6. reload the langid, classify a fresh micro-batch
      7. probe the dedup index with the day-2 batch, then MERGE-INGEST the
         batch into it (idempotent per batch_id; day-1 state stays readable
         as version 1)
      8. reload the PQ index, ENCODE the day-2 vectors with the frozen
         reloaded codebooks, merge-ingest their code rows, and serve ADC
         top-k over the union without ever touching the float corpus
    -- session boundary --
    day 3 (maintenance + serving session)
      9. COMPACT the ingested indexes (models.compact_artifact -- fold the
         day-2 delta files into the bases), then time-travel through the
         compaction boundary: the day-1 and day-2 publishes still resolve
      10. drift-check day-3 scores against the day-1 stored baseline in
          the compacted warehouse -- ingest -> compact -> time-travel ->
          drift compose
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import pyspark.sql.functions as F  # noqa: E402

from flink_cdc_fluss_quickstart_spark import models  # noqa: E402
from flink_cdc_fluss_quickstart_spark.functions import dedup  # noqa: E402
from flink_cdc_fluss_quickstart_spark.plans import similarity_queries as sq  # noqa: E402
from flink_cdc_fluss_quickstart_spark.plans import text_queries as tq  # noqa: E402
from flink_cdc_fluss_quickstart_spark.session import get_spark  # noqa: E402
from flink_cdc_fluss_quickstart_spark.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    wh = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="model_wh_")
    spark = get_spark("model-lifecycle")
    spark.sparkContext.setLogLevel("ERROR")

    d = load_table(spark, sf_dir, "documents")
    emb = load_table(spark, sf_dir, "embeddings")

    print("== day 1: fit + publish (training session)")
    scorer = tq.logreg_fit(d)
    baseline = tq.score_bin_counts(tq.logreg_score(d, scorer))
    models.save_logreg_model(
        spark, os.path.join(wh, "quality_scorer"), scorer, baseline=baseline
    )
    w, hot = tq.hashed_langid_fit(d)
    models.save_langid_model(spark, os.path.join(wh, "langid"), w, hot)
    bands = dedup.minhash_band_keyed(d, "doc_id", "text").select(
        F.col("doc_id").alias("id"), "band_idx", "band_key"
    )
    models.save_minhash_index(spark, os.path.join(wh, "dedup_index"), bands)
    books, codes = sq.pq_train_index(emb)
    models.save_pq_index(spark, os.path.join(wh, "pq_index"), books, codes)
    print(f"   published 4 artifacts under {wh}")

    print("== session boundary: newSession + fresh handles ==")
    s2 = spark.newSession()
    d2 = load_table(s2, sf_dir, "documents")

    print("== day 2, step 5: reloaded scorer + drift vs the STORED baseline")
    scorer2 = models.load_logreg_model(s2, os.path.join(wh, "quality_scorer"))
    ref = models.load_score_baseline(s2, os.path.join(wh, "quality_scorer"))
    tq.logreg_score(d2, scorer2).groupBy("predicted").agg(
        F.count(F.lit(1)).alias("n_docs")
    ).orderBy("predicted").show()

    def psi_ln(report):  # PSI_ln = sum(psi_contrib) / 4e6 * ln 2
        import math
        s = sum(r["psi_contrib"] for r in report.collect())
        return s / 4e6 * math.log(2)

    quiet = psi_ln(tq.score_drift_vs_baseline_frame(
        tq.logreg_score(d2, scorer2), ref))
    junk = s2.createDataFrame(
        [(900_000 + i, "zz!! qq@@ xx## vv$$") for i in range(200)],
        "doc_id bigint, text string",
    )
    loud = psi_ln(tq.score_drift_vs_baseline_frame(
        tq.logreg_score(junk, scorer2), ref))
    print(f"   PSI_ln vs stored day-1 baseline: same-distribution day 2 ="
          f" {quiet:.4f} (quiet, < 0.1), planted junk batch = {loud:.3f}"
          f" (flagged, > 0.25)")

    print("== day 2, step 6: reloaded langid classifies a fresh batch")
    w2, hot2 = models.load_langid_model(s2, os.path.join(wh, "langid"))
    batch = s2.createDataFrame(
        [(9001, "the of a to and in is it that for the of a to"),
         (9002, "zzz qqq xxx unk")],
        "doc_id bigint, text string",
    )
    tq.hashed_langid_score(batch, w2, hot2).orderBy("doc_id").show()

    print("== day 2, step 7: probe + merge-ingest the dedup index")
    idx = models.load_minhash_index(s2, os.path.join(wh, "dedup_index"))
    day2 = d2.filter(F.col("doc_id") % 97 == 0).select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"), "text"
    )  # near-dup replays of existing docs, shifted ids
    day2_bands = dedup.minhash_band_keyed(day2, "doc_id", "text").select(
        F.col("doc_id").alias("id"), "band_idx", "band_key"
    )
    hits = (
        day2_bands.withColumnRenamed("id", "batch_id")
        .join(idx, ["band_idx", "band_key"])
        .select("batch_id", F.col("id").alias("corpus_id"))
        .distinct()
    )
    print(f"   {hits.count()} near-dup candidate pairs against the day-1 index")
    models.upsert_minhash_index(s2, os.path.join(wh, "dedup_index"),
                                day2_bands, batch_id=2)
    v1 = models.load_minhash_index(s2, os.path.join(wh, "dedup_index"), version=1)
    now = models.load_minhash_index(s2, os.path.join(wh, "dedup_index"))
    print(f"   index rows: v1={v1.count()} now={now.count()} (day-1 state"
          " stays readable)")

    print("== day 2, step 8: ingest new vectors, then ADC from the index")
    lb, lc = models.load_pq_index(s2, os.path.join(wh, "pq_index"))
    emb2 = load_table(s2, sf_dir, "embeddings")
    # day-2 embeddings: replays of existing vectors under fresh ids --
    # encoded with the FROZEN reloaded books, never a retrain or re-encode
    new_vecs = emb2.filter(F.col("vec_id") % 89 == 0).select(
        (F.col("vec_id") + 1_000_000).alias("vec_id"), "embedding"
    )
    models.upsert_pq_index(
        s2, os.path.join(wh, "pq_index"),
        sq.pq_encode_with_books(new_vecs, lb), batch_id=2,
    )
    lb2, lc2 = models.load_pq_index(s2, os.path.join(wh, "pq_index"))
    print(f"   code rows: day-1={lc.count()} after-ingest={lc2.count()}")
    sq.pq_adc_topk_frame(emb2, books=lb2, codes=lc2).orderBy(
        "query_id", "rank"
    ).show(10)

    print("== session boundary: newSession + fresh handles ==")
    s3 = spark.newSession()

    print("== day 3, step 9: compact the ingested indexes (maintenance job)")
    models.compact_artifact(s3, os.path.join(wh, "dedup_index"))
    models.compact_artifact(s3, os.path.join(wh, "pq_index"))
    # time travel THROUGH the compaction boundary: the day-1 publish (and
    # the day-2 ingest publish) resolve exactly as before the fold
    v1b = models.load_minhash_index(s3, os.path.join(wh, "dedup_index"), version=1)
    _, v2c = models.load_pq_index(s3, os.path.join(wh, "pq_index"), version=2)
    print(f"   post-compaction time travel: dedup publish 1 = {v1b.count()}"
          f" rows, pq publish 2 = {v2c.count()} code rows (pre-compaction"
          " publishes stay loadable)")

    print("== day 3, step 10: drift check in the compacted warehouse")
    d3 = load_table(s3, sf_dir, "documents")
    scorer3 = models.load_logreg_model(s3, os.path.join(wh, "quality_scorer"))
    ref3 = models.load_score_baseline(s3, os.path.join(wh, "quality_scorer"))
    day3 = psi_ln(tq.score_drift_vs_baseline_frame(
        tq.logreg_score(d3, scorer3), ref3))
    print(f"   day-3 PSI_ln vs the day-1 baseline = {day3:.4f} (ingest ->"
          " compact -> time-travel -> drift compose across two session"
          " boundaries)")

    print("== session boundary: newSession + fresh handles ==")
    s4 = spark.newSession()

    print("== day 4, step 11: point-serve from the published indexes")
    # the Fluss PK lookup shape (`bucket.num`) composed through the publish
    # ledger: probe a handful of ids, read ONLY the buckets they hash into
    # -- a point read of the compacted artifact, never an index scan
    some_docs = [r["id"] for r in now.select("id").orderBy("id").limit(3).collect()]
    served = models.lookup_minhash_bands(
        s4, os.path.join(wh, "dedup_index"), some_docs)
    some_vecs = [r["vec_id"] for r in
                 lc2.select("vec_id").orderBy("vec_id").limit(2).collect()]
    codes_served = models.lookup_pq_codes(
        s4, os.path.join(wh, "pq_index"), some_vecs)
    print(f"   {served.count()} band rows for docs {some_docs};"
          f" {codes_served.count()} code rows for vectors {some_vecs}"
          f" -- each read touched {len(served.inputFiles())} /"
          f" {len(codes_served.inputFiles())} bucket files, not the tables")

    print("== day 5, step 12: the index outgrew its bucket count -> rescale")
    # the serving fraction is ~1/n_buckets per probed key; an index that
    # grew 4x past its creation-time SERVING_BUCKETS serves 4x-too-coarse
    # point reads until rescaled (Paimon's rescale-bucket, offline)
    models.rescale_artifact(s4, os.path.join(wh, "dedup_index"),
                            models.SERVING_BUCKETS * 4, subtables=("bands",))
    served5 = models.lookup_minhash_bands(
        spark.newSession(), os.path.join(wh, "dedup_index"), some_docs)
    assert {tuple(r) for r in served5.collect()} == {tuple(r) for r in served.collect()}
    print(f"   rescaled bands {models.SERVING_BUCKETS} ->"
          f" {models.SERVING_BUCKETS * 4} buckets; the same probe serves"
          f" identically from {len(served5.inputFiles())} bucket files"
          " (ledger publish tagged rescale)")

    print("lifecycle complete: 4 artifacts published, reloaded, monitored,"
          " ingested, compacted, drift-checked, point-served, rescaled")


if __name__ == "__main__":
    main()
