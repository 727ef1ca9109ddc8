"""Run the LLM-training-data pipeline end-to-end on the provided corpus:

    python examples/run_llm_pipeline.py [sf_dir] [out_dir]

Composes the registered operators into the corpus -> training-shards path a
real pipeline ships:

    1. domain_mix_report          -- what's in the raw corpus
    1b. token_budget_mix_plan     -- per-source token quotas for the budget
    1c. dsir_importance_weights   -- target-domain importance scores
    2. quality_filter_route       -- keep/drop/review routing
    2b. unigram_lm_surprisal      -- corpus-statistical LM cut (worst 5%)
    2c. perplexity_buckets        -- CCNet head/middle/tail mix report
    2d. span_dedup_text           -- substring-level dedup volume report
    2e. nb_quality_score          -- classifier-based domain scoring
    2e-ii. logreg_quality_score   -- trained discriminative quality scorer
                                     (GD-fit rule distillation, 0..1 scores)
    2e-iib. logreg_holdout_eval   -- leakage-free go/no-go: heldout accuracy
                                     must track train accuracy
    2e-iii. hashed_ngram_langid   -- fastText-style hashed-gram langid
                                     (distributed bucket-keyed weights)
    2e-iiib. langid_multiclass    -- one-vs-rest multiclass langid
                                     (full confusion rollup)
    2e-iiic. model persist+reload -- save the trained scorer to the
                                     warehouse, reload in a NEW session,
                                     serve (models.py lifecycle)
    2e-iiid. score_drift_report   -- PSI drift monitor over score deciles
                                     (the serving-time model-ops alarm)
    2e-iiie. logreg_calibration_report -- reliability curve + ECE (can the
                                     scores WEIGHT samples, not just rank?)
    2e-iv. source_curation_report -- per-source vendor scorecard (quality,
                                     token mass, dup incidence)
    2f. doc_novelty_score         -- low-novelty (recombined boilerplate) scan
    3. dedup_keep_representatives -- one doc per near-dup cluster
    3b. semantic_dedup_prune      -- embedding-side SemDeDup keep rates
    3c. soft_dedup_weights        -- the reweighting alternative: 1/cluster
                                     training weights + effective corpus size
    4. leakage_safe_split_assign  -- cluster-atomic train/val/test membership
                                     (near-dup clusters never straddle splits)
    5. decontamination_ngrams     -- flag test-set overlap
    6. pack_offsets_frame         -- context-window packing offsets over the
                                     SHIPPED (filtered) corpus, not the raw
                                     table, so offsets match the real stream
    7. write train shards partitioned by split
    8. pack_efficiency_report     -- padding waste / utilization go-no-go
    9. training_shuffle_order     -- stable pseudo-random load order
    10. length_bucket_batches     -- GPU batch assembly by length bucket
    11. collocation_pmi           -- phrase vocabulary of the shipped corpus
    12. bm25_retrieval            -- spot-audit: nearest corpus docs per
                                     held-out query doc (search-based leak
                                     review beyond exact n-gram decontam)
    12b. rrf_hybrid_retrieval     -- the fused lexical+semantic version of
                                     that audit (rank fusion, both arms)
    13. bpe_merge_candidates      -- tokenizer merge table of the corpus
    14. kmv_distinct_tokens +     -- bounded-state corpus monitors: vocab
        countmin_heavy_hitters       cardinality + heavy-hitter tokens
    14b. quantile_sketch_report   -- length-distribution monitor: log-histogram
                                     p50/p90 graded against the exact ranks
    15. textrank_keywords         -- graph-centrality keyword vocabulary
    16. embedding_decontamination -- semantic (paraphrase) leak audit over
                                     the embedding table
    17. bloom_decontamination     -- bounded-state membership scan of the
                                     train split vs the eval-set filter
    18. pq_adc_recall_report      -- PQ compression-loss go/no-go before
                                     serving ANN from 4-byte codes
    19. contrastive_triplets      -- (anchor, positive, negative) training
                                     triplets with deterministic negatives

Every step is a registered query (same code the correctness gate verifies);
this script is the composition glue, joining on doc_id -- all equi joins on
the stable id, no operator-private state crossing steps.
"""

from __future__ import annotations

import os
import sys
import tempfile

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import pyspark.sql.functions as F  # noqa: E402

from flink_cdc_fluss_quickstart_spark.functions import dedup  # noqa: E402
from flink_cdc_fluss_quickstart_spark.session import get_spark  # noqa: E402
from flink_cdc_fluss_quickstart_spark.plans.pipeline_queries import pack_offsets_frame  # noqa: E402
from flink_cdc_fluss_quickstart_spark.plans.registry import all_specs  # noqa: E402
from flink_cdc_fluss_quickstart_spark.tables import load_table  # noqa: E402


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"
    out_dir = sys.argv[2] if len(sys.argv) > 2 else tempfile.mkdtemp(prefix="llm_shards_")
    spark = get_spark("llm-pipeline-example")
    spark.sparkContext.setLogLevel("ERROR")
    q = all_specs()

    print("== 1. raw corpus composition")
    q["domain_mix_report"].builder(spark, sf_dir).orderBy(F.desc("n_docs")).show(5)

    print("== 1b. token-budget mix plan (top-5 quotas)")
    q["token_budget_mix_plan"].builder(spark, sf_dir).orderBy(
        F.desc("quota_tokens"), "source"
    ).show(5)

    print("== 1c. DSIR target-domain importance (5 most target-like docs)")
    q["dsir_importance_weights"].builder(spark, sf_dir).orderBy(
        F.desc("weight_bits"), "doc_id"
    ).show(5)

    print("== 2-3. quality routing + LM-surprisal cut + near-dup representatives")
    routes = q["quality_filter_route"].builder(spark, sf_dir)
    kept_route = routes.filter(F.col("route").startswith("keep:")).select("doc_id")
    # corpus-statistical quality: drop the 5% highest-surprisal documents
    # (gibberish / rare-token soup under the corpus-fit unigram LM); the
    # threshold is a data-dependent scalar, broadcast like the temperature
    # resampling rates
    # persisted (released by the release_caches() below): lm feeds both the
    # percentile aggregate and the crossJoin's left side -- unpersisted, the
    # full surprisal pipeline (corpus scans + LM fit) would execute twice
    lm = dedup.track_cache(q["unigram_lm_surprisal"].builder(spark, sf_dir).persist())
    cut = lm.agg(F.expr("percentile(bits_per_token, 0.95D)").alias("__cut"))
    fluent = (
        lm.crossJoin(F.broadcast(cut))
        .filter(F.col("bits_per_token") <= F.col("__cut"))
        .select("doc_id")
    )
    # CCNet-style curriculum mix visibility: how the kept corpus distributes
    # across per-language perplexity terciles
    print("== 2c. perplexity-bucket mix (head/middle/tail per language)")
    q["perplexity_buckets"].builder(spark, sf_dir).groupBy("lang", "bucket").agg(
        F.count(F.lit(1)).alias("n_docs")
    ).orderBy("lang", "bucket").show(9)

    print("== 2d. substring-level dedup (span removal volume)")
    spans = q["span_dedup_text"].builder(spark, sf_dir)
    spans.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_removed").alias("tokens_removed"),
        F.sum("n_tokens").alias("tokens_total"),
    ).show()

    print("== 2d-ii. line-level dedup (C4 repeated-line rule, boilerplate volume)")
    q["line_dedup_text"].builder(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n_docs_kept"),
        F.sum("n_lines_kept").alias("lines_kept"),
    ).show()

    print("== 2e. classifier-based domain scoring (NB log-odds, pred counts)")
    q["nb_quality_score"].builder(spark, sf_dir).groupBy("pred_positive").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("nb_logodds_qbits").alias("avg_qbits"),
    ).orderBy("pred_positive").show()

    print("== 2e-ii. trained quality scorer (GD-fit distillation, score deciles)")
    q["logreg_quality_score"].builder(spark, sf_dir).groupBy("predicted").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.avg("score_micro").alias("avg_score_micro"),
        F.avg(F.col("weak_label").cast("double")).alias("label_rate"),
    ).orderBy("predicted").show()

    print("== 2e-iib. scorer go/no-go: train vs heldout accuracy (leakage-free)")
    q["logreg_holdout_eval"].builder(spark, sf_dir).orderBy("split").show()

    print("== 2e-iii. hashed-gram langid (is-en classifier, confusion counts)")
    q["hashed_ngram_langid"].builder(spark, sf_dir).groupBy(
        "is_target_lang", "predicted"
    ).agg(F.count(F.lit(1)).alias("n_docs")).orderBy(
        "is_target_lang", "predicted"
    ).show()

    print("== 2e-iiib. multiclass langid (one-vs-rest confusion rollup)")
    q["langid_multiclass"].builder(spark, sf_dir).show()

    print("== 2e-iiic. persist the trained scorer and serve it RELOADED")
    # the fit -> publish -> restart -> reload -> serve lifecycle (models.py):
    # a curation model is only production-real once it survives the session
    # that fit it; scores below are from the reloaded model in a new session
    import tempfile as _tf

    from flink_cdc_fluss_quickstart_spark import models as _models
    from flink_cdc_fluss_quickstart_spark.plans import text_queries as _tq
    from flink_cdc_fluss_quickstart_spark.tables import load_table as _lt

    _mdir = _tf.mkdtemp(prefix="llm_pipeline_model_")
    _model = _tq.logreg_fit(_lt(spark, sf_dir, "documents"))
    _models.save_logreg_model(spark, _mdir, _model)
    _spark2 = spark.newSession()
    _reloaded = _models.load_logreg_model(_spark2, _mdir)
    _tq.logreg_score(_lt(_spark2, sf_dir, "documents"), _reloaded).groupBy(
        "predicted"
    ).agg(F.count(F.lit(1)).alias("n_docs")).orderBy("predicted").show()

    print("== 2e-iiid. score drift monitor (PSI per decile; sum = the alarm)")
    q["score_drift_report"].builder(spark, sf_dir).show()

    print("== 2e-iiie. calibration report (reliability curve + ECE mass)")
    q["logreg_calibration_report"].builder(spark, sf_dir).show()

    print("== 2e-iv. per-source curation scorecard (worst 5 by mean score)")
    q["source_curation_report"].builder(spark, sf_dir).orderBy(
        "mean_score_micro", "source"
    ).show(5)

    print("== 2f. novelty scan (5 most-recombined docs)")
    q["doc_novelty_score"].builder(spark, sf_dir).orderBy("novelty", "doc_id").show(5)

    reps = q["dedup_keep_representatives"].builder(spark, sf_dir).select("doc_id")
    clean = kept_route.join(fluent, "doc_id").join(reps, "doc_id")

    print("== 3c. soft-dedup weights (reweight instead of drop: effective size)")
    q["soft_dedup_weights"].builder(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("weight").alias("effective_docs"),
        F.max("cluster_size").alias("largest_cluster"),
    ).show()

    print("== 3d. near-dup source-overlap report (which sources copy from"
          " each other: top pairs by share)")
    q["neardup_source_overlap"].builder(spark, sf_dir).orderBy(
        F.col("n_pairs").desc()
    ).limit(5).show()

    print("== 3b. semantic dedup (SemDeDup keep rate per k-means cell)")
    q["semantic_dedup_prune"].builder(spark, sf_dir).groupBy("cluster").agg(
        F.count(F.lit(1)).alias("n_vecs"),
        F.sum("keep").alias("n_kept"),
    ).orderBy("cluster").show()

    print("== 4-5. leakage-safe split assignment + decontamination flags")
    # cluster-atomic splits: the key is the near-dup COMPONENT id, so no
    # near-dup pair can straddle train/test (doc-granular md5 splits can)
    splits = q["leakage_safe_split_assign"].builder(spark, sf_dir).select(
        "doc_id", "split"
    )
    contaminated = (
        q["decontamination_ngrams"].builder(spark, sf_dir)
        .filter(F.col("flagged"))
        .select("doc_id")
        .withColumn("__contaminated", F.lit(True))
    )

    print("== 6-7. pack the SHIPPED corpus + materialize shards")
    docs = load_table(spark, sf_dir, "documents")
    # packing runs over the corpus that is actually WRITTEN (post routing /
    # surprisal cut / dedup / decontamination): offsets computed over the
    # full table would reserve phantom token spans for every dropped doc,
    # so the shipped start_offset/first_pack would not match the real
    # concatenated token stream a loader sees
    # persisted (released below): kept feeds BOTH pack_offsets_frame and the
    # shards join with different column prunings, so without the persist the
    # whole cleaning subtree (dedup representatives, routing, splits,
    # decontamination joins) would execute twice inside the one write action
    kept = dedup.track_cache(
        docs.join(clean, "doc_id")
        .join(splits, "doc_id")
        .join(F.broadcast(contaminated), "doc_id", "left")
        .filter(F.col("__contaminated").isNull())  # drop leaked test overlap
        .persist()
    )
    packs = pack_offsets_frame(kept.select("doc_id", "text")).select(
        "doc_id", "n_tokens", "start_offset", "first_pack"
    )
    shards = kept.join(packs, "doc_id").select(
        "doc_id", "split", "lang", "source", "n_tokens",
        "start_offset", "first_pack", "text",
    )
    shards.write.mode("overwrite").partitionBy("split").parquet(out_dir)
    # steps 2b/3 persisted tracked frames (the LM's doc-term-frequency frame,
    # the LSH profiles); the write above materialized everything, so release
    # them (cache hygiene for long-lived sessions -- see functions/dedup.py)
    dedup.release_caches()

    out = spark.read.parquet(out_dir)
    summary = out.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"), F.sum("n_tokens").alias("tokens")
    )
    summary.orderBy("split").show()
    n_raw = docs.count()
    n_out = out.count()
    print(f"corpus {n_raw} docs -> {n_out} training docs ({out_dir})")

    print("== 8. packing efficiency (the registered FULL-corpus report; the"
          " shipped-corpus numbers are the shard summary above)")
    q["pack_efficiency_report"].builder(spark, sf_dir).show()

    print("== 9. training shuffle order (first 5 positions)")
    shuffle = q["training_shuffle_order"].builder(spark, sf_dir)
    shuffle.orderBy("global_pos").limit(5).show()

    print("== 10. length-bucketed batch assembly (batches per bucket)")
    batches = q["length_bucket_batches"].builder(spark, sf_dir)
    batches.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.max("batch_idx") + 1).alias("n_batches"),
    ).orderBy("bucket").show()

    print("== 11. phrase vocabulary (top-5 PMI collocations)")
    q["collocation_pmi"].builder(spark, sf_dir).limit(5).show()

    print("== 12. retrieval spot-audit (BM25 nearest docs per query doc)")
    q["bm25_retrieval"].builder(spark, sf_dir).filter(F.col("rank") == 1).show(5)

    print("== 12b. hybrid retrieval (RRF-fused BM25 + cosine, top hit per query)")
    q["rrf_hybrid_retrieval"].builder(spark, sf_dir).filter(
        F.col("fused_rank") == 1
    ).show(5)

    print("== 13. tokenizer induction (top-5 BPE merge candidates)")
    q["bpe_merge_candidates"].builder(spark, sf_dir).limit(5).show()

    print("== 13b. tokenizer application (BPE-encode the corpus: the token"
          " counts the packer would consume instead of whitespace counts)")
    q["bpe_encode_tokens"].builder(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_words").alias("words"),
        F.sum("n_chars").alias("chars"),
        F.sum("n_bpe_tokens").alias("bpe_tokens"),
    ).show()
    print("== 13c. tokenizer selection report (per-lang fertility:"
          " BPE tokens per word + chars per token, milli-units)")
    q["tokenizer_fertility_by_lang"].builder(spark, sf_dir).orderBy("lang").show()
    dedup.release_caches()  # steps 11-13c persist the shared term frames

    print("== 14. corpus monitors (distinct-count sketch + heavy hitters)")
    q["kmv_distinct_tokens"].builder(spark, sf_dir).orderBy("lang").show()
    q["countmin_heavy_hitters"].builder(spark, sf_dir).limit(5).show()

    print("== 14b. length-distribution monitor (log-histogram quantile sketch)")
    q["quantile_sketch_report"].builder(spark, sf_dir).orderBy("lang", "q").show()

    print("== 15. keyword vocabulary (top-5 TextRank centrality)")
    q["textrank_keywords"].builder(spark, sf_dir).limit(5).show()

    print("== 16. semantic leak audit (embedding decontamination)")
    q["embedding_decontamination"].builder(spark, sf_dir).groupBy(
        "contaminated"
    ).agg(F.count(F.lit(1)).alias("n_vectors")).show()

    print("== 17. Bloom membership scan (train split vs eval-set filter)")
    q["bloom_decontamination"].builder(spark, sf_dir).agg(
        F.count(F.lit(1)).alias("n_train_docs"),
        F.sum("n_bloom_hits").alias("bloom_hits"),
        F.sum("n_false_positives").alias("false_positives"),
    ).show()

    print("== 18. PQ compression-loss report (ADC recall vs L2 brute force)")
    q["pq_adc_recall_report"].builder(spark, sf_dir).show()

    print("== 19. contrastive triplets (first 5)")
    q["contrastive_triplets"].builder(spark, sf_dir).orderBy(
        "anchor_id", "positive_id"
    ).limit(5).show()
    dedup.release_caches()


if __name__ == "__main__":
    main()
