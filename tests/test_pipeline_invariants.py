"""Invariant tests for the packing/shuffle composition operators, run at
sf0.01 (a different SF than the repo oracle suite's sf0.001) -- these assert
STRUCTURAL properties the hash compare can't express: permutation
bijectivity, pack-count conservation."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_cdc_fluss_quickstart_spark.plans.pipeline_queries import PACK_TOKENS
from flink_cdc_fluss_quickstart_spark.plans.registry import all_specs

from tests.conftest import SF_MEDIUM as SF


def test_training_shuffle_order_is_a_permutation(spark):
    """global_pos must be a bijection onto [0, n): every doc gets exactly one
    position, no gaps, no collisions -- the property a resumable loader
    depends on."""
    df = all_specs()["training_shuffle_order"].builder(spark, SF)
    stats = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("global_pos").alias("n_distinct"),
        F.min("global_pos").alias("lo"),
        F.max("global_pos").alias("hi"),
    ).collect()[0]
    assert stats.n_distinct == stats.n
    assert stats.lo == 0
    assert stats.hi == stats.n - 1


def test_training_shuffle_order_is_stable_and_looks_shuffled(spark):
    spec = all_specs()["training_shuffle_order"]
    a = {r.doc_id: r.global_pos for r in spec.builder(spark, SF).collect()}
    b = {r.doc_id: r.global_pos for r in spec.builder(spark, SF).collect()}
    assert a == b  # deterministic across runs
    # and it is not the identity / doc_id order (it actually shuffles):
    in_id_order = sum(1 for doc_id, pos in a.items() if doc_id == pos)
    assert in_id_order < len(a) * 0.01


def test_pack_efficiency_report_invariants(spark):
    rep = all_specs()["pack_efficiency_report"].builder(spark, SF).collect()[0]
    packs = all_specs()["sequence_pack_offsets"].builder(spark, SF)
    # pack count conserves tokens: n_packs is exactly enough windows
    assert (rep.n_packs - 1) * PACK_TOKENS < rep.total_tokens <= rep.n_packs * PACK_TOKENS
    assert rep.pad_tokens == rep.n_packs * PACK_TOKENS - rep.total_tokens
    assert 0 <= rep.pad_tokens < PACK_TOKENS
    assert 0.0 < rep.utilization <= 1.0
    assert 0 <= rep.crossing_docs <= rep.n_docs
    # the report's totals equal the per-doc frame it composes
    agg = packs.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.max(F.col("start_offset") + F.col("n_tokens")).alias("end"),
    ).collect()[0]
    assert rep.n_docs == agg.n_docs
    assert rep.total_tokens == agg.total_tokens == agg.end
    # avg_docs_per_pack >= 1 whenever there is at least one doc per pack slot
    assert rep.avg_docs_per_pack * rep.n_packs >= rep.n_docs


def test_context_chunks_cover_every_token_exactly(spark):
    """Chunk coverage invariants: chunk starts step by CHUNK_STRIDE from 1,
    every token index [1, n] falls in >= 1 chunk, lengths are clamped to the
    window, and consecutive chunks overlap by CHUNK_TOKENS - CHUNK_STRIDE
    except the tail."""
    from flink_cdc_fluss_quickstart_spark.plans.pipeline_queries import (
        CHUNK_STRIDE,
        CHUNK_TOKENS,
    )

    chunks = all_specs()["context_chunks"].builder(spark, SF)
    toks = all_specs()["token_count"].builder(spark, SF)
    per_doc = (
        chunks.groupBy("doc_id").agg(
            F.count(F.lit(1)).alias("n_chunks"),
            F.min("start_tok").alias("first_start"),
            F.max(F.col("start_tok") + F.col("chunk_len") - 1).alias("covered_to"),
            F.max("chunk_len").alias("max_len"),
            F.min("chunk_len").alias("min_len"),
        )
        .join(toks.select("doc_id", "n_tokens"), "doc_id")
        .collect()
    )
    assert per_doc
    for r in per_doc:
        assert r.first_start == 1
        assert r.covered_to == r.n_tokens  # last chunk reaches the last token
        assert 1 <= r.min_len and r.max_len <= CHUNK_TOKENS
        # start positions 1, 1+S, ... while start <= n  =>  ceil(n / S) chunks
        assert r.n_chunks == -(-r.n_tokens // CHUNK_STRIDE)


def test_unigram_lm_surprisal_orders_rarity(spark):
    """A document of corpus-common tokens must score fewer bits/token than
    the corpus-wide max; totals must reconcile with token counts.

    The reconciliation count is computed with the LM queries' OWN tokenizer
    (split(text, ' ') -- literal single space), not the token_count query's
    whitespace-regex tokenizer: the two only coincide on single-space-
    normalized text, and this test must not depend on that fixture accident."""
    from flink_cdc_fluss_quickstart_spark.tables import load_table

    df = all_specs()["unigram_lm_surprisal"].builder(spark, SF)
    toks = load_table(spark, SF, "documents").select(
        "doc_id", F.size(F.split("text", " ")).cast("bigint").alias("n_tokens")
    )
    joined = df.join(toks.select("doc_id", F.col("n_tokens").alias("tc")), "doc_id")
    bad = joined.filter(
        (F.col("n_tokens") != F.col("tc"))
        | (F.col("surprisal_bits") < 0)
        | (F.abs(F.col("bits_per_token") * F.col("n_tokens") - F.col("surprisal_bits")) > 1e-6)
    ).count()
    assert bad == 0
    lo, hi = df.agg(F.min("bits_per_token"), F.max("bits_per_token")).collect()[0]
    assert 0 <= lo < hi  # the score actually discriminates documents


def test_length_bucket_batches_structure(spark):
    """Batch assembly invariants: bucket_pos is a bijection onto [0, n) per
    bucket, every batch holds exactly BATCH_DOCS docs except possibly the
    bucket's last, pos_in_batch matches bucket_pos arithmetic, and the
    assignment is deterministic across runs."""
    from flink_cdc_fluss_quickstart_spark.plans.pipeline_queries import BATCH_DOCS

    spec = all_specs()["length_bucket_batches"]
    df = spec.builder(spark, SF)
    per_bucket = (
        df.groupBy("bucket").agg(
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("bucket_pos").alias("nd"),
            F.min("bucket_pos").alias("lo"),
            F.max("bucket_pos").alias("hi"),
        )
    ).collect()
    assert per_bucket
    for r in per_bucket:
        assert r.nd == r.n and r.lo == 0 and r.hi == r.n - 1
    bad_batch = (
        df.groupBy("bucket", "batch_idx").agg(
            F.count(F.lit(1)).alias("sz"), F.max("batch_idx").alias("bi")
        )
        .join(df.groupBy("bucket").agg(F.max("batch_idx").alias("last")), "bucket")
        .filter((F.col("sz") != BATCH_DOCS) & (F.col("batch_idx") != F.col("last")))
        .count()
    )
    assert bad_batch == 0
    a = {r.doc_id: (r.bucket, r.batch_idx, r.pos_in_batch) for r in df.collect()}
    b = {r.doc_id: (r.bucket, r.batch_idx, r.pos_in_batch) for r in spec.builder(spark, SF).collect()}
    assert a == b


def test_fixed_count_sample_exact_quota(spark):
    """Exactly SAMPLE_PER_STRATUM docs per source (fewer only when the
    stratum is smaller), ranks are a bijection onto [0, kept), and the
    selection is stable across runs."""
    from flink_cdc_fluss_quickstart_spark.plans.pipeline_queries import (
        SAMPLE_PER_STRATUM,
    )
    from flink_cdc_fluss_quickstart_spark.tables import load_table

    spec = all_specs()["fixed_count_sample_by_source"]
    df = spec.builder(spark, SF)
    sizes = {
        r.source: r.n
        for r in load_table(spark, SF, "documents").groupBy("source").count()
        .withColumnRenamed("count", "n").collect()
    }
    got = (
        df.groupBy("source").agg(
            F.count(F.lit(1)).alias("kept"),
            F.count_distinct("sample_rank").alias("nd"),
            F.min("sample_rank").alias("lo"),
            F.max("sample_rank").alias("hi"),
        )
    ).collect()
    assert set(r.source for r in got) == set(sizes)
    for r in got:
        assert r.kept == min(SAMPLE_PER_STRATUM, sizes[r.source])
        assert r.nd == r.kept and r.lo == 0 and r.hi == r.kept - 1
    a = sorted(r.doc_id for r in df.collect())
    b = sorted(r.doc_id for r in spec.builder(spark, SF).collect())
    assert a == b


def test_bm25_retrieval_structure(spark):
    """Retrieval invariants the hash check can't express as clearly: no
    self-retrieval, contiguous 1-based ranks per query, scores non-increasing
    in rank, and every query doc with >= 1 eligible shared term retrieves
    something."""
    from flink_cdc_fluss_quickstart_spark.plans.registry import all_specs as specs

    df = specs()["bm25_retrieval"].builder(spark, SF).cache()
    rows = df.collect()
    assert rows
    assert all(r.doc_id != r.query_id for r in rows)
    by_q = {}
    for r in rows:
        by_q.setdefault(r.query_id, []).append(r)
    for q, rs in by_q.items():
        rs.sort(key=lambda r: r.rank)
        assert [r.rank for r in rs] == list(range(1, len(rs) + 1))
        scores = [r.bm25_score for r in rs]
        assert scores == sorted(scores, reverse=True)
        assert all(r.n_shared_terms >= 1 for r in rs)
    df.unpersist()
