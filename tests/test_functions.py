"""Unit tests for text / dedup / similarity function modules."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from flink_cdc_fluss_quickstart_spark.functions import dedup, similarity, text

from tests.conftest import SF_MEDIUM


def test_token_and_stopword_counts(spark):
    df = spark.createDataFrame([("the cat AND the dog",)], "text string")
    row = df.select(
        text.token_count(F.col("text")).alias("n"),
        text.stopword_count(F.col("text")).alias("s"),
    ).collect()[0]
    assert row["n"] == 5
    assert row["s"] == 3  # the, and, the


def test_normalized_text_and_fingerprint(spark):
    df = spark.createDataFrame(
        [("Hello, WORLD!  42",), ("hello world 42",)], "text string"
    )
    fps = [r["fp"] for r in df.select(text.fingerprint(F.col("text")).alias("fp")).collect()]
    assert fps[0] == fps[1]  # normalization collapses case/punct/space


def test_lang_id_markers(spark):
    rows = [
        ("the cat and the dog is that",),
        ("der hund und die katze ist",),
        ("le chat est dans les arbres",),
        ("el perro es una mascota por",),
        ("你好 世界",),
        ("qqq www zzz",),
    ]
    df = spark.createDataFrame(rows, "text string")
    got = [r["l"] for r in df.select(text.lang_id(F.col("text")).alias("l")).collect()]
    assert got == ["en", "de", "fr", "es", "zh", "und"]


def test_minhash_similar_docs_collide_more(spark):
    base = "the quick brown fox jumps over the lazy dog again and again"
    near = base + " tail"
    far = "completely different content about database query engines"
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "id long, text string"
    )
    sig = dedup.minhash_signature(df, "id", "text").collect()
    by_id = {r["id"]: [r[f"mh_{k}"] for k in range(dedup.N_PERMS)] for r in sig}
    matches_near = sum(a == b for a, b in zip(by_id[1], by_id[2]))
    matches_far = sum(a == b for a, b in zip(by_id[1], by_id[3]))
    assert matches_near > matches_far


def test_ngram_jaccard_exact_pair(spark):
    df = spark.createDataFrame(
        [(1, "abcdef"), (2, "abcdef"), (3, "zzzzzz")], "id long, text string"
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "id_a long, id_b long")
    got = {
        (r["id_a"], r["id_b"]): r["jaccard"]
        for r in dedup.ngram_jaccard(df, "id", "text", pairs).collect()
    }
    assert got[(1, 2)] == 1.0
    assert got[(1, 3)] == 0.0


def test_cosine_topk_self_similarity(spark):
    rows = [
        (0, [1.0, 0.0]),
        (1, [1.0, 0.0]),   # identical direction to 0
        (2, [0.0, 1.0]),   # orthogonal
        (3, [-1.0, 0.0]),  # opposite
    ]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<float>")
    q = df.filter(F.col("vec_id") == 0)
    out = similarity.cosine_topk(df, q, k=3).collect()
    ranked = [(r["neighbor_id"], r["rank"], r["cosine_sim"]) for r in out]
    assert ranked[0][0] == 1 and math.isclose(ranked[0][2], 1.0, abs_tol=1e-9)
    assert ranked[1][0] == 2 and abs(ranked[1][2]) < 1e-9
    assert ranked[2][0] == 3 and math.isclose(ranked[2][2], -1.0, abs_tol=1e-9)


def test_n_planes_scales_with_corpus():
    from flink_cdc_fluss_quickstart_spark.functions.similarity import n_planes_for

    # floor of 4 planes for tiny corpora
    assert n_planes_for(100) == 4
    assert n_planes_for(5_000) == 5
    # 1B vectors / 256 target -> ~22 planes: bucket size stays ~constant
    assert n_planes_for(1_000_000_000) == 22
    # doubling the corpus adds at most one plane
    for n in (10_000, 1_000_000, 100_000_000):
        assert n_planes_for(2 * n) - n_planes_for(n) <= 1


def test_ann_lsh_runtime_derivation(spark):
    from flink_cdc_fluss_quickstart_spark.functions.similarity import ann_lsh
    from flink_cdc_fluss_quickstart_spark.tables import load_table

    emb = load_table(spark, "/root/testdata/sf0.001", "embeddings")
    queries = emb.filter(emb.vec_id % 50 == 0)
    out = ann_lsh(emb, queries, k=3)
    rows = out.collect()
    assert set(out.columns) == {"query_id", "neighbor_id", "rank", "cosine_sim"}
    assert all(r.rank <= 3 for r in rows)
    assert all(r.query_id != r.neighbor_id for r in rows)


def test_connected_components_chains_and_singletons(spark):
    from flink_cdc_fluss_quickstart_spark.functions.dedup import connected_components

    # chain 1-2-3-4-5 (diameter 4), triangle 10-11-12, singletons 20, 21
    edges = spark.createDataFrame(
        [(1, 2), (2, 3), (3, 4), (4, 5), (10, 11), (11, 12), (10, 12)],
        "id_a long, id_b long",
    )
    nodes = spark.createDataFrame(
        [(i,) for i in [1, 2, 3, 4, 5, 10, 11, 12, 20, 21]], "id long"
    )
    out = {r.id: r.component_id for r in connected_components(edges, nodes).collect()}
    assert out == {1: 1, 2: 1, 3: 1, 4: 1, 5: 1, 10: 10, 11: 10, 12: 10, 20: 20, 21: 21}


def test_fast_digest_hash_seam(spark):
    """The digest seam: fast_digest (xxhash64-based) honors the 32-hex-char
    contract, is deterministic, and drives the same pipeline shapes."""
    import time

    from flink_cdc_fluss_quickstart_spark.functions import dedup
    from flink_cdc_fluss_quickstart_spark.tables import load_table

    d = load_table(spark, "/root/testdata/sf0.001", "documents")
    d.limit(1).collect()

    # contract: 32 hex chars per digest
    import pyspark.sql.functions as F

    lens = (
        d.select(F.length(dedup.fast_digest(F.col("text"))).alias("n"))
        .distinct()
        .collect()
    )
    assert {r.n for r in lens} == {32}

    # deterministic: identical runs, identical signatures
    a = sorted(tuple(r) for r in dedup.minhash_signature(d, "doc_id", "text", digest=dedup.fast_digest).collect())
    b = sorted(tuple(r) for r in dedup.minhash_signature(d, "doc_id", "text", digest=dedup.fast_digest).collect())
    assert a == b
    # different hash family than md5 (values differ, shape identical)
    m = sorted(tuple(r) for r in dedup.minhash_signature(d, "doc_id", "text").collect())
    assert [r[0] for r in a] == [r[0] for r in m] and a != m

    # the full near-dup pipeline runs on the fast path and finds the same
    # dup-dense structure (exact verify keeps only true near-dups either way)
    fast_pairs = dedup.jaccard_neardup(d, "doc_id", "text", digest=dedup.fast_digest)
    md5_pairs = dedup.jaccard_neardup(d, "doc_id", "text")
    fp = {(r.id_a, r.id_b) for r in fast_pairs.collect()}
    mp = {(r.id_a, r.id_b) for r in md5_pairs.collect()}
    # exact Jaccard threshold makes outputs candidate-set-insensitive on a
    # dup-dense corpus; allow a small recall delta from banding differences
    assert len(fp & mp) >= int(0.9 * max(len(mp), 1))


def test_lsh_params_derivation_invariants():
    """The width derivation must pin the capture-curve midpoint at the
    threshold and meet the clear-dup recall floor with the CHEAPEST config
    whenever one exists within the permutation budget."""
    from flink_cdc_fluss_quickstart_spark.functions.dedup import lsh_params

    # the documented default: 24 perms = 8 bands x 3 rows at t=0.5
    assert lsh_params(0.5) == (24, 8, 3)

    for t in (0.2, 0.3, 0.4, 0.5, 0.6, 0.7, 0.8, 0.9):
        n_perms, bands, rows = lsh_params(t)
        assert n_perms == bands * rows <= 64
        midpoint = (1.0 / bands) ** (1.0 / rows)
        assert abs(midpoint - t) < 0.06, (t, bands, rows, midpoint)
        j_clear = min(t + 0.2, 1.0)
        recall = 1.0 - (1.0 - j_clear**rows) ** bands
        # when the floor is achievable at this threshold, the pick meets it
        achievable = any(
            1.0 - (1.0 - j_clear**r) ** max(2, round((1.0 / t) ** r)) >= 0.95
            for r in range(2, 13)
            if max(2, round((1.0 / t) ** r)) * r <= 64
        )
        if achievable:
            assert recall >= 0.95, (t, bands, rows, recall)


def test_winnowing_guarantee_and_brute_force_match(spark):
    """The winnowing contract (Schleimer et al.): (1) selected fingerprints
    match a brute-force Python winnow of the same k-gram hash sequence;
    (2) two docs sharing a substring of >= K + W - 1 chars share at least
    one fingerprint."""
    import hashlib

    shared = "the quick brown fox jumps over the lazy dog"  # >> 11 chars
    docs = [
        (0, f"AAA unrelated prefix {shared} AAA tail one"),
        (1, f"BBB other start {shared} differing end BBB"),
        (2, "completely different text with nothing in common at all here"),
    ]
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        (r.doc_id, r.fingerprint)
        for r in dedup.winnow_fingerprint_frame(df, "doc_id", "text").collect()
    }
    dedup.release_caches()

    # brute-force twin: normalize -> positional k-grams -> 60-bit md5-prefix
    # hashes -> min per window of W -> distinct
    import re

    k, w = dedup.WINNOW_K, dedup.WINNOW_W
    expected = set()
    for doc_id, txt in docs:
        norm = re.sub(r"[^a-z0-9]+", " ", txt.lower()).strip()
        grams = [norm[i:i + k] for i in range(max(len(norm) - k + 1, 1))]
        hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
        mins = {min(hs[i:i + w]) for i in range(max(len(hs) - w + 1, 1))}
        expected |= {(doc_id, m) for m in mins}
    assert got == expected

    fp0 = {f for d, f in got if d == 0}
    fp1 = {f for d, f in got if d == 1}
    fp2 = {f for d, f in got if d == 2}
    assert fp0 & fp1, "docs sharing a long substring must share a fingerprint"
    assert not (fp0 & fp2) and not (fp1 & fp2)


def test_kmeans_lloyd_monotone_improvement(spark):
    """Lloyd's invariant: mean squared distance to the assigned centroid must
    be non-increasing across refinement rounds (each assign picks the nearest
    centroid; each update re-centers), and every vector must land in one of
    the initial K cluster ids."""
    import pyspark.sql.functions as F

    from flink_cdc_fluss_quickstart_spark.plans.similarity_queries import (
        KMEANS_K,
        _km_assign,
        _km_update,
    )
    from flink_cdc_fluss_quickstart_spark.tables import load_table

    emb = load_table(spark, SF_MEDIUM, "embeddings")
    cents = emb.filter(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").cast("bigint").alias("cluster"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("cv"),
    )
    costs = []
    for _ in range(3):
        assigned = _km_assign(emb, cents)
        stats = assigned.agg(
            F.sum("__d2").alias("cost"),
            F.count(F.lit(1)).alias("n"),
            F.count_distinct("cluster").alias("k"),
            F.min("cluster").alias("kmin"),
            F.max("cluster").alias("kmax"),
        ).collect()[0]
        assert stats.n == emb.count()
        assert 1 <= stats.k <= KMEANS_K
        assert 0 <= stats.kmin and stats.kmax < KMEANS_K
        costs.append(stats.cost)
        cents = _km_update(assigned)
    assert costs[0] >= costs[1] >= costs[2]
    assert costs[2] < costs[0], "two Lloyd rounds must actually improve the fit"


def test_rrf_fuse_planted_fusion_semantics(spark):
    """Planted RRF fixture: a doc ranked 2nd by BOTH arms must outscore each
    arm's exclusive 1st (2/62 > 1/61), absent-arm ranks surface as 0, and
    equal-score ties break by doc_id."""
    lex = spark.createDataFrame(
        [(1, 10, 1), (1, 11, 2), (2, 20, 1)],
        "query_id long, doc_id long, lex_rank long",
    )
    sem = spark.createDataFrame(
        [(1, 12, 1), (1, 11, 2), (2, 21, 1)],
        "query_id long, doc_id long, sem_rank long",
    )
    out = similarity.rrf_fuse(lex, sem, k0=60, k=5).collect()
    by_q = {}
    for r in out:
        by_q.setdefault(r.query_id, []).append(r)
    q1 = sorted(by_q[1], key=lambda r: r.fused_rank)
    # doc 11 appears in both arms at rank 2: 1/62 + 1/62 > 1/61
    assert [r.doc_id for r in q1] == [11, 10, 12]
    assert q1[0].lex_rank == 2 and q1[0].sem_rank == 2
    assert q1[1].sem_rank == 0 and q1[2].lex_rank == 0  # absent arm -> 0
    assert abs(q1[0].rrf_score - 2 / 62) < 1e-15
    # q2: one exclusive rank-1 per arm -> equal scores, doc_id breaks the tie
    q2 = sorted(by_q[2], key=lambda r: r.fused_rank)
    assert [r.doc_id for r in q2] == [20, 21]
    assert q2[0].rrf_score == q2[1].rrf_score


def test_band_keyed_equals_signature_derived_band_keys(spark):
    """Regression lock on the r8 cold-path refactor: minhash_band_keyed's
    (id, band_idx, band_key) -- sliced straight from the fold accumulator
    array -- must stay byte-identical to the keys minhash_band_pairs derives
    from the spread mh_k signature columns (same components, same '|' join,
    same md5). Both now share _shingle_digests/_minhash_fold, so this guards
    the slice indexing against the BAND_COLS layout."""
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog again and again"),
            (2, "the quick brown fox jumps over the lazy dog again and AGAIN"),
            (3, "a completely different document about spark physical plans"),
            (4, ""),
        ],
        "doc_id long, text string",
    )
    keyed = {
        (r.doc_id, r.band_idx, r.band_key)
        for r in dedup.minhash_band_keyed(docs, "doc_id", "text").collect()
    }
    sig = dedup.minhash_signature(docs, "doc_id", "text")
    derived = {
        (r.doc_id, r.band_idx, r.band_key)
        for r in sig.select(
            F.col("doc_id"),
            F.posexplode(
                F.array(
                    *[
                        F.md5(F.concat_ws("|", *[F.col(c) for c in cols]))
                        for cols in dedup.BAND_COLS
                    ]
                )
            ).alias("band_idx", "band_key"),
        ).collect()
    }
    assert keyed == derived
    assert len({k for (_, _, k) in keyed}) > 1  # keys actually vary


def test_events_json_stats_malformed_payload_parity(spark):
    """The registered oracle must honor the query's declared semantics --
     'malformed payloads surface as NULLs, not failures' -- on payload
    classes the generated test data never produces. Bare json_extract
    HARD-ERRORS in DuckDB on non-JSON input (where Spark's from_json nulls),
    so the oracle guards with json_valid + an integer json_type check; this
    runs the REAL registered oracle SQL and the REAL frame function over
    every malformed class and asserts identical aggregates."""
    import duckdb

    from flink_cdc_fluss_quickstart_spark.plans.registry import get
    from flink_cdc_fluss_quickstart_spark.plans.relational import events_json_stats_frame

    rows = [
        ("a", '{"k": 3}'),    # valid integer
        ("a", '{"k": -7}'),   # negative integer (json_type 'BIGINT')
        ("a", "not json"),    # malformed -> bad_payload
        ("b", '{"k": "3"}'),  # string-typed k -> bad (Spark BIGINT field rejects)
        ("b", '{"k": 3.5}'),  # non-integral k -> bad
        ("b", '{"x": 1}'),    # missing key -> bad
        ("b", None),          # NULL props -> bad
        # json_type 'UBIGINT' but overflows BIGINT: Spark nulls, the oracle
        # must TRY_CAST (a bare CAST hard-errors) -> bad
        ("b", '{"k": 10000000000000000000}'),
    ]
    ev = spark.createDataFrame(rows, "event_type string, props string")
    got = {
        r["event_type"]: (r["n_events"], r["sum_k"], r["max_k"], r["bad_payloads"])
        for r in events_json_stats_frame(ev).collect()
    }
    con = duckdb.connect()
    con.execute("CREATE TABLE events(event_type VARCHAR, props VARCHAR)")
    con.executemany("INSERT INTO events VALUES (?, ?)", rows)
    want = {
        r[0]: tuple(r[1:])
        for r in con.execute(get("events_json_props_stats").oracle).fetchall()
    }
    assert got == want
    assert got["a"] == (3, -4, 3, 1)
    assert got["b"] == (5, None, None, 5)


def test_blank_text_counts_zero_tokens_in_both_engines(spark, tmp_path):
    """token = maximal run of non-whitespace, so a blank or whitespace-only
    document carries ZERO tokens -- bare split(trim(''), ...) returns ['']
    (a phantom token that passed min-token gates and padded budget counts)
    and DuckDB's regexp_split_to_array shares the quirk, so the guard must
    exist on BOTH sides. Runs REAL registered queries over a planted parquet
    corpus with blank docs and asserts full result parity plus the explicit
    zero counts."""
    import duckdb
    import pandas as pd

    from flink_cdc_fluss_quickstart_spark.functions import text as tfn
    from flink_cdc_fluss_quickstart_spark.plans.registry import get

    # the function contract itself
    probe = spark.createDataFrame(
        [("",), ("   ",), (" one  two ",), (None,)], "t string"
    ).select(tfn.token_count(F.col("t")).alias("n")).collect()
    assert [r["n"] for r in probe] == [0, 0, 2, None]

    docs = pd.DataFrame(
        {
            "doc_id": [1, 2, 3, 4],
            "text": ["the quick brown fox", "", "   ", "one lonely token"],
            "lang": ["en", "en", "de", "de"],
            "source": ["src0", "src0", "src1", "src1"],
            "n_chars": [19, 0, 3, 16],
        }
    )
    td = str(tmp_path)
    docs.to_parquet(f"{td}/documents.parquet", index=False)
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{td}/documents.parquet')"
    )
    for name in (
        "text_quality",
        "token_count",
        "token_stats_by_lang",
        "quality_filter_route",
        "domain_mix_report",
        "length_bucket_batches",
        "token_budget_mix_plan",
        "quantile_sketch_report",
        "sequence_pack_offsets",
        "pack_efficiency_report",
        "gopher_quality_flags",
        "c4_quality_flags",
        "collocation_pmi",
        "char_entropy",
        "context_chunks",
    ):
        spec = get(name)
        sdf = spec.builder(spark, td)
        s_rows = sorted(
            tuple(None if v is None else round(v, 9) if isinstance(v, float) else v for v in r)
            for r in (tuple(x) for x in sdf.collect())
        )
        res = con.execute(spec.oracle)
        d_rows = sorted(
            tuple(None if v is None else round(float(v), 9) if isinstance(v, float) else v for v in r)
            for r in res.fetchall()
        )
        assert s_rows == d_rows, f"{name}: {s_rows} != {d_rows}"
    # blank docs explicitly: zero tokens, zero-width pack spans
    packs = {
        r["doc_id"]: r.asDict()
        for r in get("sequence_pack_offsets").builder(spark, td).collect()
    }
    assert packs[2]["n_tokens"] == 0 and packs[3]["n_tokens"] == 0
    assert packs[3]["start_offset"] == 4  # doc 1's 4 tokens, nothing from 2
