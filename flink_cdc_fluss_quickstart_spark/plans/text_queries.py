"""Declared queries for the text-analysis / dedup operator family over the
`documents` table (training-data pipeline ops; first-class per BASELINE.json).

Every query here is pure built-in-function row work plus at most one digest
shuffle, i.e. the shape that scales linearly to 100 TB.
"""

from __future__ import annotations

import math
from typing import NamedTuple

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_cdc_fluss_quickstart_spark.functions import dedup, text
from flink_cdc_fluss_quickstart_spark.plans.registry import register
from flink_cdc_fluss_quickstart_spark.tables import load_table, spread, table_row_count

_STOP_SQL = ", ".join(f"'{w}'" for w in text.STOPWORDS)


@register(
    "dedup_exact",
    oracle="""
    SELECT md5(text) AS text_hash,
           MIN(doc_id) AS representative_id,
           COUNT(*) AS dup_count
    FROM documents
    GROUP BY md5(text)
    """,
    description="Exact deduplication: hash-groupBy on md5(text), keep the"
    " minimum doc_id as representative.",
)
def dedup_exact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return (
        d.groupBy(dedup.exact_key(F.col("text")).alias("text_hash"))
        .agg(
            F.min("doc_id").alias("representative_id"),
            F.count(F.lit(1)).alias("dup_count"),
        )
    )


@register(
    "doc_fingerprint",
    oracle="""
    SELECT doc_id,
           md5(trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g'))) AS fingerprint
    FROM documents
    """,
    description="Document fingerprinting: digest of normalized text"
    " (lowercase, punctuation-collapsed) -- the near-dup-by-normalization key.",
)
def doc_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select("doc_id", text.fingerprint(F.col("text")).alias("fingerprint"))


@register(
    "token_count",
    oracle=r"""
    SELECT doc_id,
           len((CASE WHEN trim(text) = '' THEN []::VARCHAR[] ELSE regexp_split_to_array(trim(text), '\s+') END)) AS n_tokens,
           length(text) AS n_chars_obs
    FROM documents
    """,
    description="Token counting (whitespace tokenizer), pure map-side.",
)
def token_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        text.token_count(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars_obs"),
    )


@register(
    "text_quality",
    oracle=rf"""
    SELECT doc_id, n_tokens, punct_ratio, stopword_ratio, avg_token_len,
           (n_tokens >= 10 AND stopword_ratio >= 0.01) AS is_quality
    FROM (
      SELECT doc_id,
             len((CASE WHEN trim(text) = '' THEN []::VARCHAR[] ELSE regexp_split_to_array(trim(text), '\s+') END)) AS n_tokens,
             CAST(length(regexp_replace(text, '[^.,;:!?]', '', 'g')) AS DOUBLE)
               / length(text) AS punct_ratio,
             CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                                  x -> x IN ({_STOP_SQL}))) AS DOUBLE)
               / len((CASE WHEN trim(text) = '' THEN []::VARCHAR[] ELSE regexp_split_to_array(trim(text), '\s+') END)) AS stopword_ratio,
             CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
               / len((CASE WHEN trim(text) = '' THEN []::VARCHAR[] ELSE regexp_split_to_array(trim(text), '\s+') END)) AS avg_token_len
      FROM documents
    )
    """,
    description="Quality scoring: length / punctuation-ratio / stopword-ratio"
    " heuristics, all JVM-side built-ins (no UDF).",
)
def text_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_tokens = text.token_count(t)
    # try_divide: a blank doc has 0 tokens / 0 length, and under Spark's ANSI
    # default a bare `/` THROWS on the zero denominator where DuckDB yields
    # NULL -- try_divide returns the same NULL, so the ratio columns agree on
    # blank docs in both engines (planted-tested in tests/test_functions.py)
    out = d.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        F.try_divide(text.punct_count(t).cast("double"), F.length(t)).alias("punct_ratio"),
        F.try_divide(text.stopword_count(t).cast("double"), n_tokens).alias("stopword_ratio"),
        F.try_divide(
            F.length(F.regexp_replace(t, r"\s", "")).cast("double"), n_tokens
        ).alias("avg_token_len"),
    )
    return out.withColumn(
        "is_quality", (F.col("n_tokens") >= 10) & (F.col("stopword_ratio") >= 0.01)
    )


def _lang_score_sql(lang: str) -> str:
    markers = ", ".join(f"'{w}'" for w in text.LANG_MARKERS[lang])
    return (
        rf"len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),"
        rf" x -> x IN ({markers})))"
    )


@register(
    "lang_id",
    oracle=rf"""
    SELECT doc_id, lang AS labeled_lang,
           CASE
             WHEN len(regexp_extract_all(text, '[一-鿿]')) > 0 THEN 'zh'
             WHEN s_en > 0 AND s_en >= GREATEST(s_de, s_fr, s_es) THEN 'en'
             WHEN s_de > 0 AND s_de >= GREATEST(s_fr, s_es) THEN 'de'
             WHEN s_fr > 0 AND s_fr >= s_es THEN 'fr'
             WHEN s_es > 0 THEN 'es'
             ELSE 'und'
           END AS pred_lang
    FROM (
      SELECT doc_id, lang, text,
             {_lang_score_sql('en')} AS s_en,
             {_lang_score_sql('de')} AS s_de,
             {_lang_score_sql('fr')} AS s_fr,
             {_lang_score_sql('es')} AS s_es
      FROM documents
    )
    """,
    description="Language identification: marker-token scoring heuristic with"
    " CJK-codepoint precedence; deterministic argmax.",
)
def lang_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.col("lang").alias("labeled_lang"),
        text.lang_id(F.col("text")).alias("pred_lang"),
    )


_NORM_DOCS = (
    "SELECT doc_id, trim(regexp_replace(lower(text), '[^a-z0-9]+', ' ', 'g')) AS norm"
    " FROM documents"
)

# --- winnowing (rolling-hash fingerprints) ----------------------------------

# per-doc winnowed fingerprint rows, the oracle twin of
# dedup.winnow_fingerprint_frame: positional char k-grams -> 60-bit md5-prefix
# hashes -> min per sliding window of w (clamped at the array end, exactly
# like the zip_with null-skip on the Spark side) -> distinct
_WINNOW_FPS = f"""
      SELECT doc_id, unnest(fps) AS fingerprint FROM (
        SELECT doc_id,
               list_distinct(list_transform(
                 range(1, greatest(len(hs) - {dedup.WINNOW_W - 1}, 1) + 1),
                 i -> list_min(hs[i::int:(i + {dedup.WINNOW_W - 1})::int]))) AS fps
        FROM (
          SELECT doc_id,
                 list_transform(
                   list_transform(range(1, greatest(len(norm) - {dedup.WINNOW_K - 1}, 1) + 1),
                                  i -> substr(norm, i::int, {dedup.WINNOW_K})),
                   g -> CAST('0x' || substr(md5(g), 1, 15) AS BIGINT)) AS hs
          FROM ({_NORM_DOCS})
        )
      )
"""

# Stop-gram cap: a fingerprint present in more docs than the cap is template/
# boilerplate noise, and every such fingerprint contributes O(df^2) candidate
# pairs -- dropping them is both the precision filter and the skew guard.
# The cap is DERIVED from the corpus (1% of docs, floored at 5): a fixed
# count would either pass boilerplate at small corpora or, worse, drop every
# legitimately-shared fingerprint once the corpus grows past floor/df ratios
# (replicating the corpus 10x must not silently empty the join).
WINNOW_CAP_FLOOR = 5
WINNOW_CAP_DENOM = 100  # cap = greatest(floor, n_docs // denom)
WINNOW_MIN_SHARED = 5  # pairs must share at least this many fingerprints
WINNOW_DOCS_PER_PART = 200  # pair-join partition sizing: docs per task
# Ceiling on the derived partition count: past a few thousand partitions the
# marginal skew protection is dwarfed by shuffle-file count and scheduler
# overhead (a billion-doc corpus would otherwise request millions of
# partitions). At the cap, per-task volume grows with corpus size again, but
# by then the real lever is executor count, not partition count.
WINNOW_MAX_PARTS = 4096


@register(
    "winnow_fingerprints",
    oracle=f"SELECT doc_id, fingerprint FROM ({_WINNOW_FPS})",
    description=f"Winnowing document fingerprints (Schleimer et al., SIGMOD"
    f" 2003): minimum hash of every {dedup.WINNOW_W}-gram sliding window"
    f" over positional {dedup.WINNOW_K}-char-gram hashes, distinct per doc."
    f" Unlike minhash this GUARANTEES any shared substring of >="
    f" {dedup.WINNOW_K + dedup.WINNOW_W - 1} chars contributes a shared"
    f" fingerprint -- the partial-overlap/quote-detection primitive. All"
    f" row-local array math (sliding min via zip_with doubling, no explode"
    f" until the final fingerprint rows).",
)
def winnow_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.winnow_fingerprint_frame(d, "doc_id", "text")


@register(
    "winnow_overlap_pairs",
    oracle=f"""
    WITH fp AS ({_WINNOW_FPS}),
    keep AS (
      SELECT fingerprint FROM fp GROUP BY fingerprint
      HAVING COUNT(*) <= GREATEST({WINNOW_CAP_FLOOR},
        (SELECT COUNT(*) FROM documents) // {WINNOW_CAP_DENOM})
    ),
    fpk AS (SELECT fp.doc_id, fp.fingerprint FROM fp JOIN keep USING (fingerprint))
    SELECT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(COUNT(*) AS BIGINT) AS n_shared_fps
    FROM fpk a JOIN fpk b ON a.fingerprint = b.fingerprint AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= {WINNOW_MIN_SHARED}
    """,
    description=f"Partial-overlap candidate pairs from shared winnowing"
    f" fingerprints: fingerprints seen in more than max({WINNOW_CAP_FLOOR},"
    f" corpus/{WINNOW_CAP_DENOM}) docs are dropped first (corpus-derived"
    f" stop-gram cap -- boilerplate phrases would otherwise bucket unrelated"
    f" documents, the same skew-guard as capped LSH bands), then a"
    f" fingerprint-keyed self-join counts shared"
    f" fingerprints per pair (>= {WINNOW_MIN_SHARED} suppresses single-hash"
    f" coincidences). What shuffles is (doc_id, 8-byte fingerprint) rows"
    f" co-partitioned on the fingerprint -- never document text.",
)
def winnow_overlap_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # winnow_fingerprint_frame persists its array frame (tracked), so the
    # stop-gram count and the pair join below each re-explode from cache --
    # the expensive gram hashing runs once
    fp = dedup.winnow_fingerprint_frame(d, "doc_id", "text")
    # the stop-gram cap is a pure function of the exact doc count, which the
    # parquet FOOTERS already give the driver for free (and which also sizes
    # the pair join's partitioning below) -- deriving it as a literal deletes
    # a corpus count(1) aggregation plus a broadcast crossJoin per run while
    # computing the identical value the oracle spells as count(1) div DENOM
    n_docs = table_row_count(sf_dir, "documents")
    cap = max(WINNOW_CAP_FLOOR, n_docs // WINNOW_CAP_DENOM)
    keep = (
        fp.groupBy("fingerprint")
        .agg(F.count(F.lit(1)).alias("__df"))
        .filter(F.col("__df") <= F.lit(cap))
        .select("fingerprint")
    )
    # the keep list is CORPUS-sized (one row per surviving distinct
    # fingerprint), so it must never ride a broadcast: at a 50k-doc corpus
    # its runtime size slipped under the AQE broadcast threshold and the
    # driver-side build OOM'd the heap. The merge hint pins a sort-merge
    # join co-partitioned on the fingerprint -- the same partitioning the
    # band self-join below consumes. (A window-count filter was tried
    # instead and is WORSE: WindowExec buffers whole partitions per task,
    # where this groupBy aggregates with O(1) state per key.)
    fpk = fp.join(keep.hint("merge"), "fingerprint")
    # the pair self-join EXPLODES: each fingerprint of doc-frequency df
    # emits df^2 rows, so per-task volume is input-partition bytes x df --
    # invisible to AQE's skew split, which reads INPUT partition sizes.
    # Size the join's partitioning from the corpus so per-task pair volume
    # stays bounded as the corpus (and with it the derived stop-gram cap)
    # grows: ~WINNOW_DOCS_PER_PART docs' worth of fingerprints per task.
    # The doc count came from the parquet FOOTERS above (driver-side
    # metadata read, zero Spark jobs) so building or explaining this plan
    # runs nothing on the cluster; AQE coalesces the extra partitions away
    # at small corpora, so the floor keeps test-scale plans unchanged.
    # "spark.sql.shuffle.partitions" may be unset or the AQE idiom "auto";
    # fall back to default parallelism rather than erroring (ranking.py's
    # guard)
    try:
        base_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    except Exception:
        base_parts = spark.sparkContext.defaultParallelism
    parts = max(
        base_parts,
        min(n_docs // WINNOW_DOCS_PER_PART, WINNOW_MAX_PARTS),
    )
    fpk = fpk.repartition(parts, "fingerprint")
    a = fpk.select(F.col("fingerprint"), F.col("doc_id").alias("id_a"))
    b = fpk.select(F.col("fingerprint"), F.col("doc_id").alias("id_b"))
    return (
        a.join(b, "fingerprint")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count(F.lit(1)).alias("n_shared_fps"))
        .filter(F.col("n_shared_fps") >= WINNOW_MIN_SHARED)
    )

# word array per document (the word-n-gram shingle base, mirroring
# dedup.word_shingle_array's normalized-word unit)
_WORD_DOCS = f"SELECT doc_id, string_split(norm, ' ') AS w FROM ({_NORM_DOCS})"


def _shingles_sql(n: int = dedup.WORD_SHINGLE_LEN) -> str:
    return (
        f"list_distinct(list_transform(range(1, greatest(len(w) - {n - 1}, 1) + 1),"
        f" i -> array_to_string(list_slice(w, i::int, i::int + {n - 1}), ' ')))"
    )


# ONE md5 per DISTINCT shingle, reduced to x = (first 32 bits) mod p;
# signature component k = min over shingles of (a_k*x + b_k) mod p -- the
# multiply-mod-prime permutation family, op-for-op mirror of
# functions/dedup.minhash_signature at the threshold-derived default width
_HS_COL = "list_transform(s, x -> md5(x)) AS hs"
_X_COL = (
    f"list_transform(hs, h -> CAST('0x' || substr(h, 1, 8) AS BIGINT)"
    f" % {dedup._MH_PRIME}) AS x"
)


def _mh_expr(k: int) -> str:
    a, b = dedup.PERM_AB[k]
    return (
        f"list_min(list_transform(x, v -> ({a} * v + {b}) % {dedup._MH_PRIME})) AS mh_{k}"
    )


_MH_EXPRS = ",\n           ".join(_mh_expr(k) for k in range(dedup.N_PERMS))

_MH_SQL = f"""
    SELECT doc_id,
           {{mh_exprs}}
    FROM (
      SELECT doc_id,
             {_X_COL}
      FROM (
        SELECT doc_id, {_HS_COL}
        FROM (
          SELECT doc_id, {_shingles_sql()} AS s
          FROM ({_WORD_DOCS})
        )
      )
    )
"""


def _band_pairs_sql(src: str) -> str:
    """UNION ALL of per-band self-joins: band b matches when all of its
    N_ROWS signature components agree (mirror of dedup.minhash_band_pairs
    over dedup.BAND_COLS)."""
    branches = []
    for cols in dedup.BAND_COLS:
        conds = " AND ".join(f"a.{c} = b.{c}" for c in cols)
        branches.append(
            f"SELECT a.doc_id AS id_a, b.doc_id AS id_b"
            f" FROM {src} a JOIN {src} b ON {conds} WHERE a.doc_id < b.doc_id"
        )
    return "\n        UNION ALL\n        ".join(branches)


@register(
    "minhash_signatures",
    oracle=_MH_SQL.format(mh_exprs=_MH_EXPRS),
    description=f"MinHash signatures at the threshold-derived default width"
    f" ({dedup.N_PERMS} permutations = {dedup.N_BANDS} bands x {dedup.N_ROWS}"
    f" rows for Jaccard {dedup.DEFAULT_JACCARD}): ONE md5 per distinct"
    f" {dedup.WORD_SHINGLE_LEN}-word shingle (the RefinedWeb-style document"
    f" unit), multiply-mod-prime permutations ((a_k*x + b_k) mod p, as in"
    f" Spark MLlib MinHashLSH) deriving all components, computed row-locally"
    f" with array expressions -- no shuffle.",
)
def minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.minhash_signature(d, "doc_id", "text")


_EST_EXPRS = ",\n           ".join(
    f"list_min(list_transform(hs, h -> substr(h, {4 * k + 1}, 4))) AS est_{k}"
    for k in range(dedup.EST_SLICES)
)
_EST_GATE = " + ".join(
    f"(CASE WHEN a.est_{k} = b.est_{k} THEN 1 ELSE 0 END)"
    for k in range(dedup.EST_SLICES)
)
# mirrors dedup.jaccard_neardup's gate: ceil((min_jaccard - margin) * slices)
# -- derived from the SAME named constants the Spark path defaults to, so
# retuning either threshold moves both engines together
_EST_MIN = math.ceil(
    (dedup.NEARDUP_MIN_JACCARD - dedup.NEARDUP_EST_MARGIN) * dedup.EST_SLICES
)


@register(
    "ngram_jaccard_neardup",
    oracle=f"""
    WITH prof AS (
      SELECT doc_id, s,
             {_MH_EXPRS},
             {_EST_EXPRS}
      FROM (
        SELECT doc_id, s, hs,
               {_X_COL}
        FROM (
          SELECT doc_id, s, {_HS_COL}
          FROM (SELECT doc_id, {_shingles_sql()} AS s FROM ({_WORD_DOCS}))
        )
      )
    ),
    pairs AS (
      SELECT DISTINCT id_a, id_b FROM (
        {_band_pairs_sql("prof")}
      )
    )
    SELECT id_a, id_b, jaccard FROM (
      SELECT p.id_a, p.id_b,
             CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
               / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE)
               AS jaccard
      FROM pairs p JOIN prof a ON p.id_a = a.doc_id JOIN prof b ON p.id_b = b.doc_id
      WHERE ({_EST_GATE}) >= {_EST_MIN}
    ) WHERE jaccard >= {dedup.NEARDUP_MIN_JACCARD}
    """,
    description=f"n-gram Jaccard near-dup: threshold-derived LSH candidates"
    f" ({dedup.N_BANDS} bands x {dedup.N_ROWS} rows) -> wide-minhash estimate"
    f" gate (8 x 16-bit components sliced from the shingle digest) -> exact"
    f" shingle-set Jaccard at 0.5. Wide arrays join only the gate survivors,"
    f" so candidate volume never moves document-sized data.",
)
def ngram_jaccard_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.jaccard_neardup(d, "doc_id", "text")


def _simhash_sql_expr() -> str:
    terms = []
    for i in range(dedup.SIMHASH_BITS):
        j = i // 4 + 1
        div = 2 ** (3 - i % 4)
        bitsum = f"list_sum(list_transform(digs, d -> ((d[{j}] // {div}) % 2) * 2 - 1))"
        # MSB weight is the negative two's-complement value (2**63 overflows
        # signed BIGINT); mirrors dedup._MSB_WEIGHT
        weight = (
            "(CAST(-9223372036854775807 AS BIGINT) - CAST(1 AS BIGINT))"
            if i == 0
            else f"CAST({2 ** (dedup.SIMHASH_BITS - 1 - i)} AS BIGINT)"
        )
        terms.append(f"(CASE WHEN {bitsum} > 0 THEN {weight} ELSE CAST(0 AS BIGINT) END)")
    return " + ".join(terms)


_SIMHASH_SQL = f"""
    SELECT doc_id, CAST({_simhash_sql_expr()} AS BIGINT) AS simhash
    FROM (
      SELECT doc_id,
             list_transform({_shingles_sql()}, s -> list_transform(range(1, {dedup.SIMHASH_BITS // 4 + 1}),
               j -> instr('0123456789abcdef', substr(md5(s), j::int, 1)) - 1)) AS digs
      FROM ({_WORD_DOCS})
    )
"""


@register(
    "simhash_fingerprint",
    oracle=_SIMHASH_SQL,
    description="64-bit SimHash fingerprint: per-bit majority vote over"
    " md5-hashed distinct shingles, all row-local array math (no shuffle).",
)
def simhash_fingerprint(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.simhash(d, "doc_id", "text")


@register(
    "simhash_neardup_pairs",
    oracle=f"""
    WITH fp AS ({_SIMHASH_SQL})
    SELECT DISTINCT id_a, id_b, hamming FROM (
      SELECT a.doc_id AS id_a, b.doc_id AS id_b,
             CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
      FROM (SELECT unnest(range(0, {dedup.SIMHASH_BANDS})) AS k) band
      CROSS JOIN fp a JOIN fp b
        ON ((a.simhash >> ({dedup.SIMHASH_BAND_BITS} * band.k)) & {(1 << dedup.SIMHASH_BAND_BITS) - 1})
         = ((b.simhash >> ({dedup.SIMHASH_BAND_BITS} * band.k)) & {(1 << dedup.SIMHASH_BAND_BITS) - 1})
      WHERE a.doc_id < b.doc_id
    ) WHERE hamming <= 3
    """,
    description="SimHash near-dup pairs: 16-bit-band candidate join (pigeonhole"
    " guarantees recall for hamming<=3) + exact popcount verify; 16-bit bands"
    " keep bucket sizes ~N/65536 (sub-quadratic at corpus scale).",
)
def simhash_neardup_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    fp = dedup.simhash(d, "doc_id", "text")
    return dedup.simhash_neardup_pairs(fp, "doc_id", max_hamming=3)


@register(
    "minhash_lsh_pairs",
    oracle=f"""
    WITH sig AS ({_MH_SQL.format(mh_exprs=_MH_EXPRS)})
    SELECT DISTINCT id_a, id_b FROM (
        {_band_pairs_sql("sig")}
    )
    """,
    description=f"MinHash-LSH candidate pairs: banded signature self-join"
    f" ({dedup.N_BANDS} bands x {dedup.N_ROWS} rows, derived from the 0.5"
    f" Jaccard target); shuffles digests, never documents.",
)
def minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.band_self_join(
        dedup.minhash_band_keyed(d, "doc_id", "text"), "doc_id"
    )


def neardup_source_overlap_frame(d: DataFrame) -> DataFrame:
    """Which sources copy from each other: near-dup candidate pairs tagged
    with both endpoints' sources (canonical least/greatest order so (a,b)
    and (b,a) collapse), rolled up to pair counts and corpus share in
    integer milli-units -- the unit-testable twin of the registered query."""
    pairs = dedup.band_self_join(
        dedup.minhash_band_keyed(d, "doc_id", "text"), "doc_id"
    )
    # the (doc_id, source) tag map is corpus-sized: sort-merge, never a
    # broadcast build (r14 x100 sweep; functions.dedup._corpus_join_side)
    src = dedup._corpus_join_side(d.select("doc_id", "source"))
    tagged = (
        pairs
        .join(src.withColumnRenamed("doc_id", "id_a")
                 .withColumnRenamed("source", "sa"), "id_a")
        .join(src.withColumnRenamed("doc_id", "id_b")
                 .withColumnRenamed("source", "sb"), "id_b")
        .select(
            F.least("sa", "sb").alias("source_a"),
            F.greatest("sa", "sb").alias("source_b"),
        )
    )
    g = tagged.groupBy("source_a", "source_b").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_pairs")
    )
    total = g.agg(F.sum("n_pairs").alias("__t"))
    return g.crossJoin(F.broadcast(total)).select(
        "source_a",
        "source_b",
        "n_pairs",
        F.floor(F.lit(1000.0) * F.col("n_pairs") / F.col("__t"))
        .cast("bigint").alias("share_milli"),
    )


def _source_overlap_oracle() -> str:
    from flink_cdc_fluss_quickstart_spark.plans.registry import get

    pairs = get("minhash_lsh_pairs").oracle
    return f"""
    WITH p AS ({pairs}),
    s AS (SELECT doc_id, source FROM documents),
    tagged AS (
      SELECT least(sa.source, sb.source) AS source_a,
             greatest(sa.source, sb.source) AS source_b
      FROM p
      JOIN s sa ON p.id_a = sa.doc_id
      JOIN s sb ON p.id_b = sb.doc_id
    ),
    g AS (
      SELECT source_a, source_b, CAST(COUNT(*) AS BIGINT) AS n_pairs
      FROM tagged GROUP BY source_a, source_b
    )
    SELECT source_a, source_b, n_pairs,
           CAST(floor(1000.0 * n_pairs / SUM(n_pairs) OVER ()) AS BIGINT)
             AS share_milli
    FROM g"""


@register(
    "neardup_source_overlap",
    oracle=_source_overlap_oracle(),
    description="Corpus-curation report: near-dup pair volume BY SOURCE"
    " PAIR -- which sources copy from each other (mirror-heavy source"
    " pairs are the first thing a curation pass drops or reweights)."
    " Strict downstream of minhash_lsh_pairs: the same banded candidate"
    " join, then both endpoints tag their doc's source (two doc_id-keyed"
    " joins of an (id, source) projection -- never documents), canonical"
    " least/greatest source order, and a |sources|^2-bounded rollup with"
    " floor-scaled integer milli-shares against a one-row broadcast total."
    " Scale shape: identical to the pair join it consumes; everything"
    " after the pairs is metadata-sized.",
)
def neardup_source_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return neardup_source_overlap_frame(d)


# the NEW-ingest membership rule for the incremental dedup shape: a pure
# row-local function of the id (every 5th doc), standing in for "today's
# batch" against the already-indexed corpus
# new-batch membership rule for the incremental-dedup queries: ONE pair of
# constants feeds the band-join driver predicate, the oracle's n_new CASEs,
# and the Spark n_new expression -- three independent spellings of "% 5 = 4"
# drifted apart at retune time otherwise
_INCR_MOD, _INCR_REM = 5, 4


def _incr_new_sql(col: str = "doc_id") -> str:
    return f"{col} % {_INCR_MOD} = {_INCR_REM}"


_INCR_NEW = _incr_new_sql()


def _band_pairs_incr_sql(src: str) -> str:
    """Per-band joins DRIVEN by the new side only (mirror of
    dedup.minhash_band_pairs_against_index): index x index never appears."""
    branches = []
    for cols in dedup.BAND_COLS:
        conds = " AND ".join(f"a.{c} = b.{c}" for c in cols)
        branches.append(
            f"SELECT LEAST(a.doc_id, b.doc_id) AS id_a,"
            f" GREATEST(a.doc_id, b.doc_id) AS id_b"
            f" FROM {src} a JOIN {src} b ON {conds} AND a.doc_id <> b.doc_id"
            f" WHERE a.{_INCR_NEW}"
        )
    return "\n        UNION ALL\n        ".join(branches)


@register(
    "minhash_incremental_pairs",
    oracle=f"""
    WITH sig AS ({_MH_SQL.format(mh_exprs=_MH_EXPRS)})
    SELECT id_a, id_b,
           CAST((CASE WHEN {_incr_new_sql("id_a")} THEN 1 ELSE 0 END)
              + (CASE WHEN {_incr_new_sql("id_b")} THEN 1 ELSE 0 END) AS BIGINT) AS n_new
    FROM (
      SELECT DISTINCT id_a, id_b FROM (
        {_band_pairs_incr_sql("sig")}
      )
    )
    """,
    description=f"Incremental MinHash-LSH dedup -- the daily-ingest shape a"
    f" 100 TB pipeline actually runs: only the NEW batch (here every 5th"
    f" doc_id, standing in for today's crawl) drives the banded join against"
    f" the indexed corpus, so per-run cost is |batch| x bucket-size, never"
    f" index^2, and index-x-index pairs (resolved by previous runs) are"
    f" never generated. Emits (id_a, id_b, n_new) with n_new = how many"
    f" sides are new (2 = within-batch dup, 1 = dup of an indexed doc)."
    f" Same {dedup.N_BANDS}x{dedup.N_ROWS} banding as minhash_lsh_pairs;"
    f" shuffles digests, never documents.",
)
def minhash_incremental_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sig = dedup.minhash_signature(d, "doc_id", "text")
    pairs = dedup.minhash_band_pairs_against_index(
        sig, "doc_id", dedup.BAND_COLS, F.expr(_INCR_NEW)
    )
    is_new = lambda c: F.when(c % _INCR_MOD == _INCR_REM, 1).otherwise(0)  # noqa: E731
    return pairs.select(
        "id_a",
        "id_b",
        (is_new(F.col("id_a")) + is_new(F.col("id_b"))).cast("bigint").alias("n_new"),
    )


@register(
    "ngram_containment_pairs",
    oracle=f"""
    WITH prof AS (
      SELECT doc_id, s, {_MH_EXPRS}
      FROM (
        SELECT doc_id, s, {_X_COL}
        FROM (
          SELECT doc_id, s, {_HS_COL}
          FROM (SELECT doc_id, {_shingles_sql()} AS s FROM ({_WORD_DOCS}))
        )
      )
    ),
    pairs AS (
      SELECT DISTINCT id_a, id_b FROM (
        {_band_pairs_sql("prof")}
      )
    )
    SELECT id_a, id_b, containment_ab, containment_ba FROM (
      SELECT p.id_a, p.id_b,
             CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(a.s) AS containment_ab,
             CAST(len(list_intersect(a.s, b.s)) AS DOUBLE) / len(b.s) AS containment_ba
      FROM pairs p JOIN prof a ON p.id_a = a.doc_id JOIN prof b ON p.id_b = b.doc_id
    ) WHERE greatest(containment_ab, containment_ba) >= 0.7
    """,
    description="Asymmetric near-dup (quote/subset) detection: containment"
    " |A n B|/|A| scored both directions over the threshold-derived LSH"
    " candidates -- catches documents embedded in larger ones, which"
    " symmetric Jaccard under-scores (J ~ 1/3 for a 3x-size superset but"
    " containment 1.0). Same banded candidate join as the Jaccard path;"
    " no size-ratio prune (the J <= min/max bound does not apply).",
)
def ngram_containment_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return dedup.containment_pairs(d, "doc_id", "text", min_containment=0.7)


@register(
    "bpe_token_stats",
    oracle=r"""
    SELECT doc_id,
           len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\s]+')) AS bpe_tokens,
           len(regexp_extract_all(text, '[\w.+-]+@[\w-]+\.[\w.]+')) AS email_count,
           len(regexp_extract_all(text, 'https?://[^\s]+')) AS url_count
    FROM documents
    """,
    description="BPE-ish regex tokenization (letter runs / digit runs / punct"
    " runs, the GPT-2 pre-tokenizer shape) + email/URL pattern counts, all"
    " JVM-side regexp_extract_all -- pure map work.",
)
def bpe_token_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.expr(r"size(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]+', 0))")
        .alias("bpe_tokens"),
        F.expr(r"size(regexp_extract_all(text, '[\\w.+-]+@[\\w-]+\\.[\\w.]+', 0))")
        .alias("email_count"),
        F.expr(r"size(regexp_extract_all(text, 'https?://[^\\s]+', 0))")
        .alias("url_count"),
    )


# --- corpus-statistical quality scoring -------------------------------------

# Head/tail split bound for the vocabulary join: tokens carrying >= 1/HEAD_DENOM
# of all token mass. At most HEAD_DENOM tokens can clear the bar regardless of
# corpus size, so the broadcast side is bounded by construction -- the Zipf
# head ("the", "of", ...) that would otherwise make the tok-keyed join skewed
# rides a broadcast; the long tail (bounded at < 0.1% of rows per key) takes
# the ordinary shuffle join.
LM_HEAD_DENOM = 1000


def _cached(df: DataFrame) -> DataFrame:
    """Tracked MEMORY_AND_DISK persist, released via dedup.release_caches()."""
    from pyspark import StorageLevel

    return dedup.track_cache(df.persist(StorageLevel.MEMORY_AND_DISK))


def _doc_tf(d: DataFrame) -> DataFrame:
    """Shared (doc_id, tok) -> tf frame, PERSISTED: it feeds both branches of
    the frequency-split join AND the per-token rollup (vocab / docfreq) --
    without the persist each consumer re-scans and re-explodes the corpus
    (the plan audit showed 6 scans for unigram_lm_surprisal), the same
    finding as the winnowing array frame. Corpus-sized, spills to disk."""
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok"))
    return _cached(toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf")))


# unigram-LM CTE chain (toks -> per-doc tf -> vocab -> total mass), shared by
# the surprisal oracle and the perplexity-bucket oracle so the LM the buckets
# are cut on is the IDENTICAL model the surprisal query scores with
_LM_CTES = """
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    dtf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, tok
    ),
    vocab AS (
      SELECT tok, CAST(SUM(tf) AS BIGINT) AS c FROM dtf GROUP BY tok
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM vocab)
"""


@register(
    "unigram_lm_surprisal",
    oracle=_LM_CTES
    + """
    SELECT doc_id,
           CAST(SUM(tf) AS BIGINT) AS n_tokens,
           CAST(SUM(tf * (length(bin(tot.n)) - length(bin(v.c)))) AS BIGINT)
             AS surprisal_bits,
           CAST(SUM(tf * (length(bin(tot.n)) - length(bin(v.c)))) AS DOUBLE)
             / SUM(tf) AS bits_per_token
    FROM dtf JOIN vocab v USING (tok) CROSS JOIN tot
    GROUP BY doc_id
    """,
    description="CCNet-style statistical-LM quality score: a unigram LM is"
    " fit on the corpus itself (token -> count) and every document scored by"
    " its total/average token surprisal -- fluent text made of common tokens"
    " scores low, gibberish and rare-token soup scores high. Surprisal is"
    " integer-quantized to whole bits (floor(log2 N) - floor(log2 c) via"
    " length(bin(x)), exact in both engines -- no cross-engine float-log"
    " drift, same determinism rule as the fixed-point embedding math); the"
    " one float op is the final per-doc division. Scale shape: doc-side"
    " term frequencies aggregate BEFORE the vocabulary join, and the join"
    f" itself is frequency-split -- tokens holding >= 1/{LM_HEAD_DENOM} of"
    f" total token mass (at most {LM_HEAD_DENOM} rows by construction, the"
    " Zipf head that would skew a tok-keyed shuffle) broadcast, the tail"
    " shuffle-joins with per-key skew bounded below 1/"
    f"{LM_HEAD_DENOM} of corpus mass.",
)
def unigram_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    dtf = _doc_tf(spread(d))
    # vocab feeds the head/tail split plus the total-mass scalar: persisted
    # too (|vocabulary|-sized, far smaller than dtf)
    vocab = _cached(dtf.groupBy("tok").agg(F.sum("tf").alias("c")))
    tot = vocab.agg(F.sum("c").alias("__n"))
    vocab = vocab.crossJoin(F.broadcast(tot))
    head = vocab.filter(F.col("c") * LM_HEAD_DENOM >= F.col("__n"))
    tail = vocab.filter(F.col("c") * LM_HEAD_DENOM < F.col("__n"))
    scored = dtf.join(F.broadcast(head), "tok").unionByName(dtf.join(tail, "tok"))
    bits = F.col("tf") * (F.length(F.bin("__n")) - F.length(F.bin("c")))
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_tokens"),
            F.sum(bits).alias("surprisal_bits"),
            (F.sum(bits).cast("double") / F.sum("tf")).alias("bits_per_token"),
        )
    )


@register(
    "perplexity_buckets",
    oracle=_LM_CTES
    + """
    , sc AS (
      SELECT doc_id,
             CAST(SUM(tf * (length(bin(tot.n)) - length(bin(v.c)))) AS DOUBLE)
               / SUM(tf) AS bits_per_token
      FROM dtf JOIN vocab v USING (tok) CROSS JOIN tot
      GROUP BY doc_id
    ),
    scl AS (
      SELECT s.doc_id, d.lang, s.bits_per_token
      FROM sc s JOIN documents d USING (doc_id)
    ),
    ranked AS (
      SELECT lang, doc_id, bits_per_token,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY bits_per_token, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM scl
    )
    SELECT doc_id, lang, bits_per_token,
           CASE WHEN rn <= (n + 2) // 3 THEN 'head'
                WHEN rn <= (2 * n + 2) // 3 THEN 'middle'
                ELSE 'tail' END AS bucket
    FROM ranked
    """,
    description="CCNet-style perplexity bucketing (Wenzek et al. 2020,"
    " reference pipeline for CommonCrawl curation): every document lands in"
    " the head / middle / tail tercile of its LANGUAGE'S perplexity"
    " distribution, scored by the same corpus-fit unigram LM as"
    " unigram_lm_surprisal (shared CTE chain, integer-bit surprisal -- the"
    " buckets are cut on the identical model). Terciles are EXACT discrete"
    " rank cuts (rn <= (n+2) div 3, integer arithmetic -- no float"
    " percentile drift, and the (score, doc_id) composite order makes every"
    " rank unique, so heavily-tied score distributions still split into"
    " thirds). One per-language ranked window that moves only (lang,"
    " double, id) triplets -- the token_stats_by_lang shape, the single"
    " shuffle -- then a row-local CASE; at 100 TB the window input is the"
    " 24-byte projection, never the documents.",
)
def perplexity_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    sc = unigram_lm_surprisal(spark, sf_dir).select("doc_id", "bits_per_token")
    scl = sc.join(spread(d).select("doc_id", "lang"), "doc_id")
    w = Window.partitionBy("lang").orderBy("bits_per_token", "doc_id")
    wc = Window.partitionBy("lang")
    ranked = scl.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wc)
    )
    return ranked.select(
        "doc_id",
        "lang",
        "bits_per_token",
        F.when(F.col("rn") <= F.expr("(n + 2) div 3"), "head")
        .when(F.col("rn") <= F.expr("(2 * n + 2) div 3"), "middle")
        .otherwise("tail")
        .alias("bucket"),
    )


TFIDF_TOP_K = 3


@register(
    "tfidf_top_terms",
    oracle=f"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    dtf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, tok
    ),
    docfreq AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM dtf GROUP BY tok
    ),
    nd AS (SELECT CAST(COUNT(*) AS BIGINT) AS n_docs FROM documents)
    SELECT doc_id, term, tf, idf_bits, score_bits, rank FROM (
      SELECT doc_id, tok AS term, tf,
             CAST(length(bin(nd.n_docs)) - length(bin(d.df)) AS BIGINT) AS idf_bits,
             CAST(tf * (length(bin(nd.n_docs)) - length(bin(d.df))) AS BIGINT)
               AS score_bits,
             ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY
               tf * (length(bin(nd.n_docs)) - length(bin(d.df))) DESC, tok ASC)
               AS rank
      FROM dtf JOIN docfreq d USING (tok) CROSS JOIN nd
    ) WHERE rank <= {TFIDF_TOP_K}
    """,
    description=f"TF-IDF keyword extraction: top-{TFIDF_TOP_K} terms per"
    " document by term-frequency x inverse-document-frequency, the classic"
    " topic/keyword feature for corpus curation. IDF is integer-quantized"
    " (floor(log2 n_docs) - floor(log2 df) whole bits, exact in both"
    " engines) so scores are pure BIGINT arithmetic -- deterministic"
    " ordering with the term itself as tie-break. Shuffles are keyed on"
    " (doc_id, tok), tok, then doc_id; the per-doc window ranks at most"
    " |doc vocabulary| rows per key, and the docfreq join is frequency-split"
    " like unigram_lm_surprisal's (tokens holding >= 1/"
    f"{LM_HEAD_DENOM} of all (doc, token) pairs -- at most {LM_HEAD_DENOM}"
    " rows -- broadcast; the tail shuffle-joins skew-bounded).",
)
def tfidf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    dtf = _doc_tf(spread(d))
    docfreq = _cached(dtf.groupBy("tok").agg(F.count(F.lit(1)).alias("df")))
    pairs_tot = docfreq.agg(F.sum("df").alias("__p"))
    docfreq = docfreq.crossJoin(F.broadcast(pairs_tot))
    head = docfreq.filter(F.col("df") * LM_HEAD_DENOM >= F.col("__p")).drop("__p")
    tail = docfreq.filter(F.col("df") * LM_HEAD_DENOM < F.col("__p")).drop("__p")
    joined = dtf.join(F.broadcast(head), "tok").unionByName(dtf.join(tail, "tok"))
    nd = d.agg(F.count(F.lit(1)).alias("__n_docs"))
    idf_bits = F.length(F.bin("__n_docs")) - F.length(F.bin("df"))
    scored = (
        joined
        .crossJoin(F.broadcast(nd))
        .select(
            "doc_id",
            F.col("tok").alias("term"),
            "tf",
            idf_bits.cast("bigint").alias("idf_bits"),
            (F.col("tf") * idf_bits).cast("bigint").alias("score_bits"),
        )
    )
    w = Window.partitionBy("doc_id").orderBy(F.desc("score_bits"), F.asc("term"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= TFIDF_TOP_K)
    )


# --- BM25 more-like-this retrieval -------------------------------------------

BM25_TOP_K = 5          # retrieved docs per query
BM25_QUERY_TERMS = 8    # informative terms kept per query doc (WAND-style cap)
# stop-term cap: terms in more than max(FLOOR, n_docs // DENOM) documents are
# dropped from the probe -- the same corpus-derived floor+ratio rule as the
# winnowing stop-gram cap. The floor keeps small/low-entropy corpora
# un-pruned (the test corpus has a 31-token vocabulary where every token
# exceeds any pure ratio cap); at scale the ratio term dominates and bounds
# every posting list at n_docs / DENOM.
BM25_DF_CAP_DENOM = 20
BM25_DF_CAP_FLOOR = 1000
# BM25 constants, spelled as explicit DOUBLE casts in BOTH engines so the
# (decimal-literal) parse rules of neither engine leak into the math
_BM25_K1 = "CAST(1.2 AS DOUBLE)"
_BM25_B = "CAST(0.75 AS DOUBLE)"
# one term's contribution: idf_bits x saturated tf with length normalization,
# floor-scaled to a BIGINT so the per-pair SUM is exact and order-independent
# (the same fixed-point discipline as the embedding math); inputs are exact
# integers plus the identically-derived avgdl double, and every float op is a
# single IEEE expression evaluated in the same order in both engines
_BM25_CONTRIB = (
    f"CAST(FLOOR(CAST(idf_bits AS DOUBLE)"
    f" * ((CAST(tf AS DOUBLE) * ({_BM25_K1} + CAST(1.0 AS DOUBLE)))"
    f"    / (CAST(tf AS DOUBLE) + {_BM25_K1}"
    f"       * (CAST(1.0 AS DOUBLE) - {_BM25_B}"
    f"          + {_BM25_B} * (CAST(dl AS DOUBLE) / avgdl))))"
    f" * CAST(1000000.0 AS DOUBLE)) AS BIGINT)"
)


# the shared CTE chain through `scored` (tokenize -> tf -> doc lengths ->
# corpus stats -> df-capped eligible terms -> query-term cap -> postings ->
# per-(query, doc) BM25 accumulation); reused verbatim by the RRF hybrid
# fusion oracle in plans/similarity_queries.py so the lexical arm is
# spelled once
_BM25_CTES = f"""
    toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    dtf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, tok
    ),
    dl AS (SELECT doc_id, CAST(SUM(tf) AS BIGINT) AS dl FROM dtf GROUP BY doc_id),
    stats AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(dl) AS DOUBLE) / CAST(COUNT(*) AS DOUBLE) AS avgdl
      FROM dl
    ),
    docfreq AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS df FROM dtf GROUP BY tok
    ),
    eligible AS (
      SELECT tok, df,
             CAST(length(bin(stats.n_docs)) - length(bin(df)) AS BIGINT) AS idf_bits
      FROM docfreq CROSS JOIN stats
      WHERE df <= GREATEST({BM25_DF_CAP_FLOOR}, stats.n_docs // {BM25_DF_CAP_DENOM})
    ),
    qterms AS (
      SELECT query_id, tok, idf_bits FROM (
        SELECT d.doc_id AS query_id, d.tok, e.idf_bits,
               ROW_NUMBER() OVER (PARTITION BY d.doc_id
                                  ORDER BY d.tf * e.idf_bits DESC, d.tok ASC) AS r
        FROM dtf d JOIN eligible e USING (tok)
        WHERE d.doc_id % 100 = 0
      ) WHERE r <= {BM25_QUERY_TERMS}
    ),
    postings AS (
      SELECT d.tok, d.doc_id, d.tf, l.dl
      FROM dtf d JOIN eligible e USING (tok) JOIN dl l USING (doc_id)
    ),
    scored AS (
      SELECT q.query_id, p.doc_id,
             CAST(COUNT(*) AS BIGINT) AS n_shared_terms,
             CAST(SUM({_BM25_CONTRIB}) AS BIGINT) AS score_scaled
      FROM qterms q
      JOIN postings p ON q.tok = p.tok AND p.doc_id <> q.query_id
      CROSS JOIN stats
      GROUP BY q.query_id, p.doc_id
    )
"""


@register(
    "bm25_retrieval",
    oracle=f"""
    WITH {_BM25_CTES}
    SELECT query_id, doc_id, n_shared_terms,
           CAST(score_scaled AS DOUBLE) / 1000000.0 AS bm25_score, rank
    FROM (
      SELECT query_id, doc_id, n_shared_terms, score_scaled,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY score_scaled DESC, doc_id ASC) AS rank
      FROM scored
    ) WHERE rank <= {BM25_TOP_K}
    """,
    description=f"BM25 more-like-this retrieval (k1=1.2, b=0.75): every 100th"
    f" document acts as a query; its {BM25_QUERY_TERMS} most informative"
    f" terms (by tf x integer-quantized idf, the WAND-style term cap) probe"
    f" the inverted posting lists and candidates are ranked by"
    f" length-normalized BM25 -- the retrieval primitive for search-based"
    f" decontamination, near-topic linking, and RAG curation that the"
    f" tfidf/LM family lacks. Determinism: idf is whole bits"
    f" (length(bin(x)), exact), each term contribution is a single IEEE"
    f" float expression floor-scaled to BIGINT, and the per-pair sum is"
    f" integer -- bit-identical across engines, doc_id tie-break. Scale"
    f" shape: terms in > max({BM25_DF_CAP_FLOOR}, n_docs/"
    f"{BM25_DF_CAP_DENOM}) docs are dropped (corpus-derived stop-term cap"
    f" with a small-corpus floor, the winnow stop-gram rule; at scale no"
    f" posting list exceeds n_docs/{BM25_DF_CAP_DENOM}, so the probe join"
    f" cannot go quadratic on Zipf heads), queries carry <="
    f" {BM25_QUERY_TERMS} terms each, the probe is"
    f" one tok-keyed equi join of (query, tok) x capped postings, and the"
    f" shared dtf/docfreq frames are the same cached profiles the tfidf/LM"
    f" queries reuse.",
)
def bm25_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    dtf = _doc_tf(spread(d))
    dl = _cached(dtf.groupBy("doc_id").agg(F.sum("tf").alias("dl")))
    stats = dl.agg(
        F.count(F.lit(1)).alias("n_docs"),
        (F.sum("dl").cast("double") / F.count(F.lit(1)).cast("double")).alias("avgdl"),
    )
    # df profile, PERSISTED (r16): three consumers below (qterms' eligible
    # join, the postings eligible join, and the heavy stop-term set) each
    # re-ran the vocab rollup over the corpus-sized dtf cache -- one
    # materialization now serves all three (vocab-sized, the same rule as
    # dl).
    dfx = _cached(
        dtf.groupBy("tok")
        .agg(F.count(F.lit(1)).alias("df"))
        .crossJoin(F.broadcast(stats))
    )
    cap = F.greatest(
        F.lit(BM25_DF_CAP_FLOOR),
        F.expr(f"n_docs div {BM25_DF_CAP_DENOM}"),
    )
    eligible = dfx.filter(F.col("df") <= cap).select(
        "tok",
        (F.length(F.bin("n_docs")) - F.length(F.bin("df")))
        .cast("bigint")
        .alias("idf_bits"),
    )
    # the dropped Zipf head as a frame (guide 3.2, VERDICT r15 item 4):
    # tokens over the df cap are BOUNDED by mass -- sum(df) = sum over docs
    # of |distinct tokens per doc|, so |{t: df_t > n_docs/DENOM}| <=
    # DENOM * avg_doc_vocab regardless of corpus size -- which is why the
    # broadcast below is safe to FORCE where corpus-sized frames never are.
    heavy = dfx.filter(F.col("df") > cap).select("tok")
    wq = Window.partitionBy("query_id").orderBy(
        F.desc(F.col("tf") * F.col("idf_bits")), F.asc("tok")
    )
    qterms = (
        dtf.filter(F.col("doc_id") % 100 == 0)
        .withColumnRenamed("doc_id", "query_id")
        .join(eligible, "tok")
        .withColumn("r", F.row_number().over(wq))
        .filter(F.col("r") <= BM25_QUERY_TERMS)
        .select("query_id", "tok", "idf_bits")
    )
    # pre-shuffle stop-term semi-filter (guide 3.2): the eligible join is
    # broadcast at test vocab sizes, but at a real corpus's vocabulary the
    # planner keys dtf through a tok exchange that would CARRY the Zipf
    # head only for the join to drop it post-shuffle. Anti-joining the
    # bounded heavy set (broadcast, see bound above) drops those rows
    # BEFORE the exchange; rows removed are exactly the rows the eligible
    # inner join removes anyway (eligible and heavy partition the
    # vocabulary), so the result is unchanged at every scale.
    postings = (
        dtf.join(F.broadcast(heavy), "tok", "left_anti")
        .join(eligible.select("tok"), "tok")
        .join(dl, "doc_id")
    )
    scored = (
        qterms.join(postings, "tok")
        .filter(F.col("doc_id") != F.col("query_id"))
        .crossJoin(F.broadcast(stats.select("avgdl")))
        .groupBy("query_id", "doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_shared_terms"),
            F.sum(F.expr(_BM25_CONTRIB)).cast("bigint").alias("score_scaled"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("score_scaled"), F.asc("doc_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= BM25_TOP_K)
        .select(
            "query_id",
            "doc_id",
            "n_shared_terms",
            (F.col("score_scaled").cast("double") / 1000000.0).alias("bm25_score"),
            "rank",
        )
    )


@register(
    "dedup_components",
    oracle=f"""
    WITH RECURSIVE sig AS ({_MH_SQL.format(mh_exprs=_MH_EXPRS)}),
    pairs AS (
      SELECT DISTINCT id_a, id_b FROM (
        {_band_pairs_sql("sig")}
      )
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL
      SELECT id_b AS s, id_a AS d FROM pairs
    ),
    reach(s, d) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    )
    SELECT s AS doc_id, MIN(d) AS component_id FROM reach GROUP BY s
    """,
    description="Duplicate-cluster resolution: connected components over the"
    " MinHash-LSH candidate graph by iterative min-label propagation (rounds"
    " = graph diameter; near-dup graphs are clique-ish so 2-3 rounds). The"
    " driver loop iterates ROUNDS, never rows -- each round is one equi join"
    " + one min-aggregation, the standard distributed-CC shape. Oracle:"
    " recursive-CTE reachability (exact same min-member component ids).",
)
def dedup_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.band_self_join(
        dedup.minhash_band_keyed(d, "doc_id", "text"), "doc_id"
    )
    return dedup.connected_components(
        pairs, d.select("doc_id"), id_col="doc_id"
    )


@register(
    "dedup_keep_representatives",
    oracle=f"""
    WITH RECURSIVE sig AS ({_MH_SQL.format(mh_exprs=_MH_EXPRS)}),
    pairs AS (
      SELECT DISTINCT id_a, id_b FROM (
        {_band_pairs_sql("sig")}
      )
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL
      SELECT id_b AS s, id_a AS d FROM pairs
    ),
    reach(s, d) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ),
    comp AS (SELECT s AS doc_id, MIN(d) AS component_id FROM reach GROUP BY s)
    SELECT d.doc_id, d.lang, d.source, d.n_chars
    FROM documents d JOIN comp c ON d.doc_id = c.doc_id
    WHERE c.doc_id = c.component_id
    """,
    description="The dedup END STEP: materialize the deduplicated corpus by"
    " keeping one representative per near-dup cluster (the minimum doc_id --"
    " exactly the component id, so the filter is component_id = doc_id, a"
    " row-local predicate over the CC output joined back to the corpus;"
    " deterministic, no per-cluster window needed). This is the query a"
    " pipeline actually ships to tokenization after minhash_lsh_pairs +"
    " dedup_components.",
)
def dedup_keep_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.band_self_join(
        dedup.minhash_band_keyed(d, "doc_id", "text"), "doc_id"
    )
    comp = dedup.connected_components(pairs, d.select("doc_id"), id_col="doc_id")
    reps = comp.filter(F.col("doc_id") == F.col("component_id")).select("doc_id")
    return d.join(reps, "doc_id").select("doc_id", "lang", "source", "n_chars")


# DuckDB spelling of the md5-hex8 split bucket over an arbitrary id column
# (pipeline_queries._DUCK_HEX8 hardcodes doc_id; this one parametrizes it --
# the Spark side uses conv() as dataset_split_assign does, same value)
def _duck_split_bucket(col: str) -> str:
    return (
        "CAST(list_sum(list_transform(range(1, 9), j -> "
        f"CAST((instr('0123456789abcdef', substr(md5(CAST({col} AS VARCHAR)), j::int, 1)) - 1)"
        " * (16 ** (8 - j)) AS BIGINT))) % 100 AS BIGINT)"
    )


@register(
    "leakage_safe_split_assign",
    oracle=f"""
    WITH RECURSIVE sig AS ({_MH_SQL.format(mh_exprs=_MH_EXPRS)}),
    pairs AS (
      SELECT DISTINCT id_a, id_b FROM (
        {_band_pairs_sql("sig")}
      )
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL
      SELECT id_b AS s, id_a AS d FROM pairs
    ),
    reach(s, d) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ),
    comp AS (SELECT s AS doc_id, MIN(d) AS component_id FROM reach GROUP BY s)
    SELECT doc_id, component_id, hash_bucket,
           CASE WHEN hash_bucket < 90 THEN 'train'
                WHEN hash_bucket < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, component_id,
                 {_duck_split_bucket("component_id")} AS hash_bucket
          FROM comp)
    """,
    description="Leakage-safe train/val/test split (90/5/5): the split key is"
    " md5(near-dup COMPONENT id) mod 100, so every document in a near-dup"
    " cluster lands in the same split by construction -- the contamination"
    " guard a doc-granular split lacks (at sf0.001, 3 of 21 multi-member"
    " clusters straddle doc-level split boundaries; any one of them leaks"
    " eval content into training). Composes the stamped MinHash-LSH pair"
    " graph + pointer-jumping CC with the dataset_split_assign hash-bucket"
    " rule at cluster granularity; the split itself stays a pure row-local"
    " function of the component id -- stable under corpus growth, and new"
    " members of an existing cluster inherit its split instead of"
    " reshuffling it.",
)
def leakage_safe_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.band_self_join(
        dedup.minhash_band_keyed(d, "doc_id", "text"), "doc_id"
    )
    comp = dedup.connected_components(pairs, d.select("doc_id"), id_col="doc_id")
    bucket = dedup.hash_bucket(F.col("component_id").cast("string"))
    return comp.select(
        "doc_id",
        "component_id",
        bucket.alias("hash_bucket"),
        F.when(bucket < 90, "train")
        .when(bucket < 95, "val")
        .otherwise("test")
        .alias("split"),
    )


@register(
    "soft_dedup_weights",
    oracle=f"""
    WITH RECURSIVE sig AS ({_MH_SQL.format(mh_exprs=_MH_EXPRS)}),
    pairs AS (
      SELECT DISTINCT id_a, id_b FROM (
        {_band_pairs_sql("sig")}
      )
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM pairs
      UNION ALL
      SELECT id_b AS s, id_a AS d FROM pairs
    ),
    reach(s, d) AS (
      SELECT doc_id, doc_id FROM documents
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ),
    comp AS (SELECT s AS doc_id, MIN(d) AS component_id FROM reach GROUP BY s)
    SELECT doc_id, component_id,
           CAST(COUNT(*) OVER (PARTITION BY component_id) AS BIGINT)
             AS cluster_size,
           CAST(1 AS DOUBLE)
             / CAST(COUNT(*) OVER (PARTITION BY component_id) AS DOUBLE)
             AS weight
    FROM comp
    """,
    description="Soft dedup: per-document training weights that DOWNWEIGHT"
    " repeated content instead of dropping it (the reweighting alternative"
    " to hard dedup -- SoftDedup, He et al. 2024, with near-dup cluster"
    " mass as the commonness measure): weight = 1 / |near-dup cluster|, so"
    " every cluster contributes exactly one document's worth of gradient"
    " mass whatever its copy count, singletons keep weight 1.0, and"
    " sum(weight) = the deduplicated corpus size (the effective-dataset"
    " check a loss-weighted loader runs). Composes the stamped MinHash-LSH"
    " pair graph + pointer-jumping CC (the leakage_safe_split_assign"
    " composition) and adds ONE component-keyed count window + a row-local"
    " division of exact BIGINTs -- the single extra shuffle is"
    " component-keyed, and at 100 TB the window input is (doc_id,"
    " component_id) pairs, never text.",
)
def soft_dedup_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    pairs = dedup.band_self_join(
        dedup.minhash_band_keyed(d, "doc_id", "text"), "doc_id"
    )
    comp = dedup.connected_components(pairs, d.select("doc_id"), id_col="doc_id")
    size = F.count(F.lit(1)).over(Window.partitionBy("component_id")).cast("bigint")
    return comp.select(
        "doc_id",
        "component_id",
        size.alias("cluster_size"),
        (F.lit(1).cast("double") / size.cast("double")).alias("weight"),
    )


@register(
    "repetition_signals",
    oracle="""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
      WHERE len(string_split(text, ' ')) >= 3
    ),
    words AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n, MAX(c) AS maxc
      FROM (SELECT doc_id, tok, COUNT(*) AS c
            FROM (SELECT doc_id, unnest(l) AS tok FROM docs)
            GROUP BY doc_id, tok)
      GROUP BY doc_id
    ),
    bi AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n, MAX(c) AS maxc
      FROM (SELECT doc_id, bg, COUNT(*) AS c
            FROM (SELECT doc_id,
                         unnest(list_transform(range(1, len(l)),
                                i -> l[i::int] || ' ' || l[(i+1)::int])) AS bg
                  FROM docs)
            GROUP BY doc_id, bg)
      GROUP BY doc_id
    ),
    tri AS (
      SELECT doc_id, CAST(SUM(c) AS BIGINT) AS n,
             CAST(SUM(CASE WHEN c >= 2 THEN c ELSE 0 END) AS BIGINT) AS dupc
      FROM (SELECT doc_id, tg, COUNT(*) AS c
            FROM (SELECT doc_id,
                         unnest(list_transform(range(1, len(l) - 1),
                                i -> l[i::int] || ' ' || l[(i+1)::int] || ' ' || l[(i+2)::int])) AS tg
                  FROM docs)
            GROUP BY doc_id, tg)
      GROUP BY doc_id
    )
    SELECT w.doc_id,
           w.n AS n_tokens,
           CAST(w.maxc AS DOUBLE) / CAST(w.n AS DOUBLE) AS top_word_frac,
           CAST(b.maxc AS DOUBLE) / CAST(b.n AS DOUBLE) AS top_bigram_frac,
           CAST(t.dupc AS DOUBLE) / CAST(t.n AS DOUBLE) AS dup_trigram_frac
    FROM words w JOIN bi b ON w.doc_id = b.doc_id JOIN tri t ON w.doc_id = t.doc_id
    """,
    description="Gopher-style repetition quality signals per document: top"
    " word fraction, top bigram fraction, and the fraction of trigram"
    " occurrences belonging to a repeated trigram. Spark-first: n-grams are"
    " built ROW-LOCALLY with array transforms (no per-doc window shuffle),"
    " then three partial/final hash aggregations keyed on (doc_id, gram) --"
    " every shuffle is keyed by document+gram so the signal scales linearly"
    " with corpus size; ratios divide exact BIGINT counts in DOUBLE,"
    " identically to the oracle.",
)
def repetition_signals(spark: SparkSession, sf_dir: str) -> DataFrame:
    # persisted: the tokenized frame feeds THREE independent aggregation
    # branches (word / bigram / trigram); without the persist each branch
    # re-scans the parquet and re-splits every document (the file's usual
    # shared-consumer rule, cf. _doc_tf and bigram_lm_surprisal's dbf)
    d = _cached(
        load_table(spark, sf_dir, "documents")
        .select("doc_id", F.split("text", " ").alias("l"))
        .filter(F.size("l") >= 3)
    )
    # element_at is 1-based, matching DuckDB's l[i]. The Generates explode
    # integer POSITIONS; the n-gram concat runs in the codegen'd projection
    # after them (fusing the transform into the generator drops it out of
    # whole-stage codegen -- ~30% slower, same finding as
    # decontamination_ngrams at 2x for its md5 grams).
    bigram = "concat(element_at(l, __i), ' ', element_at(l, __i + 1))"
    trigram = ("concat(element_at(l, __i), ' ', element_at(l, __i + 1), ' ',"
               " element_at(l, __i + 2))")
    words = (
        d.select("doc_id", F.explode("l").alias("tok"))
        .groupBy("doc_id", "tok").count()
        .groupBy("doc_id")
        .agg(F.sum("count").alias("n"), F.max("count").alias("maxc"))
    )
    bi = (
        d.select("doc_id", "l", F.explode(F.expr("sequence(1, size(l) - 1)")).alias("__i"))
        .select("doc_id", F.expr(bigram).alias("bg"))
        .groupBy("doc_id", "bg").count()
        .groupBy("doc_id")
        .agg(F.sum("count").alias("bn"), F.max("count").alias("bmaxc"))
    )
    tri = (
        d.select("doc_id", "l", F.explode(F.expr("sequence(1, size(l) - 2)")).alias("__i"))
        .select("doc_id", F.expr(trigram).alias("tg"))
        .groupBy("doc_id", "tg").count()
        .groupBy("doc_id")
        .agg(
            F.sum("count").alias("tn"),
            F.sum(F.when(F.col("count") >= 2, F.col("count")).otherwise(0)).alias("tdupc"),
        )
    )
    return (
        words.join(bi, "doc_id").join(tri, "doc_id")
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            (F.col("maxc").cast("double") / F.col("n").cast("double")).alias("top_word_frac"),
            (F.col("bmaxc").cast("double") / F.col("bn").cast("double")).alias("top_bigram_frac"),
            (F.col("tdupc").cast("double") / F.col("tn").cast("double")).alias("dup_trigram_frac"),
        )
    )


@register(
    "bigram_lm_surprisal",
    oracle="""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ),
    dbf AS (
      SELECT doc_id, prev, cur, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id,
                   unnest(list_transform(range(1, len(l)), i -> l[i::int])) AS prev,
                   unnest(list_transform(range(1, len(l)), i -> l[(i+1)::int])) AS cur
            FROM docs)
      GROUP BY doc_id, prev, cur
    ),
    vocab AS (
      SELECT prev, cur, CAST(SUM(tf) AS BIGINT) AS c FROM dbf GROUP BY prev, cur
    ),
    scored_vocab AS (
      SELECT v.prev, v.cur,
             CAST(length(bin(p.cp)) - length(bin(v.c)) AS BIGINT) AS bits
      FROM vocab v JOIN (SELECT prev, CAST(SUM(c) AS BIGINT) AS cp
                         FROM vocab GROUP BY prev) p USING (prev)
    )
    SELECT doc_id,
           CAST(SUM(tf) AS BIGINT) AS n_bigrams,
           CAST(SUM(tf * bits) AS BIGINT) AS bigram_bits,
           CAST(SUM(tf * bits) AS DOUBLE) / SUM(tf) AS bits_per_bigram
    FROM dbf JOIN scored_vocab USING (prev, cur)
    GROUP BY doc_id
    """,
    description="Bigram-LM quality score (the KenLM-shaped ladder rung above"
    " unigram_lm_surprisal): each document's average CONDITIONAL surprisal"
    " -log2 P(w_i | w_{i-1}) under a bigram model fit on the corpus itself --"
    " catches word-salad that unigram stats miss (common words in impossible"
    " orders score high). Same integer-bit quantization (length(bin(x)),"
    " exact both engines; the one float op is the final division)."
    " Scale shape: surprisal is computed once per DISTINCT bigram in"
    " vocab space (bits(c_prev) - bits(c_bigram)) -- the corpus-sized"
    " doc-frequency frame joins the scored vocabulary frequency-split like"
    " the unigram path (the <= LM_HEAD_DENOM bigrams holding >= 1/"
    f"{LM_HEAD_DENOM} of bigram mass broadcast; the tail shuffle-joins"
    " skew-bounded), and the doc-term frame is a tracked persist feeding"
    " both the vocab rollup and the join.",
)
def bigram_lm_surprisal(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    docs = d.select("doc_id", F.split("text", " ").alias("l")).filter(F.size("l") >= 2)
    # positions explode; the bigram concat stays in the codegen'd projection
    pairs = docs.select(
        "doc_id",
        "l",
        F.explode(F.expr("sequence(1, size(l) - 1)")).alias("__i"),
    ).select(
        "doc_id",
        F.expr("element_at(l, __i)").alias("prev"),
        F.expr("element_at(l, __i + 1)").alias("cur"),
    )
    dbf = _cached(pairs.groupBy("doc_id", "prev", "cur").agg(F.count(F.lit(1)).alias("tf")))
    vocab = _cached(dbf.groupBy("prev", "cur").agg(F.sum("tf").alias("c")))
    prev_tot = vocab.groupBy("prev").agg(F.sum("c").alias("cp"))
    scored_vocab = vocab.join(prev_tot, "prev").select(
        "prev",
        "cur",
        "c",
        (F.length(F.bin("cp")) - F.length(F.bin("c"))).cast("bigint").alias("bits"),
    )
    mass = scored_vocab.agg(F.sum("c").alias("__m"))
    scored_vocab = scored_vocab.crossJoin(F.broadcast(mass))
    head = scored_vocab.filter(F.col("c") * LM_HEAD_DENOM >= F.col("__m")).select("prev", "cur", "bits")
    tail = scored_vocab.filter(F.col("c") * LM_HEAD_DENOM < F.col("__m")).select("prev", "cur", "bits")
    joined = dbf.join(F.broadcast(head), ["prev", "cur"]).unionByName(
        dbf.join(tail, ["prev", "cur"])
    )
    return (
        joined.groupBy("doc_id")
        .agg(
            F.sum("tf").alias("n_bigrams"),
            F.sum(F.col("tf") * F.col("bits")).alias("bigram_bits"),
            (
                F.sum(F.col("tf") * F.col("bits")).cast("double") / F.sum("tf")
            ).alias("bits_per_bigram"),
        )
    )


@register(
    "curriculum_order",
    oracle="""
    WITH toks AS (
      SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    dtf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM toks GROUP BY doc_id, tok
    ),
    vocab AS (
      SELECT tok, CAST(SUM(tf) AS BIGINT) AS c FROM dtf GROUP BY tok
    ),
    tot AS (SELECT CAST(SUM(c) AS BIGINT) AS n FROM vocab),
    lm AS (
      SELECT doc_id,
             CAST(SUM(tf * (length(bin(tot.n)) - length(bin(v.c)))) AS DOUBLE)
               / SUM(tf) AS bits_per_token
      FROM dtf JOIN vocab v USING (tok) CROSS JOIN tot
      GROUP BY doc_id
    )
    SELECT doc_id, bits_per_token,
           CAST(ROW_NUMBER() OVER (ORDER BY bits_per_token, doc_id) - 1 AS BIGINT)
             AS curriculum_rank
    FROM lm
    """,
    description="Curriculum ordering: a global easy-to-hard training order"
    " (ascending corpus-LM surprisal -- fluent, common-token documents"
    " first), deterministic and resumable like the training shuffle."
    " Distributed shape: a global rank over a DATA-DEPENDENT value, so hash"
    " sub-bucketing doesn't apply (hash prefixes aren't contiguous in a"
    " value order) -- operators.ranking.global_rank range-partitions on the"
    " full composite sort key (score, doc_id), ranks in parallel windows"
    " per range, and adds metadata-sized per-range base offsets. Because"
    " the composite key is UNIQUE, the range sampler is free to split even"
    " a fully score-tied corpus across partitions -- the skew guard the"
    " earlier fixed-width value-bucket scheme lacked (one hot 1/16-bit"
    " bucket used to funnel through one window partition). Ranks are a pure"
    " function of the data, so the output is unchanged and matches the"
    " oracle's single ROW_NUMBER.",
)
def curriculum_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_cdc_fluss_quickstart_spark.operators.ranking import global_rank

    lm = unigram_lm_surprisal(spark, sf_dir).select("doc_id", "bits_per_token")
    return global_rank(
        lm, ["bits_per_token", "doc_id"], out_col="curriculum_rank"
    ).select("doc_id", "bits_per_token", "curriculum_rank")


# --- PMI collocation extraction ----------------------------------------------

COLLOC_TOP_K = 50      # strongest collocations reported corpus-wide
COLLOC_MIN_COUNT = 5   # a pair must occur this often to be a candidate


@register(
    "collocation_pmi",
    oracle=f"""
    WITH docs AS (
      SELECT doc_id, string_split(text, ' ') AS l FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ),
    pairs AS (
      SELECT prev, cur, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(list_transform(range(1, len(l)), i -> l[i::int])) AS prev,
                   unnest(list_transform(range(1, len(l)), i -> l[(i+1)::int])) AS cur
            FROM docs)
      GROUP BY prev, cur
    ),
    ptot AS (SELECT prev, CAST(SUM(c) AS BIGINT) AS cp FROM pairs GROUP BY prev),
    ctot AS (SELECT cur, CAST(SUM(c) AS BIGINT) AS cc FROM pairs GROUP BY cur),
    n AS (SELECT CAST(SUM(c) AS BIGINT) AS nb FROM pairs)
    SELECT prev, cur, pair_count, pmi_bits
    FROM (
      SELECT p.prev, p.cur, p.c AS pair_count,
             CAST((length(bin(p.c)) + length(bin(n.nb)))
                  - (length(bin(pt.cp)) + length(bin(ct.cc))) AS BIGINT) AS pmi_bits
      FROM pairs p
      JOIN ptot pt ON p.prev = pt.prev
      JOIN ctot ct ON p.cur = ct.cur
      CROSS JOIN n
      WHERE p.c >= {COLLOC_MIN_COUNT}
    )
    ORDER BY pmi_bits DESC, prev ASC, cur ASC
    LIMIT {COLLOC_TOP_K}
    """,
    description=f"PMI collocation extraction (phrase mining): the"
    f" {COLLOC_TOP_K} adjacent word pairs whose co-occurrence most exceeds"
    f" chance, ranked by integer-quantized pointwise mutual information --"
    f" the phrase-vocabulary step of tokenizer/corpus curation. PMI is"
    f" quantized as whole bits of log2((c_ab/N)/((c_a/N)(c_b/N))) via the"
    f" SUM of per-factor floor-log2 bit counts (length(bin(x)), exact in"
    f" both engines and overflow-free where the product form would exceed"
    f" BIGINT at corpus scale); ties break lexicographically. Margins"
    f" derive from the SAME bigram table they normalize (self-consistent,"
    f" one pass). Scale shape: one (prev,cur)-keyed count, two margin"
    f" rollups joined back frequency-keyed, and the global top-{COLLOC_TOP_K}"
    f" is ORDER BY+LIMIT -- Spark plans TakeOrderedAndProject (per-partition"
    f" top-k, driver merges k x partitions rows), never a global sort.",
)
def collocation_pmi(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    docs = d.select(F.split("text", " ").alias("l")).filter(F.size("l") >= 2)
    pairs = (
        docs.select("l", F.explode(F.expr("sequence(1, size(l) - 1)")).alias("__i"))
        .select(
            F.expr("element_at(l, __i)").alias("prev"),
            F.expr("element_at(l, __i + 1)").alias("cur"),
        )
        .groupBy("prev", "cur")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = _cached(pairs)
    ptot = pairs.groupBy("prev").agg(F.sum("c").alias("cp"))
    ctot = pairs.groupBy("cur").agg(F.sum("c").alias("cc"))
    nb = pairs.agg(F.sum("c").alias("nb"))
    pmi_bits = (
        (F.length(F.bin("c")) + F.length(F.bin("nb")))
        - (F.length(F.bin("cp")) + F.length(F.bin("cc")))
    ).cast("bigint")
    return (
        pairs.filter(F.col("c") >= COLLOC_MIN_COUNT)
        .join(ptot, "prev")
        .join(ctot, "cur")
        .crossJoin(F.broadcast(nb))
        .select("prev", "cur", F.col("c").alias("pair_count"), pmi_bits.alias("pmi_bits"))
        .orderBy(F.desc("pmi_bits"), F.asc("prev"), F.asc("cur"))
        .limit(COLLOC_TOP_K)
    )


# --- Gopher rule-based quality filter ----------------------------------------

# the published rule thresholds (Rae et al. 2021, Gopher, Appendix A)
GOPHER_MIN_WORDS, GOPHER_MAX_WORDS = 50, 100_000
GOPHER_MIN_MWL, GOPHER_MAX_MWL = 3.0, 10.0
GOPHER_MAX_SYMBOL_RATIO = 0.1
GOPHER_MIN_ALPHA_RATIO = 0.8
GOPHER_REQUIRED = ("the", "be", "to", "of", "and", "that", "have", "with")
GOPHER_MIN_REQUIRED = 2
GOPHER_MAX_BULLET_RATIO = 0.9
GOPHER_MAX_ELLIPSIS_RATIO = 0.3

_G_REQ_SQL = ", ".join(f"'{w}'" for w in GOPHER_REQUIRED)


@register(
    "gopher_quality_flags",
    oracle=rf"""
    SELECT doc_id, n_words,
           (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS})
             AS ok_word_count,
           (mwl >= {GOPHER_MIN_MWL} AND mwl <= {GOPHER_MAX_MWL}) AS ok_mean_word_len,
           (symbol_ratio < {GOPHER_MAX_SYMBOL_RATIO}) AS ok_symbol_ratio,
           (alpha_ratio >= {GOPHER_MIN_ALPHA_RATIO}) AS ok_alpha_words,
           (n_required >= {GOPHER_MIN_REQUIRED}) AS ok_required_words,
           (bullet_ratio < {GOPHER_MAX_BULLET_RATIO}
            AND ellipsis_ratio < {GOPHER_MAX_ELLIPSIS_RATIO}) AS ok_lines,
           CAST((CASE WHEN n_words >= {GOPHER_MIN_WORDS}
                       AND n_words <= {GOPHER_MAX_WORDS} THEN 1 ELSE 0 END)
              + (CASE WHEN mwl >= {GOPHER_MIN_MWL}
                       AND mwl <= {GOPHER_MAX_MWL} THEN 1 ELSE 0 END)
              + (CASE WHEN symbol_ratio < {GOPHER_MAX_SYMBOL_RATIO} THEN 1 ELSE 0 END)
              + (CASE WHEN alpha_ratio >= {GOPHER_MIN_ALPHA_RATIO} THEN 1 ELSE 0 END)
              + (CASE WHEN n_required >= {GOPHER_MIN_REQUIRED} THEN 1 ELSE 0 END)
              + (CASE WHEN bullet_ratio < {GOPHER_MAX_BULLET_RATIO}
                       AND ellipsis_ratio < {GOPHER_MAX_ELLIPSIS_RATIO}
                  THEN 1 ELSE 0 END) AS BIGINT) AS n_rules_passed,
           (n_words >= {GOPHER_MIN_WORDS} AND n_words <= {GOPHER_MAX_WORDS}
            AND mwl >= {GOPHER_MIN_MWL} AND mwl <= {GOPHER_MAX_MWL}
            AND symbol_ratio < {GOPHER_MAX_SYMBOL_RATIO}
            AND alpha_ratio >= {GOPHER_MIN_ALPHA_RATIO}
            AND n_required >= {GOPHER_MIN_REQUIRED}
            AND bullet_ratio < {GOPHER_MAX_BULLET_RATIO}
            AND ellipsis_ratio < {GOPHER_MAX_ELLIPSIS_RATIO}) AS pass_gopher
    FROM (
      SELECT doc_id,
             CAST(len(w) AS BIGINT) AS n_words,
             CAST(length(regexp_replace(text, '\s', '', 'g')) AS DOUBLE)
               / len(w) AS mwl,
             CAST(length(regexp_replace(text, '[^#]', '', 'g'))
                  + (length(text) - length(replace(text, '...', ''))) // 3
                  AS DOUBLE) / len(w) AS symbol_ratio,
             CAST(len(list_filter(w, x -> regexp_matches(x, '[A-Za-z]')))
                  AS DOUBLE) / len(w) AS alpha_ratio,
             CAST(len(list_filter([{_G_REQ_SQL}],
                                  r -> list_contains(lw, r))) AS BIGINT)
               AS n_required,
             CAST(len(list_filter(ln, x -> starts_with(trim(x), '-')
                                           OR starts_with(trim(x), '*')))
                  AS DOUBLE) / len(ln) AS bullet_ratio,
             CAST(len(list_filter(ln, x -> suffix(x, '...')))
                  AS DOUBLE) / len(ln) AS ellipsis_ratio
      FROM (
        SELECT doc_id, text,
               (CASE WHEN trim(text) = '' THEN []::VARCHAR[] ELSE regexp_split_to_array(trim(text), '\s+') END) AS w,
               list_transform((CASE WHEN trim(text) = '' THEN []::VARCHAR[] ELSE regexp_split_to_array(trim(text), '\s+') END),
                              x -> lower(x)) AS lw,
               string_split(text, chr(10)) AS ln
        FROM documents
      )
    )
    """,
    description=f"Gopher rule-based quality filter (Rae et al. 2021,"
    f" Appendix A -- the rule set MassiveText shipped with, also the"
    f" baseline RefinedWeb/Dolma compare against): per-document booleans"
    f" for each published rule -- word count in"
    f" [{GOPHER_MIN_WORDS}, {GOPHER_MAX_WORDS:,}], mean word length in"
    f" [{GOPHER_MIN_MWL:g}, {GOPHER_MAX_MWL:g}], symbol(#/ellipsis)-to-word"
    f" ratio < {GOPHER_MAX_SYMBOL_RATIO}, >= {GOPHER_MIN_ALPHA_RATIO:.0%}"
    f" words containing a letter, >= {GOPHER_MIN_REQUIRED} of the"
    f" {len(GOPHER_REQUIRED)} required English function words, and the"
    f" bullet/ellipsis line-shape rules -- plus the conjunction"
    f" (pass_gopher). Entirely row-local JVM expressions (array filters,"
    f" regexp counts): zero shuffles, zero UDFs, linear at any corpus"
    f" size; ratios are single divisions of exact integers so both engines"
    f" agree bit-for-bit.",
)
def gopher_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    t = F.col("text")
    base = d.select(
        "doc_id",
        t.alias("text"),
        text.tokens(t).alias("w"),
        F.transform(text.tokens(t), lambda x: F.lower(x)).alias("lw"),
        F.split(t, "\n").alias("ln"),
    )
    # try_divide: a blank doc has 0 tokens, and under Spark's ANSI default a
    # bare `/` THROWS on the zero denominator where DuckDB yields NULL; the
    # NULL ratios then fail every >=-threshold rule exactly like the oracle
    n_words = F.size("w").cast("bigint")
    mwl = F.try_divide(
        F.length(F.regexp_replace(t, r"\s", "")).cast("double"), F.size("w")
    )
    symbol_ratio = F.try_divide(
        (
            F.length(F.regexp_replace(t, r"[^#]", ""))
            + F.floor((F.length(t) - F.length(F.replace(t, F.lit("...")))) / 3)
        ).cast("double"),
        F.size("w"),
    )
    alpha_ratio = F.try_divide(
        F.size(F.filter(F.col("w"), lambda x: x.rlike("[A-Za-z]"))).cast("double"),
        F.size("w"),
    )
    n_required = F.size(
        F.filter(
            F.array(*[F.lit(w) for w in GOPHER_REQUIRED]),
            lambda r: F.array_contains(F.col("lw"), r),
        )
    ).cast("bigint")
    bullet_ratio = (
        F.size(
            F.filter(
                F.col("ln"),
                lambda x: F.trim(x).startswith("-") | F.trim(x).startswith("*"),
            )
        ).cast("double")
        / F.size("ln")
    )
    ellipsis_ratio = (
        F.size(F.filter(F.col("ln"), lambda x: x.endswith("..."))).cast("double")
        / F.size("ln")
    )
    m = base.select(
        "doc_id",
        n_words.alias("n_words"),
        mwl.alias("mwl"),
        symbol_ratio.alias("symbol_ratio"),
        alpha_ratio.alias("alpha_ratio"),
        n_required.alias("n_required"),
        bullet_ratio.alias("bullet_ratio"),
        ellipsis_ratio.alias("ellipsis_ratio"),
    )
    oks = {
        "ok_word_count": (F.col("n_words") >= GOPHER_MIN_WORDS)
        & (F.col("n_words") <= GOPHER_MAX_WORDS),
        "ok_mean_word_len": (F.col("mwl") >= GOPHER_MIN_MWL)
        & (F.col("mwl") <= GOPHER_MAX_MWL),
        "ok_symbol_ratio": F.col("symbol_ratio") < GOPHER_MAX_SYMBOL_RATIO,
        "ok_alpha_words": F.col("alpha_ratio") >= GOPHER_MIN_ALPHA_RATIO,
        "ok_required_words": F.col("n_required") >= GOPHER_MIN_REQUIRED,
        "ok_lines": (F.col("bullet_ratio") < GOPHER_MAX_BULLET_RATIO)
        & (F.col("ellipsis_ratio") < GOPHER_MAX_ELLIPSIS_RATIO),
    }
    out = m.select(
        "doc_id",
        "n_words",
        *[expr.alias(name) for name, expr in oks.items()],
    )
    n_passed = None
    all_ok = None
    for name in oks:
        term = F.when(F.col(name), 1).otherwise(0)
        n_passed = term if n_passed is None else (n_passed + term)
        all_ok = F.col(name) if all_ok is None else (all_ok & F.col(name))
    return out.withColumn("n_rules_passed", n_passed.cast("bigint")).withColumn(
        "pass_gopher", all_ok
    )


# --- exact duplicated-span removal (substring-granular dedup) ---------------

SPAN_K = 8  # span granularity in tokens: any K-token window repeated anywhere
#             in the corpus is removed from every occurrence but the first

# The keeper tie-break is the packed occurrence code doc_id*2^32+pos in
# EXACT wide-integer arithmetic (Spark DECIMAL, DuckDB HUGEINT): a plain
# bigint would overflow once doc ids pass 2^31 (a ~100 TB corpus has ~10^11
# docs), and a (doc_id, pos) struct-min -- the other overflow-free encoding
# -- forces SortAggregate (struct min is not hash-aggregatable), turning the
# corpus-dominant census into a per-partition sort. min(DECIMAL) stays in
# HashAggregate with map-side partial aggregation.


def _span_tokens(d: DataFrame) -> DataFrame:
    return d.select("doc_id", F.split("text", " ").alias("tk")).withColumn(
        "n", F.size("tk")
    )


def _span_gram(tk, i):  # 60-bit md5-prefix hash of the K tokens starting at i
    return F.conv(
        F.substring(F.md5(F.concat_ws(" ", F.slice(tk, i + 1, SPAN_K))), 1, 15), 16, 10
    ).cast("long")


def _span_gram_rows(t: DataFrame) -> DataFrame:
    """(doc_id, pos, gh, code) occurrence rows from a tokenized frame; code
    is the exact wide-decimal packed occurrence id (see module comment)."""
    return t.select(
        "doc_id",
        F.posexplode(
            F.when(
                F.col("n") >= SPAN_K,
                F.transform(
                    F.sequence(F.lit(0), F.col("n") - SPAN_K),
                    lambda i: _span_gram(F.col("tk"), i),
                ),
            ).otherwise(F.array().cast("array<long>"))
        ).alias("pos", "gh"),
    ).withColumn(
        "code",
        F.col("doc_id").cast("decimal(28,0)") * 4294967296 + F.col("pos"),
    )


@register(
    "span_dedup_text",
    oracle=f"""
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    g AS (
      SELECT doc_id, i AS pos,
             CAST(doc_id AS HUGEINT) * 4294967296 + i AS code,
             CAST('0x' || substr(md5(array_to_string(
               tk[(i+1)::int:(i+{SPAN_K})::int], ' ')), 1, 15) AS BIGINT) AS gh
      FROM tk, unnest(CASE WHEN len(tk) >= {SPAN_K}
                           THEN range(0, len(tk) - {SPAN_K} + 1)
                           ELSE []::BIGINT[] END) AS u(i)
    ),
    dup AS (
      SELECT gh, MIN(code) AS keeper
      FROM g GROUP BY gh HAVING COUNT(*) >= 2
    ),
    st AS (
      SELECT g.doc_id, list(g.pos) AS starts
      FROM g JOIN dup USING (gh)
      WHERE g.code <> dup.keeper
      GROUP BY g.doc_id
    )
    SELECT doc_id, n_tokens,
           CAST(n_tokens - len(kept) AS BIGINT) AS n_removed,
           COALESCE(array_to_string(
             list_transform(kept, ti -> tk[(ti+1)::int]), ' '), '') AS clean_text
    FROM (
      SELECT t.doc_id, t.tk, len(t.tk) AS n_tokens,
             list_filter(range(0, len(t.tk)),
                         ti -> len(list_filter(COALESCE(st.starts, []::BIGINT[]),
                                               s -> s <= ti AND ti < s + {SPAN_K})) = 0)
               AS kept
      FROM tk t LEFT JOIN st USING (doc_id)
    )
    """,
    description=f"Exact duplicated-substring removal at {SPAN_K}-token span"
    " granularity (the shingle-approximated form of Lee et al. 2022,"
    " 'Deduplicating Training Data Makes Language Models Better',"
    " arXiv:2107.06499): every K-token window whose hash repeats anywhere in"
    " the corpus is deleted from every occurrence except the globally-first"
    " (min occurrence code doc_id*2^32+pos in exact wide-integer arithmetic,"
    " overflow-free at any doc count yet hash-aggregatable -- see module"
    " comment), and each document's text is rebuilt without the covered"
    " tokens. Unlike the pair detectors this is LINEAR in corpus size: gram"
    " rows are compact (doc_id, pos, 60-bit hash) triples, the duplicate"
    " census is one map-side-combined groupBy, the resolve join re-uses the"
    " same gh hash partitioning, and a gram repeated R times costs R join"
    " rows -- never R^2 pairs. Per-doc span lists come back as one"
    " collect_list bounded by tokens-per-doc, and the rebuild is row-local"
    " array math (filter + exists), zero UDFs.",
)
def span_dedup_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    return span_dedup_frame(d)


def span_dedup_frame(d: DataFrame) -> DataFrame:
    """Duplicated-span removal over a (doc_id, text) frame. Split out from
    the registered query so the planted-corpus unit tests drive the
    identical path."""
    t = _span_tokens(d)
    grams = _cached(_span_gram_rows(t))
    dup = (
        grams.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("c"), F.min("code").alias("keeper"))
        .filter(F.col("c") >= 2)
    )
    starts = (
        grams.join(dup, "gh")
        .filter(F.col("code") != F.col("keeper"))
        .groupBy("doc_id")
        .agg(F.collect_list("pos").alias("starts"))
    )
    ti_keeps = lambda x, ti: ~F.exists(
        F.col("starts"),
        lambda s: (s <= ti.cast("long")) & (ti.cast("long") < s + SPAN_K),
    )
    return (
        t.join(starts, "doc_id", "left")
        .withColumn("starts", F.coalesce(F.col("starts"), F.array().cast("array<int>")))
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            (F.col("n") - F.size(F.filter(F.col("tk"), ti_keeps)))
            .cast("bigint")
            .alias("n_removed"),
            F.concat_ws(" ", F.filter(F.col("tk"), ti_keeps)).alias("clean_text"),
        )
    )


# --- per-doc novelty vs the growing corpus ----------------------------------

NOVELTY_K = 5  # gram width for the novelty census


def _novelty_gram(tk, i):
    return F.conv(
        F.substring(F.md5(F.concat_ws(" ", F.slice(tk, i + 1, NOVELTY_K))), 1, 15), 16, 10
    ).cast("long")


@register(
    "doc_novelty_score",
    oracle=f"""
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    g AS (
      SELECT doc_id, unnest(list_distinct(CASE WHEN len(tk) >= {NOVELTY_K} THEN
        list_transform(range(0, len(tk) - {NOVELTY_K} + 1),
          i -> CAST('0x' || substr(md5(array_to_string(
                 tk[(i+1)::int:(i+{NOVELTY_K})::int], ' ')), 1, 15) AS BIGINT))
        ELSE []::BIGINT[] END)) AS gh
      FROM tk
    ),
    f AS (SELECT gh, MIN(doc_id) AS first_doc FROM g GROUP BY gh)
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS BIGINT)
             AS n_novel,
           CAST(SUM(CASE WHEN first_doc = doc_id THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS novelty
    FROM g JOIN f USING (gh) GROUP BY doc_id
    """,
    description=f"Per-document novelty score: the fraction of the document's"
    f" distinct {NOVELTY_K}-token grams whose globally FIRST occurrence (min"
    " doc_id over the corpus) is this document -- the data-selection signal"
    " for 'how much does this doc add that the corpus ingested before it"
    " did not already contain' (near-1 = fresh content, near-0 = recombined"
    " boilerplate; complements surprisal, which scores token rarity, not"
    " span-level reuse). Grams are deduplicated row-locally (array_distinct"
    " before the explode, so a doc-internal repeat costs one census row),"
    " the first-occurrence census is one map-side-combined groupBy on the"
    " 60-bit gram hash, and the resolve join reuses that same partitioning;"
    " the one float op is the final per-doc division, identical in both"
    " engines.",
)
def doc_novelty_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    return novelty_frame(d)


def novelty_frame(d: DataFrame) -> DataFrame:
    """First-occurrence novelty over a (doc_id, text) frame (unit-testable
    twin of the registered query)."""
    t = d.select("doc_id", F.split("text", " ").alias("tk")).withColumn(
        "n", F.size("tk")
    )
    # persisted: the gram frame feeds BOTH the first-occurrence census and
    # the resolve join, and the partial aggregation below the census's
    # exchange defeats ReuseExchange -- without the persist each consumer
    # re-scans the corpus and re-runs the per-gram md5 hashing (the same
    # cost span_dedup_frame's persisted grams avoid)
    grams = _cached(
        t.select(
            "doc_id",
            F.explode(
                F.array_distinct(
                    F.when(
                        F.col("n") >= NOVELTY_K,
                        F.transform(
                            F.sequence(F.lit(0), F.col("n") - NOVELTY_K),
                            lambda i: _novelty_gram(F.col("tk"), i),
                        ),
                    ).otherwise(F.array().cast("array<long>"))
                )
            ).alias("gh"),
        )
    )
    first = grams.groupBy("gh").agg(F.min("doc_id").alias("first_doc"))
    novel = F.when(F.col("first_doc") == F.col("doc_id"), 1).otherwise(0)
    return (
        grams.join(first, "gh")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_grams"),
            F.sum(novel).alias("n_novel"),
            (F.sum(novel).cast("double") / F.count(F.lit(1))).alias("novelty"),
        )
    )


# --- classifier-based quality/domain scoring (multinomial Naive Bayes) ------

# Quarter-bit integer log2: floor(4*log2(x)) computed with pure integer ops
# (bit-length + shift + one 4th power on a 15-bit mantissa), so both engines
# produce the IDENTICAL score for the same counts -- the same determinism
# rule as the whole-bit LM surprisal, at 4x the resolution. The mantissa
# truncation (drop bits below the top 15) perturbs log2 by < 2^-14, and both
# engines truncate identically, so there is no cross-engine drift by
# construction.
NB_MANTISSA_BITS = 15


def _qlog4(x: str, shift: str) -> str:
    """floor(4*log2(x)) for x >= 1 as a dialect-shared SQL expression.
    `shift` is the dialect's right-shift: 'duck' -> a >> b, 'spark' ->
    shiftright(a, b)."""
    m = NB_MANTISSA_BITS
    sh = (
        f"(({x}) >> (length(bin({x})) - {m}))"
        if shift == "duck"
        else f"shiftright({x}, length(bin({x})) - {m})"
    )
    y4 = f"({sh}) * ({sh}) * ({sh}) * ({sh})"
    return (
        f"(CASE WHEN length(bin({x})) <= {m}"
        f" THEN length(bin(({x})*({x})*({x})*({x}))) - 1"
        f" ELSE 4 * (length(bin({x})) - {m}) + length(bin({y4})) - 1 END)"
    )


# the weak training label for the registered query: the English slice stands
# in for the curated target domain (the GPT-3 quality-filter architecture:
# positive = docs from the trusted corpus, negative = everything else; the
# classifier then scores the whole corpus by log-odds of being target-like)
_NB_LABEL_SPARK = "lang = 'en'"
_NB_LABEL_DUCK = "lang = 'en'"


def _nb_score_sql(q) -> str:
    """Per-doc quarter-bit log-odds: sum over token occurrences of
    qlog4(c1+1)-qlog4(c0+1), plus the class-mass normalizer per token and
    the class prior once."""
    return (
        f"SUM(tf * ({q('c1 + 1')} - {q('c0 + 1')}))"
        f" + SUM(tf) * ({q('n0 + v')} - {q('n1 + v')})"
        f" + ({q('nd1')} - {q('nd0')})"
    )


_QD = lambda x: _qlog4(x, "duck")
_QS = lambda x: _qlog4(x, "spark")


@register(
    "nb_quality_score",
    oracle=rf"""
    WITH lab AS (
      SELECT doc_id, ({_NB_LABEL_DUCK}) AS lbl, string_split(text, ' ') AS tk
      FROM documents
    ),
    dtf AS (
      SELECT doc_id, lbl, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, lbl, unnest(tk) AS tok FROM lab)
      GROUP BY doc_id, lbl, tok
    ),
    vocab AS (
      SELECT tok,
             CAST(SUM(CASE WHEN lbl THEN tf ELSE 0 END) AS BIGINT) AS c1,
             CAST(SUM(CASE WHEN NOT lbl THEN tf ELSE 0 END) AS BIGINT) AS c0
      FROM dtf GROUP BY tok
    ),
    scal AS (
      SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c0) AS BIGINT) AS n0,
             CAST(COUNT(*) AS BIGINT) AS v FROM vocab
    ),
    dc AS (
      SELECT CAST(SUM(CASE WHEN lbl THEN 1 ELSE 0 END) AS BIGINT) AS nd1,
             CAST(SUM(CASE WHEN NOT lbl THEN 1 ELSE 0 END) AS BIGINT) AS nd0
      FROM lab
    )
    SELECT doc_id, lbl AS weak_label,
           CAST(SUM(tf) AS BIGINT) AS n_tokens,
           CAST({_nb_score_sql(_QD)} AS BIGINT) AS nb_logodds_qbits,
           ({_nb_score_sql(_QD)}) > 0 AS pred_positive
    FROM dtf JOIN vocab USING (tok) CROSS JOIN scal CROSS JOIN dc
    GROUP BY doc_id, lbl, n0, n1, v, nd1, nd0
    """,
    description="Classifier-based quality/domain filtering (the GPT-3 /"
    " CCNet / FineWeb-Edu architecture: fit a cheap classifier on a weak"
    " 'target domain' label, score every document by log-odds, filter or"
    " reweight on the score): a multinomial Naive Bayes with Laplace"
    " smoothing is FIT on the corpus in one aggregation pass (per-token"
    " class counts) and APPLIED in one join -- no driver-side training"
    " loop, no iteration. Log-probabilities are quarter-bit integer"
    " quantized (floor(4*log2 x) via bit-length + 15-bit-mantissa 4th"
    " power, exact identical integer ops in both engines -- no"
    " cross-engine float-log drift; planted-signal correctness is"
    " unit-tested in tests/test_corpus_ops.py). Scale shape: doc-side term"
    " frequencies aggregate before the vocabulary join (map-side combine"
    " on (doc, tok)), the per-class count table is |vocab|-sized, class"
    " totals and priors ride one broadcast scalar row, and the scoring"
    " join is tok-keyed with the same Zipf exposure as the stamped LM"
    " surprisal family. On this synthetic corpus the label carries almost"
    " no token signal, so scores sit near the prior -- the registered"
    " query proves mechanics and engine parity; accuracy is asserted on"
    " the planted-signal fixture.",
)
def nb_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    docs = d.select(
        "doc_id", F.expr(_NB_LABEL_SPARK).alias("lbl"), F.split("text", " ").alias("tk")
    )
    return nb_score_frame(docs)


def nb_score_frame(docs: DataFrame) -> DataFrame:
    """Fit-and-score multinomial NB over a (doc_id, lbl, tk:array<string>)
    frame. Split out from the registered query so the planted-signal unit
    test can drive the identical path on a constructed corpus."""
    dtf = _cached(
        docs.select("doc_id", "lbl", F.explode("tk").alias("tok"))
        .groupBy("doc_id", "lbl", "tok")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    vocab = _cached(
        dtf.groupBy("tok").agg(
            F.sum(F.when(F.col("lbl"), F.col("tf")).otherwise(0)).alias("c1"),
            F.sum(F.when(~F.col("lbl"), F.col("tf")).otherwise(0)).alias("c0"),
        )
    )
    scal = (
        vocab.agg(
            F.sum("c1").alias("n1"),
            F.sum("c0").alias("n0"),
            F.count(F.lit(1)).alias("v"),
        )
        .crossJoin(
            docs.agg(
                F.sum(F.when(F.col("lbl"), 1).otherwise(0)).alias("nd1"),
                F.sum(F.when(~F.col("lbl"), 1).otherwise(0)).alias("nd0"),
            )
        )
    )
    # per-token quarter-bit weight; the tok join is frequency-split exactly
    # like the LM surprisal family (Zipf head broadcast, tail shuffle)
    w = vocab.withColumn("__c", F.col("c1") + F.col("c0"))
    tot = w.agg(F.sum("__c").alias("__n"))
    w = w.crossJoin(F.broadcast(tot)).withColumn(
        "w", F.expr(f"{_QS('c1 + 1')} - {_QS('c0 + 1')}")
    )
    head = w.filter(F.col("__c") * LM_HEAD_DENOM >= F.col("__n")).select("tok", "w")
    tail = w.filter(F.col("__c") * LM_HEAD_DENOM < F.col("__n")).select("tok", "w")
    scored = dtf.join(F.broadcast(head), "tok").unionByName(dtf.join(tail, "tok"))
    per_doc = scored.groupBy("doc_id", "lbl").agg(
        F.sum("tf").alias("n_tokens"),
        F.sum(F.col("tf") * F.col("w")).alias("tok_qbits"),
    )
    mass = F.expr(f"{_QS('n0 + v')} - {_QS('n1 + v')}")
    prior = F.expr(f"{_QS('nd1')} - {_QS('nd0')}")
    score = F.col("tok_qbits") + F.col("n_tokens") * mass + prior
    return per_doc.crossJoin(F.broadcast(scal)).select(
        "doc_id",
        F.col("lbl").alias("weak_label"),
        "n_tokens",
        score.cast("bigint").alias("nb_logodds_qbits"),
        (score > 0).alias("pred_positive"),
    )


# --- incremental (batch-vs-index) span dedup --------------------------------

# Deterministic stand-in for "today's ingest batch": every 5th doc is new,
# the rest are the already-indexed corpus. In production the index side is
# the persisted gram census of the existing corpus; only the batch is
# scanned and hashed at ingest time.
SPAN_BATCH_MOD = 5


@register(
    "span_dedup_incremental",
    oracle=f"""
    WITH tk AS (SELECT doc_id, string_split(text, ' ') AS tk FROM documents),
    g AS (
      SELECT doc_id, i AS pos,
             CAST(doc_id AS HUGEINT) * 4294967296 + i AS code,
             CAST('0x' || substr(md5(array_to_string(
               tk[(i+1)::int:(i+{SPAN_K})::int], ' ')), 1, 15) AS BIGINT) AS gh
      FROM tk, unnest(CASE WHEN len(tk) >= {SPAN_K}
                           THEN range(0, len(tk) - {SPAN_K} + 1)
                           ELSE []::BIGINT[] END) AS u(i)
    ),
    bg AS (SELECT * FROM g WHERE doc_id % {SPAN_BATCH_MOD} = 0),
    idx AS (SELECT DISTINCT gh FROM g WHERE doc_id % {SPAN_BATCH_MOD} <> 0),
    hit AS (SELECT bg.doc_id, bg.pos FROM bg JOIN idx USING (gh)),
    nonidx AS (SELECT * FROM bg ANTI JOIN idx USING (gh)),
    bdup AS (
      SELECT gh, MIN(code) AS keeper FROM nonidx
      GROUP BY gh HAVING COUNT(*) >= 2
    ),
    bstart AS (
      SELECT nonidx.doc_id, nonidx.pos FROM nonidx JOIN bdup USING (gh)
      WHERE nonidx.code <> bdup.keeper
    ),
    st AS (
      SELECT doc_id, list(pos) AS starts
      FROM (SELECT * FROM hit UNION ALL SELECT * FROM bstart) GROUP BY doc_id
    )
    SELECT doc_id, n_tokens,
           CAST(n_tokens - len(kept) AS BIGINT) AS n_removed,
           COALESCE(array_to_string(
             list_transform(kept, ti -> tk[(ti+1)::int]), ' '), '') AS clean_text
    FROM (
      SELECT t.doc_id, t.tk, len(t.tk) AS n_tokens,
             list_filter(range(0, len(t.tk)),
                         ti -> len(list_filter(COALESCE(st.starts, []::BIGINT[]),
                                               s -> s <= ti AND ti < s + {SPAN_K})) = 0)
               AS kept
      FROM tk t LEFT JOIN st USING (doc_id)
      WHERE t.doc_id % {SPAN_BATCH_MOD} = 0
    )
    """,
    description="Daily-ingest form of exact span dedup: only the NEW batch"
    f" (doc_id % {SPAN_BATCH_MOD} = 0 stands in for today's ingest) is"
    " hashed and rewritten; a batch span is removed when its gram exists in"
    " the indexed corpus census (all batch occurrences go -- the keeper"
    " lives in the index) or repeats within the batch (all but the batch"
    " keeper go). Ingest-time cost is |batch| gram rows probing a"
    " gh-partitioned census join plus a |batch|-sized internal census --"
    " the full corpus is never re-hashed, the same incremental contract as"
    " minhash_incremental_pairs. The in-plan index census here derives from"
    " the same table only because the driver provides one corpus; in"
    " production it is the persisted census, appended with the batch's"
    " first occurrences after each ingest.",
)
def span_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    return span_dedup_incremental_frame(d)


def span_dedup_step(batch: DataFrame, idx: DataFrame | None) -> tuple[DataFrame, DataFrame]:
    """One streaming-ingest step of incremental span dedup: rewrite the
    (doc_id, text) `batch` against the accumulated gram census `idx` (a
    single-`gh`-column frame; None = first ingest, empty census) and return
    (rebuilt_batch, distinct_ghs_to_append). A batch span is removed when
    its gram is already in the census (the keeper lives in an earlier
    ingest) or repeats within the batch (all but the batch's min-code
    occurrence go) -- the span_dedup_incremental_frame rule with the index
    side swapped from an in-plan derivation to the caller's persisted
    census. Looping this over ANY ascending-doc_id batch split reproduces
    the one-shot span_dedup_frame of the union exactly (the global min-code
    keeper is always the earliest ingest's occurrence), proven in
    tests/test_streaming_dedup.py.

    CACHE CONTRACT: the step persists the batch's gram frame (both outputs
    share it lazily), so a long-running per-micro-batch caller MUST call
    dedup.release_caches() after materializing both returned frames --
    otherwise each batch leaves a dead persisted frame behind and executor
    storage fills over thousands of batches (the same hygiene call the
    example pipeline makes between steps)."""
    t = _span_tokens(batch)
    grams = _cached(_span_gram_rows(t))
    if idx is None:
        idx = batch.sparkSession.createDataFrame([], "gh long")
    # the census accumulates with the CORPUS, not the batch: pin it away
    # from a broadcast build (r14 x100 audit: the static planner broadcast
    # the census side of both the semi and anti join -- the same
    # estimate-undershoot failure _corpus_side documents)
    idx = _corpus_side(idx)
    hit = grams.join(idx, "gh", "left_semi").select("doc_id", "pos")
    nonidx = grams.join(idx, "gh", "left_anti")
    bdup = (
        nonidx.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("c"), F.min("code").alias("keeper"))
        .filter(F.col("c") >= 2)
    )
    bstart = (
        nonidx.join(bdup, "gh")
        .filter(F.col("code") != F.col("keeper"))
        .select("doc_id", "pos")
    )
    starts = (
        hit.unionByName(bstart)
        .groupBy("doc_id")
        .agg(F.collect_list("pos").alias("starts"))
    )
    ti_keeps = lambda x, ti: ~F.exists(  # noqa: E731
        F.col("starts"),
        lambda s: (s <= ti.cast("long")) & (ti.cast("long") < s + SPAN_K),
    )
    rebuilt = (
        t.join(starts, "doc_id", "left")
        .withColumn("starts", F.coalesce(F.col("starts"), F.array().cast("array<int>")))
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            (F.col("n") - F.size(F.filter(F.col("tk"), ti_keeps)))
            .cast("bigint")
            .alias("n_removed"),
            F.concat_ws(" ", F.filter(F.col("tk"), ti_keeps)).alias("clean_text"),
        )
    )
    return rebuilt, grams.select("gh").distinct()


def span_dedup_incremental_frame(d: DataFrame) -> DataFrame:
    """Batch-vs-index span dedup over a (doc_id, text) frame (unit-testable
    twin of the registered query; batch membership is doc_id % SPAN_BATCH_MOD)."""
    t = _span_tokens(d)
    is_batch = F.col("doc_id") % SPAN_BATCH_MOD == 0
    grams = _cached(_span_gram_rows(t))
    batch = grams.filter(is_batch)
    # corpus-sized census: never a broadcast build (r14 x100 audit caught
    # the static planner broadcasting it into the semi AND anti joins)
    idx = _corpus_side(grams.filter(~is_batch).select("gh").distinct())
    hit = batch.join(idx, "gh", "left_semi").select("doc_id", "pos")
    nonidx = batch.join(idx, "gh", "left_anti")
    bdup = (
        nonidx.groupBy("gh")
        .agg(F.count(F.lit(1)).alias("c"), F.min("code").alias("keeper"))
        .filter(F.col("c") >= 2)
    )
    bstart = (
        nonidx.join(bdup, "gh")
        .filter(F.col("code") != F.col("keeper"))
        .select("doc_id", "pos")
    )
    starts = (
        hit.unionByName(bstart)
        .groupBy("doc_id")
        .agg(F.collect_list("pos").alias("starts"))
    )
    ti_keeps = lambda x, ti: ~F.exists(
        F.col("starts"),
        lambda s: (s <= ti.cast("long")) & (ti.cast("long") < s + SPAN_K),
    )
    return (
        t.filter(is_batch)
        .join(starts, "doc_id", "left")
        .withColumn("starts", F.coalesce(F.col("starts"), F.array().cast("array<int>")))
        .select(
            "doc_id",
            F.col("n").alias("n_tokens"),
            (F.col("n") - F.size(F.filter(F.col("tk"), ti_keeps)))
            .cast("bigint")
            .alias("n_removed"),
            F.concat_ws(" ", F.filter(F.col("tk"), ti_keeps)).alias("clean_text"),
        )
    )


# --- tokenizer induction: first BPE merge iteration -------------------------

BPE_TOP_MERGES = 20


@register(
    "bpe_merge_candidates",
    oracle=f"""
    WITH vocab AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY tok
    ),
    pairs AS (
      SELECT substr(tok, i::int, 2) AS pair, CAST(SUM(c) AS BIGINT) AS pair_count
      FROM vocab, unnest(CASE WHEN length(tok) >= 2
                              THEN range(1, length(tok))
                              ELSE []::BIGINT[] END) AS u(i)
      GROUP BY substr(tok, i::int, 2)
    )
    SELECT pair, pair_count FROM pairs
    ORDER BY pair_count DESC, pair LIMIT {BPE_TOP_MERGES}
    """,
    description="Tokenizer induction: the first BPE merge iteration"
    " (Sennrich et al. 2016) -- adjacent symbol-pair frequencies over the"
    " word vocabulary weighted by corpus word counts, top candidates by"
    f" count (top {BPE_TOP_MERGES}, count-then-pair total order so the cut"
    " is deterministic). Scale shape: the corpus collapses to a"
    " |vocabulary|-sized (word, count) rollup FIRST (one map-side-combined"
    " shuffle -- the corpus is never re-scanned per pair), pair expansion"
    " is row-local over vocab entries, and the global top-k plans as"
    " TakeOrderedAndProject, never a global sort. Character-level sibling"
    " of collocation_pmi's word-level pair mining.",
)
def bpe_merge_candidates(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    vocab = (
        d.select(F.explode(F.split("text", " ")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    pairs = vocab.select(
        F.explode(
            F.when(
                F.length("tok") >= 2,
                F.expr("transform(sequence(1, length(tok) - 1), i -> substring(tok, i, 2))"),
            ).otherwise(F.array().cast("array<string>"))
        ).alias("pair"),
        "c",
    )
    return (
        pairs.groupBy("pair")
        .agg(F.sum("c").alias("pair_count"))
        .orderBy(F.col("pair_count").desc(), "pair")
        .limit(BPE_TOP_MERGES)
    )


# --- tokenizer application: BPE-encode the corpus ---------------------------

# Merge-table depth for the registered encode query. Each merge is one
# vocab-sized round (pair census -> argmax -> row-local fold), so the corpus
# cost is independent of this constant; a production tokenizer runs the same
# loop to 32k-100k merges over the SAME vocab-collapsed census.
BPE_ENCODE_MERGES = 6

# Symbol-string delimiter for the fold. Corpus tokens that CONTAIN the
# delimiter are excluded from encoding on BOTH engines (word-soup corpora
# have none; a production deployment picks an unused control char, e.g.
# U+001F, exactly as HF tokenizers reserve boundary markers).
_BPE_SEP = "|"

# Loop-frame sizing for the merge loop (r15 optimization round): the vocab
# census is vocab-sized BY CONSTRUCTION -- orders of magnitude below the
# corpus -- yet it inherits the corpus census's shuffle partitioning, so
# every merge round used to schedule a full width of near-empty tasks
# (measured at sf0.1: a 31-row vocab spread over 32 partitions cost
# 0.4-1.3 s PER ROUND in pure stage overhead). The loop now right-sizes the
# frame once from its MEASURED row count: ~128k vocab rows per partition
# (a few MB of (tok, c, sym) strings), floor 1 -- scale-adaptive, not a
# local[32] constant: a 100M-row production vocab still gets ~800-way
# parallelism, while any bench-scale vocab collapses to one task per round.
_BPE_VOCAB_ROWS_PER_PART = 131072


def _bpe_apply_merge(sym: F.Column, a: str, b: str) -> F.Column:
    """Greedy left-to-right application of ONE merge (a, b) to a delimited
    symbol string ('h|e|l|l|o' under merge (l, l) -> 'h|e|ll|o'): a single
    row-local fold. The accumulator is itself the delimited string, so
    "merge" is plain concat without the separator (the merged symbol IS
    a||b) -- identical arithmetic on both engines, including the a == b run
    semantics ('a|a|a|a|a' -> 'aa|aa|a', the Sennrich scan order)."""
    la = len(a)

    def fold(acc: F.Column, x: F.Column) -> F.Column:
        last_is_a = (
            F.substr(acc, F.length(acc) - F.lit(la - 1), F.lit(la)) == F.lit(a)
        ) & (
            (F.length(acc) == la)
            | (F.substr(acc, F.length(acc) - F.lit(la), F.lit(1)) == F.lit(_BPE_SEP))
        )
        return (
            F.when(acc == "", x)
            .when((x == F.lit(b)) & last_is_a, F.concat(acc, x))
            .otherwise(F.concat(acc, F.lit(_BPE_SEP), x))
        )

    return F.aggregate(F.split(sym, r"\|"), F.lit(""), fold)


def bpe_learn_merges(vocab: DataFrame, n_merges: int) -> tuple[DataFrame, list[tuple[str, str]]]:
    """Learn up to `n_merges` BPE merges (Sennrich et al. 2016) over a
    (tok, c, sym) vocab frame and return (encoded vocab, merge table).

    Each round: adjacent symbol-pair census weighted by word count ->
    argmax (count DESC, then pair, a deterministic total order) -> apply
    the merge to every vocab word with the row-local fold above. The ONLY
    driver-side data per round is the single argmax row (the Lloyd /
    connected-components precedent); the corpus itself is never touched --
    rounds operate on the vocab census exclusively.

    Loop-frame discipline (r15, tightened r16): the vocab is
    localCheckpoint-ed EVERY round, not persisted -- each round's census
    then reads a flat RDD scan instead of a k-deep stack of cached fold
    plans, so Catalyst analysis cost per round is O(1) in merge depth (the
    fold expression is large; re-analyzing k copies of it dominated round
    latency). Materialization count is unchanged. The frame is also
    coalesced once to ~_BPE_VOCAB_ROWS_PER_PART rows per partition
    (measured, not assumed -- the checkpoint makes the count a metadata
    read).

    r16: each round is now exactly ONE job (statusTracker-verified
    3 -> 1). The per-round checkpoint is LAZY (eager=False): the fold is
    shuffle-free, so marking it checkpoints nothing at call time, and the
    census job -- whose shuffle-map side necessarily computes every fold
    partition -- materializes it as a side effect, replacing the separate
    eager-materialization job. And the census runs with AQE temporarily
    off (restored in a finally, the logreg-fit rule): a fixed-shape
    vocab-sized aggregate gains nothing from adaptive re-planning but
    paid a stage-materialization job round-trip per round at any merge
    depth -- 32k-100k rounds at production depth. The one-time
    corpus-sized census up front keeps AQE (its shuffles are the ones
    adaptive sizing exists for). Cluster-mode caveat (ADVICE r15):
    localCheckpoint truncates lineage to executor-local storage, so an
    executor lost mid-loop is unrecoverable at real merge depth --
    deployments running to 32k+ merges should swap the per-round
    localCheckpoint for periodic reliable checkpoint() at the same seam."""
    merges: list[tuple[str, str]] = []
    # one checkpoint up front: materializes the census, truncates its
    # lineage, and makes the row count cheap for the partition sizing below
    cur = vocab.localCheckpoint(eager=True)
    n_vocab = cur.count()
    target = max(1, -(-n_vocab // _BPE_VOCAB_ROWS_PER_PART))
    if target < cur.rdd.getNumPartitions():
        # narrow post-checkpoint coalesce; every later checkpoint inherits it
        cur = cur.coalesce(target)
    spark = vocab.sparkSession
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    # with AQE off the census shuffle would run the static session width
    # per round; size it to the SAME measured vocab-derived target as the
    # frame itself (scale-adaptive, restored below). Measured at sf0.1:
    # 201 -> 15 tasks across a 6-merge loop, ~-0.3 s warm.
    spark.conf.set("spark.sql.shuffle.partitions", str(target))
    try:
        for _ in range(n_merges):
            s = F.split("sym", r"\|")
            best = (
                cur.withColumn("s", s)
                .filter(F.size("s") >= 2)
                .select(
                    F.explode(
                        F.expr(
                            "transform(sequence(0, size(s) - 2),"
                            " j -> struct(s[j] AS a, s[j + 1] AS b))"
                        )
                    ).alias("p"),
                    "c",
                )
                .groupBy("p.a", "p.b")
                .agg(F.sum("c").alias("pc"))
                .orderBy(F.col("pc").desc(), "a", "b")
                .limit(1)
                .collect()
            )
            if not best:  # every word is a single symbol already
                break
            a, b = best[0]["a"], best[0]["b"]
            merges.append((a, b))
            folded = cur.select(
                "tok", "c", _bpe_apply_merge(F.col("sym"), a, b).alias("sym")
            )
            # flatten every round: the next census's job materializes this
            # (lazy) checkpoint while computing its shuffle-map side, and
            # the fold lineage is dropped so the next round analyzes a
            # constant-size plan
            cur = folded.localCheckpoint(eager=False)
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
        spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
    return cur, merges


def bpe_encode_frame(d: DataFrame, n_merges: int = BPE_ENCODE_MERGES) -> DataFrame:
    """Corpus-wide BPE encode over (doc_id, text): learn `n_merges` merges
    from the vocab census, apply them to the vocab, then join the encoding
    back to each document's term frequencies (unit-testable twin of the
    registered query)."""
    toks = d.select("doc_id", F.explode(F.split("text", " ")).alias("tok")).filter(
        (F.length("tok") >= 1) & ~F.col("tok").contains(_BPE_SEP)
    )
    dtf = _cached(toks.groupBy("doc_id", "tok").agg(F.count(F.lit(1)).alias("tf")))
    vocab = dtf.groupBy("tok").agg(F.sum("tf").alias("c")).select(
        "tok", "c", F.array_join(F.split("tok", ""), _BPE_SEP).alias("sym")
    )
    enc_vocab, _ = bpe_learn_merges(vocab, n_merges)
    # symbol count without re-splitting: the fold only ever inserts the
    # separator, so n_sym = len(sym) - len(tok) + 1
    enc = enc_vocab.select(
        "tok",
        "c",
        (F.length("sym") - F.length("tok") + 1).cast("bigint").alias("n_sym"),
    )
    # Zipf-skew-proof application join (the LM-surprisal machinery): the
    # bounded head (>= 1/LM_HEAD_DENOM of token mass, <= LM_HEAD_DENOM rows
    # by construction) broadcasts; the long tail takes the shuffle join
    total = enc.agg(F.sum(F.col("c")).alias("__n"))
    w = enc.crossJoin(F.broadcast(total))
    head = w.filter(F.col("c") * LM_HEAD_DENOM >= F.col("__n")).select("tok", "n_sym")
    tail = w.filter(F.col("c") * LM_HEAD_DENOM < F.col("__n")).select("tok", "n_sym")
    scored = dtf.join(F.broadcast(head), "tok").unionByName(dtf.join(tail, "tok"))
    return scored.groupBy("doc_id").agg(
        F.sum("tf").cast("bigint").alias("n_words"),
        F.sum(F.col("tf") * F.length("tok")).cast("bigint").alias("n_chars"),
        F.sum(F.col("tf") * F.col("n_sym")).cast("bigint").alias("n_bpe_tokens"),
    )


def _bpe_encode_oracle_cte(n_merges: int) -> str:
    """The unrolled merge WITH-chain (w -> v0 -> p{i}/m{i}/v{i+1} -> enc ->
    dtf), shared by the per-doc encode oracle and the per-lang fertility
    oracle. Iteration i computes the pair census over v{i}, picks the
    argmax merge m{i} (count DESC, pair ASC), and folds it into v{i+1}
    with the SAME accumulator-string reduce the Spark side runs. LEFT JOIN
    ON TRUE keeps the chain total when no pair exists (all-single-symbol
    vocab), mirroring the builder's early break."""
    parts = [
        f"""
    WITH w AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      WHERE length(tok) >= 1 AND NOT contains(tok, '{_BPE_SEP}')
      GROUP BY tok
    ),
    v0 AS (
      SELECT tok, c,
             -- (?s): RE2's '.' must match newline too, or a token like
             -- chr(10)||chr(10) never gets delimited (planted-sweep edge)
             substr(regexp_replace(tok, '(?s)(.)', '\\1{_BPE_SEP}', 'g'),
                    1, 2 * length(tok) - 1) AS sym
      FROM w
    )"""
    ]
    for i in range(n_merges):
        parts.append(f""",
    p{i} AS (
      SELECT s[j] AS a, s[j + 1] AS b, SUM(c) AS pc
      FROM (SELECT string_split(sym, '{_BPE_SEP}') AS s, c FROM v{i})
      CROSS JOIN unnest(range(1, len(s))) AS u(j)
      GROUP BY s[j], s[j + 1]
    ),
    m{i} AS (SELECT a, b FROM p{i} ORDER BY pc DESC, a ASC, b ASC LIMIT 1),
    v{i + 1} AS (
      SELECT tok, c,
        CASE WHEN m.a IS NULL THEN sym
        ELSE list_reduce(string_split(sym, '{_BPE_SEP}'), (acc, x) ->
          CASE WHEN x = m.b
                AND substr(acc, length(acc) - length(m.a) + 1) = m.a
                AND (length(acc) = length(m.a)
                     OR substr(acc, length(acc) - length(m.a), 1) = '{_BPE_SEP}')
          THEN acc || x ELSE acc || '{_BPE_SEP}' || x END)
        END AS sym
      FROM v{i} LEFT JOIN m{i} AS m ON TRUE
    )""")
    parts.append(f""",
    enc AS (
      SELECT tok, CAST(length(sym) - length(tok) + 1 AS BIGINT) AS n_sym
      FROM v{n_merges}
    ),
    dtf AS (
      SELECT doc_id, tok, CAST(COUNT(*) AS BIGINT) AS tf
      FROM (SELECT doc_id, unnest(string_split(text, ' ')) AS tok FROM documents)
      WHERE length(tok) >= 1 AND NOT contains(tok, '{_BPE_SEP}')
      GROUP BY doc_id, tok
    )""")
    return "".join(parts)


def _bpe_encode_oracle(n_merges: int) -> str:
    """Per-doc encode rollup over the shared merge-chain CTE."""
    return _bpe_encode_oracle_cte(n_merges) + """
    SELECT doc_id,
           CAST(SUM(tf) AS BIGINT) AS n_words,
           CAST(SUM(tf * length(tok)) AS BIGINT) AS n_chars,
           CAST(SUM(tf * n_sym) AS BIGINT) AS n_bpe_tokens
    FROM dtf JOIN enc USING (tok)
    GROUP BY doc_id"""


def _bpe_fertility_oracle(n_merges: int) -> str:
    """Per-language fertility report over the same merge-chain CTE. The two
    ratio columns are floor-scaled to integer milli-units: 1000*a/b on
    BIGINT sums is exact in IEEE double below 2^53, so floor() picks the
    identical integer on both engines (the repo's float-parity idiom)."""
    return _bpe_encode_oracle_cte(n_merges) + """,
    perdoc AS (
      SELECT doc_id,
             SUM(tf) AS n_words,
             SUM(tf * length(tok)) AS n_chars,
             SUM(tf * n_sym) AS n_bpe
      FROM dtf JOIN enc USING (tok)
      GROUP BY doc_id
    )
    SELECT d.lang,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(p.n_words) AS BIGINT) AS n_words,
           CAST(SUM(p.n_bpe) AS BIGINT) AS n_bpe_tokens,
           CAST(floor(1000.0 * SUM(p.n_bpe) / SUM(p.n_words)) AS BIGINT)
             AS fertility_milli,
           CAST(floor(1000.0 * SUM(p.n_chars) / SUM(p.n_bpe)) AS BIGINT)
             AS chars_per_token_milli
    FROM perdoc p JOIN documents d USING (doc_id)
    GROUP BY d.lang"""


@register(
    "bpe_encode_tokens",
    oracle=_bpe_encode_oracle(BPE_ENCODE_MERGES),
    description="Tokenizer APPLICATION: learn a BPE merge table"
    f" ({BPE_ENCODE_MERGES} merges, Sennrich et al. 2016) over the"
    " vocab-collapsed word census and encode every document with it --"
    " the step a real pipeline runs between tokenizer induction"
    " (bpe_merge_candidates is the first iteration of this exact loop) and"
    " sequence packing, which today consumes whitespace token counts."
    " Per-doc output: word/char counts and the post-merge BPE token count."
    " Scale shape: the corpus collapses ONCE to a |vocabulary|-sized"
    " (word, count) census (one map-side-combined shuffle); each merge"
    " round is a vocab-sized pair census + a ONE-ROW argmax collect (the"
    " Lloyd/connected-components precedent) + a row-local fold; the final"
    " encode join rides the LM family's bounded-head broadcast + tail"
    " shuffle split, so the Zipf head never skews a shuffle join. The"
    " corpus is scanned once for the census and once for the per-doc"
    " rollup, independent of merge count.",
)
def bpe_encode_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    return bpe_encode_frame(d)


@register(
    "tokenizer_fertility_by_lang",
    oracle=_bpe_fertility_oracle(BPE_ENCODE_MERGES),
    description="Tokenizer SELECTION report: per-language BPE fertility"
    " (BPE tokens per whitespace word) and compression (chars per BPE"
    " token), the two numbers a pipeline compares across candidate"
    " tokenizers before committing a vocab -- high fertility on a language"
    " means its text fragments into more pieces per word, inflating"
    " training cost for the same corpus. Composes the bpe_encode_tokens"
    " per-doc encode (same learned merge table) with a lang-keyed grouped"
    " aggregation; the ratio columns are floor-scaled integer milli-units"
    " (exact on both engines below 2^53). Scale shape: inherits the encode"
    " census posture (corpus scanned twice, vocab-bound learn rounds) plus"
    " ONE extra broadcast-sized join of per-doc rollups to (doc_id, lang)"
    " and a |languages|-row final aggregate.",
)
def tokenizer_fertility_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    return fertility_frame(d)


def fertility_frame(d: DataFrame, n_merges: int = BPE_ENCODE_MERGES) -> DataFrame:
    """Per-lang fertility/compression over (doc_id, text, lang) -- the
    unit-testable twin of the registered query."""
    enc = bpe_encode_frame(d, n_merges)
    joined = enc.join(d.select("doc_id", "lang"), "doc_id")
    return joined.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_words").cast("bigint").alias("n_words"),
        F.sum("n_bpe_tokens").cast("bigint").alias("n_bpe_tokens"),
        F.floor(F.lit(1000.0) * F.sum("n_bpe_tokens") / F.sum("n_words"))
        .cast("bigint").alias("fertility_milli"),
        F.floor(F.lit(1000.0) * F.sum("n_chars") / F.sum("n_bpe_tokens"))
        .cast("bigint").alias("chars_per_token_milli"),
    )


# --- C4 rule-based cleaning (Raffel et al. 2020, section 2.2) ---------------

C4_MIN_LINE_WORDS = 3  # a retained line must contain >= 3 words
C4_MIN_SENTENCES = 3  # a page must keep >= 3 sentences after line filtering
C4_LINE_END = '[.!?"]$'  # retained lines end in a terminal punctuation mark


def c4_flags_frame(d: DataFrame) -> DataFrame:
    """C4 line-and-page heuristics over (doc_id, text); see the register()
    docstring for the rule provenance. Entirely row-local."""
    t = F.col("text")
    lines = F.split(t, "\n")
    keep = lambda x: (  # noqa: E731 - inline line predicate, used once
        F.trim(x).rlike(C4_LINE_END)
        & (F.size(F.split(F.trim(x), r"\s+")) >= C4_MIN_LINE_WORDS)
        & ~F.lower(x).contains("javascript")
    )
    base = d.select(
        "doc_id",
        t.alias("text"),
        F.size(lines).cast("bigint").alias("n_lines"),
        F.filter(lines, keep).alias("kept"),
    )
    kept_text = F.array_join(F.col("kept"), "\n")
    n_sentences = F.length(F.regexp_replace(kept_text, r"[^.!?]", "")).cast("bigint")
    m = base.select(
        "doc_id",
        "n_lines",
        F.size("kept").cast("bigint").alias("n_kept_lines"),
        F.aggregate(
            F.col("kept"),
            F.lit(0).cast("long"),
            lambda acc, x: acc + F.size(F.split(F.trim(x), r"\s+")),
        ).alias("n_clean_tokens"),
        n_sentences.alias("n_sentences"),
        F.lower(F.col("text")).contains("lorem ipsum").alias("has_lorem_ipsum"),
        F.col("text").contains("{").alias("has_curly_brace"),
    )
    return m.withColumn(
        "pass_c4",
        (F.col("n_sentences") >= C4_MIN_SENTENCES)
        & ~F.col("has_lorem_ipsum")
        & ~F.col("has_curly_brace"),
    )


@register(
    "c4_quality_flags",
    oracle=r"""
    SELECT doc_id, n_lines, n_kept_lines, n_clean_tokens, n_sentences,
           has_lorem_ipsum, has_curly_brace,
           (n_sentences >= 3 AND NOT has_lorem_ipsum AND NOT has_curly_brace)
             AS pass_c4
    FROM (
      SELECT doc_id,
             CAST(len(ln) AS BIGINT) AS n_lines,
             CAST(len(kept) AS BIGINT) AS n_kept_lines,
             CAST(coalesce(list_sum(list_transform(kept,
                    x -> len(regexp_split_to_array(trim(x), '\s+')))), 0)
                  AS BIGINT) AS n_clean_tokens,
             -- array_to_string(NULL-on-empty) needs the coalesce
             CAST(length(regexp_replace(coalesce(array_to_string(kept, chr(10)), ''),
                                        '[^.!?]', '', 'g')) AS BIGINT)
               AS n_sentences,
             contains(lower(text), 'lorem ipsum') AS has_lorem_ipsum,
             contains(text, chr(123)) AS has_curly_brace
      FROM (
        SELECT doc_id, text, ln,
               list_filter(ln, x ->
                 regexp_matches(trim(x), '[.!?"]$')
                 AND len(regexp_split_to_array(trim(x), '\s+')) >= 3
                 AND NOT contains(lower(x), 'javascript')) AS kept
        FROM (
          SELECT doc_id, text, string_split(text, chr(10)) AS ln
          FROM documents
        )
      )
    )
    """,
    description="C4 rule-based cleaning filter (Raffel et al. 2020, section"
    " 2.2 -- the heuristics behind the C4/mC4 corpora, the most widely"
    " reused published cleaning recipe): line-level retention (line ends in"
    " terminal punctuation, >= 3 words, no 'javascript'), page-level flags"
    " ('lorem ipsum', curly brace, >= 3 retained sentences) and the"
    " conjunction (pass_c4), plus retained-line/token/sentence counts so a"
    " downstream route can keep, trim, or drop. Sibling of"
    " gopher_quality_flags: entirely row-local array-filter/regex-count"
    " JVM expressions -- zero shuffles, zero UDFs, linear at any corpus"
    " size; all outputs are exact integers/booleans so both engines hash"
    " identically.",
)
def c4_quality_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    return c4_flags_frame(d)


# --- distinct-count sketch (bounded-state cardinality estimation) -----------

KMV_SUBSTREAMS = 64  # stochastic-averaging sub-streams (state rows per group)


def distinct_sketch_frame(occ: DataFrame, group_col: str, val_col: str) -> DataFrame:
    """Bounded-state distinct-count sketch per group: the MinCount /
    stochastic-averaging estimator (Giroire 2009; the order-statistics family
    HyperLogLog discretizes). Each value hashes to one of S sub-streams; the
    sketch state is the per-sub-stream MINIMUM 32-bit hash -- <= S rows per
    group, maintained by one hash-aggregate with map-side partial combine
    (min() over occurrences equals min() over distincts, so no census is
    needed). Estimator: E[min of n uniforms] ~ 1/(n/S), so
    n_hat = hit^2 * 2^32 / sum(min_i) with hit = sub-streams observed.

    Returns (group, n_buckets_hit, sum_min, distinct_estimate): the estimate
    is one double division of exact BIGINTs, so engines agree bit-for-bit."""
    g = F.col(group_col)
    h = dedup.md5_hex_prefix(F.col(val_col))
    sub = dedup.md5_hex_prefix(F.col(val_col), pos=9, length=2) % KMV_SUBSTREAMS
    mins = (
        occ.select(g.alias("g"), sub.alias("sub"), h.alias("h"))
        .groupBy("g", "sub")
        .agg(F.min("h").alias("m"))
    )
    return mins.groupBy("g").agg(
        F.count(F.lit(1)).alias("n_buckets_hit"),
        F.sum("m").alias("sum_min"),
    ).select(
        F.col("g").alias(group_col),
        "n_buckets_hit",
        "sum_min",
        (
            (F.col("n_buckets_hit") * F.col("n_buckets_hit") * F.lit(4294967296)).cast("double")
            / F.col("sum_min").cast("double")
        ).alias("distinct_estimate"),
    )


@register(
    "kmv_distinct_tokens",
    oracle=f"""
    WITH occ AS (
      SELECT lang, unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    mins AS (
      SELECT lang,
             CAST('0x' || substr(md5(tok), 9, 2) AS BIGINT) % {KMV_SUBSTREAMS} AS sub,
             MIN(CAST('0x' || substr(md5(tok), 1, 8) AS BIGINT)) AS m
      FROM occ GROUP BY lang, sub
    ),
    sk AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_buckets_hit,
             CAST(SUM(m) AS BIGINT) AS sum_min
      FROM mins GROUP BY lang
    ),
    ex AS (
      SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_tokens,
             CAST(COUNT(DISTINCT tok) AS BIGINT) AS n_distinct_exact
      FROM occ GROUP BY lang
    )
    SELECT ex.lang, n_tokens, n_distinct_exact, n_buckets_hit,
           CAST(n_buckets_hit * n_buckets_hit * 4294967296 AS DOUBLE)
             / CAST(sum_min AS DOUBLE) AS distinct_estimate,
           (CAST(n_buckets_hit * n_buckets_hit * 4294967296 AS DOUBLE)
              / CAST(sum_min AS DOUBLE)
            - CAST(n_distinct_exact AS DOUBLE))
             / CAST(n_distinct_exact AS DOUBLE) AS rel_error
    FROM ex JOIN sk ON ex.lang = sk.lang
    """,
    description="Distinct-token cardinality sketch per language: the"
    " MinCount / stochastic-averaging order-statistics estimator (Giroire"
    f" 2009) over {KMV_SUBSTREAMS} sub-streams -- the bounded-state shape"
    " for vocabulary-size / id-cardinality monitoring at 100 TB, where"
    " COUNT(DISTINCT) needs a full census shuffle of every distinct value"
    f" but the sketch state is <= {KMV_SUBSTREAMS} BIGINTs per group,"
    " maintained by ONE map-side-combined hash aggregate over raw"
    " occurrences (no pre-distinct: min over occurrences = min over"
    " distincts) and mergeable across partitions/days by construction. The"
    " exact census columns are computed alongside ONLY to grade the"
    " estimate (rel_error); production runs the sketch alone. Every"
    " estimate is a single double division of exact integers, bit-identical"
    " cross-engine; md5-derived hashes make both engines see the same"
    " sub-streams.",
)
def kmv_distinct_tokens(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    occ = d.select("lang", F.explode(F.split("text", " ")).alias("tok"))
    sk = distinct_sketch_frame(occ, "lang", "tok")
    ex = occ.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_tokens"),
        F.countDistinct("tok").alias("n_distinct_exact"),
    )
    j = ex.join(sk, "lang")
    return j.select(
        "lang",
        "n_tokens",
        "n_distinct_exact",
        "n_buckets_hit",
        "distinct_estimate",
        (
            (F.col("distinct_estimate") - F.col("n_distinct_exact").cast("double"))
            / F.col("n_distinct_exact").cast("double")
        ).alias("rel_error"),
    )


# --- Count-Min sketch heavy hitters -----------------------------------------

CM_DEPTH = 4  # independent hash rows (error probability decays as 2^-depth)
CM_WIDTH = 512  # counters per row (overcount bound ~ e * N / width)
CM_TOP_K = 50


def _cm_col(tok, r: int, width: int):
    return dedup.md5_hex_prefix(F.concat(F.lit(f"cm{r}|"), tok)) % width


def cm_cells_frame(
    occ: DataFrame, tok_col: str, depth: int = CM_DEPTH, width: int = CM_WIDTH
) -> DataFrame:
    """The Count-Min counter grid (r, c, cnt) for a token-occurrence frame.
    Works identically on a STREAMING frame: groupBy(r, c).count is a bounded
    stateful aggregation (state <= depth*width rows forever), so the sketch
    can be maintained continuously in update/complete mode -- asserted in
    tests/test_streaming_dedup.py."""
    tok = F.col(tok_col)
    return (
        occ.select(
            F.explode(
                F.array(
                    *[
                        F.struct(
                            F.lit(r).cast("int").alias("r"),
                            _cm_col(tok, r, width).alias("c"),
                        )
                        for r in range(depth)
                    ]
                )
            ).alias("cell")
        )
        .groupBy(F.col("cell.r").alias("r"), F.col("cell.c").alias("c"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )


def cm_heavy_hitters_frame(
    occ: DataFrame, tok_col: str, depth: int = CM_DEPTH, width: int = CM_WIDTH, k: int = CM_TOP_K
) -> DataFrame:
    """Count-Min sketch (Cormode & Muthukrishnan 2005) heavy hitters over a
    token-occurrence frame. The sketch is depth x width exact counters --
    built by ONE map-side-combined hash aggregate over (row, col) cells, so
    the shuffle is bounded by depth*width keys regardless of corpus size, and
    two sketches merge by cell-wise addition (the daily-ingest shape). The
    candidate probe joins the BROADCAST sketch; estimates are min over rows,
    never below the true count. Exact counts ride along to grade overcount."""
    tok = F.col(tok_col)
    cells = cm_cells_frame(occ, tok_col, depth, width)
    vocab = occ.groupBy(tok.alias("tok")).agg(F.count(F.lit(1)).alias("exact_count"))
    probes = vocab.select(
        "tok",
        "exact_count",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(r).cast("int").alias("r"),
                        _cm_col(F.col("tok"), r, width).alias("c"),
                    )
                    for r in range(depth)
                ]
            )
        ).alias("p"),
    )
    est = (
        probes.join(
            F.broadcast(cells),
            (F.col("p.r") == F.col("r")) & (F.col("p.c") == F.col("c")),
        )
        .groupBy("tok", "exact_count")
        .agg(F.min("cnt").alias("cm_estimate"))
    )
    return (
        est.select("tok", "cm_estimate", "exact_count",
                   (F.col("cm_estimate") - F.col("exact_count")).alias("overcount"))
        .orderBy(F.col("cm_estimate").desc(), "tok")
        .limit(k)
    )


@register(
    "countmin_heavy_hitters",
    oracle=f"""
    WITH occ AS (
      SELECT unnest(string_split(text, ' ')) AS tok FROM documents
    ),
    salts AS (SELECT unnest(range({CM_DEPTH})) AS r),
    cells AS (
      SELECT r,
             CAST('0x' || substr(md5('cm' || r || '|' || tok), 1, 8) AS BIGINT)
               % {CM_WIDTH} AS c,
             CAST(COUNT(*) AS BIGINT) AS cnt
      FROM occ CROSS JOIN salts GROUP BY r, c
    ),
    vocab AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS exact_count FROM occ GROUP BY tok
    ),
    est AS (
      SELECT tok, exact_count, MIN(cnt) AS cm_estimate
      FROM vocab CROSS JOIN salts
      JOIN cells ON cells.r = salts.r
        AND cells.c = CAST('0x' || substr(md5('cm' || salts.r || '|' || tok), 1, 8)
                           AS BIGINT) % {CM_WIDTH}
      GROUP BY tok, exact_count
    )
    SELECT tok, cm_estimate, exact_count,
           cm_estimate - exact_count AS overcount
    FROM est ORDER BY cm_estimate DESC, tok LIMIT {CM_TOP_K}
    """,
    description="Count-Min sketch heavy hitters (Cormode & Muthukrishnan"
    f" 2005): top-{CM_TOP_K} tokens by sketch-estimated frequency with the"
    " exact count and the (always >= 0) overcount alongside. The 100 TB"
    f" shape: the sketch is a FIXED {CM_DEPTH}x{CM_WIDTH} counter grid --"
    " one map-side-combined aggregate whose shuffle is bounded by the grid"
    " size at any corpus size, cell-wise additive across partitions/days/"
    " streams (the mergeable-state frequency monitor) -- and candidate"
    " probes broadcast-join it; min-over-rows estimates never undercount."
    " The exact census rides along only to grade the sketch. All counters"
    " are exact BIGINTs and the top-k order carries the token tie-break,"
    " so both engines agree bit-for-bit.",
)
def countmin_heavy_hitters(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    occ = d.select(F.explode(F.split("text", " ")).alias("tok"))
    return cm_heavy_hitters_frame(occ, "tok")


# --- TextRank keyword extraction (graph centrality) -------------------------

TEXTRANK_ITERS = 5  # fixed power-iteration rounds (so the oracle can unroll)
TEXTRANK_SCALE = 1_000_000  # scores in exact integer micro-units
TEXTRANK_BASE = 150_000  # floor((1 - 0.85) * SCALE)
TEXTRANK_TOP_K = 30


def textrank_frame(d: DataFrame) -> DataFrame:
    """TextRank (Mihalcea & Tarau 2004): PageRank with damping 0.85 over the
    undirected adjacent-word co-occurrence graph, in exact integer
    micro-units -- per-edge contribution is s DIV deg, the damped sum is
    (85 * sum) DIV 100 -- so every round is order-independent BIGINT
    arithmetic, bit-identical to the oracle's unrolled CTE chain.

    Scale shape: the corpus collapses to the distinct-edge VOCAB graph first
    (one map-side-combined distinct), so every iteration is a vocab-sized
    hash join + hash aggregate -- corpus size only affects the first
    rollup. The symmetrized graph guarantees every node has an in-edge, so
    no rank row is ever lost to the groupBy."""
    docs = d.select(F.split("text", " ").alias("l")).filter(F.size("l") >= 2)
    adj = docs.select(
        "l", F.explode(F.expr("sequence(1, size(l) - 1)")).alias("__i")
    ).select(
        F.expr("element_at(l, __i)").alias("a"),
        F.expr("element_at(l, __i + 1)").alias("b"),
    ).filter(F.col("a") != F.col("b"))
    edges = (
        adj.select("a", "b")
        .union(adj.select(F.col("b").alias("a"), F.col("a").alias("b")))
        .distinct()
        .withColumnRenamed("a", "src")
        .withColumnRenamed("b", "dst")
    )
    # deg feeds the rank init, every iteration (via ed), and the final
    # join -- without the pin each consumer re-scans the corpus to rebuild
    # the edge census (the plan audit showed 8 scans); vocab-sized
    deg = _cached(edges.groupBy("src").agg(F.count(F.lit(1)).alias("deg")))
    ed = _cached(edges.join(deg, "src"))
    ranks = deg.select(
        F.col("src").alias("word"), F.lit(TEXTRANK_SCALE).cast("long").alias("s")
    )
    for _ in range(TEXTRANK_ITERS):
        ranks = (
            ed.join(ranks, ed["src"] == ranks["word"])
            .select("dst", F.expr("s DIV deg").alias("contrib"))
            .groupBy("dst")
            .agg(
                (F.lit(TEXTRANK_BASE) + F.expr("(85 * sum(contrib)) DIV 100"))
                .cast("long")
                .alias("s")
            )
            .withColumnRenamed("dst", "word")
        )
    return (
        ranks.join(deg, ranks["word"] == deg["src"])
        .select("word", F.col("s").alias("score_micro"), F.col("deg").alias("degree"))
        .orderBy(F.col("score_micro").desc(), "word")
        .limit(TEXTRANK_TOP_K)
    )


def _textrank_oracle() -> str:
    step = (
        "SELECT dst AS word,"
        " CAST({base} + (85 * SUM(s // deg)) // 100 AS BIGINT) AS s"
        " FROM ed JOIN __SRC__ ON ed.src = __SRC__.word GROUP BY dst"
    ).format(base=TEXTRANK_BASE)
    parts = [
        """
    WITH tk AS (
      SELECT string_split(text, ' ') AS l FROM documents
      WHERE len(string_split(text, ' ')) >= 2
    ),
    adj AS (
      SELECT l[i] AS a, l[i + 1] AS b
      FROM (SELECT l, unnest(range(1, len(l))) AS i FROM tk)
      WHERE l[i] <> l[i + 1]
    ),
    e AS (
      SELECT DISTINCT src, dst FROM (
        SELECT a AS src, b AS dst FROM adj
        UNION ALL SELECT b AS src, a AS dst FROM adj
      )
    ),
    deg AS (SELECT src, CAST(COUNT(*) AS BIGINT) AS deg FROM e GROUP BY src),
    ed AS (SELECT e.src, e.dst, deg.deg FROM e JOIN deg ON e.src = deg.src),
    s0 AS (SELECT src AS word, CAST(%d AS BIGINT) AS s FROM deg)
    """
        % TEXTRANK_SCALE
    ]
    for it in range(1, TEXTRANK_ITERS + 1):
        parts.append(f", s{it} AS ({step.replace('__SRC__', f's{it - 1}')})")
    parts.append(
        f"""
    SELECT word, s AS score_micro, deg AS degree
    FROM s{TEXTRANK_ITERS} JOIN deg ON word = deg.src
    ORDER BY s DESC, word LIMIT {TEXTRANK_TOP_K}
    """
    )
    return "\n".join(parts)


@register(
    "textrank_keywords",
    oracle=_textrank_oracle(),
    description="TextRank keyword extraction (Mihalcea & Tarau 2004):"
    f" damping-0.85 PageRank, {TEXTRANK_ITERS} fixed power-iteration rounds"
    " over the undirected adjacent-word co-occurrence graph; top"
    f" {TEXTRANK_TOP_K} words by centrality -- the unsupervised keyword/"
    "vocabulary-importance signal that frequency counts miss (a rare word"
    " bridging many contexts outranks a frequent word in one context)."
    " 100 TB shape: the corpus collapses to the distinct-edge vocabulary"
    " graph in ONE map-side-combined rollup; each of the fixed iterations"
    " is then a vocab-sized (not corpus-sized) hash join + aggregate, and"
    " the loop lives in the driver over FRAMES (never rows). Exact integer"
    " micro-unit arithmetic (s DIV deg, (85*sum) DIV 100) keeps every"
    " round order-independent and bit-identical to the unrolled-CTE"
    " oracle; top-k carries the word tie-break.",
)
def textrank_keywords(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    return textrank_frame(d)


# --- corpus-health diagnostics: entropy + Zipf fit --------------------------


@register(
    "char_entropy",
    oracle=f"""
    SELECT doc_id, n_chars, n_distinct_chars, entropy_qbits_x4n,
           CAST(entropy_qbits_x4n AS DOUBLE) / (4.0 * n_chars) AS entropy_bits
    FROM (
      SELECT doc_id,
             CAST(n AS BIGINT) AS n_chars,
             CAST(len(cnts) AS BIGINT) AS n_distinct_chars,
             CAST(n * {_qlog4('n', 'duck')}
                  - list_sum(list_transform(cnts,
                        cnt -> cnt * {_qlog4('cnt', 'duck')}))
                  AS BIGINT) AS entropy_qbits_x4n
      FROM (
        SELECT doc_id, n,
               list_transform(list_distinct(ch),
                   c -> len(list_filter(ch, x -> x = c))) AS cnts
        FROM (
          SELECT doc_id, length(text) AS n,
                 list_transform(range(1, length(text) + 1),
                                i -> substr(text, i::int, 1)) AS ch
          FROM documents WHERE length(text) > 0
        )
      )
    )
    """,
    description="Character-entropy quality signal: exact Shannon entropy of"
    " each document's character distribution in quarter-bit integer"
    " arithmetic -- entropy * 4n = n*qlog4(n) - sum(c_i*qlog4(c_i)) over"
    " the per-character counts, the same truncated-mantissa integer log2"
    " the NB classifier uses, so both engines agree bit-for-bit and the"
    " one float op is the final division. The gibberish/low-diversity"
    " detector quality pipelines run beside the token heuristics"
    " (binary blobs and repeated-char spam score ~0-2 bits; natural text"
    " ~4-4.5). Entirely row-local array work: zero shuffles, zero UDFs,"
    " linear at any corpus size.",
)
def char_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    return char_entropy_frame(d)


def char_entropy_frame(d: DataFrame) -> DataFrame:
    d = d.filter(F.length("text") > 0)
    base = d.select(
        "doc_id",
        F.length("text").cast("bigint").alias("n"),
        F.expr("transform(sequence(1, length(text)), i -> substring(text, i, 1))").alias("ch"),
    )
    cnts = base.select(
        "doc_id",
        "n",
        F.expr(
            "transform(array_distinct(ch),"
            " c -> CAST(size(filter(ch, x -> x = c)) AS BIGINT))"
        ).alias("cnts"),
    )
    q_n = _qlog4("n", "spark")
    q_c = _qlog4("cnt", "spark")
    m = cnts.select(
        "doc_id",
        F.col("n").cast("bigint").alias("n_chars"),
        F.size("cnts").cast("bigint").alias("n_distinct_chars"),
        F.expr(
            f"CAST(n * {q_n} - aggregate(cnts, CAST(0 AS BIGINT),"
            f" (acc, cnt) -> acc + cnt * {q_c}) AS BIGINT)"
        ).alias("entropy_qbits_x4n"),
    )
    return m.withColumn(
        "entropy_bits",
        F.col("entropy_qbits_x4n").cast("double") / (4.0 * F.col("n_chars")),
    )


ZIPF_TOP_V = 200  # head vocabulary size the fit runs over


def zipf_fit_frame(occ: DataFrame, tok_col: str = "tok") -> DataFrame:
    """Zipf-law fit over the head vocabulary: least-squares slope of
    qlog4(count) against qlog4(rank) for the ZIPF_TOP_V most frequent
    tokens. Natural-language corpora fit slope ~ -1 (Zipf 1949); a corpus
    whose slope drifts toward 0 (too uniform -- synthetic/templated data)
    or below ~-1.5 (a few tokens dominating -- boilerplate flood) fails the
    health check. All sums are exact BIGINTs over quarter-bit integer logs;
    slope and r2 are single-division doubles of exact integers, so both
    engines agree bit-for-bit."""
    from pyspark.sql.window import Window

    vocab = occ.groupBy(F.col(tok_col).alias("tok")).agg(F.count(F.lit(1)).alias("c"))
    top = vocab.orderBy(F.col("c").desc(), "tok").limit(ZIPF_TOP_V)
    # <= ZIPF_TOP_V rows from here on: the single-partition window is bounded
    w = Window.orderBy(F.col("c").desc(), "tok")
    ranked = top.select(
        "tok", "c", F.row_number().over(w).cast("bigint").alias("r")
    )
    q_r, q_c = _qlog4("r", "spark"), _qlog4("c", "spark")
    xy = ranked.select(
        F.expr(f"CAST({q_r} AS BIGINT)").alias("x"),
        F.expr(f"CAST({q_c} AS BIGINT)").alias("y"),
    )
    s = xy.agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = s["n"] * F.col("sxy") - F.col("sx") * F.col("sy")
    den = s["n"] * F.col("sxx") - F.col("sx") * F.col("sx")
    deny = s["n"] * F.col("syy") - F.col("sy") * F.col("sy")
    # degenerate guards, identical in the oracle: a constant-y head (deny=0,
    # perfectly uniform vocabulary) has slope 0 and an undefined fit -- both
    # reported as exact 0.0 rather than a divide-by-zero
    return s.select(
        F.col("n").cast("bigint").alias("n_terms"),
        F.when(den == 0, F.lit(0.0))
        .otherwise(num.cast("double") / den.cast("double"))
        .alias("zipf_slope"),
        F.when(den * deny == 0, F.lit(0.0))
        .otherwise((num * num).cast("double") / (den * deny).cast("double"))
        .alias("fit_r2"),
    )


@register(
    "zipf_fit_report",
    oracle=f"""
    WITH vocab AS (
      SELECT tok, CAST(COUNT(*) AS BIGINT) AS c
      FROM (SELECT unnest(string_split(text, ' ')) AS tok FROM documents)
      GROUP BY tok ORDER BY c DESC, tok LIMIT {ZIPF_TOP_V}
    ),
    ranked AS (
      SELECT c, CAST(ROW_NUMBER() OVER (ORDER BY c DESC, tok) AS BIGINT) AS r
      FROM vocab
    ),
    xy AS (
      SELECT CAST({_qlog4('r', 'duck')} AS BIGINT) AS x,
             CAST({_qlog4('c', 'duck')} AS BIGINT) AS y
      FROM ranked
    ),
    s AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n,
             CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
             CAST(SUM(x * y) AS BIGINT) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx,
             CAST(SUM(y * y) AS BIGINT) AS syy
      FROM xy
    )
    SELECT n AS n_terms,
           CASE WHEN n * sxx - sx * sx = 0 THEN 0.0
                ELSE CAST(n * sxy - sx * sy AS DOUBLE)
                     / CAST(n * sxx - sx * sx AS DOUBLE) END AS zipf_slope,
           CASE WHEN (n * sxx - sx * sx) * (n * syy - sy * sy) = 0 THEN 0.0
                ELSE CAST((n * sxy - sx * sy) * (n * sxy - sx * sy) AS DOUBLE)
                     / CAST((n * sxx - sx * sx) * (n * syy - sy * sy) AS DOUBLE)
                END AS fit_r2
    FROM s
    """,
    description="Zipf-law corpus-health monitor: least-squares slope (and"
    f" r2) of log-frequency vs log-rank over the top-{ZIPF_TOP_V}"
    " vocabulary -- natural language fits slope ~ -1 (Zipf 1949); drift"
    " toward 0 flags templated/synthetic data, below ~-1.5 a boilerplate"
    " flood (and this synthetic corpus's near-uniform vocab measurably"
    " reads ~0 -- the monitor working as intended). 100 TB shape: one"
    " map-side-combined vocab rollup, a TakeOrdered head, and a"
    f" {ZIPF_TOP_V}-row bounded window; every regression sum is an exact"
    " BIGINT over quarter-bit integer logs, the two float ops are final"
    " divisions of exact integers -- bit-identical cross-engine.",
)
def zipf_fit_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    occ = d.select(F.explode(F.split("text", " ")).alias("tok"))
    return zipf_fit_frame(occ)


# --- contrastive triplet mining (embedding-training data) -------------------


def _ring_frame(d: DataFrame) -> DataFrame:
    """Deterministic 'random'-negative ring: docs ordered by md5(doc_id)
    within 16 hash buckets; each doc's first and second ring successors
    (wrapping inside the bucket) are computed with ONE pass of per-bucket
    window functions -- linear, skew-free under hash uniformity, and the
    bucket count is the parallelism knob (the sort is per-bucket, never
    global)."""
    from pyspark.sql.window import Window

    h = F.md5(F.col("doc_id").cast("string"))
    b = d.select("doc_id", h.alias("h"), F.substring(h, 1, 1).alias("bucket"))
    w = Window.partitionBy("bucket").orderBy("h")
    full = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return b.select(
        "doc_id",
        F.lead("doc_id", 1).over(w).alias("l1"),
        F.lead("doc_id", 2).over(w).alias("l2"),
        F.first("doc_id").over(full).alias("f1"),
        F.nth_value("doc_id", 2).over(full).alias("f2"),
    ).select(
        "doc_id",
        F.coalesce("l1", "f1").alias("c1"),
        F.coalesce(
            "l2",
            F.when(F.col("l1").isNull(), F.col("f2")).otherwise(F.col("f1")),
        ).alias("c2"),
    )


def contrastive_triplets_frame(d: DataFrame, pairs: DataFrame) -> DataFrame:
    """(anchor, positive, negative) triplets for contrastive/embedding
    training: near-dup pairs supply anchor/positive; the negative is the
    anchor's hash-ring successor (first that collides with neither side),
    i.e. a reproducible uniform draw with no RNG state. Rows whose bucket
    cannot supply a distinct negative are dropped deterministically."""
    ring = _ring_frame(d)
    t = pairs.select(
        F.col("id_a").alias("anchor_id"), F.col("id_b").alias("positive_id")
    ).join(ring, F.col("anchor_id") == F.col("doc_id"))
    neg = (
        F.when(
            (F.col("c1") != F.col("anchor_id")) & (F.col("c1") != F.col("positive_id")),
            F.col("c1"),
        )
        .when(
            (F.col("c2") != F.col("anchor_id")) & (F.col("c2") != F.col("positive_id")),
            F.col("c2"),
        )
        .otherwise(F.lit(None))
    )
    return (
        t.select("anchor_id", "positive_id", neg.alias("negative_id"))
        .filter(F.col("negative_id").isNotNull())
    )


def _triplets_oracle() -> str:
    from flink_cdc_fluss_quickstart_spark.plans.registry import get

    pairs = get("minhash_lsh_pairs").oracle
    return f"""
    WITH p AS ({pairs}),
    b AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS h,
             substr(md5(CAST(doc_id AS VARCHAR)), 1, 1) AS bucket
      FROM documents
    ),
    ring AS (
      SELECT doc_id,
             coalesce(l1, f1) AS c1,
             coalesce(l2, CASE WHEN l1 IS NULL THEN f2 ELSE f1 END) AS c2
      FROM (
        SELECT doc_id,
               lead(doc_id, 1) OVER w AS l1,
               lead(doc_id, 2) OVER w AS l2,
               first_value(doc_id) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND UNBOUNDED FOLLOWING) AS f1,
               nth_value(doc_id, 2) OVER (w ROWS BETWEEN UNBOUNDED PRECEDING
                                          AND UNBOUNDED FOLLOWING) AS f2
        FROM b WINDOW w AS (PARTITION BY bucket ORDER BY h)
      )
    )
    SELECT anchor_id, positive_id, negative_id FROM (
      SELECT p.id_a AS anchor_id, p.id_b AS positive_id,
             CASE WHEN r.c1 <> p.id_a AND r.c1 <> p.id_b THEN r.c1
                  WHEN r.c2 <> p.id_a AND r.c2 <> p.id_b THEN r.c2
                  ELSE NULL END AS negative_id
      FROM p JOIN ring r ON p.id_a = r.doc_id
    ) WHERE negative_id IS NOT NULL
    """


@register(
    "contrastive_triplets",
    oracle=_triplets_oracle(),
    description="Contrastive training-data assembly: (anchor, positive,"
    " negative) triplets for embedding/retrieval training -- anchors and"
    " positives come from the registered MinHash-LSH near-dup pairs (the"
    " standard weak-supervision positive), negatives from a DETERMINISTIC"
    " hash-ring draw: the anchor's md5-ring successor within its hash"
    " bucket, skipping collisions with either side -- a reproducible,"
    " RNG-state-free uniform negative (in-batch negatives can't be"
    " reproduced across runs; this can). 100 TB shape: the ring is one"
    " per-bucket window pass (linear, skew-free under hash uniformity,"
    " bucket count = parallelism knob -- never a global sort), and the"
    " triplet join is one equi join on the anchor id. Fully"
    " deterministic, bit-identical cross-engine.",
)
def contrastive_triplets(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    pairs = dedup.band_self_join(
        dedup.minhash_band_keyed(d, "doc_id", "text"), "doc_id"
    )
    return contrastive_triplets_frame(d.select("doc_id"), pairs)


# --- MinHash estimator grading ----------------------------------------------

_MH_MATCH = " + ".join(
    f"(CASE WHEN a.mh_{k} = b.mh_{k} THEN 1 ELSE 0 END)" for k in range(dedup.N_PERMS)
)


@register(
    "minhash_estimate_quality",
    oracle=f"""
    WITH prof AS (
      SELECT doc_id, s,
             {{mh_exprs}}
      FROM (
        SELECT doc_id, s, hs,
               {_X_COL}
        FROM (
          SELECT doc_id, s, {_HS_COL}
          FROM (SELECT doc_id, {_shingles_sql()} AS s FROM ({_WORD_DOCS}))
        )
      )
    ),
    pairs AS (
      SELECT DISTINCT id_a, id_b FROM (
        {_band_pairs_sql("prof")}
      )
    )
    SELECT p.id_a, p.id_b,
           CAST({_MH_MATCH} AS BIGINT) AS n_match,
           CAST({_MH_MATCH} AS DOUBLE) / {dedup.N_PERMS} AS est_jaccard,
           CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
             / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE)
             AS exact_jaccard,
           abs(CAST({_MH_MATCH} AS DOUBLE) / {dedup.N_PERMS}
               - CAST(len(list_intersect(a.s, b.s)) AS DOUBLE)
                 / CAST(len(a.s) + len(b.s) - len(list_intersect(a.s, b.s)) AS DOUBLE))
             AS abs_err
    FROM pairs p
    JOIN prof a ON p.id_a = a.doc_id
    JOIN prof b ON p.id_b = b.doc_id
    """.format(mh_exprs=_MH_EXPRS),
    description=f"MinHash estimator grading (completes the"
    " approximate-structure report card: ANN/PQ recall, KMV rel_error,"
    " Count-Min overcount, Bloom false positives -- and now the MinHash"
    " Jaccard estimate itself): for every LSH candidate pair, the"
    f" signature-agreement estimate (matches / {dedup.N_PERMS}) beside the"
    " exact shingle-set Jaccard and their absolute error -- the number"
    " that justifies trusting bands over exact set intersection at scale"
    f" (E[est] = J, std = sqrt(J(1-J)/{dedup.N_PERMS})). Exact sets join"
    " only the bounded candidate pairs, so wide arrays never move for"
    " non-candidates; counts are exact ints, est/exact/err are identical"
    " float expressions both engines.",
)
def minhash_estimate_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    sig = _cached(dedup.minhash_signature(d, "doc_id", "text"))
    pairs = dedup.minhash_band_pairs(sig, "doc_id", dedup.BAND_COLS)
    sets = (
        spread(d)
        .select("doc_id", dedup.normalized_text(F.col("text")).alias("__norm"))
        .select("doc_id", F.array_distinct(dedup.word_shingle_array("__norm")).alias("s"))
    )
    n_match = None
    for k in range(dedup.N_PERMS):
        term = F.when(F.col(f"a.mh_{k}") == F.col(f"b.mh_{k}"), 1).otherwise(0)
        n_match = term if n_match is None else (n_match + term)
    est = F.col("n_match").cast("double") / dedup.N_PERMS
    inter = F.size(F.array_intersect("sa", "sb"))
    exact = inter.cast("double") / (
        (F.size("sa") + F.size("sb") - inter).cast("double")
    )
    # signature and shingle-set frames are corpus-sized resolve sides:
    # sort-merge (r14 x100 sweep; functions.dedup._corpus_join_side)
    cjs = dedup._corpus_join_side
    return (
        pairs.join(cjs(sig).alias("a"), F.col("id_a") == F.col("a.doc_id"))
        .join(cjs(sig).alias("b"), F.col("id_b") == F.col("b.doc_id"))
        .select("id_a", "id_b", n_match.cast("bigint").alias("n_match"))
        .join(cjs(sets.select(F.col("doc_id").alias("id_a"), F.col("s").alias("sa"))), "id_a")
        .join(cjs(sets.select(F.col("doc_id").alias("id_b"), F.col("s").alias("sb"))), "id_b")
        .select(
            "id_a",
            "id_b",
            "n_match",
            est.alias("est_jaccard"),
            exact.alias("exact_jaccard"),
            F.abs(est - exact).alias("abs_err"),
        )
    )


# --- cross-corpus line dedup (the C4 repeated-line rule) ----------------------

LINE_DEDUP_MAX = 2  # keep lines whose corpus-wide frequency is <= this

# the synthetic corpus has no duplicated lines (single-line word-soup docs),
# so the registered query plants deterministic boilerplate IN-PLAN -- the
# multimodal_phash_dedup_planted precedent: every 3rd doc gains a header
# line and every 4th a footer line, which the census then removes while
# every unique content line survives
_LD_HEADER = "SUBSCRIBE TO OUR NEWSLETTER"
_LD_FOOTER = "Copyright 2024 All Rights Reserved"


def _reassemble_lines(kept: DataFrame) -> DataFrame:
    """Per-doc ordered reassembly of surviving (doc_id, pos, line) rows:
    array_sort(collect_list(struct)) -- no corpus-sized window."""
    return kept.groupBy("doc_id").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_lines_kept"),
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("pos", "line"))),
                lambda x: x["line"],
            ),
            "\n",
        ).alias("text_dedup"),
    )


def line_dedup_frame(docs: DataFrame, max_freq: int = LINE_DEDUP_MAX) -> DataFrame:
    """C4-style cross-corpus line dedup (Raffel et al. 2020 section 2.2 --
    the repeated-span discard rule, at the line granularity RefinedWeb/CCNet
    apply it): drop every line whose trimmed form appears more than
    `max_freq` times ACROSS the corpus (boilerplate headers, cookie
    banners, copyright footers), reassemble the survivors in document
    order. Docs whose every line is boilerplate drop out entirely.

    Scale shape: one line explode -> one census groupBy (map-side combined;
    the key space is the distinct-line vocabulary, Zipf-headed) -> one
    hash anti/equi join back on the trimmed line -> one per-doc ordered
    reassembly via array_sort(collect_list(struct(pos, line))) -- no
    window over the corpus, no driver collection, the span_dedup census
    family with lines instead of gram hashes."""
    lines = _line_rows(docs)
    census = lines.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    kept = lines.join(census.filter(F.col("n") <= max_freq).select("key"), "key")
    return _reassemble_lines(kept)


def _line_rows(docs: DataFrame) -> DataFrame:
    return docs.select(
        "doc_id", F.posexplode(F.split("text", "\n")).alias("pos", "line")
    ).withColumn("key", F.trim(F.col("line")))


@register(
    "line_dedup_text",
    oracle=f"""
    WITH planted AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 3 = 0 THEN '{_LD_HEADER}' || chr(10) ELSE '' END)
             || text ||
             (CASE WHEN doc_id % 4 = 0 THEN chr(10) || '{_LD_FOOTER}' ELSE '' END)
             AS text
      FROM documents
    ),
    arrs AS (SELECT doc_id, string_split(text, chr(10)) AS arr FROM planted),
    lines AS (
      SELECT doc_id, CAST(u.i AS BIGINT) AS pos, arr[u.i] AS line,
             trim(arr[u.i]) AS key
      FROM arrs CROSS JOIN UNNEST(range(1, len(arr) + 1)) AS u(i)
    ),
    census AS (SELECT key, COUNT(*) AS n FROM lines GROUP BY key),
    kept AS (
      SELECT l.doc_id, l.pos, l.line
      FROM lines l JOIN census c ON l.key = c.key
      WHERE c.n <= {LINE_DEDUP_MAX}
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines_kept,
           string_agg(line, chr(10) ORDER BY pos) AS text_dedup
    FROM kept GROUP BY doc_id
    """,
    description="Cross-corpus LINE dedup, the C4 repeated-span discard rule"
    f" (Raffel et al. 2020 section 2.2) at line granularity: every line"
    f" whose trimmed form appears more than {LINE_DEDUP_MAX} times in the"
    " corpus is dropped from every document (boilerplate headers, cookie"
    " banners, copyright footers -- the web-scrape noise n-gram dedup"
    " under-weights because it is a tiny fraction of each doc), and"
    " surviving lines reassemble in document order. The registered form"
    " plants deterministic header/footer boilerplate in-plan (the phash"
    " planted precedent -- the synthetic corpus is single-line) so the"
    " stamped result exercises both the removal and the survival paths."
    " One explode + one census aggregate + one line-keyed join + one"
    " ordered per-doc reassembly; no corpus-sized window, no driver loop.",
)
def line_dedup_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return line_dedup_frame(spread(_ld_planted(docs)))


def _ld_planted(docs: DataFrame) -> DataFrame:
    """The in-plan boilerplate planting shared by both line-dedup forms."""
    return docs.select(
        "doc_id",
        F.concat(
            F.when(F.pmod(F.col("doc_id"), F.lit(3)) == 0, F.lit(_LD_HEADER + "\n"))
            .otherwise(F.lit("")),
            F.col("text"),
            F.when(F.pmod(F.col("doc_id"), F.lit(4)) == 0, F.lit("\n" + _LD_FOOTER))
            .otherwise(F.lit("")),
        ).alias("text"),
    )


# --- incremental (batch-vs-census) line dedup --------------------------------

# Deterministic stand-in for "today's ingest batch" -- the span-incremental
# convention: every 5th doc is new, the rest are the already-ingested corpus
# whose line census is the persisted index.
LINE_BATCH_MOD = 5

# The shared line-census planting SQL (header on every 3rd doc, footer on
# every 4th), reused verbatim by both line-dedup oracles
_LD_PLANTED_SQL = f"""
    planted AS (
      SELECT doc_id,
             (CASE WHEN doc_id % 3 = 0 THEN '{_LD_HEADER}' || chr(10) ELSE '' END)
             || text ||
             (CASE WHEN doc_id % 4 = 0 THEN chr(10) || '{_LD_FOOTER}' ELSE '' END)
             AS text
      FROM documents
    ),
    arrs AS (SELECT doc_id, string_split(text, chr(10)) AS arr FROM planted),
    lines AS (
      SELECT doc_id, CAST(u.i AS BIGINT) AS pos, arr[u.i] AS line,
             trim(arr[u.i]) AS key
      FROM arrs CROSS JOIN UNNEST(range(1, len(arr) + 1)) AS u(i)
    )"""


def line_dedup_step(
    batch: DataFrame, census: DataFrame | None, max_freq: int = LINE_DEDUP_MAX
) -> tuple[DataFrame, DataFrame]:
    """One ingest step of incremental line dedup: rewrite the (doc_id, text)
    `batch` against the accumulated line census `census` (a (key, n) frame;
    None = first ingest) and return (rebuilt_batch, batch_census_to_append).

    A batch line survives when its census-so-far count -- prior ingests'
    occurrences PLUS this batch's -- stays within max_freq; otherwise every
    batch occurrence is dropped (the C4 rule's disposition at ingest time:
    boilerplate is removed from every later batch once the census has
    learned it, while earlier ingests' already-shipped copies are not
    retroactively rewritten -- the inherent incremental asymmetry, identical
    to span_dedup_incremental's contract). Ingest cost is |batch| line rows
    probing a key-partitioned census join; the corpus is never re-exploded.

    CACHE CONTRACT: persists the batch's line frame (both outputs share it);
    a long-running caller must dedup.release_caches() after materializing
    both returned frames -- the span_dedup_step hygiene rule.
    """
    lines = _cached(_line_rows(batch))
    bc = lines.groupBy("key").agg(F.count(F.lit(1)).alias("n"))
    if census is None:
        census = batch.sparkSession.createDataFrame([], "key string, n long")
    # callers append per-batch censuses; collapse to one count per key here.
    # The census accumulates with the corpus across ingests: pin it away
    # from a broadcast build (r14 x100 audit; see _corpus_side)
    idx = _corpus_side(census.groupBy("key").agg(F.sum("n").alias("n_idx")))
    gate = (
        bc.join(idx, "key", "left")
        .filter(F.col("n") + F.coalesce(F.col("n_idx"), F.lit(0)) <= max_freq)
        .select("key")
    )
    return _reassemble_lines(lines.join(gate, "key")), bc


def line_dedup_incremental_frame(
    d: DataFrame, max_freq: int = LINE_DEDUP_MAX
) -> DataFrame:
    """Batch-vs-census line dedup over a (doc_id, text) frame (unit-testable
    twin of the registered query; batch membership is doc_id % LINE_BATCH_MOD
    == 0, the census side is derived in-plan from the rest of the corpus)."""
    lines = _cached(_line_rows(d))
    is_batch = F.pmod(F.col("doc_id"), F.lit(LINE_BATCH_MOD)) == 0
    b = lines.filter(is_batch)
    # corpus-sized census: never a broadcast build (r14 x100 audit -- the
    # static planner broadcast it into the outer gate join)
    idx = _corpus_side(
        lines.filter(~is_batch).groupBy("key").agg(F.count(F.lit(1)).alias("n_idx"))
    )
    bc = b.groupBy("key").agg(F.count(F.lit(1)).alias("n_b"))
    gate = (
        bc.join(idx, "key", "left")
        .filter(F.col("n_b") + F.coalesce(F.col("n_idx"), F.lit(0)) <= max_freq)
        .select("key")
    )
    return _reassemble_lines(b.join(gate, "key"))


@register(
    "line_dedup_incremental",
    oracle=f"""
    WITH {_LD_PLANTED_SQL.strip()},
    b AS (SELECT * FROM lines WHERE doc_id % {LINE_BATCH_MOD} = 0),
    idx AS (
      SELECT key, COUNT(*) AS n_idx FROM lines
      WHERE doc_id % {LINE_BATCH_MOD} <> 0 GROUP BY key
    ),
    bc AS (SELECT key, COUNT(*) AS n_b FROM b GROUP BY key),
    gate AS (
      SELECT bc.key FROM bc LEFT JOIN idx USING (key)
      WHERE bc.n_b + COALESCE(idx.n_idx, 0) <= {LINE_DEDUP_MAX}
    ),
    kept AS (SELECT b.doc_id, b.pos, b.line FROM b JOIN gate USING (key))
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines_kept,
           string_agg(line, chr(10) ORDER BY pos) AS text_dedup
    FROM kept GROUP BY doc_id
    """,
    description="Daily-ingest form of the C4 repeated-line rule: only the"
    f" NEW batch (doc_id % {LINE_BATCH_MOD} = 0 stands in for today's"
    " ingest) is exploded and rewritten; a batch line is dropped when the"
    " persisted corpus census count plus the batch's own occurrences"
    f" exceeds {LINE_DEDUP_MAX} -- boilerplate the census has learned is"
    " removed from every later ingest without re-scanning the corpus, the"
    " span_dedup_incremental contract at line granularity. Ingest cost is"
    " |batch| line rows probing a key-partitioned census join plus a"
    " |batch|-sized internal census; after each ingest the batch census"
    " appends to the index. The in-plan census derives from the same table"
    " only because the driver provides one corpus; the planted header/"
    "footer boilerplate (the line_dedup_text planting) exercises both the"
    " census-hit and the batch-internal paths. Streaming loop equivalence"
    " proven in tests/test_streaming_dedup.py via line_dedup_step.",
)
def line_dedup_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    docs = load_table(spark, sf_dir, "documents")
    return line_dedup_incremental_frame(spread(_ld_planted(docs)))


# --- trained quality classifier: logistic-regression distillation ------------

# fastText-style quality classifier (Joulin et al. 2016 -- the architecture
# CCNet / LLaMA-style curation pipelines train on weakly-labeled examples):
# full-batch gradient descent on a linear model over cheap per-doc features,
# distilling a hard rule label into a smooth 0..1 quality score. The repo's
# NB (generative) and DSIR (importance-ratio) scorers cover the other two
# classic curation scorers; this is the trained DISCRIMINATIVE one.
#
# Determinism contract (the floor-scaled-BIGINT discipline, registry.py):
# every corpus-wide float reduction (feature moments, per-round gradients)
# floor-scales its PER-ROW contribution to BIGINT before summing, so sums
# are exact integers independent of partition order; all remaining per-row
# math uses only IEEE correctly-rounded ops (+ - * / abs sqrt least floor,
# NEVER exp/log -- the sigmoid is the rational 0.5 + 0.5*z/(1+|z|)), built
# with the identical association order on both engines, so Spark and DuckDB
# agree bit-for-bit on weights and scores.
LOGREG_ROUNDS = 8
LOGREG_LR = 2.0
LOGREG_SCALE = 1_000_000
# compact high-signal function-word list (shared by features AND weak label)
LOGREG_STOPS = ("a", "the", "of", "to", "and", "in", "is", "it", "that", "for")
LOGREG_LONG_LEN = 6  # "long token" feature threshold
LOGREG_MWL_CAP = 20.0  # mean-word-length feature cap (robustness to 1-token docs)
LOGREG_LEN_CAP = 100  # word-count feature saturation
LOGREG_LABEL_MIN_WORDS = 40  # weak label: nw >= 40 AND stop_ratio >= 0.05
LOGREG_LABEL_MIN_STOP = 0.05
# holdout-eval split: md5(doc_id) bucket < 80 trains, the rest is heldout
# (the dataset_split_assign hash rule, so membership is row-local + stable)
LOGREG_TRAIN_BUCKET = 80

_LR_STOP_SQL = ", ".join(f"'{w}'" for w in LOGREG_STOPS)
_LR_NFEAT = 5  # bias + 4 standardized features
_LR_S = "1000000.0"  # the quantization scale as both engines' literal


def logreg_features_frame(d: DataFrame) -> DataFrame:
    """Per-doc raw feature row: bias x0=1, stopword ratio x1, capped mean
    word length x2, long-token ratio x3, saturated length x4, weak label y.
    Each ratio is a single division of exact integers (CASE-guarded against
    0-token docs on both engines). NULL text yields the same defined row on
    both engines -- (x1=NULL, x2=MWL_CAP, x3=NULL, x4=LEN_CAP/100, y=0.0)
    -- because least() skips NULL operands, so the caps win; the corpus
    carries no NULL text, but were one to appear its extreme x2/x4 would
    enter the standardization moments identically on Spark and DuckDB."""
    t = F.col("text")
    w = text.tokens(t)
    nw = F.size(w)
    nstop = F.size(F.filter(w, lambda x: x.isin(*LOGREG_STOPS)))
    nlong = F.size(F.filter(w, lambda x: F.length(x) >= LOGREG_LONG_LEN))
    nonws = F.length(F.regexp_replace(t, r"\s", ""))
    x1 = F.when(nw == 0, F.lit(0.0)).otherwise(nstop.cast("double") / nw)
    x2 = F.least(
        F.when(nw == 0, F.lit(0.0)).otherwise(nonws.cast("double") / nw),
        F.lit(LOGREG_MWL_CAP),
    )
    x3 = F.when(nw == 0, F.lit(0.0)).otherwise(nlong.cast("double") / nw)
    x4 = F.least(nw, F.lit(LOGREG_LEN_CAP)).cast("double") / F.lit(100.0)
    y = (
        F.when((nw >= LOGREG_LABEL_MIN_WORDS) & (x1 >= F.lit(LOGREG_LABEL_MIN_STOP)), F.lit(1.0))
        .otherwise(F.lit(0.0))
    )
    return d.select(
        "doc_id",
        F.lit(1.0).alias("x0"),
        x1.alias("x1"),
        x2.alias("x2"),
        x3.alias("x3"),
        x4.alias("x4"),
        y.alias("y"),
    )


def _lr_z(w: list[float], pfx: str) -> F.Column:
    """w . x with the FIXED association order ((((w0*f0)+w1*f1)+...)+w4*f4)
    -- float addition is not associative, so the oracle builds the same."""
    z = F.lit(w[0]) * F.col(f"{pfx}0")
    for j in range(1, _LR_NFEAT):
        z = z + F.lit(w[j]) * F.col(f"{pfx}{j}")
    return z


def _lr_sig(z: F.Column) -> F.Column:
    """Rational 'fast sigmoid' 0.5 + 0.5*z/(1+|z|): same monotone S-shape,
    but every op is IEEE correctly-rounded (exp is not), so both engines
    produce bit-identical doubles."""
    return F.lit(0.5) + F.lit(0.5) * (z / (F.lit(1.0) + F.abs(z)))


class LogregModel(NamedTuple):
    """The trained quality scorer's complete driver-side state: GD weights
    over standardized features plus the standardization moments that define
    the feature space (scoring a new doc needs BOTH -- a weight vector
    without its moments is meaningless). All floats are IEEE doubles and
    round-trip bit-exactly through parquet (models.py persists this)."""

    w: tuple[float, ...]   # _LR_NFEAT weights, bias first
    m: tuple[float, ...]   # feature means; m[0] = 0.0 (bias unstandardized)
    sd: tuple[float, ...]  # feature stddevs; sd[0] = 1.0
    n: int                 # training doc count
    train_bucket: int | None  # md5 split bound the fit saw, None = all docs


def _lr_std_frame(
    feats: DataFrame, m, sd, with_tr: bool
) -> DataFrame:
    """Standardize raw features with GIVEN moments -- shared by the in-fit
    path and trained-model serving so both build the identical expressions
    (the bit-for-bit contract depends on it)."""
    return feats.select(
        "doc_id",
        "y",
        *(["tr"] if with_tr else []),
        F.col("x0").alias("s0"),
        *[
            ((F.col(f"x{j}") - F.lit(m[j])) / F.lit(sd[j])).alias(f"s{j}")
            for j in range(1, _LR_NFEAT)
        ],
    )


def logreg_quality_frame(d: DataFrame, train_bucket: int | None = None) -> DataFrame:
    """Fit by full-batch GD and score every doc.

    Execution shape (100 TB posture): the corpus collapses ONCE into a
    cached 6-double-per-doc projection; then 2 moment passes + LOGREG_ROUNDS
    gradient passes, each a map-side-combined aggregate to ONE 5-long row
    (the Lloyd/BPE one-row-collect precedent -- driver traffic is 5 scalars
    per round, never row data); final scoring is one row-local projection.
    No shuffle ever carries more than the aggregate row per partition.

    With ``train_bucket`` set, EVERY fit-side reduction (n, feature moments,
    per-round gradients) sees only docs whose md5(doc_id) bucket is below
    it (the dataset_split_assign rule) -- the leakage-free protocol: the
    heldout rows influence nothing, including the standardization moments
    -- while scoring still covers every doc and an is_train flag rides
    along for the evaluation rollup. train_bucket=None is the plain
    all-docs fit (the registered logreg_quality_score path, unchanged)."""
    model, std = _logreg_fit_full(d, train_bucket)
    sm = F.floor(F.lit(float(LOGREG_SCALE)) * _lr_sig(_lr_z(list(model.w), "s")))
    return std.select(
        "doc_id",
        F.col("y").cast("bigint").alias("weak_label"),
        sm.alias("score_micro"),
        (sm >= F.lit(LOGREG_SCALE // 2)).alias("predicted"),
        *(["tr"] if train_bucket is not None else []),
    )


# Loop-frame sizing for the fit reductions (r16, the BPE rule): the cached
# standardized projection is ~48 bytes/doc, so ~512k rows per partition is a
# few tens of MB -- scale-adaptive (a 10B-doc corpus still gets ~20k-way
# parallelism, the bench-scale frame collapses to one task per round),
# derived from the measured doc count the moments pass already collected.
_LOGREG_STD_ROWS_PER_PART = 524288


def _logreg_fit_full(
    d: DataFrame, train_bucket: int | None = None
) -> tuple[LogregModel, DataFrame]:
    """The fit passes behind logreg_quality_frame / logreg_fit: moments,
    standardization, GD rounds. Returns (model, cached std frame) so the
    in-session scorer reuses the standardized projection without a second
    corpus pass.

    Loop discipline (r16 optimization round, measured): the fit's
    reductions run with AQE temporarily OFF (restored in a finally) --
    every one is a fixed-shape one-row aggregate over a cached bounded
    projection, where adaptive re-planning can decide nothing but adds a
    stage-materialization job round-trip per shuffle PER ROUND at any
    scale; without it each GD round is exactly ONE job (statusTracker:
    17 -> 8 jobs per 8-round fit). The std frame is also coalesced from
    the measured doc count (_LOGREG_STD_ROWS_PER_PART) before caching so a
    round's partial aggregate schedules tasks proportional to data, not to
    the scan width. Paired A/B at sf0.1: 8-round loop 2.2-3.2 s ->
    1.3-1.9 s, weights bit-identical. (A broadcast-weights variant --
    LocalRelation columns instead of per-round literals, to dodge the
    per-round codegen -- was measured 2.4x SLOWER per round and rejected:
    the broadcast build outweighs janino on this plan shape.)"""
    scale = float(LOGREG_SCALE)
    feats = logreg_features_frame(d)
    if train_bucket is not None:
        feats = feats.join(
            d.select(
                "doc_id",
                (dedup.hash_bucket(F.col("doc_id").cast("string")) < train_bucket).alias(
                    "tr"
                ),
            ),
            "doc_id",
        )
    feats = _cached(feats)
    red = feats.filter("tr") if train_bucket is not None else feats
    spark = d.sparkSession
    prev_aqe = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        row = red.agg(
            F.count(F.lit(1)).alias("n"),
            *[
                F.sum(F.floor(F.lit(scale) * F.col(f"x{j}"))).alias(f"m{j}")
                for j in range(1, _LR_NFEAT)
            ],
        ).collect()[0]
        n = max(row["n"], 1)
        m = {
            j: ((row[f"m{j}"] if row[f"m{j}"] is not None else 0) / scale) / n
            for j in range(1, _LR_NFEAT)
        }
        vrow = red.agg(
            *[
                F.sum(
                    F.floor(
                        F.lit(scale)
                        * ((F.col(f"x{j}") - F.lit(m[j])) * (F.col(f"x{j}") - F.lit(m[j])))
                    )
                ).alias(f"v{j}")
                for j in range(1, _LR_NFEAT)
            ]
        ).collect()[0]
        sd = {}
        for j in range(1, _LR_NFEAT):
            s = math.sqrt(((vrow[f"v{j}"] if vrow[f"v{j}"] is not None else 0) / scale) / n)
            sd[j] = 1.0 if s == 0.0 else s
        m_full = (0.0,) + tuple(m[j] for j in range(1, _LR_NFEAT))
        sd_full = (1.0,) + tuple(sd[j] for j in range(1, _LR_NFEAT))
        # row["n"] is the train-bucket count under holdout; the frame holds
        # every doc either way -- the sizing only needs the order of
        # magnitude, and the full count is not collected separately
        target = max(1, -(-n // _LOGREG_STD_ROWS_PER_PART))
        std = _cached(
            _lr_std_frame(feats, m_full, sd_full, train_bucket is not None).coalesce(
                target
            )
        )
        std_red = std.filter("tr") if train_bucket is not None else std
        w = [0.0] * _LR_NFEAT
        for _ in range(LOGREG_ROUNDS):
            sgm = _lr_sig(_lr_z(w, "s"))
            g = std_red.agg(
                *[
                    F.sum(
                        F.floor(F.lit(scale) * ((sgm - F.col("y")) * F.col(f"s{j}")))
                    ).alias(f"g{j}")
                    for j in range(_LR_NFEAT)
                ]
            ).collect()[0]
            w = [
                w[j]
                - LOGREG_LR * (((g[f"g{j}"] if g[f"g{j}"] is not None else 0) / scale) / n)
                for j in range(_LR_NFEAT)
            ]
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev_aqe)
    model = LogregModel(tuple(w), m_full, sd_full, n, train_bucket)
    return model, std


def logreg_fit(d: DataFrame, train_bucket: int | None = None) -> LogregModel:
    """Public fit surface: the trained model is 15 doubles + a count --
    fully driver-side (the weight space is feature-count-sized, not
    corpus-sized). Persist it with models.save_logreg_model; serve any
    corpus or stream micro-batch with logreg_score."""
    return _logreg_fit_full(d, train_bucket)[0]


def logreg_score(d: DataFrame, model: LogregModel) -> DataFrame:
    """Score docs with a TRAINED model -- the serving path: one row-local
    projection (features -> standardize with the model's moments -> rational
    sigmoid over the model's weights). Zero shuffles, no training state, no
    cross-doc coupling: scores are identical however docs are batched, and
    bit-identical to the in-fit-session scoring because the expressions are
    built by the same helpers over the same driver-side doubles."""
    std = _lr_std_frame(logreg_features_frame(d), model.m, model.sd, False)
    sm = F.floor(F.lit(float(LOGREG_SCALE)) * _lr_sig(_lr_z(list(model.w), "s")))
    return std.select(
        "doc_id",
        F.col("y").cast("bigint").alias("weak_label"),
        sm.alias("score_micro"),
        (sm >= F.lit(LOGREG_SCALE // 2)).alias("predicted"),
    )


def _lr_oracle_sql(train: bool = False) -> str:
    """The SAME computation as DuckDB CTEs: unrolled GD rounds, weights
    carried through 1-row CTEs, every expression built with the identical
    association order as the Spark side (see the builders above). With
    ``train`` every fit-side reduction filters to the md5(doc_id) train
    bucket (the dataset_split_assign spelling) and the tail emits the
    per-split evaluation rollup instead of per-doc scores."""
    from flink_cdc_fluss_quickstart_spark.plans.pipeline_queries import _duck_hex

    S = _LR_S
    hex8 = _duck_hex("md5(CAST(doc_id AS VARCHAR))")
    tr_col = (
        f",\n             (CAST({hex8} % 100 AS BIGINT)"
        f" < {LOGREG_TRAIN_BUCKET}) AS tr"
        if train
        else ""
    )
    tr_f = " WHERE f.tr" if train else ""
    tr_s = " WHERE s.tr" if train else ""

    def z(wref: str, fref: str, pfx: str) -> str:
        e = f"({wref}.w0 * {fref}.{pfx}0)"
        for j in range(1, _LR_NFEAT):
            e = f"({e} + ({wref}.w{j} * {fref}.{pfx}{j}))"
        return e

    def sig(zexpr: str) -> str:
        return f"(0.5 + 0.5 * ({zexpr} / (1.0 + abs({zexpr}))))"

    mm = ", ".join(
        f"SUM(CAST(floor({S} * f.x{j}) AS BIGINT)) AS M{j}" for j in range(1, _LR_NFEAT)
    )
    mv = ", ".join(
        f"((COALESCE(mm.M{j}, 0) / {S}) / GREATEST(nn.n, 1)) AS m{j}"
        for j in range(1, _LR_NFEAT)
    )
    vv = ", ".join(
        f"SUM(CAST(floor({S} * ((f.x{j} - mv.m{j}) * (f.x{j} - mv.m{j}))) AS BIGINT)) AS V{j}"
        for j in range(1, _LR_NFEAT)
    )
    sdv = ", ".join(
        f"CASE WHEN sqrt(((COALESCE(vv.V{j}, 0) / {S}) / GREATEST(nn.n, 1))) = 0.0"
        f" THEN 1.0 ELSE sqrt(((COALESCE(vv.V{j}, 0) / {S}) / GREATEST(nn.n, 1))) END AS sd{j}"
        for j in range(1, _LR_NFEAT)
    )
    std = (
        "f.doc_id, f.y, "
        + ("f.tr, " if train else "")
        + "f.x0 AS s0, "
        + ", ".join(
            f"((f.x{j} - mv.m{j}) / sdv.sd{j}) AS s{j}" for j in range(1, _LR_NFEAT)
        )
    )
    rounds = []
    for r in range(1, LOGREG_ROUNDS + 1):
        sg = sig(z(f"w{r - 1}", "s", "s"))
        gsel = ", ".join(
            f"SUM(CAST(floor({S} * (({sg} - s.y) * s.s{j})) AS BIGINT)) AS g{j}"
            for j in range(_LR_NFEAT)
        )
        wsel = ", ".join(
            f"(w{r - 1}.w{j} - {LOGREG_LR} * (((COALESCE(g{r}.g{j}, 0) / {S})"
            f" / GREATEST(nn.n, 1)))) AS w{j}"
            for j in range(_LR_NFEAT)
        )
        rounds.append(
            f"g{r} AS MATERIALIZED (SELECT {gsel} FROM s CROSS JOIN w{r - 1}{tr_s}),\n"
            f"    w{r} AS MATERIALIZED (SELECT {wsel} FROM w{r - 1} CROSS JOIN g{r} CROSS JOIN nn)"
        )
    final_sig = sig(z(f"w{LOGREG_ROUNDS}", "s", "s"))
    w0 = ", ".join(f"0.0 AS w{j}" for j in range(_LR_NFEAT))
    body = ",\n    ".join(rounds)
    if train:
        tail = f""",
    scored AS (
      SELECT s.doc_id, s.tr,
             CAST(s.y AS BIGINT) AS weak_label,
             (CAST(floor({S} * {final_sig}) AS BIGINT)
                >= {LOGREG_SCALE // 2}) AS predicted
      FROM s CROSS JOIN w{LOGREG_ROUNDS}
    )
    SELECT CASE WHEN tr THEN 'train' ELSE 'heldout' END AS split,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(weak_label) AS BIGINT) AS n_pos,
           CAST(SUM(CASE WHEN predicted THEN 1 ELSE 0 END) AS BIGINT) AS n_pred_pos,
           CAST(SUM(CASE WHEN predicted = (weak_label = 1) THEN 1 ELSE 0 END)
                AS BIGINT) AS n_correct,
           CAST(floor((1000.0 * SUM(CASE WHEN predicted = (weak_label = 1)
                                         THEN 1 ELSE 0 END)) / COUNT(*))
                AS BIGINT) AS accuracy_milli
    FROM scored GROUP BY 1"""
    else:
        tail = f"""
    SELECT s.doc_id,
           CAST(s.y AS BIGINT) AS weak_label,
           CAST(floor({S} * {final_sig}) AS BIGINT) AS score_micro,
           (CAST(floor({S} * {final_sig}) AS BIGINT) >= {LOGREG_SCALE // 2}) AS predicted
    FROM s CROSS JOIN w{LOGREG_ROUNDS}"""
    return rf"""
    WITH raw AS (
      SELECT doc_id, text, {text.DUCK_TOKENS} AS w
      FROM documents
    ),
    cnt AS (
      SELECT doc_id, len(w) AS nw,
             len(list_filter(w, t -> t IN ({_LR_STOP_SQL}))) AS nstop,
             len(list_filter(w, t -> length(t) >= {LOGREG_LONG_LEN})) AS nlong,
             length(regexp_replace(text, '\s', '', 'g')) AS nonws
      FROM raw
    ),
    f AS MATERIALIZED (
      SELECT doc_id, 1.0 AS x0,
             CASE WHEN nw = 0 THEN 0.0 ELSE CAST(nstop AS DOUBLE) / nw END AS x1,
             least(CASE WHEN nw = 0 THEN 0.0 ELSE CAST(nonws AS DOUBLE) / nw END,
                   {LOGREG_MWL_CAP}) AS x2,
             CASE WHEN nw = 0 THEN 0.0 ELSE CAST(nlong AS DOUBLE) / nw END AS x3,
             CAST(least(nw, {LOGREG_LEN_CAP}) AS DOUBLE) / 100.0 AS x4,
             CASE WHEN nw >= {LOGREG_LABEL_MIN_WORDS}
                   AND (CASE WHEN nw = 0 THEN 0.0
                             ELSE CAST(nstop AS DOUBLE) / nw END)
                       >= {LOGREG_LABEL_MIN_STOP}
                  THEN 1.0 ELSE 0.0 END AS y{tr_col}
      FROM cnt
    ),
    nn AS MATERIALIZED (SELECT COUNT(*) AS n FROM f{tr_f}),
    mm AS MATERIALIZED (SELECT {mm} FROM f{tr_f}),
    mv AS MATERIALIZED (SELECT {mv} FROM mm CROSS JOIN nn),
    vv AS MATERIALIZED (SELECT {vv} FROM f CROSS JOIN mv{tr_f}),
    sdv AS MATERIALIZED (SELECT {sdv} FROM vv CROSS JOIN nn),
    s AS MATERIALIZED (SELECT {std} FROM f CROSS JOIN mv CROSS JOIN sdv),
    w0 AS MATERIALIZED (SELECT {w0}),
    {body}{tail}
    """


@register(
    "logreg_quality_score",
    oracle=_lr_oracle_sql(),
    description=f"Trained quality classifier (fastText-architecture"
    f" distillation, Joulin et al. 2016; the CCNet/LLaMA curation recipe"
    f" trains exactly this shape on weakly-labeled examples): logistic"
    f" regression over {_LR_NFEAT - 1} cheap per-doc features (stopword"
    f" ratio, capped mean word length, long-token ratio, saturated length)"
    f" fit by {LOGREG_ROUNDS} rounds of full-batch gradient descent against"
    f" the weak rule label (nw >= {LOGREG_LABEL_MIN_WORDS} AND stop_ratio"
    f" >= {LOGREG_LABEL_MIN_STOP}), then every doc scored 0..1"
    f" (score_micro = floor(1e6 * sigma(w.x))). Completes the curation"
    f" scorer triad: NB (generative) + DSIR (importance ratio) +"
    f" discriminative (this). Determinism: per-row contributions to every"
    f" corpus reduction floor-scale to BIGINT before the sum (exact,"
    f" order-independent); per-row math uses only correctly-rounded IEEE"
    f" ops with a rational sigmoid (no exp), identical association order"
    f" on both engines -- weights and scores match bit-for-bit. Scale"
    f" shape: one cached 6-double projection of the corpus, then"
    f" {LOGREG_ROUNDS + 2} map-side-combined aggregates each returning ONE"
    f" {_LR_NFEAT}-scalar row to the driver (the Lloyd/BPE precedent);"
    f" scoring is row-local. Linear at any corpus size; driver traffic is"
    f" O(rounds), not O(rows).",
)
def logreg_quality_score(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    return logreg_quality_frame(d)


def logreg_holdout_report_frame(d: DataFrame) -> DataFrame:
    """Leakage-free evaluation of the trained scorer: fit ONLY on the
    md5-hash train bucket (moments included -- heldout rows influence
    nothing), score everything, roll up per-split confusion counts."""
    sc = logreg_quality_frame(d, train_bucket=LOGREG_TRAIN_BUCKET)
    correct = F.when(
        F.col("predicted") == (F.col("weak_label") == 1), F.lit(1)
    ).otherwise(F.lit(0))
    return (
        sc.groupBy(
            F.when(F.col("tr"), "train").otherwise("heldout").alias("split")
        )
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("weak_label").alias("n_pos"),
            F.sum(F.when(F.col("predicted"), F.lit(1)).otherwise(F.lit(0))).alias(
                "n_pred_pos"
            ),
            F.sum(correct).alias("n_correct"),
        )
        .select(
            "split",
            "n_docs",
            "n_pos",
            "n_pred_pos",
            "n_correct",
            F.floor((F.lit(1000.0) * F.col("n_correct")) / F.col("n_docs")).alias(
                "accuracy_milli"
            ),
        )
    )


@register(
    "logreg_holdout_eval",
    oracle=_lr_oracle_sql(train=True),
    description=f"Leakage-free evaluation of the trained quality scorer"
    f" (the protocol FineWeb-Edu/CCNet-style classifier curation demands"
    f" before trusting a filter): the SAME logistic-regression fit as"
    f" logreg_quality_score but every fit-side reduction -- doc count,"
    f" standardization moments, all {LOGREG_ROUNDS} gradient rounds -- sees"
    f" ONLY the md5(doc_id) < {LOGREG_TRAIN_BUCKET}% train bucket (the"
    f" dataset_split_assign hash rule: row-local, stable, growth-proof);"
    f" every doc is then scored and the output is the per-split confusion"
    f" rollup (n_docs / n_pos / n_pred_pos / n_correct / accuracy_milli,"
    f" exact integer arithmetic). Heldout accuracy tracking train accuracy"
    f" is the generalization evidence; a gap is overfit. Same determinism"
    f" contract and scale shape as the base scorer (one cached projection,"
    f" one-row aggregates, row-local scoring) -- the split predicate only"
    f" filters the reduction inputs.",
)
def logreg_holdout_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    return logreg_holdout_report_frame(d)


# --- trained-model drift monitor (PSI over score deciles) --------------------

# The serving-time half of model ops: once a trained scorer filters live
# traffic, the FIRST production alarm is its score distribution drifting
# off the distribution it was validated on (population stability index --
# the standard model-monitoring metric). Binning is exact (fixed decile
# edges over score_micro), shares are smoothed exact integers, and the
# log-ratio uses the corpus-wide quarter-bit integer log2 (the NB/PMI
# machinery) -- so the whole report is deterministic cross-engine, like
# every other number the trained family emits. Units: psi_contrib is
# micro-share x quarter-bit (shares carry a 1e6 micro scale, the log a x4
# quarter-bit scale), so PSI_ln = sum(psi_contrib) / 4e6 * ln 2 when a
# natural-log threshold table (0.1 / 0.25) is needed.
DRIFT_REF_BUCKET = 50  # md5(doc_id) < 50 = the 'reference' half (stands in
# for the validation-time corpus; production wires a time predicate here)
DRIFT_BINS = 10


def score_drift_frame(d: DataFrame) -> DataFrame:
    """Per-decile drift report of the trained quality scorer: reference vs
    current counts, smoothed milli..micro shares, quarter-bit log share
    ratio, and the per-bin PSI contribution (sum the column for the scalar
    monitor). Scale shape: the scorer's passes + one 10-row rollup; the
    drift arithmetic is bounded by DRIFT_BINS forever."""
    spark = d.sparkSession
    scored = logreg_quality_frame(d)
    sided = scored.join(
        d.select(
            "doc_id",
            (
                dedup.hash_bucket(F.col("doc_id").cast("string")) < DRIFT_REF_BUCKET
            ).alias("ref"),
        ),
        "doc_id",
    )
    width = LOGREG_SCALE // DRIFT_BINS
    binned = sided.select(
        F.least(
            F.floor(F.col("score_micro") / F.lit(float(width))),
            F.lit(DRIFT_BINS - 1),
        )
        .cast("bigint")
        .alias("bin"),
        "ref",
    )
    counts = binned.groupBy("bin").agg(
        F.sum(F.when(F.col("ref"), 1).otherwise(0)).cast("bigint").alias("ref_n"),
        F.sum(F.when(~F.col("ref"), 1).otherwise(0)).cast("bigint").alias("cur_n"),
    )
    allbins = spark.range(DRIFT_BINS).select(F.col("id").cast("bigint").alias("bin"))
    full = allbins.join(counts, "bin", "left").select(
        "bin",
        F.coalesce(F.col("ref_n"), F.lit(0)).cast("bigint").alias("ref_n"),
        F.coalesce(F.col("cur_n"), F.lit(0)).cast("bigint").alias("cur_n"),
    )
    return _psi_report(full)


def score_bin_counts(scored: DataFrame) -> DataFrame:
    """Fixed-decile histogram (bin, n) of a scored frame, all DRIFT_BINS
    rows present -- the 10-integer mergeable state the drift monitor runs
    on. Persist THIS at model-publish time (models.save_logreg_model
    baseline=) and later sessions PSI-compare against the stored copy."""
    spark = scored.sparkSession
    width = LOGREG_SCALE // DRIFT_BINS
    counts = (
        scored.select(
            F.least(
                F.floor(F.col("score_micro") / F.lit(float(width))),
                F.lit(DRIFT_BINS - 1),
            )
            .cast("bigint")
            .alias("bin")
        )
        .groupBy("bin")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    )
    allbins = spark.range(DRIFT_BINS).select(F.col("id").cast("bigint").alias("bin"))
    return allbins.join(counts, "bin", "left").select(
        "bin", F.coalesce(F.col("n"), F.lit(0)).cast("bigint").alias("n")
    )


def score_drift_vs_baseline_frame(
    scored: DataFrame, baseline: DataFrame
) -> DataFrame:
    """The production drift monitor: PSI of a serving session's score
    distribution against the PERSISTED validation-time histogram (the
    reference side is the 10 stored bin counts, not a same-corpus split).
    ``scored`` is logreg_score(d, reloaded_model); ``baseline`` is the
    (bin, n) frame models.load_score_baseline returns. Same report shape
    and exact-integer units as score_drift_frame. Scale: the scorer's
    passes + one DRIFT_BINS-row rollup; the baseline is 10 rows, broadcast
    by size."""
    full = score_bin_counts(scored).join(
        baseline.select("bin", F.col("n").alias("ref_n")), "bin", "left"
    ).select(
        "bin",
        F.coalesce(F.col("ref_n"), F.lit(0)).cast("bigint").alias("ref_n"),
        F.col("n").cast("bigint").alias("cur_n"),
    )
    return _psi_report(full)


def _psi_report(full: DataFrame) -> DataFrame:
    """PSI arithmetic over a complete (bin, ref_n, cur_n) frame: smoothed
    exact micro shares, quarter-bit integer log2 ratio, per-bin PSI
    contribution in micro-share x quarter-bit units (PSI_ln = sum/4e6 *
    ln 2). Shared by the split-based and stored-baseline monitors so the
    exact-integer arithmetic can never drift between them."""
    tot = full.agg(F.sum("ref_n").alias("nref"), F.sum("cur_n").alias("ncur"))
    j = full.crossJoin(F.broadcast(tot))
    # Laplace smoothing (+1 per bin, +DRIFT_BINS per side) keeps empty bins
    # finite and both engines' integers identical
    ref_share = F.floor(
        F.lit(1_000_000.0) * (F.col("ref_n") + 1) / (F.col("nref") + DRIFT_BINS)
    ).cast("bigint")
    cur_share = F.floor(
        F.lit(1_000_000.0) * (F.col("cur_n") + 1) / (F.col("ncur") + DRIFT_BINS)
    ).cast("bigint")
    qlog = F.expr(
        f"({_QS(f'(cur_n + 1) * (nref + {DRIFT_BINS})')})"
        f" - ({_QS(f'(ref_n + 1) * (ncur + {DRIFT_BINS})')})"
    ).cast("bigint")
    return (
        j.select(
            "bin",
            "ref_n",
            "cur_n",
            ref_share.alias("ref_share_micro"),
            cur_share.alias("cur_share_micro"),
            qlog.alias("log_ratio_qbits"),
            ((cur_share - ref_share) * qlog).cast("bigint").alias("psi_contrib"),
        )
        .orderBy("bin")
    )


def _drift_oracle_sql() -> str:
    from flink_cdc_fluss_quickstart_spark.plans.pipeline_queries import _duck_hex

    hex8 = _duck_hex("md5(CAST(doc_id AS VARCHAR))")
    width = LOGREG_SCALE // DRIFT_BINS
    return f"""
    WITH scored AS MATERIALIZED ({_lr_oracle_sql()}),
    sided AS (
      SELECT doc_id, score_micro,
             (CAST({hex8} % 100 AS BIGINT) < {DRIFT_REF_BUCKET}) AS ref
      FROM scored
    ),
    binned AS (
      SELECT LEAST(CAST(floor(score_micro / {float(width)}) AS BIGINT),
                   {DRIFT_BINS - 1}) AS bin, ref
      FROM sided
    ),
    counts AS (
      SELECT bin,
             CAST(SUM(CASE WHEN ref THEN 1 ELSE 0 END) AS BIGINT) AS ref_n,
             CAST(SUM(CASE WHEN NOT ref THEN 1 ELSE 0 END) AS BIGINT) AS cur_n
      FROM binned GROUP BY bin
    ),
    allbins AS (SELECT CAST(range AS BIGINT) AS bin FROM range({DRIFT_BINS})),
    fullb AS (
      SELECT a.bin, COALESCE(c.ref_n, 0) AS ref_n, COALESCE(c.cur_n, 0) AS cur_n
      FROM allbins a LEFT JOIN counts c USING (bin)
    ),
    tot AS (SELECT CAST(SUM(ref_n) AS BIGINT) AS nref,
                   CAST(SUM(cur_n) AS BIGINT) AS ncur FROM fullb),
    j AS (SELECT * FROM fullb CROSS JOIN tot)
    SELECT bin, ref_n, cur_n,
           CAST(floor(1000000.0 * (ref_n + 1) / (nref + {DRIFT_BINS})) AS BIGINT)
             AS ref_share_micro,
           CAST(floor(1000000.0 * (cur_n + 1) / (ncur + {DRIFT_BINS})) AS BIGINT)
             AS cur_share_micro,
           CAST(({_QD(f'(cur_n + 1) * (nref + {DRIFT_BINS})')})
              - ({_QD(f'(ref_n + 1) * (ncur + {DRIFT_BINS})')}) AS BIGINT)
             AS log_ratio_qbits,
           CAST((CAST(floor(1000000.0 * (cur_n + 1) / (ncur + {DRIFT_BINS})) AS BIGINT)
               - CAST(floor(1000000.0 * (ref_n + 1) / (nref + {DRIFT_BINS})) AS BIGINT))
              * (({_QD(f'(cur_n + 1) * (nref + {DRIFT_BINS})')})
               - ({_QD(f'(ref_n + 1) * (ncur + {DRIFT_BINS})')})) AS BIGINT)
             AS psi_contrib
    FROM j ORDER BY bin
    """


@register(
    "score_drift_report",
    oracle=_drift_oracle_sql(),
    description=f"Trained-model DRIFT monitor -- the serving-time model-ops"
    f" step after fit/eval/persist/serve: population-stability-index"
    f" report of the trained quality scorer's score distribution, reference"
    f" half (md5(doc_id) < {DRIFT_REF_BUCKET}, standing in for the"
    f" validation-time corpus; production wires a time predicate) vs the"
    f" current half, over {DRIFT_BINS} fixed score-decile bins. Per bin:"
    f" exact counts, Laplace-smoothed micro shares, quarter-bit integer"
    f" log2 share ratio (the NB/PMI bit-length machinery -- no float logs"
    f" cross-engine), and the PSI contribution in micro-share x"
    f" quarter-bit units (sum the column; PSI_ln = sum/4e6 * ln2 against"
    f" the usual 0.1/0.25 thresholds). Scale shape:"
    f" the scorer's own passes plus ONE {DRIFT_BINS}-row rollup -- the"
    f" drift arithmetic is bin-bounded forever; nothing new is"
    f" corpus-sized. Completes the model lifecycle: fit (logreg_quality_"
    f"score) -> leakage-free eval (logreg_holdout_eval) -> persist/reload"
    f" (models.py) -> serve (logreg_score) -> MONITOR (this).",
)
def score_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    return score_drift_frame(d)


# --- trained-model calibration report (reliability curve + ECE) --------------


def calibration_frame(d: DataFrame) -> DataFrame:
    """Reliability diagram of the trained quality scorer: per score-decile,
    the mean predicted probability vs the observed weak-label rate, the
    absolute gap, and the doc-weighted ECE contribution (sum the column and
    divide by N for expected calibration error). A well-calibrated scorer
    tracks the diagonal; a confident-but-wrong one shows large gaps in the
    extreme bins -- the standard go/no-go before using scores as sampling
    WEIGHTS (miscalibrated scores still rank, they just can't weight).
    All milli-units are exact integer divisions, so both engines agree
    bit-for-bit; scale shape: the scorer's passes + one 10-row rollup."""
    spark = d.sparkSession
    scored = logreg_quality_frame(d)
    width = LOGREG_SCALE // DRIFT_BINS
    binned = scored.select(
        F.least(
            F.floor(F.col("score_micro") / F.lit(float(width))),
            F.lit(DRIFT_BINS - 1),
        )
        .cast("bigint")
        .alias("bin"),
        "score_micro",
        "weak_label",
    )
    counts = binned.groupBy("bin").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("score_micro").cast("bigint").alias("ssum"),
        F.sum("weak_label").cast("bigint").alias("npos"),
    )
    allbins = spark.range(DRIFT_BINS).select(F.col("id").cast("bigint").alias("bin"))
    full = allbins.join(counts, "bin", "left").select(
        "bin",
        F.coalesce(F.col("n_docs"), F.lit(0)).cast("bigint").alias("n_docs"),
        F.coalesce(F.col("ssum"), F.lit(0)).cast("bigint").alias("ssum"),
        F.coalesce(F.col("npos"), F.lit(0)).cast("bigint").alias("npos"),
    )
    mean_score = F.expr("CASE WHEN n_docs = 0 THEN NULL"
                        " ELSE ssum div (n_docs * 1000) END").cast("bigint")
    label_rate = F.expr("CASE WHEN n_docs = 0 THEN NULL"
                        " ELSE (1000 * npos) div n_docs END").cast("bigint")
    gap = F.abs(mean_score - label_rate).cast("bigint")
    return full.select(
        "bin",
        "n_docs",
        mean_score.alias("mean_score_milli"),
        label_rate.alias("label_rate_milli"),
        gap.alias("gap_milli"),
        F.coalesce(F.col("n_docs") * gap, F.lit(0)).cast("bigint").alias("ece_contrib"),
    ).orderBy("bin")


def _calibration_oracle_sql() -> str:
    width = LOGREG_SCALE // DRIFT_BINS
    return f"""
    WITH scored AS MATERIALIZED ({_lr_oracle_sql()}),
    binned AS (
      SELECT LEAST(CAST(floor(score_micro / {float(width)}) AS BIGINT),
                   {DRIFT_BINS - 1}) AS bin,
             score_micro, weak_label
      FROM scored
    ),
    counts AS (
      SELECT bin, CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(score_micro) AS BIGINT) AS ssum,
             CAST(SUM(weak_label) AS BIGINT) AS npos
      FROM binned GROUP BY bin
    ),
    allbins AS (SELECT CAST(range AS BIGINT) AS bin FROM range({DRIFT_BINS})),
    fullb AS (
      SELECT a.bin,
             COALESCE(c.n_docs, 0) AS n_docs,
             COALESCE(c.ssum, 0) AS ssum,
             COALESCE(c.npos, 0) AS npos
      FROM allbins a LEFT JOIN counts c USING (bin)
    ),
    m AS (
      SELECT bin, n_docs,
             CASE WHEN n_docs = 0 THEN NULL
                  ELSE ssum // (n_docs * 1000) END AS mean_score_milli,
             CASE WHEN n_docs = 0 THEN NULL
                  ELSE (1000 * npos) // n_docs END AS label_rate_milli
      FROM fullb
    )
    SELECT bin, n_docs,
           CAST(mean_score_milli AS BIGINT) AS mean_score_milli,
           CAST(label_rate_milli AS BIGINT) AS label_rate_milli,
           CAST(abs(mean_score_milli - label_rate_milli) AS BIGINT) AS gap_milli,
           CAST(COALESCE(n_docs * abs(mean_score_milli - label_rate_milli), 0)
                AS BIGINT) AS ece_contrib
    FROM m ORDER BY bin
    """


@register(
    "logreg_calibration_report",
    oracle=_calibration_oracle_sql(),
    description=f"Trained-scorer CALIBRATION report (reliability diagram +"
    f" expected calibration error): per score-decile bin, the mean"
    f" predicted probability (milli) vs the observed weak-label rate"
    f" (milli), their absolute gap, and the doc-weighted ECE contribution"
    f" (sum/N = ECE, Naeini et al. 2015's binned estimator). The model-ops"
    f" step between accuracy eval and deployment: a scorer can rank well"
    f" yet be miscalibrated, which breaks score-WEIGHTED sampling"
    f" (FineWeb-Edu-style threshold curation reads the curve before"
    f" trusting a cutoff). Exact integer milli-units (BIGINT div) on both"
    f" engines; empty bins emit NULL curve points and 0 ECE mass."
    f" Scale shape: the scorer's own passes plus ONE {DRIFT_BINS}-row"
    f" rollup -- nothing new is corpus-sized.",
)
def logreg_calibration_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    return calibration_frame(d)


# --- hashed n-gram language classifier: distributed sparse GD ----------------

# The fastText text-classification architecture at its langid flagship task
# (Joulin et al. 2016; fastText's lid.176 is THE standard pipeline langid
# model): unigram+bigram features hashed into a fixed bucket space, a linear
# model fit by gradient descent. Unlike logreg_quality_score's dense
# 5-feature model (weights = driver scalars, the Lloyd precedent), the
# weight vector here is ITSELF a DataFrame keyed by bucket: gradients are
# bucket-keyed aggregates and updates are bucket-keyed joins, so NOTHING
# model-sized ever visits the driver -- the shape that scales to fastText's
# production 2M-bucket space on a 1000-executor cluster.
#
# Determinism: the same floor-scaled-BIGINT discipline as logreg --
# per-(doc,bucket) dot-product and gradient contributions quantize to
# BIGINT before their groupBy sums (order-independent exact integers), the
# sigmoid is the rational one, division/association order mirrored exactly.
HLR_BUCKETS = 1024
HLR_ROUNDS = 10
HLR_LR = 3000.0
# drop grams seen in more than 1/4 of docs (df cap): the Zipf head carries
# no class signal and would otherwise dominate every normalized feature
# vector -- same corpus-derived stop-gram rule as winnowing / the LM head
HLR_DF_CAP_DENOM = 4
HLR_TARGET_LANG = "en"
# weight lineage flattens every K rounds (localCheckpoint, the BPE
# merge-loop precedent): the frame is <= HLR_BUCKETS rows, so the pin is
# metadata-sized while keeping the logical plan O(K) deep at any depth
_HLR_CHECKPOINT_EVERY = 3


def hashed_gram_frame(d: DataFrame) -> DataFrame:
    """(doc_id, gram) stream of whitespace unigrams + adjacent bigrams --
    fastText's default gram inventory. Blank docs contribute nothing."""
    w = text.tokens(F.col("text"))
    base = d.select("doc_id", w.alias("__w"))
    uni = base.select("doc_id", F.explode("__w").alias("gram"))
    big = base.filter(F.size("__w") >= 2).select(
        "doc_id",
        F.explode(
            F.expr(
                "transform(sequence(1, size(__w) - 1),"
                " i -> concat(element_at(__w, i), ' ', element_at(__w, i + 1)))"
            )
        ).alias("gram"),
    )
    return uni.unionAll(big)


def _hlr_bucket(gram: F.Column) -> F.Column:
    return dedup.md5_hex_prefix(F.concat(F.lit("hg|"), gram)) % HLR_BUCKETS


# weight-frame join strategy bound: up to this many (b[, cls], w) rows the
# weight side broadcasts (a few MB -- the fastText-langid-at-1024-buckets
# case, and still fine at 2M buckets binary); past it (2M buckets x 176
# classes = 352M rows) forcing a broadcast would OOM the driver build side,
# so the hint is dropped and AQE plans the bucket-keyed join as a shuffle
# join -- the graceful strategy switch the 100 TB posture requires
_HLR_BROADCAST_MAX_ROWS = 4_000_000


def _hlr_wside(weights: DataFrame, n_rows_bound: int) -> DataFrame:
    """The weight frame as a join side: broadcast-hinted while the bucket
    space is provably broadcast-sized, unhinted (planner's choice) beyond."""
    return F.broadcast(weights) if n_rows_bound <= _HLR_BROADCAST_MAX_ROWS else weights


def _corpus_side(df: DataFrame) -> DataFrame:
    """A join side that is CORPUS-sized: pin the planner to sort-merge for
    the join it enters. The inverse of _hlr_wside's rule -- a frame with a
    provable row bound may broadcast, a corpus-sized one must NEVER: static
    size estimates for frames derived through explodes and aggregates can
    undershoot the broadcast threshold by orders of magnitude, and the
    planner then schedules a driver-sized broadcast build of data that
    scales with the corpus (measured r13: the x100 multiclass GD loop
    statically planned a BroadcastExchange of the (doc, cls)-keyed err
    frame -- a ~512 MB hash-table build that OOMed a 16 GiB single-JVM
    driver; at 100 TB that build is fatal on any driver). Sort-merge keys
    both sides through the shuffle, the only join shape whose memory is
    partition-bounded at every scale."""
    return df.hint("merge")


def _hlr_kept_feats(d: DataFrame, n: int) -> tuple[DataFrame, DataFrame]:
    """Shared featurization behind the binary AND multiclass langid fits:
    gram explode -> distinct-df census -> broadcast the bounded hot head
    into a left-anti filter -> count-normalized (doc, bucket, f) rollup.
    Returns (feats, hot); callers cache feats (it is the only corpus-sized
    state any GD loop touches)."""
    cap = max(n // HLR_DF_CAP_DENOM, 1)
    grams = hashed_gram_frame(d)
    census = grams.distinct().groupBy("gram").agg(F.count(F.lit(1)).alias("df"))
    hot = census.filter(F.col("df") > cap).select("gram")
    kept = grams.join(F.broadcast(hot), "gram", "left_anti")
    fb = kept.groupBy("doc_id", _hlr_bucket(F.col("gram")).alias("b")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    ngd = fb.groupBy("doc_id").agg(F.sum("cnt").alias("ng"))
    feats = fb.join(ngd, "doc_id").select(
        "doc_id", "b", (F.col("cnt").cast("double") / F.col("ng")).alias("f")
    )
    return feats, hot


def _hlr_fit_full(d: DataFrame) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame]:
    """Fit the hashed-gram binary langid model; returns (weights, hot,
    feats, labels) -- feats/labels cached so the registered frame can score
    without re-exploding the corpus.

    Execution shape (100 TB posture): one gram explode -> distinct-df
    census; the df-capped Zipf HEAD (bounded small: at most
    total_grams/cap entries) broadcasts into a left-anti filter, never the
    tail; features collapse to one (doc, bucket)-keyed rollup (cached, the
    only corpus-sized state the loop touches). Each GD round is two
    broadcast-joins + two exact-integer aggregates -- one doc-keyed, one
    bucket-keyed (<= HLR_BUCKETS rows) -- and the weight update is a
    bucket-keyed join; weights NEVER visit the driver. Once features are
    built, round cost depends only on the (doc, bucket) rollup size, not
    the corpus text; lineage is pinned every _HLR_CHECKPOINT_EVERY rounds."""
    scale = float(LOGREG_SCALE)
    labels = _cached(
        d.select(
            "doc_id",
            F.when(F.col("lang") == HLR_TARGET_LANG, F.lit(1.0)).otherwise(F.lit(0.0)).alias("y"),
        )
    )
    n = labels.count()
    feats0, hot = _hlr_kept_feats(d, n)
    feats = _cached(feats0.join(labels, "doc_id").select("doc_id", "b", "f", "y"))
    weights = feats.select("b").distinct().select("b", F.lit(0.0).alias("w"))

    def z_frame(wf: DataFrame) -> DataFrame:
        return (
            feats.join(_hlr_wside(wf, HLR_BUCKETS), "b")
            .select(
                "doc_id",
                "y",
                F.floor(F.lit(scale) * (F.col("w") * F.col("f"))).alias("t"),
            )
            .groupBy("doc_id", "y")
            .agg(F.sum("t").alias("zm"))
        )

    def sig_of(zm: F.Column) -> F.Column:
        return _lr_sig(zm / F.lit(scale))

    for r in range(HLR_ROUNDS):
        err = z_frame(weights).select(
            "doc_id", (sig_of(F.col("zm")) - F.col("y")).alias("e")
        )
        g = (
            feats.join(_corpus_side(err), "doc_id")
            .select("b", F.floor(F.lit(scale) * (F.col("e") * F.col("f"))).alias("t"))
            .groupBy("b")
            .agg(F.sum("t").alias("gs"))
        )
        weights = weights.join(g, "b", "left").select(
            "b",
            (
                F.col("w")
                - F.lit(HLR_LR)
                * ((F.coalesce(F.col("gs"), F.lit(0)) / F.lit(scale)) / F.lit(n))
            ).alias("w"),
        )
        if r % _HLR_CHECKPOINT_EVERY == _HLR_CHECKPOINT_EVERY - 1:
            weights = weights.localCheckpoint()
    return weights, hot, feats, labels


def hashed_langid_fit(d: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Public fit surface: the trained model is the pair (weights, hot) --
    a <= HLR_BUCKETS-row bucket-keyed weight frame plus the df-capped hot
    gram list. Both broadcastable; hand them to hashed_langid_score to
    serve any corpus or stream micro-batch."""
    weights, hot, _feats, _labels = _hlr_fit_full(d)
    return weights, hot


def hashed_langid_score(
    d: DataFrame,
    weights: DataFrame,
    hot: DataFrame,
    feats: DataFrame | None = None,
) -> DataFrame:
    """Score docs with a TRAINED model -- the serving path: per-doc
    features are row-local given the broadcast hot list, then one
    broadcast join with the bucket-keyed weights and one doc-keyed
    exact-integer aggregate. No training state, no cross-doc coupling, so
    scores are identical however the docs are batched (streaming
    micro-batch == batch of the union; tests/test_streaming_dedup.py)."""
    scale = float(LOGREG_SCALE)
    if feats is None:
        grams = hashed_gram_frame(d)
        kept = grams.join(F.broadcast(hot), "gram", "left_anti")
        fb = kept.groupBy("doc_id", _hlr_bucket(F.col("gram")).alias("b")).agg(
            F.count(F.lit(1)).alias("cnt")
        )
        ngd = fb.groupBy("doc_id").agg(F.sum("cnt").alias("ng"))
        feats = fb.join(ngd, "doc_id").select(
            "doc_id", "b", (F.col("cnt").cast("double") / F.col("ng")).alias("f")
        )
    zf = (
        feats.join(_hlr_wside(weights, HLR_BUCKETS), "b")
        .select("doc_id", F.floor(F.lit(scale) * (F.col("w") * F.col("f"))).alias("t"))
        .groupBy("doc_id")
        .agg(F.sum("t").alias("zm"))
    )
    sm = F.floor(F.lit(scale) * _lr_sig(F.coalesce(F.col("zm"), F.lit(0)) / F.lit(scale)))
    return d.select("doc_id").join(zf, "doc_id", "left").select(
        "doc_id",
        sm.alias("score_micro"),
        (sm > F.lit(LOGREG_SCALE // 2)).alias("predicted"),
    )


def hashed_langid_frame(d: DataFrame) -> DataFrame:
    """Fit + score every doc (the registered query): fit once, score from
    the fit's own cached feature rollup (no second corpus explode), label
    alongside for the confusion readout."""
    weights, hot, feats, labels = _hlr_fit_full(d)
    scored = hashed_langid_score(
        d, weights, hot, feats=feats.select("doc_id", "b", "f")
    )
    return labels.join(scored, "doc_id").select(
        "doc_id",
        F.col("y").cast("bigint").alias("is_target_lang"),
        "score_micro",
        "predicted",
    )


def _hlr_oracle_sql() -> str:
    """DuckDB mirror: unrolled GD rounds with bucket-keyed weight CTEs --
    the same joins, quantized sums, and association order as the frames."""
    from flink_cdc_fluss_quickstart_spark.plans.pipeline_queries import _duck_hex

    S = _LR_S
    hx = _duck_hex("md5('hg|' || gram)")
    bucket = f"({hx} % {HLR_BUCKETS})"

    def sig(z: str) -> str:
        return f"(0.5 + 0.5 * ({z} / (1.0 + abs({z}))))"

    rounds = []
    for r in range(1, HLR_ROUNDS + 1):
        rounds.append(
            f"z{r} AS MATERIALIZED (SELECT f.doc_id, f.y,"
            f" SUM(CAST(floor({S} * (w.w * f.f)) AS BIGINT)) AS zm"
            f" FROM f JOIN w{r - 1} w USING (b) GROUP BY f.doc_id, f.y),\n"
            f"    e{r} AS MATERIALIZED (SELECT doc_id, ({sig(f'(z{r}.zm / {S})')} - z{r}.y) AS e FROM z{r}),\n"
            f"    g{r} AS MATERIALIZED (SELECT f.b,"
            f" SUM(CAST(floor({S} * (e.e * f.f)) AS BIGINT)) AS gs"
            f" FROM f JOIN e{r} e USING (doc_id) GROUP BY f.b),\n"
            f"    w{r} AS MATERIALIZED (SELECT w.b, (w.w - {HLR_LR} *"
            f" (((COALESCE(g.gs, 0) / {S}) / nn.n))) AS w"
            f" FROM w{r - 1} w LEFT JOIN g{r} g USING (b) CROSS JOIN nn)"
        )
    body = ",\n    ".join(rounds)
    zfin = f"(COALESCE(zf.zm, 0) / {S})"
    return rf"""
    WITH docs0 AS MATERIALIZED (
      SELECT doc_id, lang, {text.DUCK_TOKENS} AS w FROM documents
    ),
    lab AS MATERIALIZED (
      SELECT doc_id,
             CASE WHEN lang = '{HLR_TARGET_LANG}' THEN 1.0 ELSE 0.0 END AS y
      FROM docs0
    ),
    grams AS MATERIALIZED (
      SELECT doc_id, unnest(w) AS gram FROM docs0
      UNION ALL
      SELECT doc_id,
             unnest(list_transform(range(1, len(w)),
                                   i -> w[i] || ' ' || w[i + 1])) AS gram
      FROM docs0 WHERE len(w) >= 2
    ),
    nn AS (SELECT COUNT(*) AS n FROM docs0),
    census AS (
      SELECT gram, COUNT(DISTINCT doc_id) AS df FROM grams GROUP BY gram
    ),
    kept AS (
      SELECT g.doc_id, g.gram
      FROM grams g JOIN census c USING (gram) CROSS JOIN nn
      WHERE c.df <= GREATEST(nn.n // {HLR_DF_CAP_DENOM}, 1)
    ),
    fb AS (
      SELECT doc_id, {bucket} AS b, COUNT(*) AS cnt FROM kept GROUP BY 1, 2
    ),
    ngd AS (SELECT doc_id, SUM(cnt) AS ng FROM fb GROUP BY doc_id),
    f AS MATERIALIZED (
      SELECT fb.doc_id, fb.b, CAST(fb.cnt AS DOUBLE) / ngd.ng AS f, lab.y
      FROM fb JOIN ngd USING (doc_id) JOIN lab USING (doc_id)
    ),
    w0 AS MATERIALIZED (SELECT DISTINCT b, 0.0 AS w FROM f),
    {body},
    zf AS (
      SELECT f.doc_id, SUM(CAST(floor({S} * (w.w * f.f)) AS BIGINT)) AS zm
      FROM f JOIN w{HLR_ROUNDS} w USING (b) GROUP BY f.doc_id
    )
    SELECT lab.doc_id,
           CAST(lab.y AS BIGINT) AS is_target_lang,
           CAST(floor({S} * {sig(zfin)}) AS BIGINT) AS score_micro,
           (CAST(floor({S} * {sig(zfin)}) AS BIGINT) > {LOGREG_SCALE // 2}) AS predicted
    FROM lab LEFT JOIN zf USING (doc_id)
    """


@register(
    "hashed_ngram_langid",
    oracle=_hlr_oracle_sql(),
    description=f"Hashed n-gram language classifier (the fastText"
    f" text-classification architecture at its langid flagship task,"
    f" Joulin et al. 2016): whitespace unigrams + adjacent bigrams"
    f" feature-hashed (Weinberger et al. 2009) into {HLR_BUCKETS} buckets,"
    f" df-capped at 1/{HLR_DF_CAP_DENOM} of docs (the Zipf head carries no"
    f" class signal -- the winnow stop-gram rule), count-normalized, and a"
    f" linear model fit by {HLR_ROUNDS} rounds of full-batch GD against the"
    f" is-'{HLR_TARGET_LANG}' label. THE DISTRIBUTED-WEIGHTS COMPLEMENT to"
    f" logreg_quality_score: the weight vector is a bucket-keyed DataFrame"
    f" -- gradients are bucket-keyed integer aggregates, updates are"
    f" bucket-keyed joins, and nothing model-sized ever visits the driver,"
    f" the shape that holds at fastText's production 2M-bucket space."
    f" Rule-learned parity: ~83% accuracy vs the 56% majority class on the"
    f" synthetic corpus (asserted semantics on planted separable corpora in"
    f" tests/test_corpus_ops.py). Determinism: per-(doc,bucket)"
    f" contributions floor-scale to BIGINT before every groupBy sum;"
    f" rational sigmoid; identical association order both engines. Scale"
    f" shape: one gram census with the BOUNDED hot head broadcast"
    f" anti-joined, one cached (doc,bucket) feature rollup, then per round"
    f" two broadcast joins + one doc-keyed and one {HLR_BUCKETS}-row"
    f" bucket-keyed aggregate; weight lineage localCheckpoint-pinned every"
    f" {_HLR_CHECKPOINT_EVERY} rounds.",
)
def hashed_ngram_langid(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    return hashed_langid_frame(d)


# --- multiclass langid (one-vs-rest in ONE bucket-keyed frame) ---------------


def _hlm_fit_full(
    d: DataFrame,
) -> tuple[DataFrame, DataFrame, DataFrame, DataFrame, DataFrame, int]:
    """Fit the MULTICLASS hashed-gram langid -- the real fastText langid
    shape: one one-vs-rest linear model per language, all |langs| weight
    columns living in the SAME bucket-keyed frame keyed (b, cls).

    The algebra is the binary fit's verbatim with one extra key column:
    z becomes a (doc, cls)-keyed aggregate, gradients a (b, cls)-keyed
    aggregate, the update a (b, cls)-keyed join -- so the 100 TB posture is
    unchanged (nothing model-sized visits the driver; the weight frame is
    <= HLR_BUCKETS * |langs| rows, broadcastable at langid scale and
    shuffle-joinable at fastText's 2M-bucket space). Returns (weights, hot,
    feats, labels, classes, n); feats/labels/classes cached."""
    labels = _cached(d.select("doc_id", "lang"))
    n = labels.count()
    feats0, hot = _hlr_kept_feats(d, n)
    feats = _cached(feats0)
    classes = _cached(labels.select(F.col("lang").alias("cls")).distinct())
    k = classes.count()  # |langs| -- bounds the weight space at buckets*k
    scale = float(LOGREG_SCALE)
    weights = (
        feats.select("b")
        .distinct()
        .crossJoin(F.broadcast(classes))
        .select("b", "cls", F.lit(0.0).alias("w"))
    )
    for r in range(HLR_ROUNDS):
        z = (
            feats.join(_hlr_wside(weights, HLR_BUCKETS * k), "b")
            .select(
                "doc_id",
                "cls",
                F.floor(F.lit(scale) * (F.col("w") * F.col("f"))).alias("t"),
            )
            .groupBy("doc_id", "cls")
            .agg(F.sum("t").alias("zm"))
        )
        err = z.join(_corpus_side(labels), "doc_id").select(
            "doc_id",
            "cls",
            (
                _lr_sig(F.col("zm") / F.lit(scale))
                - F.when(F.col("lang") == F.col("cls"), F.lit(1.0)).otherwise(F.lit(0.0))
            ).alias("e"),
        )
        g = (
            feats.join(_corpus_side(err), "doc_id")
            .select(
                "b", "cls", F.floor(F.lit(scale) * (F.col("e") * F.col("f"))).alias("t")
            )
            .groupBy("b", "cls")
            .agg(F.sum("t").alias("gs"))
        )
        weights = weights.join(g, ["b", "cls"], "left").select(
            "b",
            "cls",
            (
                F.col("w")
                - F.lit(HLR_LR)
                * ((F.coalesce(F.col("gs"), F.lit(0)) / F.lit(scale)) / F.lit(n))
            ).alias("w"),
        )
        if r % _HLR_CHECKPOINT_EVERY == _HLR_CHECKPOINT_EVERY - 1:
            weights = weights.localCheckpoint()
    return weights, hot, feats, labels, classes, n


def hashed_langid_multiclass_fit(d: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Public multiclass fit surface: the model is ((b, cls, w), hot) --
    persist with models.save_langid_model(classes=True), serve with
    hashed_langid_multiclass_score."""
    weights, hot, _f, _l, _c, _n = _hlm_fit_full(d)
    return weights, hot


def hashed_langid_multiclass_score(
    d: DataFrame,
    weights: DataFrame,
    hot: DataFrame,
    feats: DataFrame | None = None,
) -> DataFrame:
    """argmax serving over a trained one-vs-rest frame: per-doc features
    (row-local given the broadcast hot list), one broadcast join with the
    (b, cls) weights, one (doc, cls)-keyed exact-integer aggregate, then
    the argmax window. Deterministic: zm is an exact BIGINT, ties break on
    cls ascending -- identical on any engine. A doc with no kept grams
    scores 0 for every class and predicts the lexicographically first one
    (the defined cold-doc fallback)."""
    from pyspark.sql.window import Window

    scale = float(LOGREG_SCALE)
    classes = weights.select("cls").distinct()
    k = classes.count()
    if feats is None:
        feats, _hot = _hlr_kept_feats_from_hot(d, hot)
    zf = (
        feats.join(_hlr_wside(weights, HLR_BUCKETS * k), "b")
        .select(
            "doc_id", "cls", F.floor(F.lit(scale) * (F.col("w") * F.col("f"))).alias("t")
        )
        .groupBy("doc_id", "cls")
        .agg(F.sum("t").alias("zm"))
    )
    full = (
        d.select("doc_id")
        .crossJoin(F.broadcast(classes))
        .join(_corpus_side(zf), ["doc_id", "cls"], "left")
        .select("doc_id", "cls", F.coalesce(F.col("zm"), F.lit(0)).alias("zm"))
    )
    rn = F.row_number().over(
        Window.partitionBy("doc_id").orderBy(F.col("zm").desc(), F.col("cls").asc())
    )
    return (
        full.withColumn("rn", rn)
        .filter(F.col("rn") == 1)
        .select("doc_id", F.col("cls").alias("predicted"), F.col("zm").alias("zm_micro"))
    )


def _hlr_kept_feats_from_hot(d: DataFrame, hot: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Serving-side featurization: same rollup as _hlr_kept_feats but the
    hot list is the TRAINED model's, not re-derived from serving traffic
    (a reloaded model must featurize exactly as the fit did)."""
    grams = hashed_gram_frame(d)
    kept = grams.join(F.broadcast(hot), "gram", "left_anti")
    fb = kept.groupBy("doc_id", _hlr_bucket(F.col("gram")).alias("b")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    ngd = fb.groupBy("doc_id").agg(F.sum("cnt").alias("ng"))
    feats = fb.join(ngd, "doc_id").select(
        "doc_id", "b", (F.col("cnt").cast("double") / F.col("ng")).alias("f")
    )
    return feats, hot


def hashed_langid_multiclass_frame(d: DataFrame) -> DataFrame:
    """Fit + predict every doc, emit the |langs|^2-bounded confusion rollup
    (true lang x predicted lang x doc count) -- the readout a langid
    evaluation reads (fastText's test command prints exactly this matrix's
    diagonal mass)."""
    weights, hot, feats, labels, _classes, _n = _hlm_fit_full(d)
    pred = hashed_langid_multiclass_score(d, weights, hot, feats=feats)
    return (
        labels.join(_corpus_side(pred), "doc_id")
        .groupBy("lang", "predicted")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .orderBy("lang", "predicted")
    )


def _hlm_oracle_sql() -> str:
    """DuckDB mirror of the multiclass fit: the binary oracle's CTE chain
    with the cls key threaded through every round (materialized -- each
    w_r feeds two consumers and would otherwise inline exponentially)."""
    from flink_cdc_fluss_quickstart_spark.plans.pipeline_queries import _duck_hex

    S = _LR_S
    hx = _duck_hex("md5('hg|' || gram)")
    bucket = f"({hx} % {HLR_BUCKETS})"

    def sig(z: str) -> str:
        return f"(0.5 + 0.5 * ({z} / (1.0 + abs({z}))))"

    rounds = []
    for r in range(1, HLR_ROUNDS + 1):
        rounds.append(
            f"z{r} AS MATERIALIZED (SELECT f.doc_id, w.cls,"
            f" SUM(CAST(floor({S} * (w.w * f.f)) AS BIGINT)) AS zm"
            f" FROM f JOIN w{r - 1} w USING (b) GROUP BY f.doc_id, w.cls),\n"
            f"    e{r} AS MATERIALIZED (SELECT z.doc_id, z.cls,"
            f" ({sig(f'(z.zm / {S})')} -"
            f" CASE WHEN l.lang = z.cls THEN 1.0 ELSE 0.0 END) AS e"
            f" FROM z{r} z JOIN lab l USING (doc_id)),\n"
            f"    g{r} AS MATERIALIZED (SELECT f.b, e.cls,"
            f" SUM(CAST(floor({S} * (e.e * f.f)) AS BIGINT)) AS gs"
            f" FROM f JOIN e{r} e USING (doc_id) GROUP BY f.b, e.cls),\n"
            f"    w{r} AS MATERIALIZED (SELECT w.b, w.cls, (w.w - {HLR_LR} *"
            f" (((COALESCE(g.gs, 0) / {S}) / nn.n))) AS w"
            f" FROM w{r - 1} w LEFT JOIN g{r} g USING (b, cls) CROSS JOIN nn)"
        )
    body = ",\n    ".join(rounds)
    return rf"""
    WITH docs0 AS MATERIALIZED (
      SELECT doc_id, lang, {text.DUCK_TOKENS} AS w FROM documents
    ),
    lab AS MATERIALIZED (SELECT doc_id, lang FROM docs0),
    cls AS MATERIALIZED (SELECT DISTINCT lang AS cls FROM docs0),
    grams AS MATERIALIZED (
      SELECT doc_id, unnest(w) AS gram FROM docs0
      UNION ALL
      SELECT doc_id,
             unnest(list_transform(range(1, len(w)),
                                   i -> w[i] || ' ' || w[i + 1])) AS gram
      FROM docs0 WHERE len(w) >= 2
    ),
    nn AS (SELECT COUNT(*) AS n FROM docs0),
    census AS (
      SELECT gram, COUNT(DISTINCT doc_id) AS df FROM grams GROUP BY gram
    ),
    kept AS (
      SELECT g.doc_id, g.gram
      FROM grams g JOIN census c USING (gram) CROSS JOIN nn
      WHERE c.df <= GREATEST(nn.n // {HLR_DF_CAP_DENOM}, 1)
    ),
    fb AS (
      SELECT doc_id, {bucket} AS b, COUNT(*) AS cnt FROM kept GROUP BY 1, 2
    ),
    ngd AS (SELECT doc_id, SUM(cnt) AS ng FROM fb GROUP BY doc_id),
    f AS MATERIALIZED (
      SELECT fb.doc_id, fb.b, CAST(fb.cnt AS DOUBLE) / ngd.ng AS f
      FROM fb JOIN ngd USING (doc_id)
    ),
    w0 AS MATERIALIZED (
      SELECT b, cls, 0.0 AS w FROM (SELECT DISTINCT b FROM f) CROSS JOIN cls
    ),
    {body},
    zf AS MATERIALIZED (
      SELECT f.doc_id, w.cls, SUM(CAST(floor({S} * (w.w * f.f)) AS BIGINT)) AS zm
      FROM f JOIN w{HLR_ROUNDS} w USING (b) GROUP BY f.doc_id, w.cls
    ),
    fullz AS (
      SELECT l.doc_id, l.lang, c.cls, COALESCE(zf.zm, 0) AS zm
      FROM lab l CROSS JOIN cls c
      LEFT JOIN zf ON zf.doc_id = l.doc_id AND zf.cls = c.cls
    ),
    pred AS (
      SELECT doc_id, lang, cls,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY zm DESC, cls ASC) AS rn
      FROM fullz
    )
    SELECT lang, cls AS predicted, COUNT(*) AS n_docs
    FROM pred WHERE rn = 1 GROUP BY lang, cls ORDER BY lang, cls
    """


@register(
    "langid_multiclass",
    oracle=_hlm_oracle_sql(),
    description=f"MULTICLASS hashed n-gram language identification -- the"
    f" full fastText langid shape (Joulin et al. 2016): one one-vs-rest"
    f" linear model per language, all of them living in ONE bucket-keyed"
    f" weight frame keyed (bucket, class). The binary"
    f" hashed_ngram_langid's algebra with one extra key column: per GD"
    f" round z is a (doc, class)-keyed exact-integer aggregate, the"
    f" gradient a (bucket, class)-keyed one, the update a (bucket,"
    f" class)-keyed join -- nothing model-sized visits the driver, so the"
    f" shape holds at fastText's 176-language x 2M-bucket production"
    f" space. Serving is argmax over exact BIGINT scores with the"
    f" class-ascending tie-break (deterministic on any engine; a doc with"
    f" no kept grams predicts the lexicographically first class, the"
    f" defined cold-doc fallback). Output is the |langs|^2-bounded"
    f" confusion rollup. Same determinism contract as the whole trained"
    f" family: floor-scaled BIGINT sums, rational sigmoid, identical"
    f" association order; weight lineage localCheckpoint-pinned every"
    f" {_HLR_CHECKPOINT_EVERY} rounds.",
)
def langid_multiclass(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    return hashed_langid_multiclass_frame(d)


# --- per-source curation scorecard -------------------------------------------


def source_curation_report_frame(d: DataFrame) -> DataFrame:
    """Vendor/source scorecard: for every `source`, corpus share, token
    mass, trained-scorer quality (mean score + weak-label rate), and
    exact-duplicate incidence -- the per-feed report a curation team reads
    before renewing a data source. Pure composition of proven pieces
    (logreg scorer + md5 dup census + token counts) joined on doc_id/hash;
    all rates are exact integer milli-units (BIGINT div), so both engines
    agree bit-for-bit. Scale shape: the scorer's passes plus ONE md5-keyed
    dup census and ONE doc-keyed join; the rollup output is |sources| rows."""
    scored = logreg_quality_frame(d)
    src = d.select(
        "doc_id",
        "source",
        text.token_count(F.col("text")).alias("n_toks"),
        dedup.exact_key(F.col("text")).alias("h"),
    )
    dupc = src.groupBy("h").agg(F.count(F.lit(1)).alias("c"))
    base = src.join(dupc, "h").join(scored, "doc_id")
    return (
        base.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("n_toks").alias("tokens_total"),
            F.sum(F.when(F.col("c") > 1, F.lit(1)).otherwise(F.lit(0))).alias(
                "n_dup_docs"
            ),
            F.coalesce(F.sum("score_micro"), F.lit(0)).alias("__s"),
            F.coalesce(F.sum("weak_label"), F.lit(0)).alias("__p"),
        )
        .select(
            "source",
            "n_docs",
            "tokens_total",
            F.expr("__s div n_docs").alias("mean_score_micro"),
            F.expr("(1000 * __p) div n_docs").alias("weak_label_rate_milli"),
            "n_dup_docs",
            F.expr("(1000 * n_dup_docs) div n_docs").alias("dup_rate_milli"),
        )
    )


@register(
    "source_curation_report",
    oracle=rf"""
    WITH scoredq AS MATERIALIZED (
      SELECT * FROM ({_lr_oracle_sql()}) __lr
    ),
    src AS MATERIALIZED (
      SELECT doc_id, source,
             len({text.DUCK_TOKENS}) AS n_toks,
             md5(text) AS h
      FROM documents
    ),
    dupc AS MATERIALIZED (SELECT h, COUNT(*) AS c FROM src GROUP BY h),
    base AS (
      SELECT src.source, src.n_toks, dupc.c,
             scoredq.score_micro, scoredq.weak_label
      FROM src JOIN dupc USING (h) JOIN scoredq USING (doc_id)
    )
    SELECT source,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_toks) AS BIGINT) AS tokens_total,
           CAST(COALESCE(SUM(score_micro), 0) // COUNT(*) AS BIGINT)
             AS mean_score_micro,
           CAST((1000 * COALESCE(SUM(weak_label), 0)) // COUNT(*) AS BIGINT)
             AS weak_label_rate_milli,
           CAST(SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs,
           CAST((1000 * SUM(CASE WHEN c > 1 THEN 1 ELSE 0 END)) // COUNT(*)
                AS BIGINT) AS dup_rate_milli
    FROM base GROUP BY source
    """,
    description="Per-source curation scorecard (the data-vendor report a"
    " pipeline team reads before renewing a feed): for every `source`,"
    " doc count, token mass, the trained scorer's mean score and"
    " weak-label rate, and exact-duplicate incidence (docs whose md5(text)"
    " repeats corpus-wide). Pure composition of proven registered pieces"
    " -- the logreg scorer chain, the dedup_exact md5 census, the token"
    " counter -- joined on doc_id/hash and rolled up to |sources| rows;"
    " every rate is exact integer milli-units (BIGINT floor division), so"
    " both engines agree bit-for-bit. Scale shape: the scorer's"
    " fixed-round passes, one md5-keyed census groupBy, one doc-keyed"
    " join, one |sources|-row rollup -- linear at any corpus size.",
)
def source_curation_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    return source_curation_report_frame(d)
