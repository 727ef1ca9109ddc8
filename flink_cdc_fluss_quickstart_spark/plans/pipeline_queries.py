"""Training-data pipeline composition queries over `documents`: deterministic
dataset splits, distribution stats, and filter-routing -- the steps between
raw corpus and training shards.

All row-local hashing is md5-based (reproducible in DuckDB); percentiles are
spelled as explicit rank selections so both engines return the identical
discrete element (built-in interpolating percentiles differ in float
arithmetic order across engines).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_cdc_fluss_quickstart_spark.functions import text
from flink_cdc_fluss_quickstart_spark.functions.dedup import hash_bucket, md5_hex_prefix
from flink_cdc_fluss_quickstart_spark.plans.registry import register
from flink_cdc_fluss_quickstart_spark.tables import load_table, spread

def _cached(df: DataFrame) -> DataFrame:
    """Tracked MEMORY_AND_DISK persist, released via dedup.release_caches()
    (the text_queries._cached twin). Used where a NARROW derived frame --
    token counts, buckets -- feeds multiple consumers: re-deriving it would
    re-read the wide `text` column from parquet once per consumer, the
    dominant I/O at corpus scale. Lazy, so plan builds stay job-free."""
    from pyspark import StorageLevel

    from flink_cdc_fluss_quickstart_spark.functions.dedup import track_cache

    return track_cache(df.persist(StorageLevel.MEMORY_AND_DISK))


def _duck_hex(hexpr: str, pos: int = 1, length: int = 8) -> str:
    """DuckDB spelling of hex-prefix-to-BIGINT over a hex-string expression,
    parsed positionally -- the ONE hex->int idiom every oracle here uses.
    Kept over DuckDB's CAST('0x' || ... AS BIGINT), which works on the
    pinned build but is undocumented string-cast behavior; two spellings of
    the same value in sibling oracles is a drift trap. The lambda variable
    is j8 so callers can reference their own j (the bloom hash index) inside
    `hexpr`. Mirrors functions.dedup.md5_hex_prefix on the Spark side."""
    return (
        f"list_sum(list_transform(range({pos}, {pos + length}), j8 -> "
        f"CAST((instr('0123456789abcdef', substr({hexpr}, j8::int, 1)) - 1)"
        f" * (16 ** ({pos + length - 1} - j8)) AS BIGINT)))"
    )


# first 8 md5 hex digits of the document id -- the split/bucket key
_DUCK_HEX8 = _duck_hex("md5(CAST(doc_id AS VARCHAR))")


@register(
    "dataset_split_assign",
    oracle=f"""
    SELECT doc_id, hash_bucket,
           CASE WHEN hash_bucket < 90 THEN 'train'
                WHEN hash_bucket < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, CAST({_DUCK_HEX8} % 100 AS BIGINT) AS hash_bucket FROM documents)
    """,
    description="Deterministic train/val/test split (90/5/5): the split key"
    " is md5(doc_id) mod 100, so membership is a pure row-local function of"
    " the id -- stable across runs, machines, and engine versions, and new"
    " documents never reshuffle existing assignments (the property random"
    " splits lack at 100 TB where re-materializing is unaffordable).",
)
def dataset_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket(F.col("doc_id").cast("string"))
    return d.select(
        "doc_id",
        bucket.alias("hash_bucket"),
        F.when(bucket < 90, "train").when(bucket < 95, "val").otherwise("test").alias("split"),
    )


@register(
    "token_stats_by_lang",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, lang,
             CAST(len((CASE WHEN trim(text) = '' THEN []::VARCHAR[] ELSE regexp_split_to_array(trim(text), '\s+') END)) AS BIGINT) AS n_tokens
      FROM documents
    ),
    ranked AS (
      SELECT lang, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY lang ORDER BY n_tokens, doc_id) AS rn,
             COUNT(*) OVER (PARTITION BY lang) AS n
      FROM tok
    )
    SELECT lang,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           MIN(n_tokens) AS min_tokens,
           MAX(n_tokens) AS max_tokens,
           MIN(CASE WHEN rn = CAST(ceil(0.5 * n) AS BIGINT) THEN n_tokens END) AS p50_tokens,
           MIN(CASE WHEN rn = CAST(ceil(0.9 * n) AS BIGINT) THEN n_tokens END) AS p90_tokens
    FROM ranked
    GROUP BY lang
    """,
    description="Per-language token-count distribution: counts, exact sums,"
    " and EXACT discrete p50/p90 via explicit rank selection (one window +"
    " one aggregation, both partitioned on lang -- a single shuffle)."
    " Interpolating percentile built-ins are avoided: their float arithmetic"
    " order differs across engines; rank selection returns the identical"
    " element everywhere.",
)
def token_stats_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    tok = d.select(
        "doc_id", "lang", text.token_count(F.col("text")).cast("bigint").alias("n_tokens")
    )
    w = Window.partitionBy("lang").orderBy("n_tokens", "doc_id")
    wc = Window.partitionBy("lang")
    ranked = tok.withColumn("rn", F.row_number().over(w)).withColumn(
        "n", F.count(F.lit(1)).over(wc)
    )
    at = lambda p: F.min(  # noqa: E731
        F.when(F.col("rn") == F.ceil(F.lit(p) * F.col("n")).cast("bigint"), F.col("n_tokens"))
    )
    return ranked.groupBy("lang").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").alias("total_tokens"),
        F.min("n_tokens").alias("min_tokens"),
        F.max("n_tokens").alias("max_tokens"),
        at(0.5).alias("p50_tokens"),
        at(0.9).alias("p90_tokens"),
    )


def _lang_score_sql(lang: str) -> str:
    markers = ", ".join(f"'{w}'" for w in text.LANG_MARKERS[lang])
    return (
        rf"len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),"
        rf" x -> x IN ({markers})))"
    )


_ROUTE_ORACLE = rf"""
    SELECT doc_id,
           CASE
             WHEN n_tokens < 10 THEN 'drop:too_short'
             WHEN stopword_ratio < 0.01 AND pred_lang IN ('en', 'de', 'fr', 'es')
               THEN 'drop:low_quality'
             WHEN pred_lang = 'und' THEN 'review:unknown_lang'
             ELSE 'keep:' || pred_lang
           END AS route
    FROM (
      SELECT doc_id,
             len((CASE WHEN trim(text) = '' THEN []::VARCHAR[] ELSE regexp_split_to_array(trim(text), '\s+') END)) AS n_tokens,
             CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                                  x -> x IN ({", ".join(f"'{w}'" for w in text.STOPWORDS)}))) AS DOUBLE)
               / len((CASE WHEN trim(text) = '' THEN []::VARCHAR[] ELSE regexp_split_to_array(trim(text), '\s+') END)) AS stopword_ratio,
             CASE
               WHEN len(regexp_extract_all(text, '[一-鿿]')) > 0 THEN 'zh'
               WHEN s_en > 0 AND s_en >= GREATEST(s_de, s_fr, s_es) THEN 'en'
               WHEN s_de > 0 AND s_de >= GREATEST(s_fr, s_es) THEN 'de'
               WHEN s_fr > 0 AND s_fr >= s_es THEN 'fr'
               WHEN s_es > 0 THEN 'es'
               ELSE 'und'
             END AS pred_lang
      FROM (
        SELECT doc_id, text,
               {{s_en}} AS s_en, {{s_de}} AS s_de, {{s_fr}} AS s_fr, {{s_es}} AS s_es
        FROM documents
      )
    )
    """


@register(
    "quality_filter_route",
    oracle=_ROUTE_ORACLE.format(
        s_en=_lang_score_sql("en"),
        s_de=_lang_score_sql("de"),
        s_fr=_lang_score_sql("fr"),
        s_es=_lang_score_sql("es"),
    ),
    description="Filter-route composition (the decision step of a data"
    " pipeline): length gate -> quality gate -> language routing, emitting a"
    " keep/drop/review route label per document. Pure row-local CASE over"
    " the same deterministic text features the individual queries expose.",
)
def quality_filter_route(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    t = F.col("text")
    n_tokens = text.token_count(t)
    stop_ratio = text.stopword_count(t).cast("double") / n_tokens
    pred = text.lang_id(t)
    route = (
        F.when(n_tokens < 10, F.lit("drop:too_short"))
        .when((stop_ratio < 0.01) & pred.isin("en", "de", "fr", "es"), F.lit("drop:low_quality"))
        .when(pred == "und", F.lit("review:unknown_lang"))
        .otherwise(F.concat(F.lit("keep:"), pred))
    )
    return d.select("doc_id", route.alias("route"))


def _split_gram_frame(d: DataFrame) -> DataFrame:
    """(doc_id, bucket, g): 16-hex md5 keys of every 8-token gram in the
    train- (bucket < 90) and test-split (bucket >= 95) documents -- the
    shared front of decontamination_ngrams and bloom_decontamination, so the
    two detectors can never disagree on what a 'contaminated gram' is.

    Shape notes: the Generate explodes integer POSITIONS only; the md5 runs
    in the codegen'd projection after it (slice()/concat_ws are 1-based,
    matching DuckDB list slicing). Fusing the hash transform into the
    Generate's generator drops the whole chain out of whole-stage codegen
    -- measured ~1.5-2x slower at sf0.1. Bucket rows 90-94 (val split) are
    dropped BEFORE the explode: they feed neither side. Repeated
    in-document grams are NOT deduped here (the exact detector's
    collect_set dedupes in the aggregate; the bloom detector adds
    .distinct() because its per-(doc, gram) probe rows must be unique)."""
    base = (
        d.select(
            "doc_id",
            hash_bucket(F.col("doc_id").cast("string")).alias("bucket"),
            F.split("text", " ").alias("l"),
        )
        .filter(F.size("l") >= 8)
        .filter((F.col("bucket") < 90) | (F.col("bucket") >= 95))
    )
    idx = base.select(
        "doc_id", "bucket", "l",
        F.explode(F.expr("sequence(1, size(l) - 7)")).alias("__i"),
    )
    return idx.select(
        "doc_id",
        "bucket",
        F.expr("substring(md5(concat_ws(' ', slice(l, __i, 8))), 1, 16)").alias("g"),
    )


@register(
    "decontamination_ngrams",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_DUCK_HEX8} % 100 AS bucket, string_split(text, ' ') AS l
      FROM documents
      WHERE len(string_split(text, ' ')) >= 8
    ),
    grams AS (
      SELECT DISTINCT doc_id, bucket, g FROM (
        SELECT doc_id, bucket,
               unnest(list_transform(range(1, len(l) - 6),
                      i -> substr(md5(array_to_string(l[i::int:(i+7)::int], ' ')), 1, 16))) AS g
        FROM base)
    ),
    train AS (SELECT DISTINCT g FROM grams WHERE bucket < 90),
    test AS (SELECT doc_id, g FROM grams WHERE bucket >= 95)
    SELECT t.doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_contaminated,
           CAST(SUM(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) AS contamination_rate,
           CAST(SUM(CASE WHEN tr.g IS NOT NULL THEN 1 ELSE 0 END) AS DOUBLE)
             / CAST(COUNT(*) AS DOUBLE) >= 0.8 AS flagged
    FROM test t LEFT JOIN train tr ON t.g = tr.g
    GROUP BY t.doc_id
    """,
    description="Benchmark decontamination: for every held-out (test-split)"
    " document, the fraction of its distinct 8-token n-grams that also occur"
    " anywhere in the train split. Spark-first: n-gram keys are 16-hex md5"
    " prefixes built row-locally (swap in xxhash64 via the digest seam at"
    " production scale), the train side is a distinct-key set and the check"
    " is one aggregation keyed on the gram hash -- the standard shape for"
    " train/eval overlap scans at corpus scale, linear in total n-gram"
    " volume, never materializing document pairs.",
)
def decontamination_ngrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    # spread: the per-gram md5 is the dominant cost and the bench corpus
    # arrives as one file split (no-op at scale where inputs are pre-split).
    # Single pass over the corpus, no cache: group by gram hash, folding the
    # train side to a 0/1 flag and the test side to the distinct doc set
    # (collect_set both dedupes repeated in-document grams and drops nulls
    # from the `when` filter). One gram-keyed shuffle + one doc-keyed
    # aggregation; nothing is persisted, so a long-lived session running many
    # queries leaks no cache. Set size per gram is bounded by the number of
    # *test-split* documents containing that exact 8-gram -- rare enough that
    # skew is a non-issue even at corpus scale.
    grams = _split_gram_frame(spread(load_table(spark, sf_dir, "documents")))
    per_gram = grams.groupBy("g").agg(
        F.max(F.when(F.col("bucket") < 90, 1).otherwise(0)).alias("in_train"),
        F.collect_set(F.when(F.col("bucket") >= 95, F.col("doc_id"))).alias("test_docs"),
    )
    exploded = per_gram.select("in_train", F.explode("test_docs").alias("doc_id"))
    hit = F.sum("in_train")
    rate = hit.cast("double") / F.count(F.lit(1)).cast("double")
    return exploded.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        hit.alias("n_contaminated"),
        rate.alias("contamination_rate"),
        (rate >= 0.8).alias("flagged"),
    )


# --- PII redaction ----------------------------------------------------------
# Java (Spark) and RE2 (DuckDB) compatible patterns: no backrefs, no
# lookaround; \b and non-capturing groups work in both.
_PII_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_PII_PHONE = r"\b555-[0-9]{4}\b"
_PII_IP = r"\b(?:[0-9]{1,3}\.)(?:[0-9]{1,3}\.)(?:[0-9]{1,3}\.)[0-9]{1,3}\b"


@register(
    "pii_redact",
    oracle=f"""
    SELECT doc_id,
           regexp_replace(regexp_replace(regexp_replace(contact,
               '{_PII_EMAIL}', '<EMAIL>', 'g'),
               '{_PII_PHONE}', '<PHONE>', 'g'),
               '{_PII_IP}', '<IP>', 'g') AS redacted,
           CAST(len(regexp_extract_all(contact, '{_PII_EMAIL}')) AS INT) AS n_emails,
           CAST(len(regexp_extract_all(contact, '{_PII_PHONE}')) AS INT) AS n_phones,
           CAST(len(regexp_extract_all(contact, '{_PII_IP}')) AS INT) AS n_ips
    FROM (
      SELECT doc_id,
             text || ' contact: user_' || CAST(doc_id AS VARCHAR)
                  || '@example.com phone 555-'
                  || lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0')
                  || ' ip 10.0.' || CAST(doc_id % 256 AS VARCHAR)
                  || '.' || CAST((doc_id * 7) % 256 AS VARCHAR) AS contact
      FROM documents
    )
    """,
    description="PII redaction (email / phone / IPv4 -> typed placeholder"
    " tokens) plus per-document match counts -- the scrub step every"
    " training-data pipeline runs before tokenization. Pure row-local"
    " regexp_replace chains (JVM-side, codegen'd; zero UDFs, zero shuffle)."
    " The synthetic corpus carries no natural PII, so the query seeds"
    " deterministic doc_id-derived contact strings inline to genuinely"
    " exercise the redaction paths; production callers run the same"
    " expressions over the raw text column.",
)
def pii_redact(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    contact = F.concat(
        F.col("text"),
        F.lit(" contact: user_"),
        F.col("doc_id").cast("string"),
        F.lit("@example.com phone 555-"),
        F.lpad((F.col("doc_id") % 10000).cast("string"), 4, "0"),
        F.lit(" ip 10.0."),
        (F.col("doc_id") % 256).cast("string"),
        F.lit("."),
        ((F.col("doc_id") * 7) % 256).cast("string"),
    )
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(F.col("contact"), _PII_EMAIL, "<EMAIL>"),
            _PII_PHONE,
            "<PHONE>",
        ),
        _PII_IP,
        "<IP>",
    )
    # F.regexp_extract_all (not F.expr) so patterns need no SQL string-literal
    # escaping: '\b' inside a SQL literal would parse as backspace
    count = lambda p: F.size(  # noqa: E731
        F.regexp_extract_all(F.col("contact"), F.lit(p), F.lit(0))
    )
    return d.select("doc_id", contact.alias("contact")).select(
        "doc_id",
        redacted.alias("redacted"),
        count(_PII_EMAIL).alias("n_emails"),
        count(_PII_PHONE).alias("n_phones"),
        count(_PII_IP).alias("n_ips"),
    )


# --- sequence packing -------------------------------------------------------

PACK_TOKENS = 2048  # context-window length the token stream is chopped into
PACK_SHARD = 1024  # doc ids per prefix-sum shard (contiguous ranges, so
                   # (shard, doc_id) order IS doc_id order)


# The packing oracle is shared: sequence_pack_offsets verifies it row-by-row
# and pack_efficiency_report aggregates over it (nested as a CTE subquery).
_PACK_ORACLE = f"""
    WITH tok AS (
      SELECT doc_id,
             CAST(len((CASE WHEN trim(text) = '' THEN []::VARCHAR[] ELSE regexp_split_to_array(trim(text), '\\s+') END)) AS BIGINT) AS n_tokens
      FROM documents
    ),
    cum AS (
      -- the window SUM returns HUGEINT in DuckDB; cast so the exposed
      -- derived columns stay BIGINT like Spark's (type-sensitive gate)
      SELECT doc_id, n_tokens,
             CAST(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cend
      FROM tok
    )
    SELECT doc_id, n_tokens,
           cend - n_tokens AS start_offset,
           (cend - n_tokens) // {PACK_TOKENS} AS first_pack,
           (CASE WHEN n_tokens = 0 THEN cend - n_tokens ELSE cend - 1 END)
             // {PACK_TOKENS} AS last_pack,
           (CASE WHEN n_tokens = 0 THEN cend - n_tokens ELSE cend - 1 END)
             // {PACK_TOKENS} - (cend - n_tokens) // {PACK_TOKENS} + 1 AS n_packs
    FROM cum
"""


@register(
    "sequence_pack_offsets",
    oracle=_PACK_ORACLE,
    description=f"Sequence packing for pretraining: every document's token"
    f" span [start_offset, start_offset + n_tokens) in the doc_id-ordered"
    f" concatenated token stream, and the {PACK_TOKENS}-token context windows"
    f" (packs) it lands in. The global running sum is computed as a"
    f" DISTRIBUTED prefix sum -- per-shard window (shards are contiguous"
    f" {PACK_SHARD}-id ranges, embarrassingly parallel) + a TWO-LEVEL"
    f" shard-base prefix sum: shard totals cumsum within super-shards of"
    f" {PACK_SHARD} shards each (parallel), then one ordered window over"
    f" super-shard totals only. The single-partition frame and the one"
    f" hint-broadcast frame are therefore bounded at corpus_docs /"
    f" {PACK_SHARD}^2 rows (~1e5 rows even at 1e11 docs); the per-shard"
    f" bases join carries no broadcast hint, so the planner co-partitions"
    f" it on the shard key at scale instead of driver-materializing a"
    f" shard-count-sized broadcast -- the scale trap a naive ORDER BY"
    f" cumsum falls into at 100 TB, one level up.",
)
def sequence_pack_offsets(spark: SparkSession, sf_dir: str) -> DataFrame:
    return pack_offsets_frame(load_table(spark, sf_dir, "documents"))


def pack_offsets_frame(d: DataFrame) -> DataFrame:
    """Packing offsets over an arbitrary (doc_id, text) frame -- the frame
    form exists so a pipeline can pack the corpus it actually SHIPS (post
    filter/dedup/decontamination) rather than the raw table; offsets computed
    over a superset leave phantom gaps at every dropped doc's token span.
    Sharding by doc_id div PACK_SHARD tolerates gaps: shards just carry
    fewer than PACK_SHARD docs and (shard, doc_id) order is still doc_id
    order."""
    from pyspark.sql.window import Window

    # persisted: tok is 3 narrow columns but feeds the stage-1 window, the
    # shard-totals aggregate, and (through it) the base computation --
    # unpersisted, each consumer re-read and re-tokenized the wide text
    # column (3 full corpus scans in the executed plan)
    tok = _cached(
        d.select(
            "doc_id",
            text.token_count(F.col("text")).cast("bigint").alias("n_tokens"),
            F.expr(f"doc_id div {PACK_SHARD}").alias("__shard"),
        )
    )
    # stage 1: per-shard running sum (parallel across shards)
    w_local = (
        Window.partitionBy("__shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = tok.withColumn("__lcum", F.sum("n_tokens").over(w_local))
    # stage 2: shard base offsets, themselves a two-level prefix sum so no
    # frame is ever more than corpus/PACK_SHARD^2 rows wide:
    #   2a. shard totals, grouped into super-shards of PACK_SHARD shards;
    #       cumsum of earlier shards WITHIN the super-shard (parallel)
    #   2b. super-shard totals -- one row per PACK_SHARD^2 docs -- through
    #       the only ordered global window, then broadcast-joined back
    shard_tot = tok.groupBy("__shard").agg(F.sum("n_tokens").alias("__stot"))
    shard_tot = shard_tot.withColumn(
        "__super", F.expr(f"__shard div {PACK_SHARD}")
    )
    w_in_super = (
        Window.partitionBy("__super")
        .orderBy("__shard")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    shard_tot = shard_tot.withColumn(
        "__lbase", F.coalesce(F.sum("__stot").over(w_in_super), F.lit(0))
    )
    w_super = Window.orderBy("__super").rowsBetween(Window.unboundedPreceding, -1)
    super_bases = (
        shard_tot.groupBy("__super")
        .agg(F.sum("__stot").alias("__sstot"))
        .select(
            "__super",
            F.coalesce(F.sum("__sstot").over(w_super), F.lit(0)).alias("__sbase"),
        )
    )
    bases = (
        shard_tot.join(F.broadcast(super_bases), "__super")
        .select("__shard", (F.col("__sbase") + F.col("__lbase")).alias("__base"))
    )
    # NO broadcast hint on the bases join: bases is one row per shard
    # (corpus/PACK_SHARD), which AQE broadcasts at test scale but must
    # hash-join at extreme scale -- `local` is already partitioned by
    # __shard from the stage-1 window, so the planner co-partitions instead
    # of driver-materializing a shard-count-sized broadcast. (super_bases
    # above IS hint-broadcast: it is corpus/PACK_SHARD^2 rows, the bounded
    # frame.)
    joined = local.join(bases, "__shard").select(
        "doc_id",
        "n_tokens",
        F.expr("__base + __lcum - n_tokens").alias("start_offset"),
        F.expr(f"(__base + __lcum - n_tokens) div {PACK_TOKENS}").alias("first_pack"),
        F.expr(
            f"(CASE WHEN n_tokens = 0 THEN __base + __lcum - n_tokens"
            f" ELSE __base + __lcum - 1 END) div {PACK_TOKENS}"
        ).alias("last_pack"),
    )
    return joined.withColumn(
        "n_packs", F.col("last_pack") - F.col("first_pack") + 1
    )


@register(
    "pack_efficiency_report",
    oracle=f"""
    WITH packed AS ({_PACK_ORACLE}),
    agg AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
             CAST(SUM(CASE WHEN last_pack > first_pack THEN 1 ELSE 0 END) AS BIGINT)
               AS crossing_docs,
             CAST(SUM(n_packs) AS BIGINT) AS doc_pack_spans
      FROM packed
    )
    SELECT n_docs, total_tokens,
           (total_tokens + {PACK_TOKENS - 1}) // {PACK_TOKENS} AS n_packs,
           crossing_docs,
           ((total_tokens + {PACK_TOKENS - 1}) // {PACK_TOKENS}) * {PACK_TOKENS}
             - total_tokens AS pad_tokens,
           CAST(total_tokens AS DOUBLE)
             / CAST(((total_tokens + {PACK_TOKENS - 1}) // {PACK_TOKENS})
                    * {PACK_TOKENS} AS DOUBLE) AS utilization,
           CAST(doc_pack_spans AS DOUBLE)
             / CAST((total_tokens + {PACK_TOKENS - 1}) // {PACK_TOKENS} AS DOUBLE)
             AS avg_docs_per_pack
    FROM agg
    """,
    description=f"Packing-efficiency report over the {PACK_TOKENS}-token"
    f" context windows: corpus totals, boundary-crossing doc count, padding"
    f" waste in the final pack, utilization, and average docs touched per"
    f" pack -- the go/no-go numbers a pipeline checks before burning GPU"
    f" hours on a packing layout. Composes the sequence_pack_offsets plan"
    f" (same two-level distributed prefix sum) into ONE single-row global"
    f" aggregate; every ratio divides two exact BIGINTs in DOUBLE, so both"
    f" engines run the identical float op.",
)
def pack_efficiency_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    p = sequence_pack_offsets(spark, sf_dir)
    agg = p.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_tokens").cast("bigint").alias("total_tokens"),
        F.sum(F.when(F.col("last_pack") > F.col("first_pack"), 1).otherwise(0))
        .cast("bigint")
        .alias("crossing_docs"),
        F.sum("n_packs").cast("bigint").alias("doc_pack_spans"),
    )
    n_packs = F.expr(f"(total_tokens + {PACK_TOKENS - 1}) div {PACK_TOKENS}")
    return agg.select(
        "n_docs",
        "total_tokens",
        n_packs.alias("n_packs"),
        "crossing_docs",
        (n_packs * PACK_TOKENS - F.col("total_tokens")).alias("pad_tokens"),
        (
            F.col("total_tokens").cast("double")
            / (n_packs * PACK_TOKENS).cast("double")
        ).alias("utilization"),
        (
            F.col("doc_pack_spans").cast("double") / n_packs.cast("double")
        ).alias("avg_docs_per_pack"),
    )


SHUFFLE_BUCKETS = 4096  # 16^3: shuffle bucket = first 3 md5 hex chars

# first 3 md5 hex chars -> the shuffle bucket id
_DUCK_HEX3 = _duck_hex("md5(CAST(doc_id AS VARCHAR))", length=3)


@register(
    "training_shuffle_order",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, md5(CAST(doc_id AS VARCHAR)) AS hx,
             CAST({_DUCK_HEX3} AS BIGINT) AS shuffle_bucket
      FROM documents
    ),
    pos AS (
      SELECT doc_id, shuffle_bucket,
             CAST(ROW_NUMBER() OVER (PARTITION BY shuffle_bucket
                                     ORDER BY hx, doc_id) - 1 AS BIGINT) AS bucket_pos
      FROM h
    ),
    bases AS (
      SELECT shuffle_bucket,
             CAST(COALESCE(SUM(cnt) OVER (ORDER BY shuffle_bucket
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS base
      FROM (SELECT shuffle_bucket, COUNT(*) AS cnt FROM h GROUP BY shuffle_bucket)
    )
    SELECT p.doc_id, p.shuffle_bucket, p.bucket_pos,
           p.bucket_pos + b.base AS global_pos
    FROM pos p JOIN bases b USING (shuffle_bucket)
    """,
    description=f"Deterministic global training-shuffle order: every document"
    f" gets a stable position in a pseudo-random permutation (rank of"
    f" md5(doc_id)), so epoch data order is reproducible across runs and"
    f" resumable mid-epoch -- what a real loader needs instead of an"
    f" unseedable distributed random shuffle. Distributed shape: rank WITHIN"
    f" {SHUFFLE_BUCKETS} hash-prefix buckets (parallel window), bucket base"
    f" offsets from a {SHUFFLE_BUCKETS}-row prefix sum (metadata-sized,"
    f" broadcast back) -- the same two-level pattern as sequence packing;"
    f" no global sort, no single-partition data window.",
)
def training_shuffle_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    # persisted: the narrow (doc_id, hx, bucket) projection feeds the
    # per-bucket rank window AND the bucket-base prefix sum -- each
    # re-scanned and re-hashed the corpus
    h = _cached(
        d.select(
            "doc_id", F.md5(F.col("doc_id").cast("string")).alias("hx")
        ).withColumn(
            "shuffle_bucket", F.conv(F.substring("hx", 1, 3), 16, 10).cast("bigint")
        )
    )
    w = Window.partitionBy("shuffle_bucket").orderBy("hx", "doc_id")
    pos = h.withColumn("bucket_pos", (F.row_number().over(w) - 1).cast("bigint"))
    wb = Window.orderBy("shuffle_bucket").rowsBetween(Window.unboundedPreceding, -1)
    bases = (
        h.groupBy("shuffle_bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "shuffle_bucket",
            F.coalesce(F.sum("cnt").over(wb), F.lit(0)).cast("bigint").alias("base"),
        )
    )
    return pos.join(F.broadcast(bases), "shuffle_bucket").select(
        "doc_id",
        "shuffle_bucket",
        "bucket_pos",
        (F.col("bucket_pos") + F.col("base")).alias("global_pos"),
    )


@register(
    "domain_mix_report",
    oracle=r"""
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(len((CASE WHEN trim(text) = '' THEN []::VARCHAR[] ELSE regexp_split_to_array(trim(text), '\s+') END))) AS BIGINT) AS total_tokens,
           CAST(COUNT(*) AS DOUBLE)
             / CAST((SELECT COUNT(*) FROM documents) AS DOUBLE) AS doc_share,
           CAST(COUNT(DISTINCT lang) AS BIGINT) AS n_langs
    FROM documents
    GROUP BY source
    """,
    description="Corpus-composition report by source domain: doc counts,"
    " exact token totals, share of corpus, language spread -- the"
    " mix-monitoring step every pipeline runs before and after filtering."
    " One grouped aggregation plus a scalar total joined in by Catalyst"
    " (broadcast of one row); map-side partials carry four numbers per"
    " domain.",
)
def domain_mix_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    total = d.agg(F.count(F.lit(1)).cast("double").alias("__total"))
    return (
        d.groupBy("source")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(text.token_count(F.col("text")).cast("bigint")).alias("total_tokens"),
            F.count_distinct("lang").alias("n_langs"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            "source",
            "n_docs",
            "total_tokens",
            (F.col("n_docs").cast("double") / F.col("__total")).alias("doc_share"),
            "n_langs",
        )
    )


# Temperature exponent: target language share ~ n_l^alpha. NOTE: the oracle's
# hash equality relies on pow() producing bit-identical doubles in the JVM and
# DuckDB at floor(x * 1e6) boundaries; 1 - 0.5 = 0.5 is effectively sqrt,
# which IEEE 754 requires to be correctly rounded, so this holds exactly. If
# TEMP_ALPHA ever changes, pow is only ~1-ulp-accurate cross-engine --
# compare keep_threshold with a tolerance or derive it in integer arithmetic.
TEMP_ALPHA = 0.5


@register(
    "temperature_resample_by_lang",
    oracle=f"""
    WITH c AS (SELECT lang, COUNT(*) AS n_l FROM documents GROUP BY lang),
    r AS (
      SELECT lang,
             CAST(floor(pow(CAST((SELECT MIN(n_l) FROM c) AS DOUBLE)
                            / CAST(n_l AS DOUBLE), {1.0 - TEMP_ALPHA}) * 1000000)
                  AS BIGINT) AS keep_threshold
      FROM c
    )
    SELECT d.doc_id, d.lang, r.keep_threshold
    FROM (SELECT doc_id, lang, CAST({_DUCK_HEX8} % 1000000 AS BIGINT) AS b
          FROM documents) d
    JOIN r ON d.lang = r.lang
    WHERE d.b < r.keep_threshold
    """,
    description=f"Temperature resampling of the language mix (target share ~"
    f" n_l^{TEMP_ALPHA}, the mT5/XLM-R-style flattening): per-language keep"
    f" rate (n_min/n_l)^{1.0 - TEMP_ALPHA} derived from the ACTUAL corpus"
    f" distribution -- a two-phase data-dependent sample: one tiny"
    f" per-language count aggregate broadcast back onto a row-local"
    f" md5-bucket predicate. Unlike stratified_sample_by_lang's fixed rates,"
    f" the rates here follow the data; unlike random sampling, membership is"
    f" a pure function of doc_id (stable under re-runs and corpus growth)."
    f" pow on IEEE doubles is identical across engines, so the thresholds"
    f" hash-match the oracle exactly.",
)
def temperature_resample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # persisted: the lang-cardinality counts frame feeds the min aggregate
    # and the rates join -- each re-scanned the corpus's lang column
    counts = _cached(d.groupBy("lang").agg(F.count(F.lit(1)).alias("n_l")))
    n_min = counts.agg(F.min("n_l").alias("n_min"))
    rates = counts.crossJoin(F.broadcast(n_min)).select(
        "lang",
        F.floor(
            F.pow(
                F.col("n_min").cast("double") / F.col("n_l").cast("double"),
                F.lit(1.0 - TEMP_ALPHA),
            )
            * 1_000_000
        )
        .cast("bigint")
        .alias("keep_threshold"),
    )
    bucket = hash_bucket(F.col("doc_id").cast("string"), mod=1_000_000)
    return (
        d.select("doc_id", "lang", bucket.alias("b"))
        .join(F.broadcast(rates), "lang")
        .filter(F.col("b") < F.col("keep_threshold"))
        .select("doc_id", "lang", "keep_threshold")
    )


@register(
    "stratified_sample_by_lang",
    oracle=f"""
    SELECT doc_id, lang, hash_bucket
    FROM (
      SELECT doc_id, lang, CAST({_DUCK_HEX8} % 100 AS BIGINT) AS hash_bucket,
             CASE lang WHEN 'en' THEN 10 WHEN 'zh' THEN 25 ELSE 50 END AS rate
      FROM documents
    )
    WHERE hash_bucket < rate
    """,
    description="Deterministic stratified downsampling: per-language keep"
    " rates (10% en, 25% zh, 50% low-resource) applied via the md5(doc_id)"
    " bucket, so the sample is a pure row-local predicate -- reproducible"
    " across runs and engines, needs no shuffle, no global count, and no"
    " state; the standard way to rebalance language mix in a 100 TB corpus"
    " without a random() that would differ per execution.",
)
def stratified_sample_by_lang(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = hash_bucket(F.col("doc_id").cast("string"))
    rate = (
        F.when(F.col("lang") == "en", 10)
        .when(F.col("lang") == "zh", 25)
        .otherwise(50)
    )
    return (
        d.select("doc_id", "lang", bucket.alias("hash_bucket"), rate.alias("rate"))
        .filter(F.col("hash_bucket") < F.col("rate"))
        .select("doc_id", "lang", "hash_bucket")
    )


# --- context-window chunking -------------------------------------------------

CHUNK_TOKENS = 64   # tokens per chunk (the model context window)
CHUNK_STRIDE = 48   # tokens between chunk starts (< CHUNK_TOKENS => overlap)


@register(
    "context_chunks",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id, (CASE WHEN trim(text) = '' THEN []::VARCHAR[] ELSE regexp_split_to_array(trim(text), '\\s+') END) AS w
      FROM documents
    )
    SELECT doc_id,
           CAST((start_tok - 1) // {CHUNK_STRIDE} AS BIGINT) AS chunk_idx,
           CAST(start_tok AS BIGINT) AS start_tok,
           CAST(least({CHUNK_TOKENS}, len(w) - start_tok + 1) AS BIGINT) AS chunk_len,
           md5(array_to_string(
             list_slice(w, start_tok,
                        start_tok + least({CHUNK_TOKENS}, len(w) - start_tok + 1) - 1),
             ' ')) AS chunk_hash
    FROM (SELECT doc_id, w, unnest(range(1, len(w) + 1, {CHUNK_STRIDE})) AS start_tok
          FROM tok)
    """,
    description=f"Sliding context-window chunking: each document's token"
    f" stream is cut into {CHUNK_TOKENS}-token chunks every {CHUNK_STRIDE}"
    f" tokens (overlap = {CHUNK_TOKENS - CHUNK_STRIDE} tokens, the"
    f" HF-tokenizer `stride` shape used for long-document SFT/eval windows);"
    f" chunks are emitted as (start, length, content digest) so row width"
    f" stays bounded. Pure row-local work -- the Generate explodes integer"
    f" START POSITIONS only and the slice/concat/md5 run in the projection"
    f" after it (the generator-vs-projection codegen rule); zero shuffles,"
    f" embarrassingly parallel at any corpus size.",
)
def context_chunks(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # text.tokens, not a raw split: a blank doc must yield ZERO chunks in
    # both engines (bare split(trim('')) is [''] -> one phantom chunk row,
    # caught by the planted-corpus sweep)
    tok = spread(d).select("doc_id", text.tokens(F.col("text")).alias("w"))
    # the empty-array branch both drops blank docs (explode of [] emits no
    # row, matching the oracle's empty range) and keeps ANSI happy --
    # sequence(1, 0) with a positive step is an error, not empty
    starts = tok.select(
        "doc_id",
        "w",
        F.explode(
            F.expr(
                f"CASE WHEN size(w) >= 1 THEN sequence(1, size(w), {CHUNK_STRIDE})"
                f" ELSE CAST(array() AS array<int>) END"
            )
        ).alias("start_tok"),
    )
    chunk_len = F.expr(f"least({CHUNK_TOKENS}, size(w) - start_tok + 1)")
    return starts.select(
        "doc_id",
        F.expr(f"(start_tok - 1) div {CHUNK_STRIDE}").cast("bigint").alias("chunk_idx"),
        F.col("start_tok").cast("bigint").alias("start_tok"),
        chunk_len.cast("bigint").alias("chunk_len"),
        F.md5(
            F.expr(
                f"array_join(slice(w, start_tok,"
                f" least({CHUNK_TOKENS}, size(w) - start_tok + 1)), ' ')"
            )
        ).alias("chunk_hash"),
    )


# --- length-bucketed batch assembly ------------------------------------------

BATCH_DOCS = 32       # documents per training batch within a length bucket
BATCH_SUBBUCKETS = 256  # hash-prefix sub-buckets for the two-level rank


@register(
    "length_bucket_batches",
    oracle=f"""
    WITH tok AS (
      SELECT doc_id,
             CAST(len((CASE WHEN trim(text) = '' THEN []::VARCHAR[] ELSE regexp_split_to_array(trim(text), '\\s+') END)) AS BIGINT) AS n_tokens,
             md5(CAST(doc_id AS VARCHAR)) AS hx
      FROM documents
    ),
    b AS (
      SELECT doc_id, n_tokens, hx,
             CAST(length(bin(greatest(n_tokens, 1))) AS BIGINT) AS bucket,
             CAST(instr('0123456789abcdef', substr(hx, 1, 1)) - 1 AS BIGINT) * 16
               + CAST(instr('0123456789abcdef', substr(hx, 2, 1)) - 1 AS BIGINT) AS sub
      FROM tok
    ),
    pos AS (
      SELECT doc_id, n_tokens, bucket, sub,
             CAST(ROW_NUMBER() OVER (PARTITION BY bucket, sub
                                     ORDER BY hx, doc_id) - 1 AS BIGINT) AS sub_pos
      FROM b
    ),
    bases AS (
      SELECT bucket, sub,
             CAST(COALESCE(SUM(cnt) OVER (PARTITION BY bucket ORDER BY sub
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS base
      FROM (SELECT bucket, sub, COUNT(*) AS cnt FROM b GROUP BY bucket, sub)
    )
    SELECT p.doc_id, p.n_tokens, p.bucket,
           p.sub_pos + s.base AS bucket_pos,
           (p.sub_pos + s.base) // {BATCH_DOCS} AS batch_idx,
           (p.sub_pos + s.base) % {BATCH_DOCS} AS pos_in_batch
    FROM pos p JOIN bases s ON p.bucket = s.bucket AND p.sub = s.sub
    """,
    description=f"Length-bucketed batch assembly (the GPU batch-efficiency"
    f" step: batching similar-length docs minimizes padding waste):"
    f" power-of-2 length buckets (floor(log2 n_tokens) via length(bin(x)),"
    f" exact in both engines), a deterministic pseudo-random order inside"
    f" each bucket (rank of md5(doc_id) -- reproducible epochs, the same"
    f" property as training_shuffle_order), and {BATCH_DOCS}-doc batch"
    f" ids. Distributed shape: rank WITHIN (bucket, {BATCH_SUBBUCKETS}"
    f" hash-prefix sub-buckets) in parallel windows, then per-bucket base"
    f" offsets from a {BATCH_SUBBUCKETS}-row-per-bucket prefix sum"
    f" (metadata-sized) -- the same two-level pattern as sequence packing;"
    f" no bucket-wide window ever ranks the full corpus through one"
    f" partition.",
)
def length_bucket_batches(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    # persisted: the narrow token/bucket projection feeds two window passes
    # -- unpersisted, each re-read and re-tokenized the wide text column
    b = _cached(d.select(
        "doc_id",
        text.token_count(F.col("text")).cast("bigint").alias("n_tokens"),
        F.md5(F.col("doc_id").cast("string")).alias("hx"),
    )).select(
        "doc_id",
        "n_tokens",
        "hx",
        F.length(F.bin(F.greatest(F.col("n_tokens"), F.lit(1)))).cast("bigint").alias("bucket"),
        F.conv(F.substring("hx", 1, 2), 16, 10).cast("bigint").alias("sub"),
    )
    w = Window.partitionBy("bucket", "sub").orderBy("hx", "doc_id")
    pos = b.withColumn("sub_pos", (F.row_number().over(w) - 1).cast("bigint"))
    wb = (
        Window.partitionBy("bucket").orderBy("sub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = (
        b.groupBy("bucket", "sub")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "bucket",
            "sub",
            F.coalesce(F.sum("cnt").over(wb), F.lit(0)).cast("bigint").alias("base"),
        )
    )
    out = pos.join(F.broadcast(bases), ["bucket", "sub"])
    bucket_pos = F.col("sub_pos") + F.col("base")
    return out.select(
        "doc_id",
        "n_tokens",
        "bucket",
        bucket_pos.alias("bucket_pos"),
        F.expr(f"(sub_pos + base) div {BATCH_DOCS}").alias("batch_idx"),
        (bucket_pos % BATCH_DOCS).alias("pos_in_batch"),
    )


# --- fixed-count per-stratum sampling ----------------------------------------

SAMPLE_PER_STRATUM = 50  # docs kept per source (the eval-set builder)


@register(
    "fixed_count_sample_by_source",
    oracle=f"""
    WITH h AS (
      SELECT doc_id, source, lang, md5(CAST(doc_id AS VARCHAR)) AS hx
      FROM documents
    ),
    b AS (
      SELECT doc_id, source, lang, hx,
             CAST(instr('0123456789abcdef', substr(hx, 1, 1)) - 1 AS BIGINT) * 16
               + CAST(instr('0123456789abcdef', substr(hx, 2, 1)) - 1 AS BIGINT) AS sub
      FROM h
    ),
    pos AS (
      SELECT doc_id, source, lang, hx, sub,
             CAST(ROW_NUMBER() OVER (PARTITION BY source, sub
                                     ORDER BY hx, doc_id) - 1 AS BIGINT) AS sub_pos
      FROM b
    ),
    bases AS (
      SELECT source, sub,
             CAST(COALESCE(SUM(cnt) OVER (PARTITION BY source ORDER BY sub
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT) AS base
      FROM (SELECT source, sub, COUNT(*) AS cnt FROM b GROUP BY source, sub)
    )
    SELECT p.doc_id, p.source, p.lang,
           p.sub_pos + s.base AS sample_rank
    FROM pos p JOIN bases s ON p.source = s.source AND p.sub = s.sub
    WHERE p.sub_pos + s.base < {SAMPLE_PER_STRATUM}
    """,
    description=f"Fixed-COUNT stratified sampling: exactly"
    f" {SAMPLE_PER_STRATUM} documents per source (fewer only if the stratum"
    f" is smaller), selected as the lowest md5(doc_id) ranks -- the eval-set/"
    f" holdout builder that rate-based sampling (stratified_sample_by_lang)"
    f" cannot express, deterministic across runs and engines with no"
    f" random(). Distributed shape: the same two-level rank as the training"
    f" shuffle and batch assembly -- parallel windows within (source, 256"
    f" hash-prefix sub-buckets), per-source base offsets from a"
    f" metadata-sized prefix sum -- so no stratum ever ranks through one"
    f" partition, however large the corpus. The rank never touches more"
    f" than the winning sub-bucket prefixes: sub-buckets whose base offset"
    f" already meets the quota are pruned BEFORE the window (a row there"
    f" has rank >= base >= quota and can never be selected), so the ranking"
    f" shuffle carries ~quota rows per stratum instead of the stratum --"
    f" the sample stays exact while rank work is quota-bounded at any"
    f" corpus size.",
)
def fixed_count_sample_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    # persisted: feeds the per-source rank window and the base prefix sum
    b = _cached(
        d.select(
            "doc_id",
            "source",
            "lang",
            F.md5(F.col("doc_id").cast("string")).alias("hx"),
        ).withColumn("sub", F.conv(F.substring("hx", 1, 2), 16, 10).cast("bigint"))
    )
    wb = (
        Window.partitionBy("source").orderBy("sub")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    bases = (
        b.groupBy("source", "sub")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .select(
            "source",
            "sub",
            F.coalesce(F.sum("cnt").over(wb), F.lit(0)).cast("bigint").alias("base"),
        )
    )
    # quota pre-prune: only sub-buckets whose base is below the quota can
    # contribute rows with rank < quota; the broadcast inner join drops the
    # rest before they ever reach the ranking window
    winning = bases.filter(F.col("base") < SAMPLE_PER_STRATUM)
    cand = b.join(F.broadcast(winning), ["source", "sub"])
    w = Window.partitionBy("source", "sub").orderBy("hx", "doc_id")
    pos = cand.withColumn("sub_pos", (F.row_number().over(w) - 1).cast("bigint"))
    rank = F.col("sub_pos") + F.col("base")
    return (
        pos.filter(rank < SAMPLE_PER_STRATUM)
        .select("doc_id", "source", "lang", rank.alias("sample_rank"))
    )


# --- DSIR importance weighting ----------------------------------------------

DSIR_BUCKETS = 128       # hashed n-gram feature space (paper: 10k; bounded)
DSIR_TARGET_SOURCE = "src0"  # stand-in for the curated target domain

# the _DUCK_HEX8 idiom over a feature string
_DUCK_FEAT_HEX8 = _duck_hex("md5(feat)")


@register(
    "dsir_importance_weights",
    oracle=f"""
    WITH w AS (SELECT doc_id, source, string_split(text, ' ') AS wl FROM documents),
    feats AS (
      SELECT doc_id, source, unnest(wl) AS feat FROM w
      UNION ALL
      SELECT doc_id, source,
             unnest(list_transform(range(2, len(wl) + 1),
                                   i -> wl[i - 1] || ' ' || wl[i])) AS feat
      FROM w
    ),
    fb AS (
      SELECT doc_id, source,
             CAST({_DUCK_FEAT_HEX8} % {DSIR_BUCKETS} AS BIGINT) AS b
      FROM feats
    ),
    srcc AS (SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM fb GROUP BY b),
    tgtc AS (
      SELECT b, CAST(COUNT(*) AS BIGINT) AS c FROM fb
      WHERE source = '{DSIR_TARGET_SOURCE}' GROUP BY b
    ),
    tot AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS ts,
             CAST(SUM(CASE WHEN source = '{DSIR_TARGET_SOURCE}' THEN 1 ELSE 0 END)
                  AS BIGINT) AS tt
      FROM fb
    ),
    wb AS (
      SELECT s.b,
             CAST((length(bin(COALESCE(t.c, 0) + 1)) - length(bin(tot.tt + {DSIR_BUCKETS})))
                - (length(bin(s.c + 1)) - length(bin(tot.ts + {DSIR_BUCKETS})))
               AS BIGINT) AS w
      FROM srcc s LEFT JOIN tgtc t USING (b) CROSS JOIN tot
    )
    SELECT fb.doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_feats,
           CAST(SUM(wb.w) AS BIGINT) AS weight_bits
    FROM fb JOIN wb USING (b)
    GROUP BY fb.doc_id
    """,
    description=f"DSIR importance weights (Xie et al. 2023, arXiv:2302.03169"
    f" -- Data Selection for LMs via Importance Resampling): every document"
    f" scored by how much its hashed n-gram feature distribution looks like"
    f" the TARGET domain (here the '{DSIR_TARGET_SOURCE}' source standing in"
    f" for e.g. Wikipedia) vs the raw corpus. Features are unigrams +"
    f" adjacent bigrams hashed into {DSIR_BUCKETS} buckets; per-bucket"
    f" log-likelihood ratios are integer-quantized to whole bits"
    f" (floor-log2 via length(bin(x)), Laplace-smoothed, exact in both"
    f" engines -- the repo's standard no-float-log rule), and a doc's weight"
    f" is the sum of its features' bucket ratios. Scale shape: one feature"
    f" explode -> ONE {DSIR_BUCKETS}-key counting aggregate (partial/final,"
    f" O(1) state) -> the ratio table broadcasts (<= {DSIR_BUCKETS} rows) ->"
    f" one doc_id-keyed rollup; resampling by the weights composes with the"
    f" registered temperature/fixed-count samplers.",
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_cdc_fluss_quickstart_spark.functions.dedup import track_cache

    d = spread(load_table(spark, sf_dir, "documents"))
    w = d.select("doc_id", "source", F.split("text", " ").alias("wl"))
    uni = w.select("doc_id", "source", F.explode("wl").alias("feat"))
    big = w.select(
        "doc_id",
        "source",
        F.explode(
            F.expr(
                "CASE WHEN size(wl) >= 2 THEN transform(sequence(2, size(wl)),"
                " i -> concat(wl[i-2], ' ', wl[i-1])) ELSE array() END"
            )
        ).alias("feat"),
    )
    # persisted: the bucketed feature frame feeds the corpus counts, the
    # target counts, the totals, and the per-doc rollup
    fb = track_cache(
        uni.unionByName(big)
        .select(
            "doc_id",
            "source",
            (
                md5_hex_prefix(F.col("feat")) % DSIR_BUCKETS
            ).alias("b"),
        )
        .persist()
    )
    is_tgt = F.col("source") == DSIR_TARGET_SOURCE
    srcc = fb.groupBy("b").agg(F.count(F.lit(1)).alias("c"))
    tgtc = fb.filter(is_tgt).groupBy("b").agg(F.count(F.lit(1)).alias("ct"))
    tot = fb.agg(
        F.count(F.lit(1)).alias("ts"),
        F.sum(F.when(is_tgt, 1).otherwise(0)).alias("tt"),
    )
    lb = lambda c: F.length(F.bin(c))  # noqa: E731  floor(log2 x) + 1, exact
    wb = (
        srcc.join(tgtc, "b", "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "b",
            (
                (lb(F.coalesce(F.col("ct"), F.lit(0)) + 1) - lb(F.col("tt") + DSIR_BUCKETS))
                - (lb(F.col("c") + 1) - lb(F.col("ts") + DSIR_BUCKETS))
            )
            .cast("bigint")
            .alias("w"),
        )
    )
    return (
        fb.join(F.broadcast(wb), "b")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("w").cast("bigint").alias("weight_bits"),
        )
    )


# --- token-budget mixture planning -------------------------------------------

MIX_BUDGET_TOKENS = 1_000_000  # nominal training-token budget to allocate
MIX_ALPHA = 0.5                # temperature on the per-source token mass


@register(
    "token_budget_mix_plan",
    oracle=rf"""
    WITH avail AS (
      SELECT source,
             CAST(COUNT(*) AS BIGINT) AS n_docs,
             CAST(SUM(len((CASE WHEN trim(text) = '' THEN []::VARCHAR[] ELSE regexp_split_to_array(trim(text), '\s+') END))) AS BIGINT)
               AS tokens_available
      FROM documents GROUP BY source
    ),
    ti AS (
      SELECT source, n_docs, tokens_available,
             CAST(floor(pow(CAST(tokens_available AS DOUBLE), {MIX_ALPHA}) * 1000000)
                  AS BIGINT) AS t
      FROM avail
    ),
    tot AS (SELECT CAST(SUM(t) AS BIGINT) AS tt FROM ti)
    SELECT source, n_docs, tokens_available,
           CAST(floor((CAST(t AS DOUBLE) / CAST(tot.tt AS DOUBLE))
                      * {MIX_BUDGET_TOKENS}) AS BIGINT) AS quota_tokens,
           (CAST(floor((CAST(t AS DOUBLE) / CAST(tot.tt AS DOUBLE))
                       * {MIX_BUDGET_TOKENS}) AS BIGINT)::DOUBLE
             / CAST(tokens_available AS DOUBLE)) AS repeat_factor
    FROM ti CROSS JOIN tot
    """,
    description=f"Token-budget mixture planner -- the data-recipe step that"
    f" turns 'train on {MIX_BUDGET_TOKENS:,} tokens' into per-source quotas"
    f" (the LLaMA/Pile-style weighted-mix design): each source's share is"
    f" proportional to tokens_available^{MIX_ALPHA} (temperature-flattened"
    f" so head domains don't drown the tail), and repeat_factor = quota /"
    f" available is the epochs-over-source knob (> 1 means deliberate"
    f" upsampling). Determinism: the temperature weights are floor-scaled to"
    f" BIGINT before the normalizing SUM, so the reduction is"
    f" order-independent integer addition; the only float ops are one"
    f" division + multiply + floor per source on identical inputs. Scale"
    f" shape: ONE source-keyed counting aggregate (partial/final), a"
    f" broadcast scalar total, row-local quota math -- the output is"
    f" sources-sized (metadata), whatever the corpus size.",
)
def token_budget_mix_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    # persisted: the source-cardinality availability frame feeds the
    # temperature total AND the quota join -- each re-tokenized the corpus
    avail = _cached(
        d.groupBy("source").agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(text.token_count(F.col("text")).cast("bigint")).alias("tokens_available"),
        )
    )
    ti = avail.withColumn(
        "t",
        F.floor(F.pow(F.col("tokens_available").cast("double"), F.lit(MIX_ALPHA)) * 1_000_000)
        .cast("bigint"),
    )
    tot = ti.agg(F.sum("t").alias("tt"))
    quota = F.floor(
        (F.col("t").cast("double") / F.col("tt").cast("double")) * MIX_BUDGET_TOKENS
    ).cast("bigint")
    return ti.crossJoin(F.broadcast(tot)).select(
        "source",
        "n_docs",
        "tokens_available",
        quota.alias("quota_tokens"),
        (quota.cast("double") / F.col("tokens_available").cast("double")).alias(
            "repeat_factor"
        ),
    )


# --- Bloom-filter decontamination (bounded-state membership filter) ----------

BLOOM_M = 65536  # filter bits
BLOOM_K = 3  # hash functions per key
BLOOM_FLAG_RATE = 0.8  # same per-doc flag threshold as decontamination_ngrams


def _bloom_bit(g, j: int):
    return (
        md5_hex_prefix(F.concat(F.lit(f"{j}:"), g)) % BLOOM_M
    )


@register(
    "bloom_decontamination",
    oracle=f"""
    WITH base AS (
      SELECT doc_id, {_DUCK_HEX8} % 100 AS bucket, string_split(text, ' ') AS l
      FROM documents
      WHERE len(string_split(text, ' ')) >= 8
    ),
    grams AS (
      SELECT DISTINCT doc_id, bucket, g FROM (
        SELECT doc_id, bucket,
               unnest(list_transform(range(1, len(l) - 6),
                      i -> substr(md5(array_to_string(l[i::int:(i+7)::int], ' ')), 1, 16))) AS g
        FROM base)
    ),
    test AS (SELECT DISTINCT g FROM grams WHERE bucket >= 95),
    bits AS (
      SELECT DISTINCT
             {_duck_hex("md5(j || ':' || g)")} % {BLOOM_M} AS bit
      FROM test CROSS JOIN (SELECT unnest(range({BLOOM_K})) AS j)
    ),
    train AS (SELECT DISTINCT doc_id, g FROM grams WHERE bucket < 90),
    probe AS (
      SELECT doc_id, g,
             {_duck_hex("md5(j || ':' || g)")} % {BLOOM_M} AS bit
      FROM train CROSS JOIN (SELECT unnest(range({BLOOM_K})) AS j)
    ),
    pg AS (
      SELECT doc_id, g,
             (SUM(CASE WHEN b.bit IS NOT NULL THEN 1 ELSE 0 END) = {BLOOM_K}) AS bloom_hit
      FROM probe p LEFT JOIN bits b ON p.bit = b.bit
      GROUP BY doc_id, g
    ),
    pe AS (
      SELECT doc_id, pg.g, bloom_hit, (t.g IS NOT NULL) AS exact_hit
      FROM pg LEFT JOIN test t ON pg.g = t.g
    )
    SELECT doc_id,
           COUNT(*) AS n_grams,
           CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
           CAST(SUM(CASE WHEN exact_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_exact_hits,
           CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END)
                - SUM(CASE WHEN exact_hit THEN 1 ELSE 0 END) AS BIGINT)
             AS n_false_positives,
           (CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS DOUBLE)
              / CAST(COUNT(*) AS DOUBLE) >= {BLOOM_FLAG_RATE}) AS bloom_flagged
    FROM pe GROUP BY doc_id
    """,
    description="Bloom-filter decontamination (Bloom 1970; the"
    " bounded-state scale path Dolma/CCNet-class pipelines use for"
    " membership scans): the held-out set's 8-gram keys fold into a"
    f" {BLOOM_M}-bit filter ({BLOOM_K} hashes per key) and every TRAIN"
    " document probes it row-locally -- the training corpus, the huge"
    " side at 100 TB, is never joined against the eval gram table; the"
    f" filter is <= {BLOOM_M} bits forever, mergeable across eval suites"
    " by bitwise OR, and broadcastable (the relational distinct-bits"
    " encoding here is exactly oracle-checkable; production packs it into"
    f" an array<long> bitmask of {BLOOM_M // 64} words at the same seam)."
    " Exact-hit columns ride along to GRADE the filter: n_false_positives"
    " >= 0 always, false negatives impossible by construction (the"
    " planted-set superset property is unit-tested). All counters exact"
    " BIGINTs, bit-identical cross-engine.",
)
def bloom_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = spread(load_table(spark, sf_dir, "documents"))
    grams = _split_gram_frame(d).distinct()
    test = grams.filter(F.col("bucket") >= 95).select("g").distinct()
    bits = (
        test.select(
            F.explode(F.array(*[_bloom_bit(F.col("g"), j) for j in range(BLOOM_K)])).alias("bit")
        )
        .distinct()
        .withColumn("__set", F.lit(1))
    )
    train = grams.filter(F.col("bucket") < 90).select("doc_id", "g")
    probe = train.select(
        "doc_id", "g",
        F.explode(F.array(*[_bloom_bit(F.col("g"), j) for j in range(BLOOM_K)])).alias("bit"),
    )
    per_gram = (
        probe.join(F.broadcast(bits), "bit", "left")
        .groupBy("doc_id", "g")
        .agg((F.sum(F.coalesce(F.col("__set"), F.lit(0))) == BLOOM_K).alias("bloom_hit"))
    )
    per_gram = per_gram.join(
        test.withColumn("__t", F.lit(1)), "g", "left"
    ).select("doc_id", "bloom_hit", F.col("__t").isNotNull().alias("exact_hit"))
    n_bloom = F.sum(F.when(F.col("bloom_hit"), 1).otherwise(0))
    n_exact = F.sum(F.when(F.col("exact_hit"), 1).otherwise(0))
    return per_gram.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_grams"),
        n_bloom.cast("bigint").alias("n_bloom_hits"),
        n_exact.cast("bigint").alias("n_exact_hits"),
        (n_bloom - n_exact).cast("bigint").alias("n_false_positives"),
        (
            n_bloom.cast("double") / F.count(F.lit(1)).cast("double")
            >= BLOOM_FLAG_RATE
        ).alias("bloom_flagged"),
    )


# --- bounded-state quantile sketch (log-histogram percentiles) ---------------

QSKETCH_QS = (50, 90)  # percentiles reported per language


def qsketch_tokens_frame(d: DataFrame) -> DataFrame:
    """(doc_id, lang, n_tokens) projection the sketch and its exact grader
    share; token counts floored to 1 so the log2 bin is always defined."""
    return spread(d).select(
        "doc_id",
        "lang",
        F.greatest(text.token_count(F.col("text")).cast("bigint"), F.lit(1)).alias(
            "n_tokens"
        ),
    )


def qsketch_hist_frame(tok: DataFrame) -> DataFrame:
    """The sketch itself: the (lang, bin) -> count log-histogram, ONE
    counting aggregate with bin = floor(log2 n_tokens). This is the frame
    that runs unchanged as a STREAMING aggregation (complete mode): state is
    bounded at ~64 BIGINT cells per language forever, and the drained grid
    equals the batch histogram of the union because the merge is integer
    addition -- the Count-Min/KMV mergeable-monitor posture, equivalence
    asserted in tests/test_streaming_dedup.py."""
    return (
        tok.select(
            "lang",
            (F.length(F.bin(F.col("n_tokens"))) - 1).cast("bigint").alias("b"),
        )
        .groupBy("lang", "b")
        .agg(F.count(F.lit(1)).alias("c"))
    )


@register(
    "quantile_sketch_report",
    oracle=r"""
    WITH tok AS (
      SELECT doc_id, lang,
             CAST(greatest(len((CASE WHEN trim(text) = '' THEN []::VARCHAR[] ELSE regexp_split_to_array(trim(text), '\s+') END)), 1)
                  AS BIGINT) AS n_tokens
      FROM documents
    ),
    binned AS (
      SELECT lang, n_tokens,
             CAST(length(bin(n_tokens)) - 1 AS BIGINT) AS b
      FROM tok
    ),
    hist AS (
      SELECT lang, b, CAST(COUNT(*) AS BIGINT) AS c
      FROM binned GROUP BY lang, b
    ),
    cum AS (
      SELECT lang, b, c,
             CAST(SUM(c) OVER (PARTITION BY lang ORDER BY b) AS BIGINT) AS cm,
             CAST(SUM(c) OVER (PARTITION BY lang) AS BIGINT) AS n
      FROM hist
    ),
    qs AS (SELECT unnest([50, 90]) AS q),
    est AS (
      SELECT lang, q, MIN(b) AS qbin, MIN(n) AS n_docs
      FROM cum CROSS JOIN qs
      WHERE cm >= (q * n + 99) // 100
      GROUP BY lang, q
    ),
    ranked AS (
      SELECT lang, n_tokens,
             ROW_NUMBER() OVER (PARTITION BY lang
                                ORDER BY n_tokens, doc_id) AS rn
      FROM tok
    ),
    exact AS (
      SELECT r.lang, e.q,
             MIN(CASE WHEN r.rn = (e.q * e.n_docs + 99) // 100
                      THEN r.n_tokens END) AS exact_tokens
      FROM ranked r JOIN est e ON r.lang = e.lang
      GROUP BY r.lang, e.q
    )
    SELECT e.lang, 'p' || CAST(e.q AS VARCHAR) AS q, e.n_docs,
           CAST(1 AS BIGINT) << e.qbin AS est_tokens,
           x.exact_tokens,
           CAST(x.exact_tokens - (CAST(1 AS BIGINT) << e.qbin) AS DOUBLE)
             / CAST(x.exact_tokens AS DOUBLE) AS rel_error
    FROM est e JOIN exact x ON e.lang = x.lang AND e.q = x.q
    """,
    description="Bounded-state quantile sketch with its accuracy graded"
    " in-row: per-language p50/p90 of document token counts estimated from"
    " a power-of-2 LOG HISTOGRAM (bin = floor(log2 n) via length(bin(n)),"
    " the unigram-surprisal integer machinery; estimate = the selected"
    " bin's lower edge 1<<b, so est <= exact < 2*est by construction),"
    " reported NEXT TO the exact discrete-rank percentile and the relative"
    " error -- completing the graded-approximation set (ANN/PQ recall, KMV"
    " rel_error, Count-Min overcount, Bloom false positives, MinHash"
    " estimator). Why it exists at 100 TB: the exact percentile needs a"
    " per-group SORTED rank window over every row; the sketch is ONE"
    " bounded (lang, bin) counting aggregate -- ~64 BIGINT cells per"
    " language, partial/final map-side combined, mergeable across shards"
    " and days by integer addition (the KMV/Count-Min posture applied to"
    " distributions). All arithmetic integer: ceil-rank (q*n+99) div 100,"
    " cumulative sums over the bins-sized histogram, a shiftleft lower"
    " edge; the one float op is the final error division of exact BIGINTs.",
)
def quantile_sketch_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    d = load_table(spark, sf_dir, "documents")
    # persisted: the narrow token projection feeds the sketch histogram AND
    # the exact-rank grader -- unpersisted, each re-read the text column
    tok = _cached(qsketch_tokens_frame(d))
    hist = qsketch_hist_frame(tok)
    cum = hist.select(
        "lang",
        "b",
        F.sum("c").over(Window.partitionBy("lang").orderBy("b")).cast("bigint").alias("cm"),
        F.sum("c").over(Window.partitionBy("lang")).cast("bigint").alias("n"),
    )
    qs = spark.range(2).select(
        F.when(F.col("id") == 0, 50).otherwise(90).cast("bigint").alias("q")
    )
    rank = F.expr("(q * n + 99) div 100")
    est = (
        cum.crossJoin(F.broadcast(qs))
        .filter(F.col("cm") >= rank)
        .groupBy("lang", "q")
        .agg(F.min("b").alias("qbin"), F.min("n").alias("n_docs"))
    )
    ranked = tok.withColumn(
        "rn",
        F.row_number().over(Window.partitionBy("lang").orderBy("n_tokens", "doc_id")),
    )
    exact = (
        ranked.join(est.select("lang", "q", "n_docs"), "lang")
        .groupBy("lang", "q")
        .agg(
            F.min(
                F.when(
                    F.col("rn") == F.expr("(q * n_docs + 99) div 100"),
                    F.col("n_tokens"),
                )
            ).alias("exact_tokens")
        )
    )
    est_tokens = F.expr("shiftleft(CAST(1 AS BIGINT), CAST(qbin AS INT))")
    return (
        est.join(exact, ["lang", "q"])
        .select(
            "lang",
            F.concat(F.lit("p"), F.col("q").cast("string")).alias("q"),
            "n_docs",
            est_tokens.alias("est_tokens"),
            "exact_tokens",
            (
                (F.col("exact_tokens") - est_tokens).cast("double")
                / F.col("exact_tokens").cast("double")
            ).alias("rel_error"),
        )
    )
