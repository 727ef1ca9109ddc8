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
from flink_cdc_fluss_quickstart_spark.plans.registry import register
from flink_cdc_fluss_quickstart_spark.tables import load_table

# DuckDB has no hex->int cast; parse the first 8 md5 hex digits positionally.
# Spark side uses conv() -- same value, different spelling.
_DUCK_HEX8 = (
    "list_sum(list_transform(range(1, 9), j -> "
    "CAST((instr('0123456789abcdef', substr(md5(CAST(doc_id AS VARCHAR)), j::int, 1)) - 1)"
    " * (16 ** (8 - j)) AS BIGINT)))"
)


@register(
    "dataset_split_assign",
    oracle=f"""
    SELECT doc_id, hash_bucket,
           CASE WHEN hash_bucket < 90 THEN 'train'
                WHEN hash_bucket < 95 THEN 'val'
                ELSE 'test' END AS split
    FROM (SELECT doc_id, {_DUCK_HEX8} % 100 AS hash_bucket FROM documents)
    """,
    description="Deterministic train/val/test split (90/5/5): the split key"
    " is md5(doc_id) mod 100, so membership is a pure row-local function of"
    " the id -- stable across runs, machines, and engine versions, and new"
    " documents never reshuffle existing assignments (the property random"
    " splits lack at 100 TB where re-materializing is unaffordable).",
)
def dataset_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    d = load_table(spark, sf_dir, "documents")
    bucket = (
        F.conv(F.substring(F.md5(F.col("doc_id").cast("string")), 1, 8), 16, 10)
        .cast("bigint") % 100
    )
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
             CAST(len(regexp_split_to_array(trim(text), '\s+')) AS BIGINT) AS n_tokens
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
             len(regexp_split_to_array(trim(text), '\s+')) AS n_tokens,
             CAST(len(list_filter(regexp_split_to_array(trim(lower(text)), '\s+'),
                                  x -> x IN ({", ".join(f"'{w}'" for w in text.STOPWORDS)}))) AS DOUBLE)
               / len(regexp_split_to_array(trim(text), '\s+')) AS stopword_ratio,
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
