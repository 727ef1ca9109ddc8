"""Declared queries for similarity search over the `embeddings` table.

Scale posture: queries broadcast, corpus streams (one scan, no corpus
shuffle); fixed-point integer accumulation keeps results bit-identical to the
DuckDB oracle (see functions/similarity.py docstring).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from flink_cdc_fluss_quickstart_spark.functions import similarity
from flink_cdc_fluss_quickstart_spark.plans.registry import register
from flink_cdc_fluss_quickstart_spark.tables import load_table

# exact dot product / squared norm in DuckDB spelling: floor-scaled bigint
# sums (matches functions/similarity.py op-for-op)
_DOT = (
    "(CAST(list_sum(list_transform(e.embedding,"
    " (x, i) -> CAST(floor(x::DOUBLE * q.qv[i]::DOUBLE * 1e12) AS BIGINT))) AS DOUBLE) / 1e12)"
)
_QNORM = (
    "sqrt(CAST(list_sum(list_transform(q.qv,"
    " x -> CAST(floor(x::DOUBLE * x::DOUBLE * 1e12) AS BIGINT))) AS DOUBLE) / 1e12)"
)
_CNORM = (
    "sqrt(CAST(list_sum(list_transform(e.embedding,"
    " x -> CAST(floor(x::DOUBLE * x::DOUBLE * 1e12) AS BIGINT))) AS DOUBLE) / 1e12)"
)


@register(
    "embedding_cosine_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv
      FROM embeddings WHERE vec_id % 50 = 0
    ),
    scored AS (
      SELECT q.query_id,
             e.vec_id AS neighbor_id,
             {_DOT} / ({_QNORM} * {_CNORM}) AS cosine_sim
      FROM embeddings e, q
      WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, rank, cosine_sim
    FROM (
      SELECT query_id, neighbor_id, cosine_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    WHERE rank <= 5
    """,
    description="Brute-force cosine top-k ANN baseline: broadcast query set x"
    " streamed corpus, per-query top-k window.",
)
def embedding_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return similarity.cosine_topk(emb, queries, k=5)


@register(
    "embedding_label_centroids",
    oracle="""
    WITH flat AS (
      SELECT label,
             unnest(list_transform(embedding, (x, i) -> {'i': i, 'x': x})) AS s
      FROM embeddings
    )
    SELECT label,
           s.i AS dim,
           (CAST(SUM(CAST(floor(s.x::DOUBLE * 1e12) AS BIGINT)) AS DOUBLE) / 1e12)
             / COUNT(*) AS centroid
    FROM flat
    GROUP BY label, s.i
    """,
    description="Per-label embedding centroids via posexplode + exact"
    " fixed-point mean (the reduce step of IVF coarse quantization).",
)
def embedding_label_centroids(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = load_table(spark, sf_dir, "embeddings")
    flat = emb.select("label", F.posexplode("embedding").alias("pos", "x"))
    scaled = F.floor(F.col("x").cast("double") * F.lit(similarity.SCALE))
    return (
        flat.groupBy("label", (F.col("pos") + 1).alias("dim"))
        .agg(
            (
                (F.sum(scaled).cast("double") / F.lit(similarity.SCALE))
                / F.count(F.lit(1))
            ).alias("centroid")
        )
    )
