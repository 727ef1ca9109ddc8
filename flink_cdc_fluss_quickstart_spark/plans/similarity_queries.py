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
from flink_cdc_fluss_quickstart_spark.tables import load_table, spread

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
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return similarity.cosine_topk(emb, queries, k=5)


N_PLANES = 4
DIM = 64
_PLANES = similarity.lsh_planes(N_PLANES, DIM)


def _bucket_sql(col: str) -> str:
    """DuckDB spelling of similarity.lsh_bucket, op-for-op (same literal
    hyperplanes, same floor-scale association order)."""
    terms = []
    for p, w in enumerate(_PLANES):
        lit = "[" + ",".join(str(float(x)) for x in w) + "]"
        terms.append(
            f"(CASE WHEN list_sum(list_transform({col},"
            f" (x, i) -> CAST(floor(x::DOUBLE * ({lit})[i] * 1e12) AS BIGINT))) > 0"
            f" THEN {2 ** p} ELSE 0 END)"
        )
    return "CAST(" + " + ".join(terms) + " AS INTEGER)"


_BUCKETED = f"""
      SELECT vec_id, embedding, {_bucket_sql('embedding')} AS bucket
      FROM embeddings
"""


@register(
    "embedding_ann_lsh",
    oracle=f"""
    WITH b AS ({_BUCKETED}),
    q AS (SELECT vec_id AS query_id, embedding AS qv, bucket FROM b WHERE vec_id % 50 = 0),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id, q.bucket,
             {_DOT} / ({_QNORM} * {_CNORM}) AS cosine_sim
      FROM b e JOIN q ON e.bucket = q.bucket AND e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, bucket, rank, cosine_sim
    FROM (
      SELECT query_id, neighbor_id, bucket, cosine_sim,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY cosine_sim DESC, neighbor_id ASC) AS rank
      FROM scored
    )
    WHERE rank <= 5
    """,
    description="LSH-bucketed ANN (the scale path): sign-LSH over 4 fixed"
    " hyperplanes buckets the corpus; each query only scores its own bucket"
    " (~1/16 of the corpus), then exact cosine top-k. At 100 TB the bucket"
    " column is a partition key: queries route to one partition each.",
)
def embedding_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    # bucket AND norm are per-row: computed on the corpus scan, never per pair
    b = emb.select(
        "vec_id",
        "embedding",
        similarity.lsh_bucket(F.col("embedding"), _PLANES).alias("bucket"),
        F.sqrt(similarity.sq_norm(F.col("embedding"))).alias("__n"),
    )
    q = b.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
        F.col("bucket").alias("__qb"),
        F.col("__n").alias("__qn"),
    )
    from pyspark.sql.window import Window

    scored = (
        b.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("__qb")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            "bucket",
            (
                similarity.dot(F.col("__qv"), F.col("embedding"))
                / (F.col("__qn") * F.col("__n"))
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "bucket", "rank", "cosine_sim")
    )


_PAIR_DOT = (
    "(CAST(list_sum(list_transform(a.embedding,"
    " (x, i) -> CAST(floor(x::DOUBLE * b.embedding[i]::DOUBLE * 1e12) AS BIGINT))) AS DOUBLE) / 1e12)"
)
_PAIR_ANORM = (
    "sqrt(CAST(list_sum(list_transform(a.embedding,"
    " x -> CAST(floor(x::DOUBLE * x::DOUBLE * 1e12) AS BIGINT))) AS DOUBLE) / 1e12)"
)
_PAIR_BNORM = (
    "sqrt(CAST(list_sum(list_transform(b.embedding,"
    " x -> CAST(floor(x::DOUBLE * x::DOUBLE * 1e12) AS BIGINT))) AS DOUBLE) / 1e12)"
)


@register(
    "embedding_cosine_neardup",
    oracle=f"""
    WITH bk AS ({_BUCKETED})
    SELECT id_a, id_b, cosine_sim FROM (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b,
             {_PAIR_DOT} / ({_PAIR_ANORM} * {_PAIR_BNORM}) AS cosine_sim
      FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
    ) WHERE cosine_sim >= 0.4
    """,
    description="Embedding-cosine near-dup pairs: sign-LSH bucket self-join"
    " (never all-pairs) + exact cosine threshold. The 100 TB shape: pairs are"
    " generated within buckets only, so the join is an equi hash join on the"
    " bucket id.",
)
def embedding_cosine_neardup(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    bk = emb.select(
        "vec_id",
        "embedding",
        similarity.lsh_bucket(F.col("embedding"), _PLANES).alias("bucket"),
        F.sqrt(similarity.sq_norm(F.col("embedding"))).alias("__n"),
    )
    a, b = bk.alias("a"), bk.alias("b")
    pairs = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.vec_id") < F.col("b.vec_id")))
        .select(
            F.col("a.vec_id").alias("id_a"),
            F.col("b.vec_id").alias("id_b"),
            (
                similarity.dot(F.col("a.embedding"), F.col("b.embedding"))
                / (F.col("a.__n") * F.col("b.__n"))
            ).alias("cosine_sim"),
        )
    )
    return pairs.filter(F.col("cosine_sim") >= 0.4)


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
    emb = spread(load_table(spark, sf_dir, "embeddings"))
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


@register(
    "embedding_ann_multiprobe",
    oracle=f"""
    WITH b AS ({_BUCKETED}),
    q AS (
      SELECT query_id, qv, qn, unnest([bucket, xor(bucket, 1), xor(bucket, 2),
                                       xor(bucket, 4), xor(bucket, 8)]) AS probe
      FROM (SELECT vec_id AS query_id, embedding AS qv, bucket,
                   {_QNORM.replace('q.qv', 'embedding')} AS qn
            FROM b WHERE vec_id % 50 = 0) q
    ),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             {_DOT} / (q.qn * {_CNORM}) AS cosine_sim
      FROM b e JOIN q ON e.bucket = q.probe AND e.vec_id <> q.query_id
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
    description="Multi-probe sign-LSH ANN: each query probes its own bucket"
    " plus the 4 hamming-1 neighbor buckets (5/16 of the corpus) -- the"
    " recall/cost knob between single-probe LSH and brute force. The probe"
    " set expands row-locally (explode) so the match stays an equi hash join"
    " at scale, never a theta join.",
)
def embedding_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    from pyspark.sql.window import Window

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    b = emb.select(
        "vec_id",
        "embedding",
        similarity.lsh_bucket(F.col("embedding"), _PLANES).alias("bucket"),
        F.sqrt(similarity.sq_norm(F.col("embedding"))).alias("__n"),
    )
    probes = F.array(
        F.col("bucket"),
        *[F.col("bucket").bitwiseXOR(F.lit(1 << p)) for p in range(N_PLANES)],
    )
    q = (
        b.filter(F.col("vec_id") % 50 == 0)
        .select(
            F.col("vec_id").alias("query_id"),
            F.col("embedding").alias("__qv"),
            F.col("__n").alias("__qn"),
            F.explode(probes).alias("__probe"),
        )
    )
    scored = (
        b.join(
            F.broadcast(q),
            (F.col("bucket") == F.col("__probe")) & (F.col("vec_id") != F.col("query_id")),
        )
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            (
                similarity.dot(F.col("__qv"), F.col("embedding"))
                / (F.col("__qn") * F.col("__n"))
            ).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )
