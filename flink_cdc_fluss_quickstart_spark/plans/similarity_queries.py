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
    return _bf_topk(spread(load_table(spark, sf_dir, "embeddings")))


def _bf_topk(emb: DataFrame) -> DataFrame:
    """Frame-level brute-force top-k (shared with the clustered recall
    fixture, which feeds a derived embedding frame instead of the table)."""
    queries = emb.filter(F.col("vec_id") % 50 == 0)
    return similarity.cosine_topk(emb, queries, k=5)


# Plane count derived from the nominal bench corpus (sf0.1 = 5000 vectors)
# via the scale rule p >= log2(N / target_bucket_size) -- see
# similarity.n_planes_for. The registered queries need a FIXED count because
# the DuckDB oracle SQL is static; similarity.ann_lsh derives from the actual
# corpus at runtime.
_NOMINAL_CORPUS = 5_000
N_PLANES = similarity.n_planes_for(_NOMINAL_CORPUS)
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
    description=f"LSH-bucketed ANN (the scale path): sign-LSH over {N_PLANES}"
    " fixed hyperplanes buckets the corpus; each query only scores its own"
    f" bucket (~1/{2 ** N_PLANES} of the corpus), then exact cosine top-k."
    " Plane count follows n_planes_for(corpus) so bucket size stays constant"
    " as the corpus grows. At 100 TB the bucket column is a partition key:"
    " queries route to one partition each.",
)
def embedding_ann_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _lsh_topk(spread(load_table(spark, sf_dir, "embeddings")))


def _lsh_topk(emb: DataFrame, query_mod: int = 50, k: int = 5) -> DataFrame:
    # bucket AND norm are per-row: computed on the corpus scan, never per pair
    b = emb.select(
        "vec_id",
        "embedding",
        similarity.lsh_bucket(F.col("embedding"), _PLANES).alias("bucket"),
        F.sqrt(similarity.sq_norm(F.col("embedding"))).alias("__n"),
    )
    q = b.filter(F.col("vec_id") % query_mod == 0).select(
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
        .filter(F.col("rank") <= k)
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


# scored within-bucket pair subquery + threshold, shared by the neardup and
# dedup-representatives oracles so the two cannot drift apart
_NEARDUP_PAIRS_SQL = f"""
      SELECT id_a, id_b, cosine_sim FROM (
        SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               {_PAIR_DOT} / ({_PAIR_ANORM} * {_PAIR_BNORM}) AS cosine_sim
        FROM bk a JOIN bk b ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      ) WHERE cosine_sim >= 0.4
"""


@register(
    "embedding_cosine_neardup",
    oracle=f"""
    WITH bk AS ({_BUCKETED})
    {_NEARDUP_PAIRS_SQL}
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
    "embedding_dedup_representatives",
    oracle=f"""
    WITH RECURSIVE bk AS ({_BUCKETED}),
    p AS (
      SELECT id_a, id_b FROM ({_NEARDUP_PAIRS_SQL})
    ),
    edges AS (
      SELECT id_a AS s, id_b AS d FROM p
      UNION ALL
      SELECT id_b AS s, id_a AS d FROM p
    ),
    reach(s, d) AS (
      SELECT vec_id, vec_id FROM embeddings
      UNION
      SELECT r.s, e.d FROM reach r JOIN edges e ON r.d = e.s
    ),
    comp AS (SELECT s AS vec_id, MIN(d) AS component_id FROM reach GROUP BY s)
    SELECT e.vec_id, e.label
    FROM embeddings e JOIN comp c ON e.vec_id = c.vec_id
    WHERE c.vec_id = c.component_id
    """,
    description="Embedding-side dedup end step (the vector twin of"
    " dedup_keep_representatives): connected components over the"
    " LSH-bucketed cosine near-dup pair graph, keeping the minimum vec_id"
    " per cluster -- pointer-jumping CC (O(log diameter) rounds, loop over"
    " rounds never rows) then a row-local component_id = vec_id filter"
    " joined back to the corpus.",
)
def embedding_dedup_representatives(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_cdc_fluss_quickstart_spark.functions.dedup import connected_components

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    pairs = embedding_cosine_neardup(spark, sf_dir).select("id_a", "id_b")
    comp = connected_components(
        pairs, emb.select("vec_id"), id_col="vec_id", src_col="id_a", dst_col="id_b"
    )
    reps = comp.filter(F.col("vec_id") == F.col("component_id")).select("vec_id")
    return emb.join(reps, "vec_id").select("vec_id", "label")


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
      SELECT query_id, qv, qn,
             unnest([bucket{"".join(f", xor(bucket, {1 << p})" for p in range(N_PLANES))}]) AS probe
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
    f" plus the {N_PLANES} hamming-1 neighbor buckets"
    f" ({N_PLANES + 1}/{2 ** N_PLANES} of the corpus) -- the recall/cost knob"
    " between single-probe LSH and brute force. The probe set expands"
    " row-locally (explode) so the match stays an equi hash join at scale,"
    " never a theta join.",
)
def embedding_ann_multiprobe(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _multiprobe_topk(spread(load_table(spark, sf_dir, "embeddings")))


def _multiprobe_topk(emb: DataFrame) -> DataFrame:
    from pyspark.sql.window import Window

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


NPROBE = 2  # centroid cells each query scans; the IVF recall/cost knob


@register(
    "embedding_ann_ivf",
    oracle=f"""
    WITH cent_flat AS (
      SELECT label, s.i AS dim,
             (CAST(SUM(CAST(floor(s.x::DOUBLE * 1e12) AS BIGINT)) AS DOUBLE) / 1e12)
               / COUNT(*) AS c
      FROM (SELECT label,
                   unnest(list_transform(embedding, (x, i) -> {{'i': i, 'x': x}})) AS s
            FROM embeddings)
      GROUP BY label, s.i
    ),
    cent AS (
      SELECT label, list(c ORDER BY dim) AS cv FROM cent_flat GROUP BY label
    ),
    q AS (
      SELECT vec_id AS query_id, embedding AS qv,
             {_QNORM.replace('q.qv', 'embedding')} AS qn
      FROM embeddings WHERE vec_id % 50 = 0
    ),
    routed AS (
      SELECT query_id, qv, qn, label AS probe_label FROM (
        SELECT q.query_id, q.qv, q.qn, c.label,
               ROW_NUMBER() OVER (PARTITION BY q.query_id ORDER BY
                 (CAST(list_sum(list_transform(q.qv,
                    (x, i) -> CAST(floor(x::DOUBLE * c.cv[i] * 1e12) AS BIGINT))) AS DOUBLE) / 1e12)
                 / (q.qn * sqrt(CAST(list_sum(list_transform(c.cv,
                    x -> CAST(floor(x * x * 1e12) AS BIGINT))) AS DOUBLE) / 1e12))
                 DESC, c.label ASC) AS r
        FROM q CROSS JOIN cent c
      ) WHERE r <= {NPROBE}
    ),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id,
             {_DOT} / (q.qn * {_CNORM}) AS cosine_sim
      FROM embeddings e JOIN routed q
        ON e.label = q.probe_label AND e.vec_id <> q.query_id
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
    description="IVF-routed ANN: label centroids act as the coarse quantizer"
    f" (cells = labels); each query routes to its {NPROBE} nearest centroids"
    " (tiny broadcast cross join) and scores ONLY those cells via an equi"
    " hash join on the cell id -- the corpus never shuffles and never meets a"
    " theta join. At 100 TB the cell id is the partition key, so a probe"
    " reads nprobe partitions instead of the whole corpus.",
)
def embedding_ann_ivf(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _ivf_topk(spread(load_table(spark, sf_dir, "embeddings")))


def _ivf_topk(emb: DataFrame) -> DataFrame:
    from pyspark.sql.window import Window

    # coarse quantizer: exact fixed-point per-label centroid vectors as a
    # TWO-LEVEL streaming aggregate. Level 1 posexplodes to (label, dim,
    # floor-scaled BIGINT) and integer-SUMs per (label, dim): Catalyst plans
    # the usual partial/final HashAggregate pair, so per-buffer state is a
    # single long, the explode is pipelined (never materialized), and the
    # exchange carries only n_labels x DIM partial rows per map task --
    # map-side combine does the data reduction. Level 2 reassembles the DIM
    # per-dim sums into the centroid array (collect_list of DIM structs =
    # O(DIM) state per label). Integer addition is order-independent, so the
    # result is bit-identical to the oracle's per-dim SUM regardless of
    # partitioning. A hot cell costs nothing extra: its rows spread over
    # DIM keys and fold into scalars before they ever shuffle (the previous
    # collect_list-then-fold shape buffered O(cell_size x DIM) per
    # aggregation buffer -- an executor OOM at corpus scale). Measured
    # alternative, rejected: one wide aggregate with DIM explicit
    # element_at sum columns has the same O(DIM) state and one fewer
    # exchange, but its 64-column codegen compiles slowly and ran 1.4-2.5x
    # SLOWER end-to-end here and in the kmeans update (which would pay the
    # compile per Lloyd round).
    per_dim = (
        emb.select("label", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("label", "dim")
        .agg(
            F.sum(
                F.floor(F.col("x").cast("double") * similarity.SCALE).cast("bigint")
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    cent = (
        per_dim.groupBy("label")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "s", "n"))).alias("ds"))
        .select(
            "label",
            F.expr(
                f"transform(ds, p -> (CAST(p.s AS DOUBLE) / {similarity.SCALE}) / p.n)"
            ).alias("cv"),
        )
    )
    cent = cent.withColumn("cn", F.sqrt(similarity.sq_norm(F.col("cv"))))

    b = emb.select(
        "vec_id",
        "label",
        "embedding",
        F.sqrt(similarity.sq_norm(F.col("embedding"))).alias("__n"),
    )
    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.col("embedding").alias("__qv"),
        F.sqrt(similarity.sq_norm(F.col("embedding"))).alias("__qn"),
    )

    # routing: queries x centroids is (n_queries x n_labels) -- both tiny, so
    # the cross join broadcasts; the corpus-facing join below stays equi
    route_sim = similarity.dot(F.col("__qv"), F.col("cv")) / (F.col("__qn") * F.col("cn"))
    wr = Window.partitionBy("query_id").orderBy(F.desc("route_sim"), F.asc("label"))
    routed = (
        q.crossJoin(F.broadcast(cent))
        .withColumn("route_sim", route_sim)
        .withColumn("r", F.row_number().over(wr))
        .filter(F.col("r") <= NPROBE)
        .select("query_id", "__qv", "__qn", F.col("label").alias("__probe"))
    )
    scored = (
        b.join(
            F.broadcast(routed),
            (F.col("label") == F.col("__probe")) & (F.col("vec_id") != F.col("query_id")),
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


# --- distributed k-means (self-trained coarse quantizer) ---------------------

KMEANS_K = 8      # clusters; init = the K lowest vec_ids (deterministic)
KMEANS_ITERS = 2  # Lloyd refinement rounds (fixed, so the oracle can unroll)

# exact fixed-point squared L2 distance between the float corpus vector and a
# DOUBLE centroid: per-dim floor((x-y)^2 * SCALE) BIGINTs summed -- integer
# addition is order-independent, so assignment is bit-identical to the oracle
_KM_D2 = (
    "aggregate(zip_with(embedding, c.cv, (x, y) ->"
    " CAST(floor((CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y) * 1e12) AS BIGINT)),"
    " CAST(0 AS BIGINT), (a, b) -> a + b)"
)
_KM_PICK = (
    f"array_min(transform(__cents, c -> named_struct("
    f"'d', {_KM_D2}, 'k', c.cluster)))"
)


def _km_assign(emb: DataFrame, cents: DataFrame) -> DataFrame:
    """Row-local nearest-centroid assignment: centroids collapse to ONE row
    (K x DIM doubles -- metadata-sized at any corpus scale), broadcast, and
    the argmin folds over that array per corpus row. Zero shuffle; ties break
    to the lowest cluster id via lexicographic struct ordering."""
    packed = cents.agg(F.collect_list(F.struct("cluster", "cv")).alias("__cents"))
    return (
        emb.crossJoin(F.broadcast(packed))
        .select("vec_id", "embedding", F.expr(_KM_PICK).alias("__pick"))
        .select(
            "vec_id",
            "embedding",
            F.col("__pick.k").alias("cluster"),
            F.col("__pick.d").alias("__d2"),
        )
    )


def _km_update(assigned: DataFrame) -> DataFrame:
    """Centroid recomputation as the same two-level streaming aggregate as
    embedding_ann_ivf's: level 1 integer-sums floor-scaled components per
    (cluster, dim) -- partial/final HashAggregate, O(1) state per buffer,
    map-side combine does the reduction; level 2 reassembles DIM per-dim
    means into the centroid array (O(DIM) state per cluster)."""
    per_dim = (
        assigned.select("cluster", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("cluster", "dim")
        .agg(
            F.sum(
                F.floor(F.col("x").cast("double") * similarity.SCALE).cast("bigint")
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return (
        per_dim.groupBy("cluster")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "s", "n"))).alias("ds"))
        .select(
            "cluster",
            F.expr(
                f"transform(ds, p -> (CAST(p.s AS DOUBLE) / {similarity.SCALE}) / p.n)"
            ).alias("cv"),
        )
    )


def _km_cte_chain() -> str:
    """Unrolled DuckDB twin of the Lloyd loop (fixed KMEANS_ITERS makes the
    recursion a static CTE chain), op-for-op: same fixed-point distance, same
    struct-min tie-break, same per-dim integer sums. Returns the WITH chain
    through `fin` (vec_id, embedding, pick) so both the kmeans oracle and
    downstream consumers (semantic_dedup_prune) extend the identical
    clustering and cannot drift apart."""
    d2 = (
        "CAST(list_sum(list_transform(embedding, (x, i) ->"
        " CAST(floor((x::DOUBLE - c.cv[i]) * (x::DOUBLE - c.cv[i]) * 1e12) AS BIGINT)))"
        " AS BIGINT)"
    )
    assign = (
        "SELECT vec_id, embedding,"
        f" list_min(list_transform(cs, c -> {{'d': {d2}, 'k': c.cluster}})) AS pick"
        " FROM embeddings CROSS JOIN"
        " (SELECT list({'cluster': cluster, 'cv': cv}) AS cs FROM __SRC__)"
    )
    update = """
      SELECT cluster, list(cvx ORDER BY dim) AS cv FROM (
        SELECT pick.k AS cluster, s.i AS dim,
               (CAST(SUM(CAST(floor(s.x::DOUBLE * 1e12) AS BIGINT)) AS DOUBLE) / 1e12)
                 / COUNT(*) AS cvx
        FROM (SELECT pick,
                     unnest(list_transform(embedding, (x, i) -> {'i': i, 'x': x})) AS s
              FROM __SRC__)
        GROUP BY pick.k, s.i
      ) GROUP BY cluster
    """
    parts = [
        f"WITH c0 AS (SELECT CAST(vec_id AS BIGINT) AS cluster,"
        f" list_transform(embedding, x -> x::DOUBLE) AS cv"
        f" FROM embeddings WHERE vec_id < {KMEANS_K})"
    ]
    for it in range(1, KMEANS_ITERS + 1):
        parts.append(f", a{it} AS ({assign.replace('__SRC__', f'c{it - 1}')})")
        parts.append(f", c{it} AS ({update.replace('__SRC__', f'a{it}')})")
    parts.append(f", fin AS ({assign.replace('__SRC__', f'c{KMEANS_ITERS}')})")
    return "\n".join(parts)


def _km_oracle() -> str:
    return (
        _km_cte_chain()
        + "\nSELECT vec_id, pick.k AS cluster,"
        " CAST(pick.d AS DOUBLE) / 1e12 AS dist_sq FROM fin"
    )


def _km_final_assign(emb: DataFrame) -> DataFrame:
    """The full Lloyd loop to the final assignment frame (vec_id, embedding,
    cluster, __d2) -- shared by kmeans_embeddings and semantic_dedup_prune
    so both build the IDENTICAL clustering."""
    cents = emb.filter(F.col("vec_id") < KMEANS_K).select(
        F.col("vec_id").cast("bigint").alias("cluster"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("cv"),
    )
    for _ in range(KMEANS_ITERS):
        cents = _km_update(_km_assign(emb, cents))
    return _km_assign(emb, cents)


@register(
    "kmeans_embeddings",
    oracle=_km_oracle(),
    description=f"Distributed k-means (Lloyd) over the embedding corpus:"
    f" {KMEANS_ITERS} refinement rounds from a deterministic seed (the"
    f" {KMEANS_K} lowest vec_ids), emitting each vector's final cluster and"
    f" exact fixed-point squared distance -- the SELF-TRAINED coarse"
    f" quantizer that replaces embedding_ann_ivf's label cells when no labels"
    f" exist. Per round: centroids collapse to one K x DIM row and BROADCAST"
    f" (assignment is a row-local array fold, zero shuffle -- never an N x K"
    f" shuffle join), then ONE (cluster, dim)-keyed partial/final aggregate"
    f" recomputes means with O(1)-state integer buffers. The driver loop runs"
    f" {KMEANS_ITERS} rounds, never rows; cost at 100 TB is"
    f" {KMEANS_ITERS + 1} corpus scans + {KMEANS_ITERS} bounded shuffles."
    f" All arithmetic is floor-scaled BIGINT (order-independent), so the"
    f" result is bit-identical to the oracle's unrolled CTE chain.",
)
def kmeans_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    final = _km_final_assign(emb)
    return final.select(
        "vec_id",
        "cluster",
        (F.col("__d2").cast("double") / similarity.SCALE).alias("dist_sq"),
    )


# --- semantic dedup (SemDeDup) -----------------------------------------------

# intra-cluster cosine threshold: a pair above it is a semantic duplicate.
# (SemDeDup, Abbas et al. 2023, arXiv:2303.09540, runs ~0.95+ on real text
# embeddings; the synthetic corpus is near-isotropic, so the registered
# threshold sits where pruning is actually exercised at test SF.)
SEMDEDUP_TAU = 0.4


@register(
    "semantic_dedup_prune",
    oracle=f"""
    {_km_cte_chain()}
    , asg AS (SELECT vec_id, embedding, pick.k AS cluster FROM fin)
    , pr AS (
      SELECT DISTINCT b.vec_id
      FROM asg a JOIN asg b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
      WHERE {_PAIR_DOT} / ({_PAIR_ANORM} * {_PAIR_BNORM}) >= {SEMDEDUP_TAU}
    )
    SELECT a.vec_id, CAST(a.cluster AS BIGINT) AS cluster,
           CAST(CASE WHEN pr.vec_id IS NULL THEN 1 ELSE 0 END AS BIGINT) AS keep
    FROM asg a LEFT JOIN pr ON a.vec_id = pr.vec_id
    """,
    description=f"Semantic dedup (SemDeDup, Abbas et al. 2023): cluster the"
    f" embedding corpus with the SAME {KMEANS_K}-cell Lloyd k-means as"
    f" kmeans_embeddings, then prune, WITHIN each cell, every vector that"
    f" has a lower-id neighbor at cosine >= {SEMDEDUP_TAU} -- keeping one"
    f" representative per epsilon-neighborhood. The pair scan is"
    f" cell-bucketed: cost is sum(|cell|^2), never corpus^2, and the cell"
    f" count K is the knob that bounds |cell| as the corpus grows (SemDeDup"
    f" production runs use K~50k; the pair join stays an equi join on the"
    f" cluster id either way). The clustering reuses the broadcast-centroid"
    f" row-local assignment (zero shuffle), the keep rule is one"
    f" cluster-keyed self-join + left anti-style flag, and all cosine math"
    f" is the fixed-point scaled-sum form, so the result is bit-identical"
    f" to the oracle's unrolled CTE chain.",
)
def semantic_dedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_cdc_fluss_quickstart_spark.functions.dedup import track_cache

    emb = spread(load_table(spark, sf_dir, "embeddings"))
    # persisted: the assignment feeds both sides of the pair join AND the
    # output frame -- without it the Lloyd loop would run three times
    assigned = track_cache(
        _km_final_assign(emb).select("vec_id", "embedding", "cluster").persist()
    )
    a = assigned.select(
        "cluster",
        F.col("vec_id").alias("__ida"),
        F.col("embedding").alias("__ea"),
        F.sqrt(similarity.sq_norm(F.col("embedding"))).alias("__na"),
    )
    b = assigned.select(
        "cluster",
        F.col("vec_id").alias("vec_id"),
        F.col("embedding").alias("__eb"),
        F.sqrt(similarity.sq_norm(F.col("embedding"))).alias("__nb"),
    )
    pruned = (
        a.join(b, "cluster")
        .filter(F.col("__ida") < F.col("vec_id"))
        .filter(
            similarity.dot(F.col("__ea"), F.col("__eb"))
            / (F.col("__na") * F.col("__nb"))
            >= SEMDEDUP_TAU
        )
        .select("vec_id")
        .distinct()
        .withColumn("__pruned", F.lit(1))
    )
    return assigned.join(pruned, "vec_id", "left").select(
        "vec_id",
        "cluster",
        F.when(F.col("__pruned").isNull(), F.lit(1))
        .otherwise(F.lit(0))
        .cast("bigint")
        .alias("keep"),
    )


# --- int8 scalar quantization ------------------------------------------------

QUANT_LEVELS = 255  # uint8 code range [0, 255]


@register(
    "embedding_int8_quantize",
    oracle=f"""
    WITH stats AS (
      SELECT s.i AS dim,
             MIN(s.x::DOUBLE) AS mn,
             MAX(s.x::DOUBLE) AS mx
      FROM (SELECT unnest(list_transform(embedding, (x, i) -> {{'i': i, 'x': x}})) AS s
            FROM embeddings)
      GROUP BY s.i
    ),
    rng AS (SELECT list({{'dim': dim, 'mn': mn, 'mx': mx}} ORDER BY dim) AS st FROM stats)
    SELECT vec_id,
           array_to_string(
             list_transform(embedding, (x, i) -> CAST(least({QUANT_LEVELS}, greatest(0,
               CAST(floor(((x::DOUBLE - st[i].mn)
                 / (CASE WHEN st[i].mx = st[i].mn THEN 1.0 ELSE st[i].mx - st[i].mn END))
                 * {QUANT_LEVELS}.0) AS BIGINT))) AS INTEGER)),
             '-') AS codes,
           list_max(list_transform(embedding, (x, i) -> abs(x::DOUBLE -
             (st[i].mn + (CAST(least({QUANT_LEVELS}, greatest(0,
               CAST(floor(((x::DOUBLE - st[i].mn)
                 / (CASE WHEN st[i].mx = st[i].mn THEN 1.0 ELSE st[i].mx - st[i].mn END))
                 * {QUANT_LEVELS}.0) AS BIGINT))) AS DOUBLE) / {QUANT_LEVELS}.0)
               * (st[i].mx - st[i].mn))))) AS max_abs_err
    FROM embeddings CROSS JOIN rng
    """,
    description=f"Int8 scalar quantization of the embedding store (the 4x"
    f" compression step a 100 TB vector corpus takes before ANN serving):"
    f" per-dimension corpus min/max -> uint8 code"
    f" floor((x-mn)/(mx-mn)*{QUANT_LEVELS}), emitted as a dash-joined code"
    f" string plus the exact per-vector max reconstruction error."
    f" Determinism without fixed-point tricks: min/max SELECT exact float"
    f" values (order-independent), and every downstream op is a single"
    f" explicitly-parenthesized IEEE double op on identical inputs, so both"
    f" engines produce bit-identical codes. Scale shape: ONE"
    f" (dim)-keyed partial/final aggregate (O(1) state, {'{:,}'.format(64)}"
    f" final rows), ranges broadcast back as one metadata row, quantization"
    f" itself row-local -- a single bounded shuffle regardless of corpus"
    f" size; constant dimensions quantize to code 0 via the guarded range.",
)
def embedding_int8_quantize(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    stats = (
        emb.select(F.posexplode("embedding").alias("pos", "x"))
        .groupBy((F.col("pos") + 1).alias("dim"))
        .agg(
            F.min(F.col("x").cast("double")).alias("mn"),
            F.max(F.col("x").cast("double")).alias("mx"),
        )
    )
    rng = stats.agg(F.array_sort(F.collect_list(F.struct("dim", "mn", "mx"))).alias("st"))
    code = (
        f"CAST(least({QUANT_LEVELS}, greatest(0,"
        f" CAST(floor(((CAST(x AS DOUBLE) - st[i - 1].mn)"
        f" / (CASE WHEN st[i - 1].mx = st[i - 1].mn THEN 1.0D"
        f" ELSE st[i - 1].mx - st[i - 1].mn END))"
        f" * {QUANT_LEVELS}.0D) AS BIGINT))) AS INT)"
    )
    err = (
        f"abs(CAST(x AS DOUBLE) - (st[i - 1].mn"
        f" + (CAST({code} AS DOUBLE) / {QUANT_LEVELS}.0D)"
        f" * (st[i - 1].mx - st[i - 1].mn)))"
    )
    return (
        emb.crossJoin(F.broadcast(rng))
        .select(
            "vec_id",
            F.expr(
                "array_join(zip_with(embedding, sequence(1, size(embedding)),"
                f" (x, i) -> CAST({code} AS STRING)), '-')"
            ).alias("codes"),
            F.expr(
                "array_max(zip_with(embedding, sequence(1, size(embedding)),"
                f" (x, i) -> {err}))"
            ).alias("max_abs_err"),
        )
    )


# --- ANN recall evaluation ---------------------------------------------------

def _ann_recall_oracle() -> str:
    """Composes the registered oracles: brute force is ground truth; each ANN
    variant's top-k is intersected with it per query. Exact integer overlap
    counts; the single float op is the final recall division."""
    from flink_cdc_fluss_quickstart_spark.plans.registry import get

    bf = get("embedding_cosine_topk").oracle
    variants = {
        "lsh": get("embedding_ann_lsh").oracle,
        "multiprobe": get("embedding_ann_multiprobe").oracle,
        "ivf": get("embedding_ann_ivf").oracle,
    }
    branches = []
    for name, sql in variants.items():
        branches.append(f"""
      SELECT '{name}' AS method,
             CAST((SELECT COUNT(DISTINCT query_id) FROM bf) AS BIGINT) AS n_queries,
             CAST(5 AS BIGINT) AS k,
             CAST((SELECT COUNT(*)
                   FROM bf JOIN ({sql}) a
                     ON bf.query_id = a.query_id
                    AND bf.neighbor_id = a.neighbor_id) AS BIGINT) AS total_overlap
        """)
    union = "\nUNION ALL\n".join(branches)
    return f"""
    WITH bf AS ({bf})
    SELECT method, n_queries, k, total_overlap,
           CAST(total_overlap AS DOUBLE) / (n_queries * k) AS recall_at_k
    FROM ({union})
    """


@register(
    "ann_recall_report",
    oracle=_ann_recall_oracle(),
    description="ANN quality evaluation: recall@5 of every approximate"
    " variant (sign-LSH, multi-probe, IVF) against the exact brute-force"
    " top-k on the same query set -- the go/no-go report a deployment runs"
    " before trading exactness for the bucketed scale path. Composes the"
    " registered queries themselves (the numbers grade exactly the plans"
    " the engine ships); overlap counts aggregate as exact BIGINTs and the"
    " single float op is the final division, so the report is"
    " cross-engine deterministic. Scale cost is the sum of the composed"
    " plans; the joins add only (query_id, neighbor_id) pairs -- k rows"
    " per query -- never corpus data. (On this near-uniform synthetic"
    " corpus absolute recall is structurally low -- random vectors'"
    " neighbors scatter across sign-LSH buckets -- and the ordering"
    " multiprobe > ivf > single-probe is exactly the probe-count story;"
    " clustered real embeddings concentrate neighbors into cells and raise"
    " all three.)",
)
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _recall_report(spread(load_table(spark, sf_dir, "embeddings")))


def _recall_report(emb: DataFrame) -> DataFrame:
    from flink_cdc_fluss_quickstart_spark.functions.dedup import track_cache

    # the brute-force frame is EXPENSIVE to compute and tiny to hold (k rows
    # per query): persist it so the overlap join plus the n_queries
    # aggregate reuse one materialization. Lazy -- building this plan
    # runs nothing (an explain/report pass must not pay a corpus-scale job);
    # the count folds into the returned plan as a broadcast 1-row aggregate,
    # the same shape every other data-dependent scalar here rides.
    bf = track_cache(_bf_topk(emb).select("query_id", "neighbor_id").persist())
    variants = {
        "lsh": _lsh_topk(emb),
        "multiprobe": _multiprobe_topk(emb),
        "ivf": _ivf_topk(emb),
    }
    nq = bf.agg(F.countDistinct("query_id").cast("bigint").alias("n_queries"))
    return _overlap_report(bf, variants, nq, k=5)


def _overlap_report(
    bf: DataFrame, variants: dict[str, DataFrame], nq: DataFrame, k: int
) -> DataFrame:
    """Shared recall-report tail: union the method-tagged arm outputs, join
    ground truth ONCE, group by method. r16 optimization round: the prior
    shape joined bf against each arm separately, so the (persisted but
    lineage-carrying) brute-force subtree was re-embedded and re-analyzed
    per arm -- 4 occurrences for 3 arms + the n_queries aggregate; this
    shape carries 2 (the join + the aggregate) at any arm count, and runs
    ONE overlap join instead of one per arm. The zero-overlap edge keeps
    its row via the left join against the static method list (an aggregate
    without groupBy always emitted a row before; a groupBy drops empty
    groups). hits is method-count-bounded (one count per method), so its
    broadcast is metadata-sized; the 3-row method list is the stream side,
    preserving the prior lsh/multiprobe/ivf output order."""
    arms = None
    for name, df in variants.items():
        tagged = df.select(
            F.lit(name).alias("method"), "query_id", "neighbor_id"
        )
        arms = tagged if arms is None else arms.unionByName(tagged)
    hits = (
        bf.join(arms, ["query_id", "neighbor_id"])
        .groupBy("method")
        .agg(F.count(F.lit(1)).cast("bigint").alias("total_overlap"))
    )
    methods = bf.sparkSession.createDataFrame(
        [(name,) for name in variants], schema="method string"
    )
    reports = methods.join(F.broadcast(hits), "method", "left").select(
        "method",
        F.coalesce(F.col("total_overlap"), F.lit(0).cast("bigint")).alias(
            "total_overlap"
        ),
    )
    return reports.crossJoin(F.broadcast(nq)).select(
        "method",
        "n_queries",
        F.lit(k).cast("bigint").alias("k"),
        "total_overlap",
        (
            F.col("total_overlap").cast("double") / (F.col("n_queries") * F.col("k"))
        ).alias("recall_at_k"),
    )


# --- clustered recall fixture ------------------------------------------------

ANN_CLUSTERS = 8          # planted clusters (one coordinate-axis spike each)
ANN_CLUSTER_OFFSET = 3.0  # exact-in-double spike added to one dim per cluster


def _clustered_embeddings(emb: DataFrame) -> DataFrame:
    """Deterministic mixture-of-clusters corpus derived IN-PLAN from the base
    embeddings: row r joins cluster c = vec_id % ANN_CLUSTERS and gets
    +ANN_CLUSTER_OFFSET on dimensions i with i % ANN_CLUSTERS == c; label
    becomes the cluster id (so IVF's label-cells align with the planted
    structure, as a trained coarse quantizer would). Every op is exact in
    float64 (float widening + addition of an exactly-representable literal),
    so Spark and DuckDB derive bit-identical vectors."""
    offset = (
        f"CASE WHEN i % {ANN_CLUSTERS} = pmod(vec_id, {ANN_CLUSTERS})"
        f" THEN CAST({ANN_CLUSTER_OFFSET} AS DOUBLE) ELSE CAST(0.0 AS DOUBLE) END"
    )
    return emb.select(
        "vec_id",
        F.expr(
            f"transform(embedding, (x, i) -> CAST(CAST(x AS DOUBLE) + ({offset}) AS DOUBLE))"
        ).alias("embedding"),
        F.pmod(F.col("vec_id"), F.lit(ANN_CLUSTERS)).cast("bigint").alias("label"),
    )


def _ann_recall_clustered_oracle() -> str:
    """The composed recall oracle with `embeddings` rebound to the clustered
    derivation: a mechanical word-boundary rename of every table reference to
    the `emb_clustered` CTE (no name shadowing, so the CTE's own FROM reads
    the base view unqualified -- robust to however the harness registers
    the tables)."""
    import re as _re

    inner = _re.sub(r"\bembeddings\b", "emb_clustered", _ann_recall_oracle())
    body = _re.sub(r"^\s*WITH\b", "", inner, count=1)
    return f"""
    WITH emb_clustered AS (
      SELECT vec_id,
             list_transform(embedding, (x, i) -> CAST(x::DOUBLE +
               (CASE WHEN (i - 1) % {ANN_CLUSTERS} = vec_id % {ANN_CLUSTERS}
                     THEN CAST({ANN_CLUSTER_OFFSET} AS DOUBLE)
                     ELSE CAST(0.0 AS DOUBLE) END) AS DOUBLE)) AS embedding,
             CAST(vec_id % {ANN_CLUSTERS} AS BIGINT) AS label
      FROM embeddings
    ),
    {body}
    """


@register(
    "ann_recall_report_clustered",
    oracle=_ann_recall_clustered_oracle(),
    description="ANN recall@5 on a CLUSTERED corpus: the same composed"
    " lsh/multiprobe/ivf-vs-brute-force report, run over a deterministic"
    " mixture-of-clusters embedding frame derived in-plan from the base"
    " table (per-cluster coordinate spikes; labels = planted clusters)."
    " This is the fixture that makes the recall numbers MEANINGFUL: on the"
    " near-uniform synthetic base corpus neighbors scatter across sign-LSH"
    " buckets and absolute recall is structurally low, while clustered"
    " vectors concentrate true neighbors into the same buckets/cells --"
    " the recall ordering and floors are asserted in"
    " tests/test_functions_approx.py. Scale shape identical to"
    " ann_recall_report (the derivation is row-local).",
)
def ann_recall_report_clustered(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    return _recall_report(_clustered_embeddings(emb))


# --- PCA top component (power iteration) -------------------------------------

PCA_SCALE = 1_000_000  # fixed-point scale for covariance accumulation
PCA_ITERS = 3          # normalized power-iteration steps (fixed -> unrollable)


def _pca_mv(cd: str, v: str) -> str:
    """Spark expr: w = C v as an ORDERED left fold per output dim (the fold
    order is the cross-engine determinism contract for double addition)."""
    return (
        f"transform(sequence(0, {DIM - 1}), i -> "
        f"aggregate(sequence(0, {DIM - 1}), CAST(0 AS DOUBLE), "
        f"(acc, j) -> acc + {cd}[i * {DIM} + j] * {v}[j]))"
    )


def _pca_norm(w: str) -> str:
    return (
        f"sqrt(aggregate(sequence(0, {DIM - 1}), CAST(0 AS DOUBLE), "
        f"(acc, i) -> acc + {w}[i] * {w}[i]))"
    )


def _duck_mv(cd: str, v: str) -> str:
    """DuckDB twin of _pca_mv: list_reduce is a left fold in list order, so
    the addition sequence t0+t1+...+t63 is identical (Spark's explicit zero
    only adds 0.0 + t0 = t0)."""
    return (
        f"list_transform(range(0, {DIM}), i -> "
        f"list_reduce(list_transform(range(0, {DIM}), "
        f"j -> {cd}[i * {DIM} + j + 1] * {v}[j + 1]), (a, x) -> a + x))"
    )


def _duck_norm(w: str) -> str:
    return (
        f"sqrt(list_reduce(list_transform(range(0, {DIM}), "
        f"i -> {w}[i + 1] * {w}[i + 1]), (a, x) -> a + x))"
    )


def _pca_oracle() -> str:
    v0 = f"list_transform(range(0, {DIM}), i -> CAST(0.125 AS DOUBLE))"
    its = [f"it0 AS (SELECT cd, mu.n AS n, {v0} AS v FROM cr CROSS JOIN mu)"]
    for k in range(1, PCA_ITERS + 1):
        prev = f"it{k - 1}"
        its.append(
            f"it{k} AS (SELECT cd, n, list_transform({_duck_mv('cd', 'v')},"
            f" x -> x / (CASE WHEN {_duck_norm(_duck_mv('cd', 'v'))} = 0 THEN 1.0"
            f" ELSE {_duck_norm(_duck_mv('cd', 'v'))} END)) AS v FROM {prev})"
        )
    return f"""
    WITH e AS (
      SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS e FROM embeddings
    ),
    pd AS (
      SELECT s.i AS dim,
             SUM(CAST(floor(s.x * 1e12) AS BIGINT)) AS sm,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM (SELECT unnest(list_transform(e, (x, i) -> {{'i': i, 'x': x}})) AS s FROM e)
      GROUP BY s.i
    ),
    mu AS (
      SELECT list((CAST(sm AS DOUBLE) / 1e12) / n ORDER BY dim) AS mu, MAX(n) AS n
      FROM pd
    ),
    kp AS (
      SELECT unnest(flatten(list_transform(e.e, (xi, i) ->
               list_transform(e.e, (xj, j) -> {{
                 'k': (i - 1) * {DIM} + (j - 1),
                 'p': CAST(floor((xi - mu.mu[i]) * (xj - mu.mu[j]) * {PCA_SCALE})
                           AS BIGINT)}})))) AS s
      FROM e CROSS JOIN mu
    ),
    cv AS (SELECT s.k AS k, CAST(SUM(s.p) AS BIGINT) AS c FROM kp GROUP BY s.k),
    cr AS (SELECT list(CAST(c AS DOUBLE) ORDER BY k) AS cd FROM cv),
    {', '.join(its)},
    fin AS (
      SELECT n, v, {_duck_mv('cd', 'v')} AS w FROM it{PCA_ITERS}
    ),
    scal AS (
      SELECT n, v, w,
             (CASE WHEN {_duck_norm('w')} = 0 THEN 1.0 ELSE {_duck_norm('w')} END) AS nrm,
             list_reduce(list_transform(range(0, {DIM}),
                         i -> v[i + 1] * w[i + 1]), (a, x) -> a + x)
               / ({PCA_SCALE}.0 * n) AS eigenvalue
      FROM fin
    )
    SELECT s.i - 1 AS dim, s.x / nrm AS loading, eigenvalue
    FROM (
      SELECT unnest(list_transform(w, (x, i) -> {{'i': i, 'x': x}})) AS s,
             nrm, eigenvalue
      FROM scal
    )
    """


@register(
    "embedding_pca_top_component",
    oracle=_pca_oracle(),
    description=f"Top principal component of the embedding corpus by"
    f" {PCA_ITERS}-step normalized power iteration -- the anisotropy /"
    f" collapse diagnostic an embedding pipeline runs before trusting"
    f" cosine geometry (a dominant component means the vectors share a"
    f" rogue direction and similarity saturates). Exact cross-engine:"
    f" per-dim means and the {DIM}x{DIM} covariance accumulate as"
    f" floor-scaled BIGINTs (order-independent integer sums), and every"
    f" double reduction in the iteration is an ORDERED left fold (Spark"
    f" `aggregate` vs DuckDB `list_reduce`, identical addition sequence),"
    f" so loadings and the Rayleigh-quotient eigenvalue match"
    f" bit-for-bit. Scale shape: ONE corpus pass emits row-local"
    f" (dim_i, dim_j) outer-product terms into a {DIM * DIM}-key"
    f" partial/final aggregate (map-side combined); everything after is a"
    f" ONE-ROW frame of {DIM * DIM} doubles -- the iteration costs nothing"
    f" at any corpus size. The {PCA_SCALE} fixed-point scale bounds exact"
    f" accumulation to ~1e12 rows; beyond that, drop a scale decade.",
)
def embedding_pca_top_component(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings")).select(
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("e")
    )
    per_dim = (
        emb.select(F.posexplode("e").alias("dim", "x"))
        .groupBy("dim")
        .agg(
            F.sum(F.floor(F.col("x") * 1e12).cast("bigint")).alias("sm"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    mu_row = (
        per_dim.select(
            "dim", ((F.col("sm").cast("double") / 1e12) / F.col("n")).alias("m"), "n"
        )
        .groupBy()
        .agg(
            F.array_sort(F.collect_list(F.struct("dim", "m"))).alias("mm"),
            F.max("n").alias("n"),
        )
        .select(F.expr("transform(mm, p -> p.m)").alias("mu"), "n")
    )
    kp = emb.crossJoin(F.broadcast(mu_row)).select(
        F.explode(
            F.expr(
                f"flatten(transform(e, (xi, i) -> transform(e, (xj, j) -> "
                f"struct(i * {DIM} + j AS k, "
                f"CAST(floor((xi - mu[i]) * (xj - mu[j]) * {PCA_SCALE}) AS BIGINT)"
                f" AS p))))"
            )
        ).alias("s")
    )
    cov = kp.groupBy(F.col("s.k").alias("k")).agg(F.sum("s.p").alias("c"))
    cr = (
        cov.groupBy()
        .agg(F.array_sort(F.collect_list(F.struct("k", "c"))).alias("kc"))
        .select(F.expr("transform(kc, p -> CAST(p.c AS DOUBLE))").alias("cd"))
    )
    from flink_cdc_fluss_quickstart_spark.functions.dedup import track_cache

    row = cr.crossJoin(F.broadcast(mu_row.select("n"))).withColumn(
        "v", F.expr(f"transform(sequence(0, {DIM - 1}), i -> CAST(0.125 AS DOUBLE))")
    )
    # the persist() between steps is an OPTIMIZER barrier, not a cache for
    # reuse: without it Catalyst inlines each iteration's v into every
    # reference in the next step's lambdas and the combined expression
    # re-evaluates the whole previous iteration PER ARRAY ELEMENT --
    # exponential in PCA_ITERS (measured: the 3-iteration plan never
    # finishes; each ONE-ROW persisted frame executes in milliseconds).
    # An InMemoryRelation is lazy, so building/explaining this plan still
    # runs zero jobs.
    norm_case = (
        f"CASE WHEN {_pca_norm('w')} = 0 THEN CAST(1 AS DOUBLE)"
        f" ELSE {_pca_norm('w')} END"
    )
    for _ in range(PCA_ITERS):
        row = track_cache(
            track_cache(
                row.select("cd", "n", F.expr(_pca_mv("cd", "v")).alias("w")).persist()
            )
            .select(
                "cd",
                "n",
                F.expr(f"transform(w, x -> x / ({norm_case}))").alias("v"),
            )
            .persist()
        )
    fin = (
        track_cache(
            row.select("cd", "n", "v", F.expr(_pca_mv("cd", "v")).alias("w")).persist()
        )
        .select(
            "n",
            "v",
            "w",
            F.expr(norm_case).alias("nrm"),
            (
                F.expr(
                    f"aggregate(sequence(0, {DIM - 1}), CAST(0 AS DOUBLE), "
                    f"(acc, i) -> acc + v[i] * w[i])"
                )
                / (float(PCA_SCALE) * F.col("n"))
            ).alias("eigenvalue"),
        )
    )
    return fin.select(
        F.posexplode("w").alias("dim", "x"), "nrm", "eigenvalue"
    ).select(
        F.col("dim").cast("bigint").alias("dim"),
        (F.col("x") / F.col("nrm")).alias("loading"),
        "eigenvalue",
    )


# --- embedding-space decontamination ----------------------------------------

DECON_BENCH_MOD = 97  # vec_id % MOD == 0 plays the held-out benchmark set
DECON_THRESHOLD = 0.3  # max-cosine flag threshold

_DECON_COS_RAW = (
    "(CAST(list_sum(list_transform(c.embedding,"
    " (x, i) -> CAST(floor(x::DOUBLE * bv[i]::DOUBLE * 1e12) AS BIGINT))) AS DOUBLE) / 1e12)"
    " / (sqrt(CAST(list_sum(list_transform(c.embedding,"
    " x -> CAST(floor(x::DOUBLE * x::DOUBLE * 1e12) AS BIGINT))) AS DOUBLE) / 1e12)"
    " * sqrt(CAST(list_sum(list_transform(bv,"
    " x -> CAST(floor(x::DOUBLE * x::DOUBLE * 1e12) AS BIGINT))) AS DOUBLE) / 1e12))"
)
# zero-norm guard mirroring the Spark side's try_divide+nanvl+coalesce:
# DuckDB returns NULL for x/0 (any numeric type), and a hypothetical NaN
# would rank ABOVE every finite cosine -- both collapse to the -2.0 sentinel.
# Applied over a named column (cos_raw) in a sub-select so the list_transform
# dot product is evaluated ONCE per candidate-benchmark pair, not re-inlined
# inside both the isnan test and the ELSE branch (r9 advice).
_DECON_COS_GUARD = (
    "COALESCE(CASE WHEN isnan(cos_raw) THEN CAST(-2.0 AS DOUBLE)"
    " ELSE cos_raw END, CAST(-2.0 AS DOUBLE))"
)


@register(
    "embedding_decontamination",
    oracle=f"""
    WITH b AS (
      SELECT vec_id AS b_id, embedding AS bv FROM embeddings
      WHERE vec_id % {DECON_BENCH_MOD} = 0
    ),
    c AS (
      SELECT vec_id, label, embedding FROM embeddings
      WHERE vec_id % {DECON_BENCH_MOD} <> 0
    ),
    p0 AS (
      SELECT c.vec_id, c.label, b.b_id, {_DECON_COS_RAW} AS cos_raw
      FROM c CROSS JOIN b
    ),
    p AS (
      SELECT vec_id, label, b_id, {_DECON_COS_GUARD} AS cos FROM p0
    ),
    r AS (
      SELECT vec_id, label, b_id, cos,
             row_number() OVER (PARTITION BY vec_id
                                ORDER BY cos DESC, b_id ASC) AS rn
      FROM p
    )
    SELECT vec_id, label,
           cos AS max_benchmark_cos,
           b_id AS benchmark_id,
           (cos >= {DECON_THRESHOLD}) AS contaminated
    FROM r WHERE rn = 1
    """,
    description="Embedding-space decontamination (the semantic sibling of"
    " decontamination_ngrams): every corpus vector scored by its MAX cosine"
    " to a held-out benchmark/eval set, flagged when it exceeds"
    f" {DECON_THRESHOLD} -- paraphrased eval leakage that n-gram overlap"
    " misses. 100 TB shape: the benchmark set is tiny next to the corpus"
    " (eval suites are <=1e6 rows), so it collapses to ONE broadcast row"
    " holding an array of (id, vec, norm) structs and the corpus scan folds"
    " over it row-locally -- no join explosion, no shuffle, one pass, exact"
    " recall (brute force is the contract here: an ANN prune that misses a"
    " contaminated doc silently poisons evals; for benchmark sets too big"
    " to broadcast, shard the benchmark array and OR the per-shard flags)."
    " The max fold keeps (cos, smallest id) deterministically and products"
    " are floor-scaled to integers, so both engines agree bit-for-bit.",
)
def embedding_decontamination(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    bench = (
        emb.filter(F.col("vec_id") % DECON_BENCH_MOD == 0)
        .select(
            F.struct(
                F.col("vec_id").alias("b_id"),
                F.col("embedding").alias("bv"),
                F.sqrt(similarity.sq_norm(F.col("embedding"))).alias("bn"),
            ).alias("e")
        )
        .agg(F.collect_list("e").alias("bench"))
    )
    corpus = emb.filter(F.col("vec_id") % DECON_BENCH_MOD != 0).select(
        "vec_id",
        "label",
        "embedding",
        F.sqrt(similarity.sq_norm(F.col("embedding"))).alias("__cn"),
    )
    # (max cos, min b_id at the max) as ONE struct array_max: higher-order
    # lambdas are interpreted without common-subexpression elimination, so a
    # fold whose condition AND replacement both spell the cosine would pay
    # the DIM-length dot product 2-3x per benchmark element; transform()
    # evaluates it exactly once, and struct ordering (cos DESC via max,
    # then -b_id max == b_id min) keeps the tie-break order-independent.
    scored = corpus.crossJoin(F.broadcast(bench)).select(
        "vec_id",
        "label",
        F.coalesce(
            F.array_max(
                F.transform(
                    F.col("bench"),
                    # zero-norm guard (r8 advice): a zero-norm vector makes
                    # the cosine 0/0 -- under ANSI that division THROWS, so
                    # try_divide returns NULL instead, and any hypothetical
                    # NaN would rank ABOVE every double in struct-max
                    # ordering -- both collapse to the -2.0 sentinel (below
                    # any cosine), matching the empty-benchmark fallback and
                    # the oracle's NULL-division semantics (DuckDB x/0 is
                    # NULL)
                    lambda e: F.struct(
                        F.coalesce(
                            F.nanvl(
                                F.try_divide(
                                    similarity.dot(F.col("embedding"), e["bv"]),
                                    F.col("__cn") * e["bn"],
                                ),
                                F.lit(-2.0),
                            ),
                            F.lit(-2.0),
                        ).alias("cos"),
                        (-e["b_id"]).cast("bigint").alias("neg_id"),
                    ),
                )
            ),
            # empty-benchmark fallback keeps the historical sentinel row
            F.struct(
                F.lit(-2.0).cast("double").alias("cos"),
                F.lit(1).cast("bigint").alias("neg_id"),
            ),
        ).alias("best"),
    )
    return scored.select(
        "vec_id",
        "label",
        F.col("best.cos").alias("max_benchmark_cos"),
        (-F.col("best.neg_id")).cast("bigint").alias("benchmark_id"),
        (F.col("best.cos") >= DECON_THRESHOLD).alias("contaminated"),
    )


# --- product quantization (PQ codes + ADC search) ---------------------------

PQ_M = 4  # subspaces
PQ_SUBDIM = DIM // PQ_M  # dims per subspace
PQ_K = 16  # centroids per subspace -> one 4-bit-addressable code byte each
PQ_ITERS = 2  # Lloyd rounds per subspace codebook (fixed -> unrollable)
PQ_TOPK = 5


def _pq_codebooks_and_codes(emb: DataFrame, include_coarse: bool = False):
    """Train the PQ codebooks (Jegou et al. 2011: an independent PQ_K-center
    Lloyd k-means per PQ_SUBDIM-dim subspace, reusing _km_assign/_km_update
    op-for-op) and encode the corpus. Returns (per-subspace centroid frames,
    codes frame (vec_id, m, code, d2)). Same scale posture as
    kmeans_embeddings with the subspace id fused into every key: ALL PQ_M
    codebooks train in ONE Lloyd chain over the exploded (vec_id, m, sub)
    frame -- per round, the PQ_M * PQ_K centroids collapse to one broadcast
    row and assignment folds over the m-filtered slice of it; the update is
    one bounded (m, cluster, dim) aggregate. Fusing matters: four separate
    per-subspace chains pay 4x the stage count for the same arithmetic --
    measured 17.7 s -> ~4 s for the full ADC query at sf0.1. Per-(m,
    cluster) sums and argmins are identical to independent chains, so the
    per-subspace oracle CTEs verify this plan unchanged.

    The trained codebook frame (PQ_M * PQ_K rows) is PERSISTED: ADC
    consumes it twice (corpus encoding + query distance tables); lazy
    persist, so plan builds still run no job -- in production the codebook
    is the artifact you checkpoint anyway. Persist keeps the DATA from
    recomputing but not the chain's ANALYSIS cost (downstream plans still
    embed the full Lloyd lineage); localCheckpoint would truncate that too,
    but measured: eager=True runs the chain at plan build by definition,
    and eager=False ALSO runs a job at build time under AQE (the
    Dataset->RDD conversion materializes the upstream shuffle stages), so
    either breaks the repo's job-free-plan-build invariant
    (tests/test_plans.py listener check). The re-analysis is bounded --
    PQ_ITERS is fixed at 2 -- and the whole chain is overhead, not data:
    at sf0.1 the embeddings table is 2,000 rows, so the query's wall time
    is stage/codegen fixed cost that amortizes away at real scale
    (SCALE.md: 1.6x at 10x).

    r16 negative result, measured and reverted (do not retry without new
    evidence): collecting the trained codebook driver-side -- per-round or
    final-only -- and re-emitting it as a LocalRelation DOES shrink every
    consumer plan dramatically (embedding_ivfpq_topk explain 945 -> 408
    lines, pq_adc_recall_report 1564 -> 842) but is consistently SLOWER
    end to end at sf0.1 in order-debiased same-session A/Bs: the collect
    serializes the training stages BEFORE the consumer action, where the
    lazy chain's stages overlap with the independent arm/ground-truth
    stages under one AQE execution, and the collect-side round plans pay
    their own cold codegen (~1.9 s first run). Bench-conditions numbers:
    ivfpq 4.5 -> 6.4 s cold / 3.7 -> 4.6 warm; pq_adc_recall_report with
    the single-join report tail 2.25 s (lazy) vs 3.86 s (collect) warm.
    The analysis cost the collect would save is real but smaller than the
    concurrency it destroys.

    include_coarse=True (the IVF-PQ composition, r8) fuses the COARSE
    KMEANS_K-center Lloyd chain into the SAME union frame as subspace
    m=PQ_M over the full-dim vectors: the distance/argmin/update
    expressions are character-identical to _km_assign/_km_update (_KM_D2 ==
    _PQ_D2, same floor-scaled update), and every aggregate keys on m, so
    per-m results are bit-identical to the separate chains while the
    training pays ONE assign+update pair of stages per round instead of
    two. KMEANS_ITERS == PQ_ITERS is asserted -- the fusion's precondition.
    Returns (books, codes, coarse_cents, coarse_assigned) in that mode."""
    from flink_cdc_fluss_quickstart_spark.functions.dedup import track_cache

    subs = _pq_subspaces(emb)
    if include_coarse:
        assert KMEANS_ITERS == PQ_ITERS, "fused chain needs equal Lloyd rounds"
        subs = subs.unionByName(
            emb.select(
                "vec_id", F.lit(PQ_M).cast("int").alias("m"), "embedding"
            )
        )
    init_k = (
        F.when(F.col("m") < PQ_M, F.lit(PQ_K)).otherwise(F.lit(KMEANS_K))
        if include_coarse
        else F.lit(PQ_K)
    )
    cents = subs.filter(F.col("vec_id") < init_k).select(
        "m",
        F.col("vec_id").cast("bigint").alias("cluster"),
        F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("cv"),
    )
    for _ in range(PQ_ITERS):
        cents = _pq_update(_pq_assign(subs, cents))
    cents = track_cache(cents.persist())
    assigned_all = _pq_assign(subs, cents)
    if include_coarse:
        # the final assignment feeds TWO output slices below (codes m<PQ_M
        # and the coarse router m=PQ_M) and each consumer plan would
        # otherwise re-run the full corpus-sized nearest-centroid pass per
        # slice -- persist so the pass runs once (lazy, so plan builds
        # still run no job; r15 optimization round, one corpus scan saved
        # per consumer at any scale)
        assigned_all = track_cache(assigned_all.persist())
        books = cents.filter(F.col("m") < PQ_M)
        codes = assigned_all.filter(F.col("m") < PQ_M).select(
            "vec_id", "m", F.col("cluster").alias("code"), F.col("__d2").alias("d2")
        )
        coarse_cents = cents.filter(F.col("m") == PQ_M).select("cluster", "cv")
        coarse_assigned = assigned_all.filter(F.col("m") == PQ_M).select(
            "vec_id", F.col("cluster").alias("coarse")
        )
        return books, codes, coarse_cents, coarse_assigned
    codes = assigned_all.select(
        "vec_id",
        "m",
        F.col("cluster").alias("code"),
        F.col("__d2").alias("d2"),
    )
    return cents, codes


_PQ_D2 = (
    "aggregate(zip_with(embedding, c.cv, (x, y) ->"
    " CAST(floor((CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y) * 1e12) AS BIGINT)),"
    " CAST(0 AS BIGINT), (a, b) -> a + b)"
)
_PQ_PICK = (
    f"array_min(transform(filter(__cents, c -> c.m = m),"
    f" c -> named_struct('d', {_PQ_D2}, 'k', c.cluster)))"
)


def _pq_subspaces(emb: DataFrame) -> DataFrame:
    """Explode each vector into its PQ_M subspace slices: (vec_id, m,
    embedding[PQ_SUBDIM]) -- the row shape both training and frozen-book
    encoding assign over."""
    return emb.select(
        "vec_id",
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).cast("int").alias("m"),
                        F.slice("embedding", m * PQ_SUBDIM + 1, PQ_SUBDIM).alias("sub"),
                    )
                    for m in range(PQ_M)
                ]
            )
        ).alias("s"),
    ).select("vec_id", F.col("s.m").alias("m"), F.col("s.sub").alias("embedding"))


def pq_encode_with_books(emb: DataFrame, books: DataFrame) -> DataFrame:
    """Encode vectors with FROZEN (e.g. reloaded) codebooks -- the day-2
    ingest path of the persisted PQ index: no retraining, one broadcast
    nearest-centroid assignment per subspace, cost |batch| x PQ_M rows.
    Returns the same (vec_id, m, code, d2) frame shape pq_train_index
    emits, so the rows merge straight into models.upsert_pq_index; because
    assignment under fixed books is row-local and deterministic, encoding
    a batch with reloaded books is bit-identical to what a from-scratch
    assignment over the union would give those vectors
    (tests/test_index_store.py proves the day-2 ADC equivalence)."""
    return _pq_assign(_pq_subspaces(emb), books).select(
        "vec_id", "m", F.col("cluster").alias("code"), F.col("__d2").alias("d2")
    )


def _pq_assign(subs: DataFrame, cents: DataFrame) -> DataFrame:
    """Row-local nearest-centroid assignment across ALL subspaces at once:
    the full (m, cluster, cv) codebook collapses to ONE broadcast row and
    each (vec_id, m) row argmins over its own subspace's slice of it."""
    packed = cents.agg(F.collect_list(F.struct("m", "cluster", "cv")).alias("__cents"))
    return (
        subs.crossJoin(F.broadcast(packed))
        .select("vec_id", "m", "embedding", F.expr(_PQ_PICK).alias("__pick"))
        .select(
            "vec_id",
            "m",
            "embedding",
            F.col("__pick.k").alias("cluster"),
            F.col("__pick.d").alias("__d2"),
        )
    )


def _pq_update(assigned: DataFrame) -> DataFrame:
    """Codebook recomputation: the same two-level bounded aggregate as
    _km_update with the subspace id riding in every key."""
    per_dim = (
        assigned.select("m", "cluster", F.posexplode("embedding").alias("dim", "x"))
        .groupBy("m", "cluster", "dim")
        .agg(
            F.sum(
                F.floor(F.col("x").cast("double") * similarity.SCALE).cast("bigint")
            ).alias("s"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    return (
        per_dim.groupBy("m", "cluster")
        .agg(F.array_sort(F.collect_list(F.struct("dim", "s", "n"))).alias("ds"))
        .select(
            "m",
            "cluster",
            F.expr(
                f"transform(ds, p -> (CAST(p.s AS DOUBLE) / {similarity.SCALE}) / p.n)"
            ).alias("cv"),
        )
    )


def _pq_cte_chain(train_where: str = "", assign_where: str = "") -> str:
    """Unrolled DuckDB twin of the per-subspace Lloyd chains, ending with
    `codes` (vec_id, m, code, d2) and per-subspace centroid CTEs c{m}N.

    ``train_where`` restricts the Lloyd training (and the deterministic
    vec_id < PQ_K init) to a sub-corpus; ``assign_where`` restricts the
    final assignment -- the pair expresses the frozen-book day-2 encode
    (train on day 1, encode day 2 with the day-1 books) that
    pq_incremental_codes registers. Defaults reproduce the full-corpus
    chain byte-for-byte."""
    d2 = (
        "CAST(list_sum(list_transform(sub, (x, i) ->"
        " CAST(floor((x::DOUBLE - c.cv[i]) * (x::DOUBLE - c.cv[i]) * 1e12) AS BIGINT)))"
        " AS BIGINT)"
    )
    assign = (
        "SELECT vec_id, sub,"
        f" list_min(list_transform(cs, c -> {{'d': {d2}, 'k': c.cluster}})) AS pick"
        " FROM s__M__ CROSS JOIN"
        " (SELECT list({'cluster': cluster, 'cv': cv}) AS cs FROM __SRC__)"
    )
    update = """
      SELECT cluster, list(cvx ORDER BY dim) AS cv FROM (
        SELECT pick.k AS cluster, s.i AS dim,
               (CAST(SUM(CAST(floor(s.x::DOUBLE * 1e12) AS BIGINT)) AS DOUBLE) / 1e12)
                 / COUNT(*) AS cvx
        FROM (SELECT pick,
                     unnest(list_transform(sub, (x, i) -> {'i': i, 'x': x})) AS s
              FROM __SRC__)
        GROUP BY pick.k, s.i
      ) GROUP BY cluster
    """
    parts = []
    for m in range(PQ_M):
        lo, hi = m * PQ_SUBDIM + 1, (m + 1) * PQ_SUBDIM
        lead = "WITH" if m == 0 else ","
        parts.append(
            f"{lead} s{m} AS (SELECT vec_id, embedding[{lo}:{hi}] AS sub FROM embeddings)"
        )
        train_src, assign_src = f"s{m}", f"s{m}"
        if train_where:
            parts.append(f", st{m} AS (SELECT * FROM s{m} WHERE {train_where})")
            train_src = f"st{m}"
        if assign_where:
            parts.append(f", sa{m} AS (SELECT * FROM s{m} WHERE {assign_where})")
            assign_src = f"sa{m}"
        parts.append(
            f", c{m}0 AS (SELECT CAST(vec_id AS BIGINT) AS cluster,"
            f" list_transform(sub, x -> x::DOUBLE) AS cv FROM {train_src}"
            f" WHERE vec_id < {PQ_K})"
        )
        a = assign.replace("s__M__", train_src)
        for it in range(1, PQ_ITERS + 1):
            parts.append(f", a{m}{it} AS ({a.replace('__SRC__', f'c{m}{it - 1}')})")
            parts.append(f", c{m}{it} AS ({update.replace('__SRC__', f'a{m}{it}')})")
        fa = assign.replace("s__M__", assign_src)
        parts.append(f", f{m} AS ({fa.replace('__SRC__', f'c{m}{PQ_ITERS}')})")
    unions = "\nUNION ALL ".join(
        f"SELECT vec_id, {m} AS m, pick.k AS code, pick.d AS d2 FROM f{m}"
        for m in range(PQ_M)
    )
    parts.append(f", codes AS ({unions})")
    return "\n".join(parts)


@register(
    "embedding_pq_codes",
    oracle=f"""
    {_pq_cte_chain()}
    SELECT vec_id,
           {", ".join(f"CAST(MAX(CASE WHEN m = {m} THEN code END) AS BIGINT) AS code{m}" for m in range(PQ_M))},
           CAST(SUM(d2) AS DOUBLE) / 1e12 AS recon_sq_err
    FROM codes GROUP BY vec_id
    """,
    description="Product quantization encoding (Jegou et al. 2011, the"
    f" IVF-PQ serving standard): {PQ_M} independent {PQ_K}-center Lloyd"
    f" codebooks, one per {PQ_SUBDIM}-dim subspace (each trained with the"
    " SAME fixed-point machinery as kmeans_embeddings), compressing every"
    f" vector to {PQ_M} code bytes + its exact reconstruction error --"
    f" {DIM * 4} payload bytes -> {PQ_M}, the compression that lets a"
    " 100 TB corpus's ANN index live in memory (vs 4x for the int8 scalar"
    " path). Codebooks broadcast, assignment is row-local, updates are"
    " bounded (cluster, dim) aggregates; all arithmetic floor-scaled"
    " BIGINT, bit-identical to the unrolled per-subspace CTE chains.",
)
def embedding_pq_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    return pq_codes_frame(emb)


def pq_train_index(emb: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Public train surface for the PERSISTABLE PQ index: (books, codes) --
    hand the pair to models.save_pq_index and serve ADC top-k from the
    reload with pq_adc_topk_frame(emb, books=..., codes=...)."""
    return _pq_codebooks_and_codes(emb)


@register(
    "pq_incremental_codes",
    oracle=f"""
    {_pq_cte_chain(train_where="vec_id % 4 <> 3", assign_where="vec_id % 4 = 3")}
    SELECT vec_id,
           {", ".join(f"CAST(MAX(CASE WHEN m = {m} THEN code END) AS BIGINT) AS code{m}" for m in range(PQ_M))},
           CAST(SUM(d2) AS DOUBLE) / 1e12 AS recon_sq_err
    FROM codes GROUP BY vec_id
    """,
    description="FROZEN-codebook incremental PQ encode -- the day-2 ingest"
    " path of the persisted index (models.upsert_pq_index): codebooks are"
    " trained on the day-1 corpus (vec_id % 4 <> 3 here), then the day-2"
    " arrivals are encoded against those FROZEN books -- one broadcast"
    " row-local nearest-centroid assignment, cost |batch| x"
    f" {PQ_M} rows, NO retraining and NO corpus re-encode. This is how a"
    " 100 TB serving index absorbs daily arrivals: the trained artifact is"
    " immutable, only code rows are appended (idempotent PKTable merge per"
    " batch_id, tests/test_index_store.py proves day-2 ADC over the merged"
    " codes row-equals a from-scratch frozen-book encode of the union)."
    " Same floor-scaled BIGINT distance arithmetic as embedding_pq_codes,"
    " bit-identical to the train-filtered CTE chain.",
)
def pq_incremental_codes(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    day1 = emb.filter(F.col("vec_id") % 4 != 3)
    books, _day1_codes = _pq_codebooks_and_codes(day1)
    codes2 = pq_encode_with_books(emb.filter(F.col("vec_id") % 4 == 3), books)
    aggs = [
        F.max(F.when(F.col("m") == m, F.col("code"))).cast("bigint").alias(f"code{m}")
        for m in range(PQ_M)
    ]
    return codes2.groupBy("vec_id").agg(
        *aggs, (F.sum("d2").cast("double") / similarity.SCALE).alias("recon_sq_err")
    )


def pq_codes_frame(emb: DataFrame) -> DataFrame:
    _books, codes = _pq_codebooks_and_codes(emb)
    aggs = [
        F.max(F.when(F.col("m") == m, F.col("code"))).cast("bigint").alias(f"code{m}")
        for m in range(PQ_M)
    ]
    return codes.groupBy("vec_id").agg(
        *aggs, (F.sum("d2").cast("double") / similarity.SCALE).alias("recon_sq_err")
    )


@register(
    "embedding_pq_adc_topk",
    oracle=f"""
    {_pq_cte_chain()}
    , dt AS (
      {" UNION ALL ".join(
        f'''SELECT e.vec_id AS query_id, {m} AS m, c.cluster AS code,
               CAST(list_sum(list_transform(e.embedding[{m * PQ_SUBDIM + 1}:{(m + 1) * PQ_SUBDIM}],
                    (x, i) -> CAST(floor((x::DOUBLE - c.cv[i]) * (x::DOUBLE - c.cv[i]) * 1e12) AS BIGINT)))
                    AS BIGINT) AS d
            FROM embeddings e CROSS JOIN c{m}{PQ_ITERS} c WHERE e.vec_id % 50 = 0'''
        for m in range(PQ_M)
      )}
    ),
    est AS (
      SELECT dt.query_id, codes.vec_id, CAST(SUM(dt.d) AS BIGINT) AS dsum
      FROM codes JOIN dt ON codes.m = dt.m AND codes.code = dt.code
      WHERE codes.vec_id <> dt.query_id
      GROUP BY dt.query_id, codes.vec_id
    ),
    rk AS (
      SELECT query_id, vec_id, dsum,
             row_number() OVER (PARTITION BY query_id ORDER BY dsum, vec_id) AS rn
      FROM est
    )
    SELECT query_id, vec_id AS neighbor_id, CAST(rn AS BIGINT) AS rank,
           CAST(dsum AS DOUBLE) / 1e12 AS approx_dist_sq
    FROM rk WHERE rn <= {PQ_TOPK}
    """,
    description="Asymmetric-distance (ADC) PQ top-k search (Jegou et al."
    " 2011): each query precomputes a distance table to every codebook"
    f" centroid ({PQ_M} x {PQ_K} BIGINTs per query -- metadata-sized,"
    " BROADCAST), and the corpus is scanned as CODES ONLY -- the estimated"
    " distance is a sum of table lookups, so the serving scan reads"
    f" {PQ_M} bytes per vector instead of {DIM * 4} and never touches the"
    " float corpus. The lookup is a broadcast equi join on (subspace,"
    " code) + one map-side-combined (query, vec) rollup; per-query top-k"
    " is a bounded partitioned window with the vec_id tie-break. Exact"
    " BIGINT distance sums keep both engines bit-identical.",
)
def embedding_pq_adc_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    return pq_adc_topk_frame(emb)


def _pq_query_distance_tables(emb: DataFrame, books: DataFrame) -> DataFrame:
    """Per-query ADC distance tables (query_id, m, code, d): explode each
    query vector into its PQ_M subspace slices and join the broadcast
    codebook -- PQ_M * PQ_K BIGINT rows per query, metadata-sized. Shared by
    the flat-ADC and IVF-PQ searchers so the floor-scaled distance
    arithmetic can never drift between them (or from their composed
    oracles, which spell this expression once as _PQ_D2's query form)."""
    qsubs = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(m).cast("int").alias("m"),
                        F.slice("embedding", m * PQ_SUBDIM + 1, PQ_SUBDIM).alias("qs"),
                    )
                    for m in range(PQ_M)
                ]
            )
        ).alias("s"),
    ).select("query_id", F.col("s.m").alias("m"), F.col("s.qs").alias("qs"))
    return qsubs.join(F.broadcast(books), "m").select(
        "query_id",
        "m",
        F.col("cluster").alias("code"),
        F.expr(
            "aggregate(zip_with(qs, cv, (x, y) ->"
            " CAST(floor((CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y) * 1e12)"
            " AS BIGINT)), CAST(0 AS BIGINT), (a, b) -> a + b)"
        ).alias("d"),
    )


def pq_adc_topk_frame(
    emb: DataFrame, books: DataFrame | None = None, codes: DataFrame | None = None
) -> DataFrame:
    from pyspark.sql.window import Window

    from flink_cdc_fluss_quickstart_spark.functions.dedup import track_cache

    if books is None:
        books, codes = _pq_codebooks_and_codes(emb)
    dt = track_cache(_pq_query_distance_tables(emb, books).persist())
    est = (
        codes.join(F.broadcast(dt), ["m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").cast("bigint").alias("dsum"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dsum"), F.asc("vec_id"))
    return (
        est.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PQ_TOPK)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("rn").cast("bigint").alias("rank"),
            (F.col("dsum").cast("double") / similarity.SCALE).alias("approx_dist_sq"),
        )
    )


# --- IVF-PQ: coarse-cell routing + ADC within probed cells ------------------

IVFPQ_NPROBE = 2  # coarse cells probed per query (of KMEANS_K)


def ivfpq_topk_frame(
    emb: DataFrame,
    trained: tuple[DataFrame, DataFrame, DataFrame, DataFrame] | None = None,
) -> DataFrame:
    """IVF-PQ top-k (Jegou et al. 2011; the FAISS serving composition):
    queries route to their IVFPQ_NPROBE nearest coarse Lloyd cells and only
    those cells' vectors are scored -- by ADC over the PQ codes, so the
    pruned scan reads PQ_M bytes per candidate and the float corpus is
    never re-read at query time. Flat-PQ variant (codes quantize raw
    vectors, not cell residuals; residual refinement is a drop-in at the
    codes seam). Reuses the SAME coarse Lloyd chain as kmeans_embeddings
    and the SAME codebooks as embedding_pq_codes, so the oracle CTE chains
    compose verbatim -- and since r8 the coarse chain TRAINS FUSED with the
    subspace chains as one more m-key of the union Lloyd frame
    (_pq_codebooks_and_codes include_coarse=True): bit-identical per-m
    results (the assign/update expressions are character-equal), half the
    training stages.

    Scale shape: coarse centroids (K x DIM) and codebooks broadcast; the
    per-vector cell assignment is the fused chain's m=PQ_M slice; the
    candidate filter is a broadcast semi-join on (query, cell); expected
    candidates = corpus * NPROBE / K."""
    from pyspark.sql.window import Window

    # one fused Lloyd chain trains the coarse quantizer AND the 4 subspace
    # codebooks; the persisted centroid frame feeds router, encoder, and
    # distance tables alike. A caller that already ran the fused chain
    # (the recall report scores both searchers) passes it in so the
    # corpus-scale training runs once, not once per variant.
    books, codes, cents, assigned = trained or _pq_codebooks_and_codes(
        emb, include_coarse=True
    )
    d2q = (
        "aggregate(zip_with(qv, cv, (x, y) ->"
        " CAST(floor((CAST(x AS DOUBLE) - y) * (CAST(x AS DOUBLE) - y) * 1e12)"
        " AS BIGINT)), CAST(0 AS BIGINT), (a, b) -> a + b)"
    )
    queries = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    qd = queries.crossJoin(F.broadcast(cents)).select(
        "query_id", "cluster", F.expr(d2q).alias("cd")
    )
    wq = Window.partitionBy("query_id").orderBy(F.asc("cd"), F.asc("cluster"))
    probes = (
        qd.withColumn("pr", F.row_number().over(wq))
        .filter(F.col("pr") <= IVFPQ_NPROBE)
        .select("query_id", F.col("cluster").alias("coarse"))
    )
    # fine side: per-query distance tables over the fused chain's codebooks
    dt = _pq_query_distance_tables(emb, books)
    cand = codes.join(assigned, "vec_id").join(F.broadcast(probes), "coarse")
    est = (
        cand.join(F.broadcast(dt), ["query_id", "m", "code"])
        .filter(F.col("vec_id") != F.col("query_id"))
        .groupBy("query_id", "vec_id")
        .agg(F.sum("d").cast("bigint").alias("dsum"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("dsum"), F.asc("vec_id"))
    return (
        est.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= PQ_TOPK)
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.col("rn").cast("bigint").alias("rank"),
            (F.col("dsum").cast("double") / similarity.SCALE).alias("approx_dist_sq"),
        )
    )


def _ivfpq_oracle() -> str:
    """Composes the coarse Lloyd chain (verbatim _km_cte_chain, ending in
    fin) with the per-subspace PQ chains (verbatim _pq_cte_chain, leading
    WITH demoted to a comma) plus the router/dt/candidate CTEs."""
    km = _km_cte_chain()
    pq = _pq_cte_chain().replace("WITH s0", ", s0", 1)
    d2q = (
        "CAST(list_sum(list_transform(q.qv, (x, i) ->"
        " CAST(floor((x::DOUBLE - c.cv[i]) * (x::DOUBLE - c.cv[i]) * 1e12) AS BIGINT)))"
        " AS BIGINT)"
    )
    return f"""
    {km}
    {pq}
    , q AS (
      SELECT vec_id AS query_id, embedding AS qv FROM embeddings
      WHERE vec_id % 50 = 0
    ),
    qd AS (
      SELECT q.query_id, c.cluster, {d2q} AS cd
      FROM q CROSS JOIN c{KMEANS_ITERS} c
    ),
    probes AS (
      SELECT query_id, cluster AS coarse FROM (
        SELECT query_id, cluster,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cd ASC, cluster ASC) AS pr
        FROM qd
      ) WHERE pr <= {IVFPQ_NPROBE}
    ),
    asg AS (SELECT vec_id, pick.k AS coarse FROM fin),
    dt AS (
      {" UNION ALL ".join(
        f'''SELECT e.vec_id AS query_id, {m} AS m, c.cluster AS code,
               CAST(list_sum(list_transform(e.embedding[{m * PQ_SUBDIM + 1}:{(m + 1) * PQ_SUBDIM}],
                    (x, i) -> CAST(floor((x::DOUBLE - c.cv[i]) * (x::DOUBLE - c.cv[i]) * 1e12) AS BIGINT)))
                    AS BIGINT) AS d
            FROM embeddings e CROSS JOIN c{m}{PQ_ITERS} c WHERE e.vec_id % 50 = 0'''
        for m in range(PQ_M)
      )}
    ),
    est AS (
      SELECT dt.query_id, codes.vec_id, CAST(SUM(dt.d) AS BIGINT) AS dsum
      FROM codes
      JOIN asg ON codes.vec_id = asg.vec_id
      JOIN probes ON asg.coarse = probes.coarse
      JOIN dt ON dt.query_id = probes.query_id
             AND codes.m = dt.m AND codes.code = dt.code
      WHERE codes.vec_id <> dt.query_id
      GROUP BY dt.query_id, codes.vec_id
    ),
    rk AS (
      SELECT query_id, vec_id, dsum,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY dsum ASC, vec_id ASC) AS rn
      FROM est
    )
    SELECT query_id, vec_id AS neighbor_id, CAST(rn AS BIGINT) AS rank,
           CAST(dsum AS DOUBLE) / 1e12 AS approx_dist_sq
    FROM rk WHERE rn <= {PQ_TOPK}
    """


@register(
    "embedding_ivfpq_topk",
    oracle=_ivfpq_oracle(),
    description="IVF-PQ top-k search (Jegou et al. 2011 -- the FAISS"
    f" serving composition): each query probes its {IVFPQ_NPROBE} nearest"
    f" coarse Lloyd cells (of {KMEANS_K}) and only those cells' vectors"
    " are scored, by ADC over the 4-byte PQ codes -- expected candidate"
    f" volume = corpus * {IVFPQ_NPROBE}/{KMEANS_K}, and the pruned scan"
    " reads codes, never floats. Composes the registered machinery"
    " verbatim (kmeans_embeddings' coarse chain + embedding_pq_codes'"
    " codebooks), so the oracle is the two unrolled CTE chains joined."
    " All distances exact floor-scaled BIGINTs; nprobe is the"
    " recall/cost knob, graded against the L2 brute force in"
    " pq_adc_recall_report.",
)
def embedding_ivfpq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    return ivfpq_topk_frame(emb)


# --- L2 brute force + PQ-ADC recall grading ---------------------------------

_L2D = (
    "CAST(list_sum(list_transform(e.embedding, (x, i) ->"
    " CAST(floor((x::DOUBLE - q.qv[i]::DOUBLE) * (x::DOUBLE - q.qv[i]::DOUBLE) * 1e12)"
    " AS BIGINT))) AS BIGINT)"
)


@register(
    "embedding_l2_topk",
    oracle=f"""
    WITH q AS (
      SELECT vec_id AS query_id, embedding AS qv
      FROM embeddings WHERE vec_id % 50 = 0
    ),
    scored AS (
      SELECT q.query_id, e.vec_id AS neighbor_id, {_L2D} AS d2
      FROM embeddings e, q
      WHERE e.vec_id <> q.query_id
    )
    SELECT query_id, neighbor_id, rank, CAST(d2 AS DOUBLE) / 1e12 AS dist_sq
    FROM (
      SELECT query_id, neighbor_id, d2,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY d2 ASC, neighbor_id ASC) AS rank
      FROM scored
    )
    WHERE rank <= 5
    """,
    description="Brute-force squared-L2 top-k: the exact ground truth in"
    " PQ/ADC's metric (cosine's twin baseline; unnormalized corpora rank"
    " differently under the two). Same 100 TB shape as the cosine"
    " baseline: queries broadcast, the corpus streams once, per-query"
    " bounded top-k window; distances are floor-scaled BIGINT sums,"
    " bit-identical cross-engine.",
)
def embedding_l2_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    return _bf_l2_topk(spread(load_table(spark, sf_dir, "embeddings")))


def _bf_l2_topk(emb: DataFrame) -> DataFrame:
    from pyspark.sql.window import Window

    q = emb.filter(F.col("vec_id") % 50 == 0).select(
        F.col("vec_id").alias("query_id"), F.col("embedding").alias("qv")
    )
    scored = (
        emb.crossJoin(F.broadcast(q))
        .filter(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            F.col("vec_id").alias("neighbor_id"),
            F.expr(
                "aggregate(zip_with(embedding, qv, (x, y) ->"
                " CAST(floor((CAST(x AS DOUBLE) - CAST(y AS DOUBLE))"
                " * (CAST(x AS DOUBLE) - CAST(y AS DOUBLE)) * 1e12) AS BIGINT)),"
                " CAST(0 AS BIGINT), (a, b) -> a + b)"
            ).alias("d2"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("d2"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= 5)
        .select(
            "query_id",
            "neighbor_id",
            "rank",
            (F.col("d2").cast("double") / similarity.SCALE).alias("dist_sq"),
        )
    )


def _pq_recall_oracle() -> str:
    from flink_cdc_fluss_quickstart_spark.plans.registry import get

    bf = get("embedding_l2_topk").oracle
    variants = {
        "adc": get("embedding_pq_adc_topk").oracle,
        "ivfpq": get("embedding_ivfpq_topk").oracle,
    }
    branches = []
    for name, sql in variants.items():
        branches.append(f"""
      SELECT '{name}' AS method,
             CAST((SELECT COUNT(DISTINCT query_id) FROM bf) AS BIGINT) AS n_queries,
             CAST({PQ_TOPK} AS BIGINT) AS k,
             CAST((SELECT COUNT(*)
                   FROM bf JOIN ({sql}) a
                     ON bf.query_id = a.query_id
                    AND bf.neighbor_id = a.neighbor_id) AS BIGINT) AS total_overlap
        """)
    union = "\nUNION ALL\n".join(branches)
    return f"""
    WITH bf AS ({bf})
    SELECT method, n_queries, k, total_overlap,
           CAST(total_overlap AS DOUBLE) / (n_queries * k) AS recall_at_k
    FROM ({union})
    """


@register(
    "pq_adc_recall_report",
    oracle=_pq_recall_oracle(),
    description="PQ quality grading: recall@5 of the code-only ADC full"
    " scan AND the nprobe-pruned IVF-PQ search against the exact L2 brute"
    " force on the same query set -- the compression-loss and"
    " cell-pruning-loss go/no-go a deployment reads before serving from"
    f" {PQ_M}-byte codes (the PQ twin of ann_recall_report; on an exactly"
    " PQ-representable corpus both read 1.0 by construction --"
    " planted-tested; adc >= ivfpq always, the gap IS the nprobe knob)."
    " Composes the registered queries themselves; the overlap joins add"
    " only k rows per query, counts are exact BIGINTs, and the single"
    " float op is the final division.",
)
def pq_adc_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    return _pq_recall_frame(emb)


def _pq_recall_frame(emb: DataFrame) -> DataFrame:
    from flink_cdc_fluss_quickstart_spark.functions.dedup import track_cache

    bf = track_cache(_bf_l2_topk(emb).select("query_id", "neighbor_id").persist())
    # ONE fused Lloyd chain serves both searchers: the include_coarse chain's
    # per-m subspace results are bit-identical to the separate chain's (every
    # aggregate keys on m), so the flat-ADC arm consumes its books/codes
    # slices unchanged while the IVF arm also gets the coarse router --
    # without this the report trained the identical codebooks twice.
    trained = _pq_codebooks_and_codes(emb, include_coarse=True)
    variants = {
        "adc": pq_adc_topk_frame(emb, books=trained[0], codes=trained[1]),
        "ivfpq": ivfpq_topk_frame(emb, trained=trained),
    }
    nq = bf.agg(F.countDistinct("query_id").cast("bigint").alias("n_queries"))
    # same single-join overlap tail as _recall_report (r16): bf's subtree
    # appears twice (join + n_queries), not once per arm
    return _overlap_report(bf, variants, nq, k=PQ_TOPK)


# --- Hybrid retrieval: reciprocal-rank fusion of BM25 + cosine ----------------
#
# The retrieval operator a RAG-curation / search-based-decontamination
# pipeline actually serves: a lexical arm (the registered BM25
# more-like-this plan) and a semantic arm (brute-force cosine top-k over the
# document embeddings) fused per query by RRF (Cormack et al., SIGIR 2009)
# -- the standard zero-training fusion that is robust to the two arms'
# incomparable score scales because it consumes only ranks.

RRF_K0 = 60        # the paper's damping constant
RRF_TOP_K = 5      # fused results per query (= each arm's own k)
RRF_QUERY_MOD = 100  # every 100th document queries, matching the BM25 plan


def _rrf_oracle() -> str:
    from flink_cdc_fluss_quickstart_spark.plans.text_queries import (
        _BM25_CTES,
        BM25_TOP_K,
    )

    return f"""
    WITH {_BM25_CTES},
    lex AS (
      SELECT query_id, doc_id, rank AS lex_rank FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score_scaled DESC, doc_id ASC) AS rank
        FROM scored
      ) WHERE rank <= {BM25_TOP_K}
    ),
    q AS (
      SELECT vec_id AS query_id, embedding AS qv
      FROM embeddings WHERE vec_id % {RRF_QUERY_MOD} = 0
    ),
    sem_scored AS (
      SELECT q.query_id, e.vec_id AS doc_id,
             {_DOT} / ({_QNORM} * {_CNORM}) AS cosine_sim
      FROM embeddings e, q
      WHERE e.vec_id <> q.query_id
    ),
    sem AS (
      SELECT query_id, doc_id, rank AS sem_rank FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine_sim DESC, doc_id ASC) AS rank
        FROM sem_scored
      ) WHERE rank <= {RRF_TOP_K}
    ),
    fused AS (
      SELECT query_id, doc_id, lex_rank, sem_rank,
             COALESCE(CAST(1.0 AS DOUBLE)
                      / (CAST({RRF_K0} AS DOUBLE) + CAST(lex_rank AS DOUBLE)),
                      CAST(0.0 AS DOUBLE))
             + COALESCE(CAST(1.0 AS DOUBLE)
                        / (CAST({RRF_K0} AS DOUBLE) + CAST(sem_rank AS DOUBLE)),
                        CAST(0.0 AS DOUBLE)) AS rrf_score
      FROM lex FULL OUTER JOIN sem USING (query_id, doc_id)
    )
    SELECT query_id, doc_id,
           CAST(COALESCE(lex_rank, 0) AS BIGINT) AS lex_rank,
           CAST(COALESCE(sem_rank, 0) AS BIGINT) AS sem_rank,
           rrf_score, fused_rank
    FROM (
      SELECT query_id, doc_id, lex_rank, sem_rank, rrf_score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY rrf_score DESC, doc_id ASC) AS fused_rank
      FROM fused
    ) WHERE fused_rank <= {RRF_TOP_K}
    """


@register(
    "rrf_hybrid_retrieval",
    oracle=_rrf_oracle(),
    description=f"Hybrid retrieval via reciprocal-rank fusion: every"
    f" {RRF_QUERY_MOD}th document queries both the BM25 lexical arm (the"
    f" registered bm25_retrieval plan, recomputed end-to-end) and a"
    f" brute-force cosine semantic arm over its embedding; per-document"
    f" fused score = 1/({RRF_K0}+lex_rank) + 1/({RRF_K0}+sem_rank) with 0"
    f" for an absent arm, fused top-{RRF_TOP_K} kept. Rank-only fusion is"
    f" immune to the arms' incomparable score scales (Cormack et al., SIGIR"
    f" 2009) -- the hybrid-search shape RAG curation and search-based"
    f" decontamination run. Determinism: each contribution is one IEEE"
    f" float64 division on exact integer ranks, summed in fixed order;"
    f" ties break by doc_id. Scale: the arms broadcast queries and stream"
    f" the corpus once each; fusion itself joins two (queries x"
    f" {RRF_TOP_K})-row frames -- no corpus-sized shuffle is added at any"
    f" corpus size.",
)
def rrf_hybrid_retrieval(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_cdc_fluss_quickstart_spark.plans.text_queries import bm25_retrieval

    lex = bm25_retrieval(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").alias("lex_rank")
    )
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    sem = similarity.cosine_topk(
        emb, emb.filter(F.col("vec_id") % RRF_QUERY_MOD == 0), k=RRF_TOP_K
    ).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("sem_rank")
    )
    return similarity.rrf_fuse(lex, sem, k0=RRF_K0, k=RRF_TOP_K)


def _rrf_ann_oracle() -> str:
    from flink_cdc_fluss_quickstart_spark.plans.text_queries import (
        _BM25_CTES,
        BM25_TOP_K,
    )

    return f"""
    WITH {_BM25_CTES},
    lex AS (
      SELECT query_id, doc_id, rank AS lex_rank FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY score_scaled DESC, doc_id ASC) AS rank
        FROM scored
      ) WHERE rank <= {BM25_TOP_K}
    ),
    b AS ({_BUCKETED}),
    q AS (
      SELECT vec_id AS query_id, embedding AS qv, bucket
      FROM b WHERE vec_id % {RRF_QUERY_MOD} = 0
    ),
    sem_scored AS (
      SELECT q.query_id, e.vec_id AS doc_id,
             {_DOT} / ({_QNORM} * {_CNORM}) AS cosine_sim
      FROM b e JOIN q ON e.bucket = q.bucket AND e.vec_id <> q.query_id
    ),
    sem AS (
      SELECT query_id, doc_id, rank AS sem_rank FROM (
        SELECT query_id, doc_id,
               ROW_NUMBER() OVER (PARTITION BY query_id
                                  ORDER BY cosine_sim DESC, doc_id ASC) AS rank
        FROM sem_scored
      ) WHERE rank <= {RRF_TOP_K}
    ),
    fused AS (
      SELECT query_id, doc_id, lex_rank, sem_rank,
             COALESCE(CAST(1.0 AS DOUBLE)
                      / (CAST({RRF_K0} AS DOUBLE) + CAST(lex_rank AS DOUBLE)),
                      CAST(0.0 AS DOUBLE))
             + COALESCE(CAST(1.0 AS DOUBLE)
                        / (CAST({RRF_K0} AS DOUBLE) + CAST(sem_rank AS DOUBLE)),
                        CAST(0.0 AS DOUBLE)) AS rrf_score
      FROM lex FULL OUTER JOIN sem USING (query_id, doc_id)
    )
    SELECT query_id, doc_id,
           CAST(COALESCE(lex_rank, 0) AS BIGINT) AS lex_rank,
           CAST(COALESCE(sem_rank, 0) AS BIGINT) AS sem_rank,
           rrf_score, fused_rank
    FROM (
      SELECT query_id, doc_id, lex_rank, sem_rank, rrf_score,
             ROW_NUMBER() OVER (PARTITION BY query_id
                                ORDER BY rrf_score DESC, doc_id ASC) AS fused_rank
      FROM fused
    ) WHERE fused_rank <= {RRF_TOP_K}
    """


@register(
    "rrf_hybrid_retrieval_ann",
    oracle=_rrf_ann_oracle(),
    description=f"The serving-scale variant of rrf_hybrid_retrieval: the"
    f" semantic arm swaps the brute-force cosine scan for the LSH-bucketed"
    f" ANN plan (each query scores only its own sign-LSH bucket, ~1/2^p of"
    f" the corpus with p following n_planes_for), so BOTH arms now stream"
    f" bounded candidate sets -- the fusion itself is unchanged and stays"
    f" (queries x {RRF_TOP_K})-row. This is the registered proof of the"
    f" SCALE.md note that the ANN arm swap is the hybrid path at corpus"
    f" scale; recall loss of the lsh arm is graded in ann_recall_report."
    f" Determinism: identical fixed hyperplanes and fixed-point cosine in"
    f" both engines, rank-only fusion, doc_id tie-breaks.",
)
def rrf_hybrid_retrieval_ann(spark: SparkSession, sf_dir: str) -> DataFrame:
    from flink_cdc_fluss_quickstart_spark.plans.text_queries import bm25_retrieval

    lex = bm25_retrieval(spark, sf_dir).select(
        "query_id", "doc_id", F.col("rank").alias("lex_rank")
    )
    emb = spread(load_table(spark, sf_dir, "embeddings"))
    sem = _lsh_topk(emb, query_mod=RRF_QUERY_MOD, k=RRF_TOP_K).select(
        "query_id", F.col("neighbor_id").alias("doc_id"), F.col("rank").alias("sem_rank")
    )
    return similarity.rrf_fuse(lex, sem, k0=RRF_K0, k=RRF_TOP_K)
