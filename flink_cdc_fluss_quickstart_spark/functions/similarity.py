"""Similarity search over embedding columns (array<float>).

Baseline: brute-force cosine top-k -- the query set broadcasts, the corpus
streams, so the cost is one pass over the corpus per batch of queries (the
right plan at 100 TB: queries are small, corpus is huge, never shuffle the
corpus).

Cross-engine determinism contract: elements are float32, so pairwise products
in float64 are EXACT (24-bit x 24-bit mantissas fit in 53 bits). Each product
is then floor-scaled to an integer (floor(p * 1e12) -- floor of a double is
the same in every IEEE engine, unlike decimal-cast rounding modes) and summed
as BIGINT, which is exact and order-independent, so the dot product matches
the DuckDB oracle bit-for-bit. The final cosine division happens in float64
on identical inputs.

Precondition: embeddings are assumed non-zero-norm (every generator and real
encoder emits unit-ish vectors). A zero-norm vector divides by zero, where
the engines diverge -- Spark's `/` yields NULL (non-ANSI), DuckDB yields
inf -- so zero vectors must be excluded upstream if a corpus can contain
them; they are not silently handled here.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame
from pyspark.sql.window import Window

from flink_cdc_fluss_quickstart_spark.tables import spread

# fixed-point scale for exact integer accumulation of double products;
# |product| < 1 and dims <= a few thousand, so sums stay far below 2^53
SCALE = 1e12


def _scaled_sum(arr: Column) -> Column:
    """Exact order-free sum of a double array: floor-scale each element to a
    long, sum longs."""
    zero = F.lit(0).cast("long")
    return F.aggregate(arr, zero, lambda acc, x: acc + F.floor(x * F.lit(SCALE)))


def dot(a: Column, b: Column) -> Column:
    prods = F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double"))
    return _scaled_sum(prods).cast("double") / F.lit(SCALE)


def sq_norm(a: Column) -> Column:
    sq = F.transform(a, lambda x: x.cast("double") * x.cast("double"))
    return _scaled_sum(sq).cast("double") / F.lit(SCALE)


def n_planes_for(n_vectors: int, target_bucket_size: int = 256) -> int:
    """Plane count that keeps expected sign-LSH bucket size near the target.

    Each plane halves the expected bucket population: n_planes planes spread N
    vectors over 2^n_planes buckets, so bucket self-joins / probes cost
    ~N^2 / 2^n_planes. Solving N / 2^p <= target gives
    p >= log2(N / target) -- a FIXED plane count is the quadratic scale-killer
    (bucket size grows linearly with the corpus); deriving it from corpus size
    keeps per-bucket work constant at any N. Floor of 4 planes so tiny corpora
    still exercise the bucketed plan shape.
    """
    import math

    if n_vectors <= target_bucket_size:
        return 4
    return max(4, math.ceil(math.log2(n_vectors / target_bucket_size)))


def ann_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    target_bucket_size: int = 256,
) -> DataFrame:
    """Sign-LSH ANN with the plane count derived from the ACTUAL corpus size
    (the production entry point; the registered oracle queries pin a plane
    count derived from the nominal bench corpus so the oracle SQL is static).

    The size/dim derivation is ONE aggregate job (count + first vector in the
    same pass) -- a metadata-only footer read on a bare parquet scan, and a
    single data pass when the corpus is a filter/join pipeline (separate
    count() + head() jobs would read that pipeline twice before the real
    query runs a third time).
    """
    stats = corpus.agg(
        F.count(F.lit(1)).alias("n"), F.first(vec_col).alias("v")
    ).first()
    n = stats["n"]
    dim = len(stats["v"]) if stats["v"] is not None else 0
    planes = lsh_planes(n_planes_for(n, target_bucket_size), dim)

    b = spread(corpus).select(
        F.col(id_col),
        F.col(vec_col),
        lsh_bucket(F.col(vec_col), planes).alias("bucket"),
        F.sqrt(sq_norm(F.col(vec_col))).alias("__n"),
    )
    q = queries.select(
        F.col(id_col).alias("query_id"),
        lsh_bucket(F.col(vec_col), planes).alias("__qb"),
        F.col(vec_col).alias("__qv"),
        F.sqrt(sq_norm(F.col(vec_col))).alias("__qn"),
    )
    scored = b.join(
        F.broadcast(q),
        (F.col("bucket") == F.col("__qb")) & (F.col(id_col) != F.col("query_id")),
    ).select(
        "query_id",
        F.col(id_col).alias("neighbor_id"),
        (dot(F.col("__qv"), F.col(vec_col)) / (F.col("__qn") * F.col("__n"))).alias("cosine_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine_sim"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


def lsh_planes(n_planes: int, dim: int) -> list[list[int]]:
    """Deterministic random-hyperplane weights for sign-LSH: small odd
    integers in [-15, 15] derived from md5(plane:dim). Odd -> never zero, so
    per-dimension products never hit sign(0); integer -> float32 * w is exact
    in float64 and both engines floor-scale identical values."""
    import hashlib

    return [
        [int(hashlib.md5(f"{p}:{d}".encode()).hexdigest()[0], 16) * 2 - 15 for d in range(dim)]
        for p in range(n_planes)
    ]


def lsh_bucket(vec: Column, planes: list[list[int]]) -> Column:
    """Sign-LSH bucket id: bit p set iff the exact (floor-scaled bigint) dot
    product with hyperplane p is > 0. Row-local; the bucket is the only thing
    that shuffles at scale."""
    out = None
    zero = F.lit(0).cast("bigint")
    for p, w in enumerate(planes):
        warr = F.array(*[F.lit(float(x)) for x in w])
        prods = F.zip_with(vec, warr, lambda x, y: x.cast("double") * y)
        # bigint bucket id: n_planes_for derives >= 32 planes past ~1e12
        # vectors, where an int32 id would drop the high planes (4x the
        # intended bucket size) or overflow under ANSI mode
        term = F.when(
            _scaled_sum(prods) > 0, F.lit(2 ** p).cast("bigint")
        ).otherwise(zero)
        out = term if out is None else out + term
    assert out is not None
    return out.cast("bigint")


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Brute-force cosine top-k: for each query vector, the k nearest corpus
    vectors (excluding itself), rank ties broken by neighbor id.

    Plan shape: broadcast(queries) nested-loop join against the corpus scan,
    then a per-query top-k window. At scale the corpus side stays partitioned
    and is read once; only (query_id, neighbor_id, sim) rows shuffle into the
    top-k, and AQE coalesces that tiny exchange.
    """
    # norms are per-row, not per-pair: compute them once on each side before
    # the join (k x fewer float ops per candidate; identical values, so the
    # DuckDB oracle's per-pair spelling still matches bit-for-bit)
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        F.sqrt(sq_norm(F.col(vec_col))).alias("__qn"),
    )
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        F.sqrt(sq_norm(F.col(vec_col))).alias("__cn"),
    )
    scored = (
        c.join(F.broadcast(q), F.col("query_id") != F.col("neighbor_id"))
        .select(
            "query_id",
            "neighbor_id",
            (dot(F.col("__qv"), F.col("__cv")) / (F.col("__qn") * F.col("__cn"))).alias("cosine_sim"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine_sim"), F.asc("neighbor_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine_sim")
    )


def rrf_fuse(lex: DataFrame, sem: DataFrame, k0: int = 60, k: int = 5) -> DataFrame:
    """Reciprocal-rank fusion (Cormack/Clarke/Buettcher, SIGIR 2009) of two
    ranked retrieval lists: score(q, d) = sum over lists of 1/(k0 + rank),
    with a 0 contribution from any list the document is absent from.

    Inputs are (query_id, doc_id, lex_rank) and (query_id, doc_id, sem_rank)
    frames whose ranks are 1-based and already top-k-bounded per query; the
    output keeps the fused top-k with absent-arm ranks reported as 0.

    Determinism contract: 1/(k0 + rank) is a single IEEE float64 division on
    exact small-integer inputs, and the two contributions are added in a
    fixed (lexical + semantic) order, so fused scores are bit-identical
    across engines; score ties (identical rank patterns) break by doc_id.

    Scale shape: both arms arrive bounded at k rows per query, so the fusion
    is a tiny (queries x k)-row full-outer join plus a bounded per-query
    window -- fusion cost is independent of corpus size no matter how large
    the corpora the arms ranked. At 100 TB the expensive work lives in the
    arms (which broadcast queries and stream the corpus); RRF adds no
    corpus-sized shuffle.
    """
    rr_lex = F.coalesce(
        F.lit(1.0) / (F.lit(float(k0)) + F.col("lex_rank").cast("double")),
        F.lit(0.0),
    )
    rr_sem = F.coalesce(
        F.lit(1.0) / (F.lit(float(k0)) + F.col("sem_rank").cast("double")),
        F.lit(0.0),
    )
    fused = lex.join(sem, ["query_id", "doc_id"], "full_outer").withColumn(
        "rrf_score", rr_lex + rr_sem
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("rrf_score"), F.asc("doc_id"))
    return (
        fused.withColumn("fused_rank", F.row_number().over(w))
        .filter(F.col("fused_rank") <= k)
        .select(
            "query_id",
            "doc_id",
            F.coalesce(F.col("lex_rank"), F.lit(0)).cast("bigint").alias("lex_rank"),
            F.coalesce(F.col("sem_rank"), F.lit(0)).cast("bigint").alias("sem_rank"),
            "rrf_score",
            "fused_rank",
        )
    )
