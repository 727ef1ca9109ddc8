"""Deduplication operators: exact, normalized-fingerprint, MinHash/LSH.

Designed for the 100 TB posture:
- exact/normalized dedup: one hash-shuffle on the digest (the minimum),
- MinHash signatures: computed per-row with array expressions -- the shingle
  set never leaves the row (no explode, no shuffle); only the band-bucket
  self-join shuffles, and it shuffles 8-byte-ish digests, not documents,
- all hashing is md5-based so every step is deterministic AND reproducible in
  the DuckDB oracle (Spark's xxhash64 is faster but engine-private; a
  production deployment swaps the hash in one place here).

Cache hygiene: the profile/band frames that feed both sides of a candidate
self-join are persisted (MEMORY_AND_DISK) so the expensive signature pass
runs once, not per side. Every such persist is tracked; long-lived sessions
that run the dedup family repeatedly should call `release_caches()` after
materializing each query's results (examples/run_llm_pipeline.py does;
bench.py and tools/scale_smoke.py clear the whole session cache between
queries instead). Blocks are LRU-evictable either way, so an unreleased
frame degrades to recompute, never to an OOM -- but releasing keeps the
block manager flat. The tracker itself is bounded (oldest entries are
auto-released past a high-water mark), so clearCache-only consumers don't
accumulate driver-side frame references either.
"""

from __future__ import annotations

import threading

import pyspark.sql.functions as F
from pyspark.sql import Column, DataFrame

from flink_cdc_fluss_quickstart_spark.functions.text import normalized_text
from flink_cdc_fluss_quickstart_spark.tables import spread

SHINGLE_LEN = 5  # character shingles over normalized text

# --- cache lifecycle ---------------------------------------------------------
# frames persisted by dedup operators, released via release_caches(); capped
# so consumers that never call release (they clearCache instead) don't grow
# an unbounded driver-side reference list. Releasing an old entry is always
# safe: a lazy plan that still references it just recomputes.
_CACHED: list[DataFrame] = []
_CACHED_MAX = 16
_CACHED_LOCK = threading.Lock()


def _release(df: DataFrame) -> None:
    try:
        df.unpersist(blocking=False)
    except Exception:
        pass  # session torn down or cache already cleared


def _track(df: DataFrame) -> DataFrame:
    with _CACHED_LOCK:
        _CACHED.append(df)
        evicted = _CACHED[:-_CACHED_MAX]
        del _CACHED[:-_CACHED_MAX]
    for old in evicted:
        _release(old)
    return df


def track_cache(df: DataFrame) -> DataFrame:
    """Public seam for OTHER operator families (e.g. the corpus-statistics
    text queries) that persist a shared intermediate frame: registers it in
    the same capped, release_caches()-managed list as the dedup profiles so
    one hygiene call covers every library-persisted frame."""
    return _track(df)


def release_caches() -> None:
    """Unpersist every profile/band frame persisted by earlier dedup calls.

    Call after the results of a dedup query have been materialized (the
    frames feed lazy self-joins, so releasing earlier just means recompute).
    Idempotent; safe if the session already cleared its cache."""
    with _CACHED_LOCK:
        drained = _CACHED[:]
        _CACHED.clear()
    for df in drained:
        _release(df)

# --- LSH parameter derivation -------------------------------------------------
# The (n_perms, bands, rows) triple is DERIVED from the target Jaccard
# threshold rather than hardcoded (mirrors similarity.n_planes_for, which
# derives hyperplane count from corpus size): the banded-LSH capture curve is
# p(J) = 1 - (1 - J^rows)^bands with its steep midpoint near (1/bands)^(1/rows),
# so for a threshold t we pick bands = round(t^-rows), pinning the midpoint at
# t. Among the configs that hit the midpoint, width is a pure recall-vs-cost
# trade: every extra permutation is one more multiply-mod-min pass per
# document and every extra band is one more exploded row into the candidate
# self-join. The derivation therefore takes the CHEAPEST config that still
# captures >= `min_clear_recall` of CLEAR near-dups (J >= t + clear_margin) --
# at t=0.5 that is 24 permutations = 8 bands x 3 rows (0.965 capture at
# J=0.7), not the textbook-maximal 16 x 4 (0.988 capture but 2.7x the hash
# work and 2x the candidate-join volume for ~2 points of tail recall).

DEFAULT_JACCARD = 0.5  # the near-dup threshold the default signature targets
MAX_PERMS = 64  # permutation budget (shingle-hash evaluations per document)


def lsh_params(
    threshold: float = DEFAULT_JACCARD,
    max_perms: int = MAX_PERMS,
    clear_margin: float = 0.2,
    min_clear_recall: float = 0.95,
) -> tuple[int, int, int]:
    """Derive (n_perms, bands, rows) for a target Jaccard threshold: midpoint
    (1/bands)^(1/rows) closest to `threshold`; among midpoint-ties, the
    CHEAPEST signature whose capture probability at J = threshold +
    clear_margin is >= min_clear_recall (fall back to the highest-recall
    config if none meets the floor within the permutation budget)."""
    cands = []
    for rows in range(2, 13):
        bands = max(2, round((1.0 / threshold) ** rows))
        n_perms = bands * rows
        if n_perms > max_perms:
            continue
        midpoint = (1.0 / bands) ** (1.0 / rows)
        j_clear = min(threshold + clear_margin, 1.0)
        recall = 1.0 - (1.0 - j_clear**rows) ** bands
        cands.append((round(abs(midpoint - threshold), 3), n_perms, recall, bands, rows))
    assert cands, "no (bands, rows) fits the permutation budget"
    best_err = min(c[0] for c in cands)
    near = [c for c in cands if c[0] == best_err]
    meeting = [c for c in near if c[2] >= min_clear_recall]
    if meeting:
        _, n_perms, _, bands, rows = min(meeting, key=lambda c: c[1])
    else:
        _, n_perms, _, bands, rows = max(near, key=lambda c: c[2])
    return (n_perms, bands, rows)


N_PERMS, N_BANDS, N_ROWS = lsh_params()  # (24, 8, 3) at the 0.5 default

#: default band layout over the signature columns: band b = columns
#: mh_{b*rows} .. mh_{b*rows + rows - 1}
BAND_COLS: tuple[tuple[str, ...], ...] = tuple(
    tuple(f"mh_{b * N_ROWS + r}" for r in range(N_ROWS)) for b in range(N_BANDS)
)


def md5_digest(s: Column) -> Column:
    """Oracle-reproducible shingle digest: 32 hex chars, mirrored in DuckDB.
    This is THE hash seam -- every minhash/LSH step slices this digest, so
    swapping the digest function swaps the whole pipeline's hash."""
    return F.md5(s)


def fast_digest(s: Column) -> Column:
    """Production shingle digest: two seeded xxhash64 values hex-packed to
    the same 32-hex-char contract md5_digest satisfies. xxhash64 skips md5's
    cryptographic rounds (~10% on the whole signature step at sf0.1 --
    shingling/array work dominates, so the swap is a modest win, not a
    rescue) -- but it is engine-private, so the DuckDB oracle gate pins md5;
    production callers pass digest=fast_digest."""
    return F.concat(
        F.lpad(F.hex(F.xxhash64(s)), 16, "0"),
        F.lpad(F.hex(F.xxhash64(s, F.lit(1))), 16, "0"),
    )


def md5_hex_prefix(s: Column, pos: int = 1, length: int = 8) -> Column:
    """`length` hex digits of md5(s) from 1-based `pos`, parsed to BIGINT --
    the ONE row-local integer-hash spelling behind every split/bucket/bit
    predicate in the pipeline plans (re-spelling conv(substring(md5(...)))
    inline at each site let the copies drift). DuckDB oracles mirror it with
    the positional parse (plans/pipeline_queries._duck_hex). 8 digits keeps
    the value < 2^32: products and mods stay exact in BIGINT."""
    return F.conv(F.substring(F.md5(s), pos, length), 16, 10).cast("bigint")


def hash_bucket(s: Column, mod: int = 100) -> Column:
    """Deterministic mod-`mod` bucket of md5(s): the split/sample membership
    predicate (stable across runs, machines, and corpus growth -- the
    property random splits lack at 100 TB)."""
    return md5_hex_prefix(s) % mod


def exact_key(text: Column) -> Column:
    """Exact-dup grouping key: md5 of the raw text."""
    return F.md5(text)


def normalized_key(text: Column) -> Column:
    """Near-dup-by-normalization grouping key."""
    return F.md5(normalized_text(text))


def shingle_array(norm_col: str, n: int = SHINGLE_LEN) -> Column:
    """Array of character n-gram shingles of a normalized-text column,
    computed row-locally (SQL expr because the lambda variable feeds
    substring's start position). Character shingles are the fine-grained
    alternative; the dedup defaults below use word shingles."""
    return F.expr(
        f"transform(sequence(1, greatest(length({norm_col}) - {n - 1}, 1)),"
        f" i -> substring({norm_col}, i, {n}))"
    )


WORD_SHINGLE_LEN = 3  # word n-grams: the document-dedup unit used in practice
                      # (RefinedWeb/SlimPajama-style MinHash shingles words,
                      # not characters -- ~6x fewer elements per document)


def word_shingle_array(norm_col: str, n: int = WORD_SHINGLE_LEN) -> Column:
    """Array of word n-gram shingles of a normalized-text column, computed
    row-locally in O(words): shifted-array zips whose inputs are ARGUMENTS
    (evaluated once per row), never lambda-captured columns (which Spark's
    interpreted higher-order functions would re-evaluate per element).
    Shingles past the end carry fewer than n words via concat_ws null-skip,
    and the final slice drops them (keeping one shingle for docs shorter
    than n words)."""
    w = f"split({norm_col}, ' ')"
    expr = w
    for j in range(1, n):
        expr = (
            f"zip_with({expr}, slice({w}, {j + 1}, size({w})),"
            f" (a, b) -> concat_ws(' ', a, b))"
        )
    return F.expr(f"slice({expr}, 1, greatest(size({w}) - {n - 1}, 1))")


# --- winnowing (rolling-hash fingerprinting) --------------------------------

WINNOW_K = 8  # char k-gram length
WINNOW_W = 4  # winnowing window in grams; any shared substring of at least
              # WINNOW_K + WINNOW_W - 1 = 11 chars shares a fingerprint

def winnow_fingerprint_frame(df: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """Winnowing fingerprint set per document (Schleimer/Wilkerson/Aiken,
    SIGMOD 2003 'local algorithms for document fingerprinting'): hash every
    POSITIONAL char k-gram of the normalized text, keep the minimum of each
    sliding window of WINNOW_W consecutive hashes, distinct the selections.
    Unlike minhash (a similarity ESTIMATE), winnowing GUARANTEES any common
    substring of length >= k + w - 1 contributes a shared fingerprint --
    the standard primitive for partial-overlap/plagiarism-style detection.

    Scale shape: everything is row-local array math until the final explode;
    the sliding-window minimum is computed by zip_with DOUBLING (window 2 =
    elementwise least of the hash array and itself shifted 1; window 4 =
    least of window-2 and itself shifted 2), with each stage referencing the
    previous stage's column several times so Catalyst keeps the projection
    boundary (same ARGUMENTS-not-lambda-captured discipline as
    word_shingle_array -- no per-element recompute). Output: one
    (id, fingerprint BIGINT) row per selected hash; what downstream joins
    shuffle is 8-byte fingerprints, never documents.
    """
    k, w = WINNOW_K, WINNOW_W
    # spread first: the positional-gram hashing is the expensive part and the
    # input may arrive as a handful of file partitions
    norm = spread(df).select(
        F.col(id_col), normalized_text(F.col(text_col)).alias("__norm")
    )
    grams = norm.select(id_col, shingle_array("__norm", k).alias("__g"))
    cur = grams.select(
        id_col,
        F.expr(
            "transform(__g, g ->"
            " CAST(conv(substring(md5(g), 1, 15), 16, 10) AS BIGINT))"
        ).alias("__m"),
    )
    # sliding min via sparse-table doubling, derived from w (not hardcoded):
    # window-2p minima = elementwise least of window-p minima and themselves
    # shifted p; a non-power-of-2 tail combines the largest power-of-2 table
    # with itself shifted w - p (windows overlap; min is idempotent).
    # least() skips the nulls zip_with pads with, so trailing windows
    # truncate at the array end (docs shorter than w grams produce the min
    # of what exists -- mirrored in the oracle's clamped list slicing).
    # Each stage references the previous column several times (arguments,
    # never lambda-captured), keeping the projection boundary.
    p = 1
    while p * 2 <= w:
        cur = cur.select(
            id_col,
            F.expr(
                f"zip_with(__m, slice(__m, {p + 1}, size(__m)),"
                f" (a, b) -> least(a, b))"
            ).alias("__m"),
        )
        p *= 2
    if p < w:
        cur = cur.select(
            id_col,
            F.expr(
                f"zip_with(__m, slice(__m, {w - p + 1}, size(__m)),"
                f" (a, b) -> least(a, b))"
            ).alias("__m"),
        )
    fps = cur.select(
        id_col,
        F.expr(
            f"array_distinct(slice(__m, 1, greatest(size(__m) - {w - 1}, 1)))"
        ).alias("__fps"),
    )
    # materialize the array frame BEFORE exploding: fusing the whole HOF
    # chain into the Generate is ~5x slower than computing the arrays and
    # exploding from the materialized frame (measured 20s -> 4s at sf0.01),
    # and the frame also feeds both uses in the overlap-pairs query. Tracked
    # persist -- released via release_caches() like every dedup profile.
    from pyspark import StorageLevel

    fps = _track(fps.persist(StorageLevel.MEMORY_AND_DISK))
    return fps.select(id_col, F.explode("__fps").alias("fingerprint"))


# Permutation family: ONE md5 per distinct shingle reduced to a value
# x in [0, p), then component k applies the 2-universal map
# (a_k*x + b_k) mod p with fixed per-component constants -- the same
# multiply-mod-prime family Spark MLlib's MinHashLSH uses (and datasketch's
# 2^61 variant). vs one salted digest per 4 components this is 16x fewer
# hash evaluations at 64 permutations, and unlike naive double hashing
# (h1 + k*h2: linearly DEPENDENT across k -- one shingle with small h1 and
# h2 wins every component's min and glues unrelated documents into every
# band) the per-k multiplication scrambles the argmin independently.
_MH_PRIME = 2038074743  # prime < 2^31: a*x + b < 2^62, BIGINT-safe


def _perm_consts(k: int) -> tuple[int, int]:
    """Deterministic (a_k, b_k), a_k != 0, derived by hashing k (stable
    across sessions/engines; inlined as literals in the DuckDB oracle)."""
    import hashlib

    a = int(hashlib.md5(f"mh-a-{k}".encode()).hexdigest()[:8], 16) % (_MH_PRIME - 1) + 1
    b = int(hashlib.md5(f"mh-b-{k}".encode()).hexdigest()[:8], 16) % _MH_PRIME
    return a, b


PERM_AB: tuple[tuple[int, int], ...] = tuple(_perm_consts(k) for k in range(MAX_PERMS))


def _hex_long(h: Column, start: int, width: int = 8) -> Column:
    """Unsigned integer value of a hex-digest slice (conv is exact to 15
    hex chars; slices here are 8). DuckDB mirror: CAST('0x'||substr AS BIGINT)."""
    return F.conv(F.substring(h, start, width), 16, 10).cast("long")


def perm_component(k: int, x_col: str = "__x") -> Column:
    """Signature component k over the reduced-shingle array x_col: min over
    shingles of (a_k*x + b_k) mod p. (Reference spelling -- the batch path
    uses perm_fold_expr, which computes ALL components in one traversal.)"""
    a, b = PERM_AB[k]
    return F.array_min(
        F.transform(x_col, lambda x: (F.lit(a) * x + F.lit(b)) % _MH_PRIME)
    )


def perm_fold_expr(n_perms: int, x_col: str = "__x") -> str:
    """SQL expr computing ALL n_perms signature components in ONE traversal
    of the reduced-shingle array: the accumulator is the running component
    minima; each shingle folds in via zip_with(least). Identical values to
    per-component perm_component (for the always-non-empty shingle arrays
    word_shingle_array produces), but one interpreted pass instead of
    n_perms -- measured 3-4x faster at 24 permutations, since higher-order
    array functions are evaluated interpreted and their cost is per-pass."""
    a_lits = ",".join(str(PERM_AB[k][0]) for k in range(n_perms))
    b_lits = ",".join(str(PERM_AB[k][1]) for k in range(n_perms))
    return (
        f"aggregate({x_col}, array_repeat(CAST({_MH_PRIME} AS BIGINT), {n_perms}),"
        f" (acc, x) -> zip_with(acc, zip_with(array({a_lits}), array({b_lits}),"
        f" (a, b) -> (a * x + b) % {_MH_PRIME}), (u, v) -> least(u, v)))"
    )


def _shingle_digests(
    df: DataFrame, id_col: str, text_col: str, n: int, digest
) -> DataFrame:
    """(id, __hs): one digest per DISTINCT word shingle of the normalized
    text -- the shared head of every shingle-hash chain (minhash signatures
    and band keys, simhash, the Jaccard/containment LSH profile). One
    definition so a change to normalization, shingling, or the digest seam
    cannot desynchronize the batch, incremental, and keyed-LSH paths."""
    out = spread(df).select(F.col(id_col), normalized_text(F.col(text_col)).alias("__norm"))
    out = out.select(id_col, F.array_distinct(word_shingle_array("__norm", n)).alias("__sh"))
    return out.select(id_col, F.transform(F.col("__sh"), digest).alias("__hs"))


def _minhash_fold(hs: DataFrame, n_perms: int) -> DataFrame:
    """Adds __x (digest -> 32-bit half mod p) and __mh (the n_perms-component
    signature fold, see perm_fold_expr) to a (_shingle_digests) frame;
    keeps __hs for callers that slice it further (the LSH profile)."""
    out = hs.withColumn(
        "__x", F.transform("__hs", lambda h: _hex_long(h, 1) % _MH_PRIME)
    )
    return out.withColumn("__mh", F.expr(perm_fold_expr(n_perms)))


def minhash_signature(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_perms: int = N_PERMS,
    n: int = WORD_SHINGLE_LEN,
    digest=md5_digest,
) -> DataFrame:
    """MinHash signature per document: ONE digest per distinct word shingle,
    reduced to x = (32-bit half) mod p; the k-th signature component is the
    minimum over shingles of (a_k*x + b_k) mod p -- the 2-universal
    multiply-mod-prime permutation family (as in Spark MLlib MinHashLSH).
    The ~31-bit component range keeps the random-collision floor negligible
    (min of n uniforms over ~2^31 collides across documents with prob
    ~n/2^32).

    ``digest`` is the hash seam: md5_digest (default) is oracle-reproducible;
    fast_digest is the cheaper production path.

    Output: (id, mh_0 .. mh_{n_perms-1} BIGINT) -- one row per document,
    no shuffle.
    """
    out = _minhash_fold(_shingle_digests(df, id_col, text_col, n, digest), n_perms)
    return out.select(
        id_col, *[F.element_at("__mh", k + 1).alias(f"mh_{k}") for k in range(n_perms)]
    )


def minhash_band_keyed(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n_perms: int = N_PERMS,
    n: int = WORD_SHINGLE_LEN,
    digest=md5_digest,
    n_bands: int = N_BANDS,
    n_rows: int = N_ROWS,
) -> DataFrame:
    """(id, band_idx, band_key) straight from the signature ARRAY: band b's
    key is the md5 of its n_rows components joined with '|', sliced from the
    fold accumulator without ever spreading the per-permutation columns.
    The key strings are byte-identical to minhash_band_pairs' (same
    components, same '|' join, same md5), but the plan skips the
    n_perms-wide element_at projection and the band-key re-concat --
    measurably less analysis + codegen on the cold path, which is what a
    first-execution bench pays."""
    out = _minhash_fold(_shingle_digests(df, id_col, text_col, n, digest), n_perms)
    keys = F.expr(
        f"transform(sequence(0, {n_bands - 1}),"
        f" b -> md5(array_join(transform(slice(__mh, b * {n_rows} + 1, {n_rows}),"
        f" v -> cast(v as string)), '|')))"
    )
    return (
        out.select(F.col(id_col), F.posexplode(keys))
        .withColumnRenamed("pos", "band_idx")
        .withColumnRenamed("col", "band_key")
    )


def _corpus_join_side(df: DataFrame) -> DataFrame:
    """A join side that scales with the CORPUS (band-exploded key frames,
    per-doc shingle/fingerprint profiles): pin the join it enters to
    sort-merge. Static size estimates through explode/aggregate chains
    undershoot the broadcast threshold, and the planner then schedules a
    broadcast build of a frame that grows with the data -- fatal on any
    driver/executor at 100 TB even where it happens to fit at test scale
    (caught by the r14 x100 sweep, tools/broadcast_sweep.py; the same rule
    as plans/text_queries._corpus_side for the GD loops). Sort-merge keys
    both sides through the shuffle, the only join shape whose memory stays
    partition-bounded at every scale."""
    return df.hint("merge")


def band_self_join(keyed: DataFrame, id_col: str) -> DataFrame:
    """ONE equi self-join of a (id, band_idx, band_key) frame on the
    compound key -- one exchange total regardless of band count, and what
    shuffles is (id, band_idx, 16-byte digest), never documents
    (sort-merge by construction: both sides are corpus-sized, see
    _corpus_join_side).

    Output: distinct (id_a, id_b) with id_a < id_b.

    The keyed frame feeds both self-join sides, so it is persisted: the
    signature computation (the expensive part) runs once, not per side."""
    from pyspark import StorageLevel

    keyed = _track(keyed.persist(StorageLevel.MEMORY_AND_DISK))
    a, b = keyed.alias("a"), _corpus_join_side(keyed).alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key")),
        )
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


def minhash_band_pairs(
    signatures: DataFrame,
    id_col: str,
    band_cols: tuple[tuple[str, ...], ...],
) -> DataFrame:
    """LSH candidate pairs: documents sharing ALL minhash values within any
    band. The band keys are exploded row-locally to (id, band_idx, band_key)
    and matched via band_self_join. '|'-joining the fixed-width components
    keeps the key injective.

    Output: distinct (id_a, id_b) with id_a < id_b.
    """
    keys = F.array(
        *[F.md5(F.concat_ws("|", *[F.col(c) for c in cols])) for cols in band_cols]
    )
    keyed = (
        signatures.select(F.col(id_col), F.posexplode(keys))
        .withColumnRenamed("pos", "band_idx")
        .withColumnRenamed("col", "band_key")
    )
    return band_self_join(keyed, id_col)


def minhash_band_pairs_against_index(
    signatures: DataFrame,
    id_col: str,
    band_cols: tuple[tuple[str, ...], ...],
    new_pred: Column,
) -> DataFrame:
    """Incremental LSH: candidate pairs where at least one side satisfies
    ``new_pred`` (the NEW ingest batch) -- the daily-ingest shape of
    minhash_band_pairs. Only the new side's band keys DRIVE the join (the
    index side is probed), so per-run cost is |batch| x bucket-size, never
    index^2, and index-x-index pairs (already resolved by previous runs) are
    never generated. new-x-new pairs arrive once via least/greatest ordering
    + distinct.

    Output: distinct (id_a, id_b) with id_a < id_b.
    """
    from pyspark import StorageLevel

    keys = F.array(
        *[F.md5(F.concat_ws("|", *[F.col(c) for c in cols])) for cols in band_cols]
    )
    keyed = _track(
        signatures.select(F.col(id_col), new_pred.alias("__new"), F.posexplode(keys))
        .withColumnRenamed("pos", "band_idx")
        .withColumnRenamed("col", "band_key")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    a = keyed.filter(F.col("__new")).alias("a")
    # the probed side is INDEX-sized (every band row of the corpus): pin the
    # join to sort-merge (r14 x100 audit caught the planner broadcasting the
    # whole index; see _corpus_join_side). The |batch| x bucket probe-cost
    # contract is unchanged.
    b = _corpus_join_side(keyed).alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key")),
        )
        .filter(F.col(f"a.{id_col}") != F.col(f"b.{id_col}"))
        .select(
            F.least(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_a"),
            F.greatest(F.col(f"a.{id_col}"), F.col(f"b.{id_col}")).alias("id_b"),
        )
        .distinct()
    )


SIMHASH_BITS = 64
SIMHASH_BANDS = 4  # 16-bit bands; pigeonhole guarantees hamming<=3 recall
SIMHASH_BAND_BITS = SIMHASH_BITS // SIMHASH_BANDS
_HEX = "0123456789abcdef"
# Two's-complement weight of the sign bit: 2**63 overflows signed BIGINT, so
# the MSB term contributes the negative value directly (identical in Spark
# and DuckDB).
_MSB_WEIGHT = "(CAST(-9223372036854775807 AS BIGINT) - CAST(1 AS BIGINT))"


def hex_digits_expr(hs_col: str) -> str:
    """SQL expr: per-row array (one element per distinct shingle digest) of
    the first 16 hex-digit values of the digest -- the 64 bits feeding
    simhash. The digest array is a separate column so md5 runs ONCE per
    shingle (a digest captured inside the inner lambda would be re-evaluated
    per hex digit by interpreted higher-order functions -- 16x the hashing).
    Everything is row-local array math; no shuffle, no UDF."""
    return (
        f"transform({hs_col}, h -> transform(sequence(1, {SIMHASH_BITS // 4}),"
        f" j -> instr('{_HEX}', substring(h, j, 1)) - 1))"
    )


def bit_counts_expr(digs_col: str) -> str:
    """SQL expr: ONE aggregate pass over the shingle digest arrays producing
    the 64-element +/-1 vote-count array (element i = #shingles with bit i set
    minus #shingles with it clear, MSB-first).

    Single traversal: each shingle's 16 hex digits expand to 64 +/-1 votes
    which zip_with-accumulate into the running counts -- O(shingles) array
    work per row instead of one aggregate() pass per output bit."""
    # each hex digit v (0..15) contributes its 4 bits MSB-first as +/-1 votes
    contrib = (
        "flatten(transform(d, v -> array("
        "CAST((((v div 8) % 2) * 2 - 1) AS INT),"
        "CAST((((v div 4) % 2) * 2 - 1) AS INT),"
        "CAST((((v div 2) % 2) * 2 - 1) AS INT),"
        "CAST(((v % 2) * 2 - 1) AS INT))))"
    )
    zero = f"transform(sequence(1, {SIMHASH_BITS}), x -> CAST(0 AS INT))"
    return (
        f"aggregate({digs_col}, {zero},"
        f" (acc, d) -> zip_with(acc, {contrib}, (a, b) -> CAST(a + b AS INT)))"
    )


def simhash_from_counts_expr(cnt_col: str) -> str:
    """SQL expr folding the 64 vote counts into one BIGINT simhash: bit i is 1
    iff counts[i] > 0 (ties -> 0). The MSB uses the negative two's-complement
    weight so the sum stays in signed-64 range."""
    terms = []
    for i in range(SIMHASH_BITS):
        weight = _MSB_WEIGHT if i == 0 else f"CAST({2 ** (SIMHASH_BITS - 1 - i)} AS BIGINT)"
        terms.append(
            f"(CASE WHEN element_at({cnt_col}, {i + 1}) > 0 THEN {weight}"
            f" ELSE CAST(0 AS BIGINT) END)"
        )
    return " + ".join(terms)


def simhash(
    df: DataFrame, id_col: str, text_col: str, n: int = WORD_SHINGLE_LEN
) -> DataFrame:
    """64-bit SimHash fingerprint per document over distinct word shingles
    of the normalized text. Output: (id, simhash BIGINT).

    The DuckDB oracle spells the majority vote per-bit (64 list_sums); this
    side accumulates all 64 votes in one pass -- same values, linear cost.
    """
    out = _shingle_digests(df, id_col, text_col, n, md5_digest)
    out = out.select(id_col, F.expr(hex_digits_expr("__hs")).alias("__digs"))
    out = out.select(id_col, F.expr(bit_counts_expr("__digs")).alias("__cnt"))
    return out.select(id_col, F.expr(simhash_from_counts_expr("__cnt")).alias("simhash"))


def simhash_neardup_pairs(
    fingerprints: DataFrame, id_col: str, max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by simhash: candidates share at least one of the 4
    16-bit bands of the fingerprint (pigeonhole: hamming <= 3 guarantees a
    whole equal band), verified with an exact popcount on the XOR.

    Band width is the scale lever: a band key of b bits spreads N documents
    over ~2^b buckets, so expected bucket size is N/2^b and the per-band
    self-join cost is N^2/2^b. 16-bit bands keep that sub-quadratic out to
    billions of documents where 8-bit bands go quadratic at millions.

    The 4 band keys are exploded row-locally to (id, band_idx, band_key) and
    matched with ONE equi self-join on the compound key (the same shape as
    minhash_band_pairs) -- one exchange total instead of a 4-branch join
    union, and only (id, simhash, band_key) rows shuffle, never documents.
    The keyed frame feeds both self-join sides, so it is persisted: the
    fingerprint computation runs once.

    Output: distinct (id_a, id_b, hamming) with id_a < id_b.
    """
    from pyspark import StorageLevel

    mask = (1 << SIMHASH_BAND_BITS) - 1
    # shift-then-mask: a shifted mask literal (65535 << 48) would overflow
    # int64; arithmetic shift right + mask is sign-safe in both engines
    bands = F.array(
        *[
            F.shiftright(F.col("simhash"), SIMHASH_BAND_BITS * k).bitwiseAND(F.lit(mask))
            for k in range(SIMHASH_BANDS)
        ]
    )
    keyed = _track(
        fingerprints.select(F.col(id_col), F.col("simhash"), F.posexplode(bands))
        .withColumnRenamed("pos", "band_idx")
        .withColumnRenamed("col", "band_key")
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # both self-join sides are the corpus-sized band frame: sort-merge
    a, b = keyed.alias("a"), _corpus_join_side(keyed).alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key")),
        )
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(
            F.col(f"a.{id_col}").alias("id_a"),
            F.col(f"b.{id_col}").alias("id_b"),
            F.expr("bit_count(a.simhash ^ b.simhash)").alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
        .distinct()
    )


def ngram_jaccard(
    df: DataFrame,
    id_col: str,
    text_col: str,
    candidate_pairs: DataFrame,
    n: int = SHINGLE_LEN,
    min_jaccard: float | None = None,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for candidate pairs only (the verify
    step after LSH). Shingle sets are row-local arrays; the pair join brings
    two arrays together and intersects them without exploding.

    Scale shape: each shingle is hashed to a 60-bit BIGINT (15 hex chars of
    its md5) BEFORE the pair join, so what shuffles and intersects is a long
    array, not the shingle strings; the set frame feeds both join sides and
    is persisted, so shingling+hashing happens once per document.

    No array_union is ever built: |A u B| = |A| + |B| - |A n B| with the set
    sizes precomputed per document. With `min_jaccard` set, pairs whose size
    ratio already caps Jaccard below the threshold skip the intersection
    entirely (sound: J <= min(|A|,|B|)/max(|A|,|B|)), and the output keeps
    only pairs at or above the threshold.

    Output: (id_a, id_b, jaccard DOUBLE).
    """
    from pyspark import StorageLevel

    norm = _track(
        spread(df).select(F.col(id_col), normalized_text(F.col(text_col)).alias("__norm"))
        .select(F.col(id_col), F.array_distinct(shingle_array("__norm", n)).alias("__sh"))
        .select(
            F.col(id_col),
            F.transform(
                F.col("__sh"),
                lambda s: F.conv(F.substring(F.md5(s), 1, 15), 16, 10).cast("long"),
            ).alias("sh"),
        )
        .select(F.col(id_col), F.col("sh"), F.size("sh").alias("sh_n"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # the per-doc shingle-set frames are corpus-sized: sort-merge resolve
    a = _corpus_join_side(norm.select(
        F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"), F.col("sh_n").alias("n_a")
    ))
    b = _corpus_join_side(norm.select(
        F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"), F.col("sh_n").alias("n_b")
    ))
    joined = candidate_pairs.join(a, "id_a").join(b, "id_b")
    if min_jaccard is not None:
        joined = joined.filter(
            F.least("n_a", "n_b").cast("double")
            >= F.lit(min_jaccard) * F.greatest("n_a", "n_b")
        )
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.col("n_a") + F.col("n_b")).cast("double") - inter
    out = joined.select("id_a", "id_b", (inter / union).alias("jaccard"))
    if min_jaccard is not None:
        out = out.filter(F.col("jaccard") >= min_jaccard)
    return out


EST_SLICES = 8  # 16-bit minhash components used to ESTIMATE Jaccard cheaply


def _lsh_shingle_profile(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    threshold: float,
    digest,
    est_slices: int = 0,
) -> tuple[DataFrame, int]:
    """Shared per-document LSH profile (ONE digest per distinct shingle,
    sliced three ways -- see jaccard_neardup's docstring) used by both the
    Jaccard and containment paths, so the band/fold wiring cannot
    desynchronize between them or from the DuckDB oracle spellings.

    Returns (prof, n_bands): prof is persisted (it feeds both self-join
    sides plus the verify joins) with columns
    (id, bk_0..bk_{bands-1}, [est_0..est_{est_slices-1},] sh, sh_n).
    """
    from pyspark import StorageLevel

    n_perms, n_bands, n_rows = lsh_params(threshold)
    # all signature components in ONE fold pass (see perm_fold_expr), then
    # each band's row-components fold into ONE key column so the persisted
    # profile stays narrow (n_bands keys, not n_perms components); '|' join
    # of the decimal component values is injective
    hs = _minhash_fold(_shingle_digests(df, id_col, text_col, n, digest), n_perms)
    band_keys = [
        F.md5(
            F.concat_ws(
                "|", *[F.element_at("__mh", b * n_rows + r + 1) for r in range(n_rows)]
            )
        ).alias(f"bk_{b}")
        for b in range(n_bands)
    ]
    est_cols = [
        F.array_min(
            F.transform(F.col("__hs"), lambda h, s=4 * k + 1: F.substring(h, s, 4))
        ).alias(f"est_{k}")
        for k in range(est_slices)
    ]
    sh_col = F.transform(
        F.col("__hs"), lambda h: F.conv(F.substring(h, 1, 15), 16, 10).cast("long")
    ).alias("sh")
    prof = _track(
        hs.select(id_col, *band_keys, *est_cols, sh_col)
        .withColumn("sh_n", F.size("sh"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    return prof, n_bands


def _band_candidates(prof: DataFrame, id_col: str, n_bands: int) -> DataFrame:
    """Candidate pairs from the profile's band keys: exploded row-locally and
    matched with ONE compound-key self-join (same shape as
    minhash_band_pairs). Output: distinct (id_a, id_b), id_a < id_b."""
    keyed = (
        prof.select(
            F.col(id_col),
            F.posexplode(F.array(*[F.col(f"bk_{b}") for b in range(n_bands)])),
        )
        .withColumnRenamed("pos", "band_idx")
        .withColumnRenamed("col", "band_key")
    )
    ka, kb = keyed.alias("a"), _corpus_join_side(keyed).alias("b")
    return (
        ka.join(
            kb,
            (F.col("a.band_idx") == F.col("b.band_idx"))
            & (F.col("a.band_key") == F.col("b.band_key")),
        )
        .filter(F.col(f"a.{id_col}") < F.col(f"b.{id_col}"))
        .select(F.col(f"a.{id_col}").alias("id_a"), F.col(f"b.{id_col}").alias("id_b"))
        .distinct()
    )


#: default Jaccard threshold / estimate-gate margin for jaccard_neardup.
#: Named so the DuckDB oracle (plans/text_queries._EST_MIN) derives its gate
#: from the SAME constants the Spark path uses -- a literal 0.5/0.1 spelled
#: in both places can silently diverge when one side is retuned.
NEARDUP_MIN_JACCARD = 0.5
NEARDUP_EST_MARGIN = 0.1


def jaccard_neardup(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = WORD_SHINGLE_LEN,
    min_jaccard: float = NEARDUP_MIN_JACCARD,
    est_margin: float = NEARDUP_EST_MARGIN,
    digest=md5_digest,
) -> DataFrame:
    """LSH candidates -> minhash-estimate gate -> exact Jaccard verify, with
    every hash derived from ONE digest per distinct shingle (md5 by default;
    pass digest=fast_digest for the cheaper engine-private production hash).

    The digest (32 hex chars) is sliced three ways, so the profile frame is
    computed in a single pass and persisted:
    - 32-bit half reduced mod p -> n_perms multiply-mod-prime components
      ((a_k*x + b_k) mod p) whose minima fold into bands x rows band keys ->
      the LSH candidate generation (bands/rows derived from min_jaccard via
      lsh_params, so the capture-curve midpoint tracks the threshold),
    - 8 x 4-hex minima of the digest -> a minhash that ESTIMATES Jaccard
      as the fraction of matching components (16-bit slices collide upward,
      which only makes the gate more conservative),
    - 15-hex of the digest -> 60-bit BIGINT per shingle for the exact
      set intersection.

    The estimate gate drops candidate pairs whose estimated Jaccard is below
    (min_jaccard - est_margin) BEFORE the exact intersection -- on an
    LSH-candidate stream most pairs are band-collision false positives, so
    this removes the dominant cost (pairwise O(|A|+|B|) intersections) while
    the margin keeps borderline pairs on the exact path. The gate is part of
    the operator's definition and is mirrored in the DuckDB oracle.

    Output: (id_a, id_b, jaccard DOUBLE) with jaccard >= min_jaccard.
    """
    import math

    prof, n_bands = _lsh_shingle_profile(
        df, id_col, text_col, n, min_jaccard, digest, est_slices=EST_SLICES
    )
    pairs = _band_candidates(prof, id_col, n_bands)

    # stage 1 -- gate on NARROW columns only. The est/sh_n frame carries 8
    # short strings + an int per doc; joining the full shingle arrays to all
    # candidate pairs first would shuffle |pairs| x |shingles| longs (the
    # actual bottleneck, GBs at sf0.1), so the wide arrays are attached only
    # to gate survivors in stage 2.
    narrow_a = _corpus_join_side(prof.select(
        F.col(id_col).alias("id_a"),
        *[F.col(f"est_{k}").alias(f"__ea_{k}") for k in range(EST_SLICES)],
        F.col("sh_n").alias("n_a"),
    ))
    narrow_b = _corpus_join_side(prof.select(
        F.col(id_col).alias("id_b"),
        *[F.col(f"est_{k}").alias(f"__eb_{k}") for k in range(EST_SLICES)],
        F.col("sh_n").alias("n_b"),
    ))
    gated = pairs.join(narrow_a, "id_a").join(narrow_b, "id_b")

    est_min = math.ceil((min_jaccard - est_margin) * EST_SLICES)
    est_matches = None
    for k in range(EST_SLICES):
        term = (F.col(f"__ea_{k}") == F.col(f"__eb_{k}")).cast("int")
        est_matches = term if est_matches is None else est_matches + term
    gated = gated.filter(est_matches >= est_min)

    # size-ratio bound (sound: J <= min/max) -- prunes without set work
    gated = gated.filter(
        F.least("n_a", "n_b").cast("double") >= F.lit(min_jaccard) * F.greatest("n_a", "n_b")
    ).select("id_a", "id_b", "n_a", "n_b")

    # stage 2 -- exact intersection for the few survivors only (the wide
    # array frames are corpus-sized: sort-merge, never a broadcast build)
    sets_a = _corpus_join_side(
        prof.select(F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a")))
    sets_b = _corpus_join_side(
        prof.select(F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b")))
    joined = gated.join(sets_a, "id_a").join(sets_b, "id_b")
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    union = (F.col("n_a") + F.col("n_b")).cast("double") - inter
    return (
        joined.select("id_a", "id_b", (inter / union).alias("jaccard"))
        .filter(F.col("jaccard") >= min_jaccard)
    )


def containment_pairs(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int = WORD_SHINGLE_LEN,
    min_containment: float = 0.7,
    digest=md5_digest,
) -> DataFrame:
    """Asymmetric near-dup scoring over LSH candidates: containment
    c(A in B) = |A n B| / |A| in both directions, keeping pairs where either
    direction reaches `min_containment` -- the quote/subset detector that
    symmetric Jaccard misses (a doc fully embedded in a 3x larger doc has
    J ~ 0.33 but containment 1.0).

    Candidate generation is the SAME threshold-derived banded-LSH self-join
    as jaccard_neardup (one compound-key equi join; digests shuffle, never
    documents), so candidates are near-mirror pairs and supersets of
    comparable size. Honest scope note: minhash-LSH estimates JACCARD, so a
    tiny fragment inside a huge document may not surface as a candidate;
    exhaustive small-in-big search needs asymmetric LSH, which is a
    different index. No size-ratio prune is applied -- the Jaccard bound
    J <= min/max does not bound containment.

    Output: (id_a, id_b, containment_ab, containment_ba) with id_a < id_b.
    """
    prof, n_bands = _lsh_shingle_profile(
        df, id_col, text_col, n, DEFAULT_JACCARD, digest
    )
    pairs = _band_candidates(prof, id_col, n_bands)
    sets_a = _corpus_join_side(prof.select(
        F.col(id_col).alias("id_a"), F.col("sh").alias("sh_a"), F.col("sh_n").alias("n_a")
    ))
    sets_b = _corpus_join_side(prof.select(
        F.col(id_col).alias("id_b"), F.col("sh").alias("sh_b"), F.col("sh_n").alias("n_b")
    ))
    inter = F.size(F.array_intersect("sh_a", "sh_b")).cast("double")
    return (
        pairs.join(sets_a, "id_a")
        .join(sets_b, "id_b")
        .select(
            "id_a",
            "id_b",
            (inter / F.col("n_a")).alias("containment_ab"),
            (inter / F.col("n_b")).alias("containment_ba"),
        )
        .filter(
            F.greatest("containment_ab", "containment_ba") >= F.lit(min_containment)
        )
    )


def connected_components(
    edges: DataFrame,
    nodes: DataFrame,
    id_col: str = "id",
    src_col: str = "id_a",
    dst_col: str = "id_b",
    max_iterations: int = 25,
) -> DataFrame:
    """Duplicate-cluster resolution: connected components over a near-dup
    pair graph by min-label propagation with pointer jumping.

    Each node starts labeled with its own id. Every round:
    1. hook: take the minimum of the node's label and its neighbors' labels
       (one equi join + min-aggregation), then
    2. jump: replace the label with its label's label (path halving -- one
       self equi join), so chains collapse in O(log diameter) rounds instead
       of O(diameter). Near-dup LSH graphs DO chain (A~B~C without A~C), so
       the jump matters: the sf0.01 fixture graph has diameter 13, which is
       13 rounds hooked-only vs 4 with jumping.

    The loop is over ROUNDS, never rows; every step is an equi join -- the
    standard distributed-CC shape. Labels decrease monotonically, so the
    cheap convergence check is an unchanged label SUM (one aggregation, no
    join). Labels are localCheckpoint'ed per round to keep lineage flat.

    Output: (id, component_id) for EVERY node; singletons label themselves.
    The component id is the minimum member id -- deterministic, so the DuckDB
    oracle (recursive-CTE reachability) matches exactly.
    """
    sym = edges.select(
        F.col(src_col).alias("__src"), F.col(dst_col).alias("__dst")
    ).unionByName(
        edges.select(F.col(dst_col).alias("__src"), F.col(src_col).alias("__dst"))
    )
    sym = sym.localCheckpoint(eager=True)  # edges feed every round
    labels = nodes.select(
        F.col(id_col).alias("__node"), F.col(id_col).alias("__label")
    ).localCheckpoint(eager=True)
    prev_sum = None

    for _ in range(max_iterations):
        # hook: min over neighbors
        neighbor_min = (
            sym.join(labels, sym["__dst"] == labels["__node"])
            .groupBy("__src")
            .agg(F.min("__label").alias("__nmin"))
        )
        hooked = labels.join(
            neighbor_min, labels["__node"] == neighbor_min["__src"], "left"
        ).select(
            "__node",
            F.least(F.col("__label"), F.coalesce("__nmin", "__label")).alias("__label"),
        )
        # jump: label <- label(label)  (labels always point at real node ids,
        # so the inner self-join matches every row)
        jumped = (
            hooked.alias("x")
            .join(hooked.alias("y"), F.col("x.__label") == F.col("y.__node"))
            .select(F.col("x.__node").alias("__node"), F.col("y.__label").alias("__label"))
        )
        labels = jumped.localCheckpoint(eager=True)
        cur_sum = labels.agg(F.sum("__label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select(F.col("__node").alias(id_col), F.col("__label").alias("component_id"))
