"""Property-based tests (hypothesis): operators vs independent brute-force
Python oracles on randomized inputs. Catches edge cases the hand-written
fixtures miss (ties, empties, all-deleted keys, unmatched join keys).

One shared Hypothesis profile: few-but-large examples, because each example
pays a Spark job's fixed cost.
"""

from __future__ import annotations

from datetime import datetime, timedelta

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from flink_cdc_fluss_quickstart_spark.operators import apply_changelog, asof_join

SETTINGS = dict(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)

_T0 = datetime(2024, 1, 1)


def _ts(minutes: int) -> datetime:
    return _T0 + timedelta(minutes=minutes)


# --- changelog apply -------------------------------------------------------

events = st.lists(
    st.tuples(
        st.sampled_from(["I", "U", "D"]),
        st.integers(0, 6),          # key (small domain -> collisions)
        st.integers(0, 100),        # value
    ),
    min_size=0,
    max_size=40,
)


@given(events)
@settings(**SETTINGS)
def test_apply_changelog_matches_python_fold(spark, evs):
    # seq = arrival order, unique -> deterministic
    rows = [(op, i, k, v) for i, (op, k, v) in enumerate(evs)]
    state: dict[int, int] = {}
    for op, _seq, k, v in rows:
        if op == "D":
            state.pop(k, None)
        else:
            state[k] = v
    df = spark.createDataFrame(rows, "op string, seq long, k long, v long") \
        if rows else spark.createDataFrame([], "op string, seq long, k long, v long")
    snap = {r["k"]: r["v"] for r in apply_changelog(df, ["k"], ["seq"]).collect()}
    assert snap == state


# --- as-of join ------------------------------------------------------------

asof_inputs = st.tuples(
    st.lists(  # left: (key, ts_minutes)
        st.tuples(st.integers(0, 3), st.integers(0, 50)), min_size=0, max_size=25
    ),
    st.lists(  # right: (key, ts_minutes, payload)
        st.tuples(st.integers(0, 3), st.integers(0, 50), st.integers(0, 999)),
        min_size=0,
        max_size=25,
    ),
    st.booleans(),  # allow_exact_matches
)


@given(asof_inputs)
@settings(**SETTINGS)
def test_asof_join_matches_bruteforce(spark, inp):
    left_rows, right_rows, exact = inp
    left = [(i, k, _ts(m)) for i, (k, m) in enumerate(left_rows)]
    right = [(i, k, _ts(m), p) for i, (k, m, p) in enumerate(right_rows)]

    def brute(lk, lts):
        cands = [
            r for r in right
            if r[1] == lk and (r[2] <= lts if exact else r[2] < lts)
        ]
        if not cands:
            return None
        # operator contract: latest ts wins; among equal ts the greatest
        # right_order key (here rid) wins
        return max(cands, key=lambda r: (r[2], r[0]))[0]

    ldf = (
        spark.createDataFrame(left, "lid long, k long, ts timestamp")
        if left else spark.createDataFrame([], "lid long, k long, ts timestamp")
    )
    rdf = (
        spark.createDataFrame(right, "rid long, k long, rts timestamp, p long")
        if right else spark.createDataFrame([], "rid long, k long, rts timestamp, p long")
    )
    out = asof_join(
        ldf, rdf, on=["k"], left_ts="ts", right_ts="rts",
        right_cols=["rid", "p"], right_order=("rid",), allow_exact_matches=exact,
    )
    got = {r["lid"]: r["rid"] for r in out.collect()}
    want = {lid: brute(k, ts) for lid, k, ts in left}
    assert got == want


# --- minhash containment ---------------------------------------------------

texts = st.lists(
    st.text(alphabet="ab ", min_size=0, max_size=30), min_size=1, max_size=12
)


@given(texts)
@settings(**SETTINGS)
def test_identical_norm_texts_share_signature_and_pair(spark, docs):
    """Documents with identical normalized text MUST collide in every minhash
    component (completeness of the LSH candidate step for exact dups)."""
    from flink_cdc_fluss_quickstart_spark.functions import dedup
    from flink_cdc_fluss_quickstart_spark.functions.text import normalized_text
    import pyspark.sql.functions as F

    rows = [(i, t) for i, t in enumerate(docs)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    norm = {
        r["doc_id"]: r["n"]
        for r in df.select("doc_id", normalized_text(F.col("text")).alias("n")).collect()
    }
    sig = dedup.minhash_signature(df, "doc_id", "text")
    by_id = {r["doc_id"]: tuple(r)[1:] for r in sig.collect()}
    for i in by_id:
        for j in by_id:
            if norm[i] == norm[j]:
                assert by_id[i] == by_id[j]


# --- global_rank vs brute-force ordering -------------------------------------

rank_rows = st.lists(
    st.tuples(st.integers(0, 10_000), st.sampled_from([0.0, 1.5, 1.5, 1.5, 2.25, -3.5])),
    min_size=1,
    max_size=120,
    unique_by=lambda t: t[0],  # unique ids; scores intentionally collide
)


@given(rank_rows)
@settings(**SETTINGS)
def test_global_rank_matches_python_sort(spark, rows):
    """Range-partitioned distributed rank == brute-force sorted enumerate,
    under heavy score ties, negatives, singletons, and arbitrary id gaps."""
    from flink_cdc_fluss_quickstart_spark.operators.ranking import global_rank

    df = spark.createDataFrame(rows, "id bigint, score double")
    got = {r.id: r.rank for r in global_rank(df, ["score", "id"]).collect()}
    expected = {
        row_id: pos
        for pos, (_score, row_id) in enumerate(sorted((s, i) for i, s in rows))
    }
    assert got == expected


# --- quantile sketch vs brute-force Python oracle ----------------------------

qs_corpus = st.dictionaries(
    st.sampled_from(["a", "b", "c"]),
    st.lists(st.integers(1, 500), min_size=1, max_size=12),
    min_size=1,
    max_size=3,
)


@given(qs_corpus)
@settings(max_examples=8, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture,
                                 HealthCheck.too_slow])
def test_quantile_sketch_matches_python_oracle(spark, corpus):
    """The full report vs an independent Python recomputation on random
    per-language token-count multisets: the exact column is the true
    ceil-rank order statistic, the estimate is the log-histogram bin lower
    edge, and est <= exact < 2*est holds everywhere -- the bound proven for
    arbitrary inputs, not just the planted fixtures."""
    import os
    import tempfile

    import pandas as pd

    from flink_cdc_fluss_quickstart_spark.plans.registry import get

    rows, expected, i = [], {}, 0
    for lang, counts in sorted(corpus.items()):
        for n in counts:
            rows.append((i, " ".join(f"w{j}" for j in range(n)), lang))
            i += 1
        n_docs = len(counts)
        bins = sorted(c.bit_length() - 1 for c in counts)
        ordered = sorted(counts)
        for q in (50, 90):
            rank = (q * n_docs + 99) // 100
            exact = ordered[rank - 1]
            qbin = bins[rank - 1]  # cum count over sorted bins first reaches rank here
            expected[(lang, f"p{q}")] = (n_docs, 1 << qbin, exact)

    with tempfile.TemporaryDirectory() as td:
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"]).assign(
            source="t", n_chars=1
        ).to_parquet(os.path.join(td, "documents.parquet"), index=False)
        got = {
            (r["lang"], r["q"]): (r["n_docs"], r["est_tokens"], r["exact_tokens"])
            for r in get("quantile_sketch_report").builder(spark, td).collect()
        }
    assert got == expected
    for _n, est, exact in got.values():
        assert est <= exact < 2 * est


# --- connected components ----------------------------------------------------
# the pointer-jumping CC is the cluster-resolution keystone under
# dedup_components, embedding_dedup_representatives, leakage_safe_split_assign
# and soft_dedup_weights; label = component-min id by construction, which a
# min-rooted union-find reproduces exactly.

cc_edges = st.lists(
    st.tuples(st.integers(0, 15), st.integers(0, 15)),
    min_size=0,
    max_size=30,
)


@given(cc_edges)
@settings(**SETTINGS)
def test_connected_components_match_union_find(spark, es):
    from flink_cdc_fluss_quickstart_spark.functions.dedup import connected_components

    nodes_py = sorted({n for e in es for n in e} | {99})  # 99: always an isolate
    parent = {n: n for n in nodes_py}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in es:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)  # root stays the component min
    expected = {n: find(n) for n in nodes_py}

    edges = spark.createDataFrame(es, "id_a long, id_b long") if es else (
        spark.createDataFrame([], "id_a long, id_b long")
    )
    nodes = spark.createDataFrame([(n,) for n in nodes_py], "id long")
    out = {
        r.id: r.component_id for r in connected_components(edges, nodes).collect()
    }
    assert out == expected


# --- Debezium precise-mode decimal decode ------------------------------------

_dec_cases = st.lists(
    st.tuples(
        st.integers(-(10 ** 18), 10 ** 18),  # unscaled, within 8 wire bytes
        st.integers(0, 6),                   # scale
    ),
    min_size=1,
    max_size=25,
)


@given(_dec_cases)
@settings(**SETTINGS)
def test_precise_decimal_decodes_any_bigdecimal(spark, cases):
    """Property: for ANY (unscaled, scale) within 8 wire bytes, decoding the
    Kafka Connect Decimal bytes reproduces Decimal(unscaled) / 10^scale
    exactly -- including sign-bit-boundary byte lengths the minimal
    two's-complement encoding produces."""
    import base64
    from decimal import Decimal

    from flink_cdc_fluss_quickstart_spark.sources.connectors import precise_decimal

    def wire(u: int) -> str:
        n = 1
        while not (-(1 << (8 * n - 1)) <= u < (1 << (8 * n - 1))):
            n += 1
        return base64.b64encode(u.to_bytes(n, "big", signed=True)).decode()

    # one job per distinct scale (the column expression is scale-typed)
    by_scale: dict[int, list[tuple[int, int]]] = {}
    for i, (u, s) in enumerate(cases):
        by_scale.setdefault(s, []).append((i, u))
    for s, items in by_scale.items():
        df = spark.createDataFrame(
            [(i, wire(u)) for i, u in items], "i int, w string"
        )
        got = {
            r.i: r.v
            for r in df.select(
                "i", precise_decimal("w", 38, s).alias("v")
            ).collect()
        }
        for i, u in items:
            assert got[i] == Decimal(u) / (Decimal(10) ** s), (u, s, got[i])
