"""Property tests for the cross-engine float-determinism contract behind the
trained classifiers (plans/text_queries.py): every per-row expression uses
ONLY IEEE-754 correctly-rounded operations (+ - * / abs sqrt floor, the
rational sigmoid -- never exp/log), so Python (the Spark driver's weight
arithmetic), the JVM (Spark executors), and DuckDB (the oracle) must agree
BIT-FOR-BIT given the same inputs and association order. These tests pin the
Python<->DuckDB leg directly with hypothesis-generated doubles -- no Spark
session, so the property runs wide and fast; the Spark leg is covered by the
oracle gate's hash compares on real corpora."""

from __future__ import annotations

import math
import struct

import duckdb
import pytest

try:
    from hypothesis import given, settings
    from hypothesis import strategies as st
except ImportError:  # pragma: no cover - hypothesis is in the test env
    pytest.skip("hypothesis not installed", allow_module_level=True)

# magnitudes the classifiers actually see: standardized features (|z| <~ 50),
# weights (|w| <~ 10), micro-scaled sums (|g| <~ 1e13)
_finite = st.floats(
    min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
)


def _bits(x: float) -> int:
    return struct.unpack("<Q", struct.pack("<d", x))[0]


def _duck1(expr: str, **params) -> float:
    """Evaluate `expr` with the params bound as NATIVE doubles (prepared-
    statement bindings). Inline decimal literals would parse as DECIMAL and
    convert to double via int128/pow10 -- TWO roundings, up to 1 ulp off for
    >15-significant-digit values (hypothesis found 900720.6463022095). The
    engine contract never hits this: oracle literals are short/exact
    (0.05, 2.0, 1000000.0) and every high-precision double in an oracle is
    COMPUTED inside DuckDB, not parsed; this harness must match that."""
    con = duckdb.connect()
    keys = list(params)
    cols = ", ".join(f"CAST(? AS DOUBLE) AS {k}" for k in keys)
    return con.execute(
        f"SELECT {expr} FROM (SELECT {cols})", [params[k] for k in keys]
    ).fetchone()[0]


@settings(max_examples=80, deadline=None)
@given(z=_finite)
def test_rational_sigmoid_bitwise_identical(z):
    py = 0.5 + 0.5 * (z / (1.0 + abs(z)))
    dk = _duck1("0.5 + 0.5 * (z / (1.0 + abs(z)))", z=z)
    assert _bits(py) == _bits(dk)


@settings(max_examples=80, deadline=None)
@given(x=_finite)
def test_floor_scale_to_bigint_identical(x):
    """floor(1e6 * x) -- the per-row quantization every corpus reduction
    applies before its integer sum -- must floor to the SAME integer."""
    py = math.floor(1_000_000.0 * x)
    con = duckdb.connect()
    dk = con.execute(
        "SELECT CAST(floor(1000000.0 * CAST(? AS DOUBLE)) AS BIGINT)", [x]
    ).fetchone()[0]
    assert py == dk


@settings(max_examples=60, deadline=None)
@given(
    g=st.integers(min_value=-(2**50), max_value=2**50),
    n=st.integers(min_value=1, max_value=10_000_000),
    w=_finite,
)
def test_weight_update_arithmetic_identical(g, n, w):
    """The GD weight update w - lr*((g/1e6)/n) with an exact-integer gradient
    sum: Python (driver-side weights, logreg) and DuckDB (CTE weights,
    holdout/langid oracles) must produce the same double."""
    lr = 2.0
    py = w - lr * ((g / 1_000_000.0) / n)
    con = duckdb.connect()
    dk = con.execute(
        "SELECT CAST(? AS DOUBLE) - 2.0 * (((CAST(? AS BIGINT) / 1000000.0)"
        " / CAST(? AS BIGINT)))",
        [w, g, n],
    ).fetchone()[0]
    assert _bits(py) == _bits(dk)


@settings(max_examples=60, deadline=None)
@given(v=st.integers(min_value=0, max_value=2**52), n=st.integers(min_value=1, max_value=10_000_000))
def test_stddev_sqrt_identical(v, n):
    """sqrt((V/1e6)/n) -- the standardization denominator -- sqrt is
    correctly rounded in IEEE-754, so both engines agree bitwise."""
    py = math.sqrt((v / 1_000_000.0) / n)
    con = duckdb.connect()
    dk = con.execute(
        "SELECT sqrt((CAST(? AS BIGINT) / 1000000.0) / CAST(? AS BIGINT))",
        [v, n],
    ).fetchone()[0]
    assert _bits(py) == _bits(dk)


@settings(max_examples=60, deadline=None)
@given(ws=st.lists(_finite, min_size=5, max_size=5), xs=st.lists(_finite, min_size=5, max_size=5))
def test_dot_product_association_order_identical(ws, xs):
    """The fixed-association dot product ((((w0*x0)+w1*x1)+...)+w4*x4):
    float addition is NOT associative, but with the SAME order both engines
    produce the same double."""
    py = ws[0] * xs[0]
    for j in range(1, 5):
        py = py + ws[j] * xs[j]
    expr = "(w0 * x0)"
    for j in range(1, 5):
        expr = f"({expr} + (w{j} * x{j}))"
    params = {f"w{j}": ws[j] for j in range(5)} | {f"x{j}": xs[j] for j in range(5)}
    dk = _duck1(expr, **params)
    assert _bits(py) == _bits(dk)


@settings(max_examples=80, deadline=None)
@given(
    n=st.integers(min_value=0, max_value=10_000_000_000),
    d=st.integers(min_value=1, max_value=10_000_000_000),
)
def test_psi_smoothed_share_identical(n, d):
    """floor(1000000.0 * (n+1) / (d+10)) -- score_drift_report's smoothed
    micro share: one exact int->double conversion hazard (n+1 beyond 2^53
    never occurs at these magnitudes), one correctly-rounded multiply, one
    correctly-rounded divide, floor. Both engines agree bitwise, so the
    BIGINT share is identical."""
    py = math.floor(1_000_000.0 * (n + 1) / (d + 10))
    con = duckdb.connect()
    dk = con.execute(
        "SELECT CAST(floor(1000000.0 * (CAST(? AS BIGINT) + 1)"
        " / (CAST(? AS BIGINT) + 10)) AS BIGINT)",
        [n, d],
    ).fetchone()[0]
    assert py == dk
