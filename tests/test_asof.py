"""Unit tests for the as-of join operator (union-tag + window implementation)."""

from __future__ import annotations

from datetime import datetime

import pyspark.sql.functions as F

from flink_cdc_fluss_quickstart_spark.operators import asof_join


def _ts(s: str) -> datetime:
    return datetime.fromisoformat(s)


def _frames(spark):
    left = spark.createDataFrame(
        [
            (1, "k1", _ts("2024-01-01T10:00:00"), "l-a"),
            (2, "k1", _ts("2024-01-01T12:00:00"), "l-b"),
            (3, "k2", _ts("2024-01-01T09:00:00"), "l-c"),  # before any right row
            (4, "k3", _ts("2024-01-01T09:00:00"), "l-d"),  # key with no right rows
        ],
        "lid long, k string, ts timestamp, lval string",
    )
    right = spark.createDataFrame(
        [
            (10, "k1", _ts("2024-01-01T09:30:00"), 1.0),
            (11, "k1", _ts("2024-01-01T11:00:00"), 2.0),
            (12, "k1", _ts("2024-01-01T12:00:00"), 3.0),  # exactly at left row 2
            (13, "k2", _ts("2024-01-01T10:00:00"), 4.0),
        ],
        "rid long, k string, rts timestamp, rval double",
    )
    return left, right


def test_asof_basic_and_nulls(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        right_cols=["rid", "rval"], right_order=("rid",),
    )
    got = {r["lid"]: (r["rid"], r["rval"]) for r in out.collect()}
    assert got == {
        1: (10, 1.0),   # most recent right row strictly before
        2: (12, 3.0),   # exact-timestamp right row visible by default
        3: (None, None),  # right rows exist for k2 but all later
        4: (None, None),  # no right rows for k3 at all
    }
    assert set(out.columns) == {"lid", "k", "ts", "lval", "rid", "rval"}
    assert out.count() == left.count()  # as-of never duplicates left rows


def test_asof_exact_match_excluded(spark):
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        right_cols=["rid"], allow_exact_matches=False,
    )
    got = {r["lid"]: r["rid"] for r in out.collect()}
    # left row 2 at 12:00 must now skip right row 12 (also 12:00) -> 11:00 row
    assert got[2] == 11
    assert got[1] == 10


def test_asof_tie_break_last_wins(spark):
    left = spark.createDataFrame(
        [(1, "k", _ts("2024-01-01T10:00:00"))], "lid long, k string, ts timestamp"
    )
    right = spark.createDataFrame(
        [
            (7, "k", _ts("2024-01-01T10:00:00")),
            (9, "k", _ts("2024-01-01T10:00:00")),
            (8, "k", _ts("2024-01-01T10:00:00")),
        ],
        "rid long, k string, rts timestamp",
    )
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts",
        right_cols=["rid"], right_order=("rid",),
    )
    assert out.collect()[0]["rid"] == 9  # max rid among equal-ts right rows


def test_asof_plan_is_single_shuffle(spark):
    """The operator must plan as union + one window (one Exchange on the key),
    never a broadcast-nested-loop / cartesian theta join."""
    left, right = _frames(spark)
    out = asof_join(
        left, right, on=["k"], left_ts="ts", right_ts="rts", right_cols=["rid"],
    )
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastNestedLoopJoin" not in plan
    assert "CartesianProduct" not in plan
    assert plan.count("Exchange hashpartitioning") <= 1


def test_null_right_timestamp_never_matches(spark):
    """A right row with a NULL timestamp can never be 'at or before' any left
    timestamp (the theta-join spelling r.ts <= l.ts is never true for NULL);
    the union-tag window must not hand it to left rows as a last-non-null
    fill -- the r8 review regression."""
    from datetime import datetime

    from flink_cdc_fluss_quickstart_spark.operators.asof import asof_join

    t = lambda h: datetime(2025, 6, 1, h)  # noqa: E731
    left = spark.createDataFrame([(1, t(9)), (1, t(12))], "k long, lts timestamp")
    right = spark.createDataFrame(
        [(1, None, "ghost"), (1, t(10), "real")],
        "k long, rts timestamp, payload string",
    )
    out = {
        r["lts"]: r["payload"]
        for r in asof_join(
            left, right, on=["k"], left_ts="lts", right_ts="rts",
            right_cols=["payload"],
        ).collect()
    }
    assert out[t(9)] is None      # nothing at or before 09:00
    assert out[t(12)] == "real"   # 10:00 row matches, NULL-ts row never does
