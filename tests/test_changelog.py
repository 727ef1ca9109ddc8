"""Unit tests for the changelog/PK-table operator core (SURVEY.md section 5
item 1/3): tiny in-memory changelogs with hand-computed expectations."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_cdc_fluss_quickstart_spark.operators.changelog import (
    apply_changelog,
    latest_by_key,
)


def _log(spark):
    # (op, seq, key, val): key 1 ends updated, key 2 ends deleted,
    # key 3 insert-only, key 4 deleted then re-inserted
    rows = [
        ("I", 1, 1, "a"),
        ("U", 2, 1, "b"),
        ("I", 1, 2, "x"),
        ("D", 2, 2, None),
        ("I", 5, 3, "z"),
        ("I", 1, 4, "p"),
        ("D", 2, 4, None),
        ("I", 3, 4, "q"),
    ]
    return spark.createDataFrame(rows, "op string, seq long, k long, v string")


def test_latest_by_key(spark):
    df = _log(spark)
    latest = latest_by_key(df, ["k"], ["seq"])
    got = {r["k"]: (r["op"], r["seq"]) for r in latest.collect()}
    assert got == {1: ("U", 2), 2: ("D", 2), 3: ("I", 5), 4: ("I", 3)}


def test_apply_changelog_upsert_and_delete(spark):
    df = _log(spark)
    snap = apply_changelog(df, ["k"], ["seq"])
    got = {r["k"]: r["v"] for r in snap.collect()}
    # key 2's final op is D -> gone; key 4 was re-inserted after delete
    assert got == {1: "b", 3: "z", 4: "q"}
    assert "op" not in snap.columns


def test_latest_by_key_tie_break(spark):
    rows = [("I", 1, 10, 1, "first"), ("U", 1, 11, 1, "second")]
    df = spark.createDataFrame(rows, "op string, seq long, sub long, k long, v string")
    latest = latest_by_key(df, ["k"], ["seq", "sub"])
    assert latest.collect()[0]["v"] == "second"


def test_changelog_aggregation_equals_snapshot_reaggregation(spark, sf_dir):
    """The A11 invariant: aggregating the applied snapshot == what Flink's
    retraction machinery would produce for the same changelog."""
    from flink_cdc_fluss_quickstart_spark.operators.changelog import (
        changelog_from_events,
    )
    from flink_cdc_fluss_quickstart_spark.tables import load_table

    ev = load_table(spark, sf_dir, "events")
    log = changelog_from_events(ev)
    snap = apply_changelog(log, ["user_id"], ["ts", "event_id"])
    total = snap.agg(F.count(F.lit(1)).alias("n")).collect()[0]["n"]
    # re-derive independently: users whose latest event is not an error
    manual = (
        ev.groupBy("user_id")
        .agg(F.max(F.struct("ts", "event_id", "event_type")).alias("last"))
        .filter(F.col("last.event_type") != "error")
        .count()
    )
    assert total == manual
