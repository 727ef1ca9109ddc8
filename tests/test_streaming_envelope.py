"""Streaming envelope check (BASELINE.md): the reference's workload is ~10
events/s with a 1 s update-latency target; the engine must sustain at least
that. Each micro-batch here carries one epoch (>= the reference's per-second
event volume), so per-batch processing time is the end-to-end update latency.
"""

from __future__ import annotations

import statistics

from flink_cdc_fluss_quickstart_spark.sources import osb
from flink_cdc_fluss_quickstart_spark.streaming.cdc_pipeline import replicate
from flink_cdc_fluss_quickstart_spark.streaming.pk_table import PKTable

# generous CI margin over the 1 s target: local[32] shares one JVM with the
# whole test session; the reference envelope check is the MEDIAN, and a 3x
# margin still catches an O(n) regression in the merge path
LATENCY_BUDGET_MS = 3000


def test_cdc_merge_latency_within_envelope(spark, tmp_path):
    dirs = osb.generate_workload(
        str(tmp_path / "wl"), epochs=8, seed=7, tickets_per_epoch=20, updates_per_epoch=10
    )
    tickets = PKTable(
        spark, str(tmp_path / "tickets"), keys=["ticket_id"], order_by=["seq"]
    )
    q = replicate(
        osb.changelog_stream(spark, dirs["tickets"], osb.TICKETS_SCHEMA),
        tickets,
        str(tmp_path / "ckpt"),
        watermark=("purchased_at", "3 seconds"),
    )
    q.awaitTermination(240)

    progress = q.recentProgress
    batches = [p for p in progress if p["numInputRows"] > 0]
    assert len(batches) >= 6  # one micro-batch per epoch file
    durations = [p["durationMs"]["triggerExecution"] for p in batches[1:]]  # skip cold batch
    med = statistics.median(durations)
    assert med <= LATENCY_BUDGET_MS, f"median micro-batch {med}ms > {LATENCY_BUDGET_MS}ms"

    # the reference's rate is ~10 events/s; each 1 s-equivalent batch carried
    # 30 events, so sustained throughput clears the envelope when the median
    # batch completes within the trigger interval
    rows = sum(p["numInputRows"] for p in batches)
    assert rows >= 8 * 30  # inserts + updates all arrived
    assert tickets.snapshot().count() > 0


def test_replicate_strips_before_image_and_respects_target_ordering(spark, tmp_path):
    """Two replicate() contracts from the r8 review: (a) with no projection
    requested the CDC before-image envelope must NOT reach the staging
    snapshot (after-image payload columns only); (b) the force-kept merge
    columns come from the TARGET's order_by, not a hardcoded 'seq'."""
    dirs = osb.generate_workload(str(tmp_path / "wl"), epochs=2, seed=7)
    tickets = PKTable(
        spark, str(tmp_path / "tickets"), keys=["ticket_id"], order_by=["seq"]
    )
    q = replicate(
        osb.changelog_stream(spark, dirs["tickets"], osb.TICKETS_SCHEMA),
        tickets,
        str(tmp_path / "ckpt"),
    )
    assert q.awaitTermination(240), "replication did not drain"
    snap = tickets.snapshot()
    assert "before" not in snap.columns
    assert snap.count() > 0

    # (b): a target ordered by a non-'seq' column keeps that column through
    # the select_cols projection (a hardcoded 'seq' would drop it and kill
    # the first merge with an unresolved column)
    import pandas as pd

    src = tmp_path / "src2"
    src.mkdir()
    pd.DataFrame(
        [("I", 1, 10, "a"), ("U", 2, 10, "b")], columns=["op", "ts", "k", "v"]
    ).to_parquet(str(src / "e0.parquet"), index=False)
    target = PKTable(spark, str(tmp_path / "t2"), keys=["k"], order_by=["ts"])
    q2 = replicate(
        spark.readStream.schema("op string, ts long, k long, v string").parquet(str(src)),
        target,
        str(tmp_path / "ckpt2"),
        select_cols=["k", "v"],
    )
    assert q2.awaitTermination(240), "custom-order replication did not drain"
    got = {r["k"]: r["v"] for r in target.snapshot().collect()}
    assert got == {10: "b"}  # ordered by ts, latest row wins
