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
