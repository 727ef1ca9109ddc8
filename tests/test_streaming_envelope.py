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


def test_rate_admission_cap_bounds_every_batch(spark):
    """Bounded-batch admission (the maxOffsetsPerTrigger equivalent for the
    rate harness): with a rows-per-trigger cap, NO micro-batch ever admits
    more than the cap regardless of how far modeled arrival outruns
    consumption -- overload becomes backlog, never unbounded batches (r9
    verdict: past the ~3M ev/s knee the uncapped pipeline compounded
    latency to collapse)."""
    import tempfile
    import time

    import pyspark.sql.functions as F

    cap = 500
    src = (
        spark.readStream.format("rate-micro-batch")
        .option("rowsPerBatch", cap)
        .load()
        .groupBy((F.col("value") % 5).alias("k"))
        .agg(F.count(F.lit(1)).alias("n"))
    )
    with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as ckpt:
        q = (
            src.writeStream.format("memory")
            .queryName("admission_cap_probe")
            .option("checkpointLocation", ckpt)
            .outputMode("update")
            .trigger(processingTime="1 second")
            .start()
        )
        try:
            deadline = time.time() + 30
            while time.time() < deadline:
                sizes = [
                    p["numInputRows"] for p in q.recentProgress
                    if p["numInputRows"] > 0
                ]
                if len(sizes) >= 4:
                    break
                time.sleep(1)
        finally:
            q.stop()
            q.awaitTermination(30)
    assert len(sizes) >= 4, "admission probe produced too few batches"
    assert max(sizes) <= cap, f"a batch exceeded the admission cap: {sizes}"
    assert all(s == cap for s in sizes), sizes  # exactly cap rows per trigger


def test_bench_overload_envelope_reports_backlog_not_latency(spark):
    """The bench's capped overload block: modeled arrival far above the cap
    must surface as positive backlog growth with a bounded (trigger-sized)
    p95 -- the graceful-degradation contract. Tiny rates keep this CI-fast;
    the 2x-knee numbers live in the per-round bench JSON."""
    import bench

    out = bench.streaming_envelope(
        spark, rows_per_sec=100_000, run_secs=10, rows_per_batch=200
    )
    if out["batches"] == 0:
        # cold-session startup (plan compile + state-store open) can eat
        # the whole 10 s window before 4 non-empty batches exist; the
        # first call warmed exactly that path, so one re-measure is
        # deterministic (seen once in the r15 full-suite run)
        out = bench.streaming_envelope(
            spark, rows_per_sec=100_000, run_secs=10, rows_per_batch=200
        )
    assert out["rows_per_batch"] == 200
    assert out["batches"] >= 1
    assert out["p95_batch_sec"] < LATENCY_BUDGET_MS / 1000.0
    # arrival is modeled at 100k/s but at most 200 rows admit per ~1 s
    # trigger, so backlog must grow at (nearly) the arrival rate
    assert out["admitted_per_sec"] <= 200
    assert out["backlog_growth_per_sec"] >= 99_000


def test_file_source_admission_bounds_batches(spark, tmp_path):
    """The repo's own streaming sources carry the same admission knob
    natively: files_per_trigger bounds how much of a deep file backlog one
    trigger may consume, so a restart against accumulated epochs drains as
    N bounded batches, not one giant one."""
    dirs = osb.generate_workload(
        str(tmp_path / "wl"), epochs=6, seed=3, tickets_per_epoch=10,
        updates_per_epoch=5,
    )
    tickets = PKTable(
        spark, str(tmp_path / "tickets"), keys=["ticket_id"], order_by=["seq"]
    )
    q = replicate(
        osb.changelog_stream(spark, dirs["tickets"], osb.TICKETS_SCHEMA,
                             files_per_trigger=2),
        tickets,
        str(tmp_path / "ckpt"),
    )
    q.awaitTermination(240)
    batches = [p for p in q.recentProgress if p["numInputRows"] > 0]
    # 6 epoch files at 2 per trigger: exactly 3 bounded batches, and no
    # batch swallowed more than its 2-file admission
    assert len(batches) == 3
    per_epoch_max = max(p["numInputRows"] for p in batches) / 2
    assert all(p["numInputRows"] <= 2 * per_epoch_max for p in batches)
    assert tickets.snapshot().count() > 0
