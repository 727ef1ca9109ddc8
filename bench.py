"""Benchmark runner: headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS].

Prints ONE JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec, ...}, "sf": ...}.
"""

from __future__ import annotations

import io
import json
import math
import os
import re
import sys
import time
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import pyspark.sql.functions as F  # noqa: E402

from flink_cdc_fluss_quickstart_spark.session import get_spark  # noqa: E402
from flink_cdc_fluss_quickstart_spark.plans.registry import all_specs  # noqa: E402

# headline set: the flagship + the heavy relational queries + the operator
# families (dedup / text / similarity / changelog / temporal / multimodal)
HEADLINE = (
    "revenue_analytics",
    "q1_pricing_summary",
    "q3_top_revenue_orders",
    "q17_below_avg_quantity_revenue",
    "q7_nation_trade_flows",
    "upsert_latest_snapshot",
    "event_time_tumbling_hourly",
    # r15 rotation: dedup_exact / simhash_neardup_pairs leave the head-50
    # at 14 stamps (so also the bench, per benched-implies-stamped); the
    # same families stay benched via line_dedup_text / minhash_lsh_pairs /
    # winnow_overlap_pairs, and the two rotate-ins below were timed FIRST
    # (--watch, BENCH_NOTES r15): bpe_token_stats 0.29 s,
    # ngram_containment_pairs 2.75 s medians at sf0.1.
    "bpe_token_stats",
    "minhash_lsh_pairs",
    "ngram_containment_pairs",
    "gopher_quality_flags",
    "leakage_safe_split_assign",
    "token_stats_by_lang",
    "decontamination_ngrams",
    "bloom_decontamination",
    "pack_efficiency_report",
    "betting_tickets_analytics",
    "rrf_hybrid_retrieval",
    "embedding_ivfpq_topk",
    "semantic_dedup_prune",
    "bigram_lm_surprisal",
    "winnow_overlap_pairs",
    "span_dedup_text",
    "countmin_heavy_hitters",
    "multimodal_phash_dedup_planted",
    "bpe_encode_tokens",
    "line_dedup_text",
    "range_join_price_bands",
    "multimodal_feature_extract",
    # r13 rotation wave: the six stalest tail TPC-H queries (in for the
    # r11-r12 double-stamped set-op/rollup family + rrf_hybrid_retrieval_ann
    # -- every benched name carries a driver correctness row)
    "q2_min_cost_supplier",
    "q4_priority_order_exists",
    "q14_promo_revenue_share",
    "q19_disjunctive_predicates",
    "q20_part_heavy_suppliers",
    "q22_idle_rich_customers",
    # r11 second wave: the trained discriminative quality scorer (GD rounds
    # dominate its cost -- benched for exactly that reason)
    "logreg_quality_score",
    # r14 rotation wave: q9/q18/q21 + logreg_holdout_eval +
    # tokenizer_fertility_by_lang leave the head-50 (so also the bench,
    # per the benched-implies-stamped invariant); five head names whose
    # cost profiles matter at 100 TB join in their place -- the drift PSI
    # monitor, the composed ANN recall audit, the day-2 PQ encode, the
    # global curriculum rank, and the running event-stats window.
    # (langid_multiclass was considered and rejected: its 10-round GD loop
    # reads 35 s at sf0.1 -- stage-overhead-bound, SCALE.md r12 -- which
    # would halve the signal-to-noise of the whole-bench comparison; its
    # scale story lives in its x100 SCALE.md decade instead.)
    "score_drift_report",
    "ann_recall_report_clustered",
    "pq_incremental_codes",
    "curriculum_order",
    "events_running_stats",
)


def streaming_envelope(spark, rows_per_sec: int = 100, run_secs: int = 25,
                       rows_per_batch: int | None = None) -> dict:
    """Sustained-rate run of the kinesis -> JSON decode -> watermark ->
    window -> update-sink path (the reference's streaming envelope is ~10
    events/s at <= 1 s freshness; this drives 10x that and reports p95
    micro-batch latency).

    Rate source -> synthesized JSON payload -> from_json decode -> 10 s
    tumbling window per event type, 1 s trigger, update mode. Latency is
    durationMs.triggerExecution from the query's progress events; the first
    3 batches are warmup (plan compile + state-store open) and excluded.

    rows_per_batch: bounded-batch ADMISSION (the maxOffsetsPerTrigger
    equivalent for the rate harness, via the rate-micro-batch source): each
    trigger admits exactly this many rows no matter how far arrival outruns
    consumption, so overload past the knee (~3M ev/s on local[32],
    BENCH_NOTES r9) degrades into throughput-bound BACKLOG -- reported as
    backlog_growth_per_sec against the modeled rows_per_sec arrival --
    instead of compounding per-batch latency into collapse. The repo's file
    sources carry the same knob natively (maxFilesPerTrigger,
    sources/osb.py changelog_stream).
    """
    import tempfile

    if rows_per_batch is None:
        src = (
            spark.readStream.format("rate")
            .option("rowsPerSecond", rows_per_sec)
            .load()
        )
    else:
        src = (
            spark.readStream.format("rate-micro-batch")
            .option("rowsPerBatch", rows_per_batch)
            .load()
        )
    events = (
        src
        .select(
            F.col("timestamp").alias("event_time"),
            F.concat(F.lit("type_"), (F.col("value") % 5).cast("string")).alias("event_type"),
            F.to_json(F.struct((F.col("value") % 100).alias("amount"))).alias("payload"),
        )
    )
    amount = F.from_json(F.col("payload"), "amount BIGINT")["amount"]
    windowed = (
        events.withWatermark("event_time", "5 seconds")
        .select("event_type", "event_time", amount.alias("amount"))
        .groupBy(F.window("event_time", "10 seconds").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("amount").alias("total_amount"))
    )
    # per-batch latency at this rate is dominated by state-store commits, one
    # per shuffle partition; 8 partitions bounds that fixed cost while still
    # spreading state (the partition count is baked into the checkpoint at
    # first batch, so this is a per-job sizing decision, exactly like
    # picking 'bucket.num' in the reference)
    prev_parts = spark.conf.get("spark.sql.shuffle.partitions")
    restored = False

    def _restore() -> None:
        # idempotent: also called right after start() so the window where a
        # co-running loader thread plans with 8 partitions stays minimal; the
        # outer finally guarantees it on any exception before that point
        nonlocal restored
        if not restored:
            spark.conf.set("spark.sql.shuffle.partitions", prev_parts)
            spark.sparkContext.setLocalProperty("spark.scheduler.pool", None)
            restored = True

    spark.conf.set("spark.sql.shuffle.partitions", "8")
    # run the stream's jobs in a dedicated FAIR pool (session.py sets
    # spark.scheduler.mode=FAIR): the micro-batch thread inherits this local
    # property, so trigger executions round-robin with -- instead of queueing
    # behind -- any co-running batch stages. This is what bounds the
    # concurrent-envelope p95; without it a single long batch stage holds all
    # executor threads for its full duration.
    spark.sparkContext.setLocalProperty("spark.scheduler.pool", "latency")
    # ignore_cleanup_errors: state-store maintenance threads can still be
    # compacting checkpoint files for a beat after q.stop() returns; a
    # cleanup race must not fail the bench run
    try:
        with tempfile.TemporaryDirectory(ignore_cleanup_errors=True) as ckpt:
            q = (
                windowed.writeStream.format("memory")
                .queryName("bench_envelope")
                .option("checkpointLocation", ckpt)
                .outputMode("update")
                .trigger(processingTime="1 second")
                .start()
            )
            _restore()
            try:
                time.sleep(run_secs)
                progress = [json.loads(p.json) for p in q.recentProgress]
            finally:
                q.stop()
                q.awaitTermination(30)
    finally:
        # a failed start() (bad checkpoint dir, source error) must not leave
        # the session stuck at 8 shuffle partitions in the latency pool
        _restore()
    measured = [p for p in progress if p.get("numInputRows", 0) > 0][3:]
    lat = sorted(
        p["durationMs"]["triggerExecution"] / 1000.0 for p in measured
    )
    if not lat:
        # a cold session can spend the whole (short) window on plan compile
        # + state-store open and measure zero post-warmup batches; the
        # degenerate return still honors the admission-mode contract
        # (rows_per_batch present whenever the caller set it) -- only the
        # wall-derived throughput numbers are unknowable
        out = {"events_per_sec": rows_per_sec, "batches": 0,
               "p95_batch_sec": None}
        if rows_per_batch is not None:
            out.update({"rows_per_batch": rows_per_batch,
                        "arrival_per_sec_modeled": rows_per_sec})
        return out
    # nearest-rank p95 = ceil(0.95*n)-1 (0-indexed); the previous
    # round(0.95*n) indexed past rank 95 -- at n<=20 it WAS the sample max,
    # so one GC-stalled trigger defined the whole headline reading
    p95 = lat[min(len(lat) - 1, max(0, math.ceil(0.95 * len(lat)) - 1))]
    out = {
        "events_per_sec": rows_per_sec,
        "batches": len(lat),
        "p50_batch_sec": round(lat[len(lat) // 2], 3),
        "p95_batch_sec": round(p95, 3),
        "max_batch_sec": round(lat[-1], 3),
    }
    if rows_per_batch is not None:
        # admission accounting over the measured window: throughput is
        # cap / mean-batch-wall (each trigger admits exactly the cap);
        # arrival beyond that accumulates as source-side backlog
        mean_wall = sum(lat) / len(lat)
        admitted = rows_per_batch / max(mean_wall, 1.0)  # 1 s trigger floor
        out.update({
            "rows_per_batch": rows_per_batch,
            "arrival_per_sec_modeled": rows_per_sec,
            "admitted_per_sec": round(admitted),
            "backlog_growth_per_sec": round(max(0.0, rows_per_sec - admitted)),
        })
    return out


def _timed(fn) -> float:
    t0 = time.time()
    fn()
    return time.time() - t0


def _calibrate(spark) -> float:
    """Fixed CPU-bound job (200M-row mod-sum), best of 3 -- the ambient-load
    floor both calibration readings measure, defined once."""
    return min(
        _timed(lambda: spark.range(200_000_000, numPartitions=32)
               .select(F.sum((F.col("id") % 97).cast("long"))).collect())
        for _ in range(3)
    )


def watch(names: list[str], n_runs: int = 5) -> None:
    """The BENCH_NOTES re-measure ritual as one command: run each named
    query n_runs times back-to-back on a warmed session, bracketed by
    calibration floors, and print per-query medians -- the floor-adjusted
    numbers the noise discipline wants before reading anything into a
    single-shot driver timing (same-binary runs swing +/-25-35% tracking
    the ambient floor).

    Usage: python bench.py --watch simhash_neardup_pairs [more...] [-n 5]
    """
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("bench-watch")
    spark.sparkContext.setLogLevel("ERROR")
    specs = all_specs()
    unknown = [n for n in names if n not in specs]
    if unknown:
        sys.exit(f"unknown queries: {unknown}")
    specs["q1_pricing_summary"].builder(spark, sf_dir).count()  # JVM warmup
    floor_before = _calibrate(spark)
    report = {}
    for name in names:
        runs = []
        for _ in range(n_runs):
            t = _timed(lambda: specs[name].builder(spark, sf_dir).count())
            runs.append(round(t, 3))
            spark.catalog.clearCache()
        srt = sorted(runs)
        mid = len(srt) // 2
        median = srt[mid] if len(srt) % 2 else round((srt[mid - 1] + srt[mid]) / 2, 3)
        report[name] = {
            "runs": runs,
            "median_sec": median,
            "min_sec": srt[0],
        }
        print(f"# watch {name}: runs={runs}", file=sys.stderr)
    floor_after = _calibrate(spark)
    print(json.dumps({
        "metric": "watch_requeries",
        "calibration_before_sec": round(floor_before, 3),
        "calibration_after_sec": round(floor_after, 3),
        "queries": report,
        "sf_dir": sf_dir,
    }))


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    specs = all_specs()
    timings: dict[str, float] = {}
    # warm the JVM + file listing once with the cheapest query, and the
    # Python daemon workers with a no-op mapInPandas (one-time session costs,
    # not per-query costs)
    specs["q1_pricing_summary"].builder(spark, sf_dir).count()
    spark.range(64, numPartitions=32).mapInPandas(
        lambda it: it, schema="id long"
    ).count()

    # machine-noise calibration: a fixed CPU-bound job, best of 3. Query
    # times are single-shot and share the host with whatever else runs on
    # it; this floor lets round-over-round comparisons normalize ambient
    # load (a calib 2x above typical means the whole run is inflated).
    calib = _calibrate(spark)
    print(f"# calibration (fixed 200M-row mod-sum): {calib:.3f}s", file=sys.stderr)

    # r16 (VERDICT r15 item 6): per-query {jobs, stages, tasks, plan_lines}
    # telemetry so plan-level movement is separable from wall-clock ambience
    # in the round-over-round record. STRICTLY additive: the timed region
    # (t0 .. count) is byte-identical to every prior round; the job-group
    # label is set before t0 and the counters are read after the timing is
    # captured. Emitted on stderr per query and as one extra stdout JSON
    # line (the final machine-read line is unchanged).
    telemetry: dict[str, dict] = {}
    tracker = spark.sparkContext.statusTracker()
    for name in HEADLINE:
        spec = specs[name]
        spark.sparkContext.setJobGroup(f"bench-{name}", name)
        t0 = time.time()
        df = spec.builder(spark, sf_dir)
        n = df.count()  # forces full execution; avoids driver-side collect cost
        timings[name] = round(time.time() - t0, 3)
        jobs = tracker.getJobIdsForGroup(f"bench-{name}")
        stages = tasks = 0
        for jid in jobs:
            jinfo = tracker.getJobInfo(jid)
            if jinfo is None:
                continue
            for sid in jinfo.stageIds:
                sinfo = tracker.getStageInfo(sid)
                if sinfo is not None:
                    stages += 1
                    tasks += sinfo.numTasks
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        telemetry[name] = {
            "jobs": len(jobs),
            "stages": stages,
            "tasks": tasks,
            "plan_lines": len(buf.getvalue().splitlines()),
        }
        spark.sparkContext.setLocalProperty("spark.jobGroup.id", None)
        print(
            f"# {name}: {timings[name]:.3f}s ({n} rows) "
            f"[jobs={telemetry[name]['jobs']} stages={stages} tasks={tasks} "
            f"plan_lines={telemetry[name]['plan_lines']}]",
            file=sys.stderr,
        )
        # drop intra-query persists AFTER the timing so per-query numbers
        # stay independent and later queries don't inherit cache pressure
        spark.catalog.clearCache()
    # full-fidelity telemetry line (the driver machine-reads only the FINAL
    # line; the streaming blocks established this extra-line pattern)
    print(json.dumps({"metric": "bench_telemetry", "queries": telemetry},
                     separators=(",", ":")))

    # second calibration reading right before the envelopes: ambient host
    # load can differ between the batch phase and the streaming phase, and
    # envelope p95 is the number most sensitive to it
    calib_streaming = _calibrate(spark)
    print(f"# calibration before envelopes: {calib_streaming:.3f}s", file=sys.stderr)

    # The envelope is measured twice because micro-batch latency is sensitive
    # to co-running batch load (executor threads are shared in local mode,
    # exactly as executor slots are shared on a cluster): once isolated --
    # the engine's intrinsic envelope -- and once with a continuous batch
    # aggregation looping on the same session, the worst-case a mixed
    # batch+streaming deployment sees.
    # 45 s for the same reason as the concurrent block below: at ~20
    # batches nearest-rank p95 IS the worst-or-second-worst single batch,
    # so one GC/RocksDB-maintenance stall colors the whole record (r12:
    # driver single-shot read 1.117 s while the 5-run calm-floor ritual
    # median was 0.577 s -- BENCH_NOTES r13); ~38 batches absorbs it
    envelope = streaming_envelope(spark, run_secs=45)
    print(f"# streaming_envelope (isolated): {envelope}", file=sys.stderr)

    import threading

    stop = threading.Event()

    def batch_load() -> None:
        while not stop.is_set():
            specs["q5_region_revenue"].builder(spark, sf_dir).count()

    # caveat: streaming_envelope briefly toggles the session-global
    # spark.sql.shuffle.partitions while the loader thread plans queries on
    # the same session; a loader iteration planned in that window runs with 8
    # partitions. That only perturbs the load generator (acceptable), never
    # the envelope measurement itself.
    # 45 s run (~38 measured batches): at ~20 batches nearest-rank p95 is
    # the second-highest sample, so one trigger that lands behind a q5 stage
    # burst still colors the reading; ~38 batches puts p95 below the top two
    loader = threading.Thread(target=batch_load, daemon=True)
    loader.start()
    try:
        envelope_concurrent = streaming_envelope(spark, run_secs=45)
    finally:
        stop.set()
        # the loop exits after its in-flight q5 iteration, which must finish
        # before the isolated headroom probe below starts or it pollutes the
        # measurement; a generous bound (vs unbounded join) keeps a wedged
        # Spark job from hanging the whole bench with no JSON emitted
        loader.join(timeout=300)
        if loader.is_alive():
            print("# WARNING: batch loader still running after 300s; "
                  "headroom envelope may be polluted", file=sys.stderr)
    envelope_concurrent["batch_load"] = "q5_region_revenue loop"
    print(f"# streaming_envelope (concurrent): {envelope_concurrent}", file=sys.stderr)

    # headroom probe: 1000x the reference's ~10 ev/s recordable envelope
    # (isolated; documents how far the same pipeline is from saturating --
    # micro-batch cost is state-commit dominated, so rate barely moves it
    # until the millions: the r9 knee sweep in BENCH_NOTES.md measured p95
    # crossing 1 s at ~3,000,000 ev/s and collapse at 4M)
    envelope_headroom = streaming_envelope(spark, rows_per_sec=10_000)
    print(f"# streaming_envelope (10000 ev/s): {envelope_headroom}", file=sys.stderr)

    # overload-with-admission probe (r9 verdict item 2): 2x the measured
    # knee (~3M ev/s, BENCH_NOTES r9) of modeled arrival under a 1M-rows-
    # per-trigger admission cap. Uncapped, 4M ev/s compounded p95 to 3.0 s
    # and 16M collapsed to zero completed batches; capped, p95 stays at the
    # ~1M-row batch cost (~0.5 s, knee table) and the overload surfaces as
    # backlog_growth_per_sec instead of latency growth.
    envelope_overload = streaming_envelope(
        spark, rows_per_sec=6_000_000, rows_per_batch=1_000_000, run_secs=25
    )
    print(f"# streaming_envelope (6M ev/s arrival, 1M/batch admission cap):"
          f" {envelope_overload}", file=sys.stderr)

    # The driver records only the last ~2000 chars of stdout and parses the
    # final JSON line (r10's single fat line outgrew that window and the
    # official record lost its headline -- VERDICT r10 item 1). So: each
    # streaming block gets its OWN stdout JSON line first, full fidelity,
    # and the final machine-read line stays compact -- per-query timings
    # plus scalar streaming summaries only, compact separators, with a hard
    # length guard that sheds optional keys before it ever overflows again.
    for key, block in (
        ("streaming_isolated", envelope),
        ("streaming_concurrent", envelope_concurrent),
        ("streaming_headroom", envelope_headroom),
        ("streaming_overload_capped", envelope_overload),
    ):
        print(json.dumps({"metric": key, **block}, separators=(",", ":")))

    total = round(sum(timings.values()), 3)
    headline = {
        "metric": "headline_queries_total_runtime",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "streaming_p95": {
            "isolated": envelope.get("p95_batch_sec"),
            "concurrent": envelope_concurrent.get("p95_batch_sec"),
            "headroom_10k": envelope_headroom.get("p95_batch_sec"),
            "overload_capped": envelope_overload.get("p95_batch_sec"),
            "overload_backlog_per_sec": envelope_overload.get(
                "backlog_growth_per_sec"),
        },
        "calibration_sec": round(calib, 3),
        "calibration_before_streaming_sec": round(calib_streaming, 3),
        # compact plan-size scalars for the driver's capture window (the
        # per-query breakdown rides the bench_telemetry line above): total
        # formatted-explain lines and total jobs across the headline set --
        # plan/job movement round-over-round, ambience-immune
        "plan_lines_total": sum(t["plan_lines"] for t in telemetry.values()),
        "jobs_total": sum(t["jobs"] for t in telemetry.values()),
        "sf": sf,
    }
    line = json.dumps(headline, separators=(",", ":"))
    # shed detail rather than overflow the driver's capture window; the
    # streaming detail already went out on its own lines above
    for drop in ("plan_lines_total", "jobs_total", "streaming_p95",
                 "calibration_before_streaming_sec"):
        if len(line) <= 1800:
            break
        headline.pop(drop, None)
        line = json.dumps(headline, separators=(",", ":"))
    print(line)


if __name__ == "__main__":
    if "--watch" in sys.argv:
        args = sys.argv[sys.argv.index("--watch") + 1 :]
        n_runs = 5
        if "-n" in args:
            k = args.index("-n")
            n_runs = int(args[k + 1])
            args = args[:k] + args[k + 2 :]
        if not args:
            sys.exit("usage: python bench.py --watch QUERY [QUERY...] [-n RUNS]")
        watch(args, n_runs)
    else:
        main()
