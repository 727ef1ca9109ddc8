"""The reference's kinesis -> event-time window -> sink path as a REAL
Structured Streaming job (S5 + W2 + T1 together): JSON events replayed as a
file stream, watermarked tumbling-window aggregation, append-mode sink once
the watermark passes, checked against the batch twin of the same window.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_cdc_fluss_quickstart_spark.sources import betting


def test_streaming_tumbling_window_matches_batch(spark, tmp_path):
    dirs = betting.generate_betting_workload(str(tmp_path / "wl"), epochs=6, seed=7)

    stream = (
        spark.readStream.schema(betting.KINESIS_EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["events"])
        .withColumn("event_time", F.col("event_time").cast("timestamp"))
        .withWatermark("event_time", "5 seconds")
    )
    # payload decode (the kinesis 'format'='json' step) + tumbling window
    amount = F.from_json(F.col("payload"), "amount BIGINT")["amount"]
    windowed = (
        stream.select("event_type", "event_time", amount.alias("amount"))
        .groupBy(F.window("event_time", "1 minute").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.sum("amount").alias("total_amount"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_amount")
    )
    out_dir = str(tmp_path / "out")
    q = (
        windowed.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    got = spark.read.parquet(out_dir)

    # batch twin over the same files; append mode only emits windows the
    # watermark has CLOSED, so compare on the emitted windows only
    batch = (
        spark.read.schema(betting.KINESIS_EVENTS_SCHEMA)
        .parquet(dirs["events"])
        .withColumn("event_time", F.col("event_time").cast("timestamp"))
        .select(
            "event_type",
            "event_time",
            F.from_json(F.col("payload"), "amount BIGINT")["amount"].alias("amount"),
        )
        .groupBy(F.window("event_time", "1 minute").alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("amount").alias("total_amount"))
        .select(F.col("w.start").alias("window_start"), "event_type", "n_events", "total_amount")
    )
    got_rows = {tuple(r) for r in got.collect()}
    batch_rows = {tuple(r) for r in batch.collect()}
    assert len(got_rows) > 0
    # every emitted window agrees exactly with the batch computation
    assert got_rows <= batch_rows
    # all but the final (still-open at end-of-stream) windows were emitted
    assert len(got_rows) >= len(batch_rows) - 2
