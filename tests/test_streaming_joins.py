"""Stream-stream interval join end-to-end: ticket_created kinesis events
joined to their settle UPDATE from the cdc_tickets changelog within a bounded
event-time interval, replayed as two file streams, checked against the batch
twin of the identical join (SURVEY.md section 2.4 / 2.7: two-sided streaming
join with bounded state)."""

from __future__ import annotations

import pyspark.sql.functions as F

from flink_cdc_fluss_quickstart_spark.sources import betting
from flink_cdc_fluss_quickstart_spark.streaming.joins import interval_join

SETTLED = list(betting.SETTLE)


def _created(df):
    tid = F.from_json(F.col("payload"), "ticket_id STRING")["ticket_id"]
    return df.filter(F.col("event_type") == "ticket_created").select(
        tid.alias("ticket_id"),
        F.col("event_time").cast("timestamp").alias("created_time"),
    )


def _settled(df):
    return (
        df.filter(
            (F.col("op") == "U")
            & F.col("status").isin(SETTLED)
            & F.col("deleted_at").isNull()
        )
        .select(
            F.col("id").alias("settle_id"),
            "status",
            F.col("status_updated_at").cast("timestamp").alias("settle_time"),
        )
    )


def test_interval_join_stream_matches_batch(spark, tmp_path):
    dirs = betting.generate_betting_workload(str(tmp_path / "wl"), epochs=5, seed=11)

    # both schemas already carry the changelog envelope (op, seq) via _env
    ev_schema = betting.KINESIS_EVENTS_SCHEMA
    tk_schema = betting.BETTING_TICKETS_SCHEMA

    created_s = _created(
        spark.readStream.schema(ev_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["events"])
    )
    settled_s = _settled(
        spark.readStream.schema(tk_schema)
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["tickets"])
    )
    joined = interval_join(
        created_s, settled_s,
        left_key="ticket_id", right_key="settle_id",
        left_time="created_time", right_time="settle_time",
        upper_bound="2 hours",
    ).select("ticket_id", "status", "created_time", "settle_time")

    out_dir = str(tmp_path / "out")
    q = (
        joined.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)
    got = {tuple(r) for r in spark.read.parquet(out_dir).collect()}

    created_b = _created(spark.read.schema(ev_schema).parquet(dirs["events"]))
    settled_b = _settled(spark.read.schema(tk_schema).parquet(dirs["tickets"]))
    want = {
        tuple(r)
        for r in interval_join(
            created_b, settled_b,
            left_key="ticket_id", right_key="settle_id",
            left_time="created_time", right_time="settle_time",
            upper_bound="2 hours",
        ).select("ticket_id", "status", "created_time", "settle_time").collect()
    }

    assert len(want) > 0
    assert got == want


def test_drop_duplicates_within_watermark(spark, tmp_path):
    """Built-in streaming dedup: replayed files carry duplicate event_ids
    (at-least-once delivery); dropDuplicatesWithinWatermark keeps exactly one
    per id while the watermark bounds the dedup state."""
    import shutil

    dirs = betting.generate_betting_workload(str(tmp_path / "wl"), epochs=3, seed=5)
    # duplicate one input file wholesale -- an at-least-once redelivery
    files = sorted(
        f for f in __import__("os").listdir(dirs["events"]) if f.endswith(".parquet")
    )
    src = f"{dirs['events']}/{files[0]}"
    shutil.copy(src, src.replace(".parquet", "-redelivered.parquet"))

    stream = (
        spark.readStream.schema(betting.KINESIS_EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(dirs["events"])
        .withColumn("event_time", F.col("event_time").cast("timestamp"))
        .withWatermark("event_time", "10 minutes")
        .dropDuplicatesWithinWatermark(["event_id"])
    )
    out_dir = str(tmp_path / "out")
    q = (
        stream.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(240)

    got = spark.read.parquet(out_dir)
    n_distinct = (
        spark.read.schema(betting.KINESIS_EVENTS_SCHEMA)
        .parquet(dirs["events"])
        .select("event_id").distinct().count()
    )
    assert got.count() == n_distinct
    assert got.select("event_id").distinct().count() == n_distinct
