"""Streaming exact-dedup across micro-batches: Spark's built-in
dropDuplicates keeps seen keys in the state store, so re-deliveries in later
batches are dropped -- the streaming twin of the batch dedup_exact operator
(at-least-once sources -> effectively-once rows downstream)."""

from __future__ import annotations

import os


def _write(d, name, rows):
    import pandas as pd

    pd.DataFrame(rows, columns=["event_id", "payload"]).to_parquet(
        os.path.join(d, f"{name}.parquet"), index=False
    )


def test_drop_duplicates_across_microbatches(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    _write(src, "e1", [(1, "a"), (2, "b")])
    _write(src, "e2", [(2, "b-redelivered"), (3, "c")])  # 2 is a duplicate

    stream = (
        spark.readStream.schema("event_id long, payload string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    emitted = []

    def fb(batch_df, batch_id):
        emitted.extend((r["event_id"], r["payload"]) for r in batch_df.collect())

    q = (
        stream.dropDuplicates(["event_id"])
        .writeStream.foreachBatch(fb)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    assert sorted(emitted) == [(1, "a"), (2, "b"), (3, "c")]  # first wins


def test_countmin_cells_as_streaming_state(spark, tmp_path):
    """The Count-Min grid is maintained as a STREAMING aggregation: the
    sketch state is bounded (<= depth*width rows) forever, and after
    draining an out-of-order two-batch stream the grid equals the batch
    sketch of the union -- the mergeable-monitor claim, measured."""
    import os

    import pandas as pd
    import pyspark.sql.functions as F

    from flink_cdc_fluss_quickstart_spark.plans import text_queries as tq

    rows1 = [(i, f"tok{i % 7} filler{i}") for i in range(40)]
    rows2 = [(100 + i, f"tok{i % 7} other{i}") for i in range(40)]
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    for name, rows in (("b1", rows1), ("b2", rows2)):
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
            os.path.join(src, f"{name}.parquet"), index=False
        )

    depth, width = 4, 32
    occ_of = lambda df: df.select(F.explode(F.split("text", " ")).alias("tok"))  # noqa: E731

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        tq.cm_cells_frame(occ_of(stream), "tok", depth, width)
        .writeStream.format("memory")
        .queryName("cm_cells_stream")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    streamed = {
        (r["r"], r["c"]): r["cnt"] for r in spark.sql("SELECT * FROM cm_cells_stream").collect()
    }
    batch = spark.createDataFrame(rows1 + rows2, "doc_id long, text string")
    expected = {
        (r["r"], r["c"]): r["cnt"]
        for r in tq.cm_cells_frame(occ_of(batch), "tok", depth, width).collect()
    }
    assert streamed == expected
    assert len(streamed) <= depth * width  # bounded state, by construction
