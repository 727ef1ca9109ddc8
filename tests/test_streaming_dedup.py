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
