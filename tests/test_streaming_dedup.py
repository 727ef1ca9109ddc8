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


def test_streaming_minhash_index_matches_batch_pairs(spark, tmp_path):
    """The daily-ingest dedup loop run as a STREAM: each micro-batch's
    signatures probe the accumulated signature index (new side drives the
    band join -- index x index never re-joins), then append to it. Over any
    batch split, the union of per-batch emissions equals the full batch
    minhash_band_pairs of the whole corpus: every pair is found exactly when
    its later-arriving doc streams in."""
    import os

    import pandas as pd
    import pyspark.sql.functions as F

    from flink_cdc_fluss_quickstart_spark.functions import dedup

    base = "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10"
    rows1 = [(1, base), (2, base + " tail1"), (3, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10")]
    rows2 = [(11, base + " tail2"), (12, "y1 y2 y3 y4 y5 y6 y7 y8 y9 y10"),
             (13, rows1[2][1])]  # exact dup of doc 3, arriving a batch later
    src, ckpt, idx = (str(tmp_path / p) for p in ("src", "ckpt", "idx"))
    os.makedirs(src)
    for name, rows in (("e1", rows1), ("e2", rows2)):
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
            os.path.join(src, f"{name}.parquet"), index=False
        )

    emitted = []

    def fb(batch_df, batch_id):
        sig = dedup.minhash_signature(batch_df, "doc_id", "text")
        if os.path.exists(idx):
            both = sig.withColumn("__new", F.lit(True)).unionByName(
                spark.read.parquet(idx).withColumn("__new", F.lit(False))
            )
            pairs = dedup.minhash_band_pairs_against_index(
                both, "doc_id", dedup.BAND_COLS, F.col("__new")
            ).drop("__new")
        else:
            pairs = dedup.minhash_band_pairs(sig, "doc_id", dedup.BAND_COLS)
        emitted.extend((r["id_a"], r["id_b"]) for r in pairs.collect())
        sig.write.mode("append").parquet(idx)

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(fb)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "dedup stream did not drain"

    all_docs = spark.createDataFrame(rows1 + rows2, "doc_id bigint, text string")
    expected = {
        (r["id_a"], r["id_b"])
        for r in dedup.minhash_band_pairs(
            dedup.minhash_signature(all_docs, "doc_id", "text"),
            "doc_id",
            dedup.BAND_COLS,
        ).collect()
    }
    assert set(emitted) == expected
    assert len(emitted) == len(set(emitted))  # no pair emitted twice
    assert (3, 13) in expected  # the cross-batch duplicate was caught
