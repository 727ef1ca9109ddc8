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


def test_streaming_span_dedup_matches_batch_of_union(spark, tmp_path):
    """The daily-ingest span-dedup loop run as a STREAM (the
    minhash-incremental precedent applied to span dedup): each micro-batch
    rewrites its documents against the accumulated gram census
    (plans.text_queries.span_dedup_step), then appends its distinct grams.
    Over an ascending-doc_id batch split, the union of per-batch rebuilt
    rows must equal the one-shot span_dedup_frame of the whole corpus --
    the global min-code keeper is always the earliest ingest's occurrence,
    so cross-batch repeats are removed from the later doc and batch-internal
    repeats from all but the batch keeper, exactly as the batch rule does."""
    import os

    import pandas as pd

    from flink_cdc_fluss_quickstart_spark.functions import dedup
    from flink_cdc_fluss_quickstart_spark.plans import text_queries as tq

    span = " ".join(f"s{i}" for i in range(tq.SPAN_K))          # shared 8-gram
    span2 = " ".join(f"z{i}" for i in range(tq.SPAN_K))         # intra-batch repeat
    uniq = lambda p, n: " ".join(f"{p}{i}" for i in range(n))   # noqa: E731
    rows1 = [
        (1, span + " " + uniq("a", 8)),                # keeper of `span`
        (2, uniq("b", 8) + " " + span),                # same-batch repeat -> removed
        (3, uniq("c", 16)),                            # clean doc
    ]
    rows2 = [
        (11, span + " " + uniq("d", 8)),               # cross-batch repeat -> removed
        (12, span2 + " " + uniq("e", 8)),              # keeper of `span2`
        (13, uniq("f", 8) + " " + span2),              # same-batch repeat -> removed
    ]
    rows3 = [
        (21, uniq("g", 4) + " " + span2 + " " + span), # repeats from both batches
        (22, uniq("h", 16)),                           # clean doc
    ]
    src, ckpt, census = (str(tmp_path / p) for p in ("src", "ckpt", "census"))
    os.makedirs(src)
    for name, rows in (("e1", rows1), ("e2", rows2), ("e3", rows3)):
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
            os.path.join(src, f"{name}.parquet"), index=False
        )

    emitted = {}

    def fb(batch_df, batch_id):
        idx = spark.read.parquet(census) if os.path.exists(census) else None
        rebuilt, ghs = tq.span_dedup_step(batch_df, idx)
        emitted.update({r["doc_id"]: r.asDict() for r in rebuilt.collect()})
        ghs.write.mode("append").parquet(census)
        # the step's cache contract: both outputs are materialized above, so
        # release the batch's persisted gram frame before the next trigger
        dedup.release_caches()

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(fb)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "span dedup stream did not drain"

    all_docs = spark.createDataFrame(
        rows1 + rows2 + rows3, "doc_id bigint, text string"
    )
    expected = {r["doc_id"]: r.asDict() for r in tq.span_dedup_frame(all_docs).collect()}
    assert emitted == expected
    # spot-check the planted semantics actually fired
    assert emitted[1]["n_removed"] == 0          # keeper survives intact
    assert emitted[2]["n_removed"] == tq.SPAN_K  # batch-internal repeat removed
    assert emitted[11]["n_removed"] == tq.SPAN_K # cross-batch repeat removed
    assert emitted[21]["n_removed"] == 2 * tq.SPAN_K  # both spans removed
    assert emitted[22]["n_removed"] == 0


def test_quantile_hist_as_streaming_state(spark, tmp_path):
    """The quantile sketch's (lang, bin) log-histogram is maintained as a
    STREAMING aggregation: state is bounded (<= langs x 64 BIGINT cells)
    forever, and after draining an out-of-order two-batch stream the grid
    equals the batch histogram of the union -- same mergeable-monitor claim
    the Count-Min grid test measures, applied to distributions."""
    import os

    import pandas as pd

    from flink_cdc_fluss_quickstart_spark.plans import pipeline_queries as pq

    def doc(i, lang, n):
        return (i, " ".join(f"w{j}" for j in range(n)), lang)

    rows1 = [doc(1, "a", 4), doc(2, "a", 7), doc(3, "b", 33)]
    rows2 = [doc(11, "a", 5), doc(12, "b", 1), doc(13, "b", 260)]
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    for name, rows in (("b1", rows1), ("b2", rows2)):
        pd.DataFrame(rows, columns=["doc_id", "text", "lang"]).to_parquet(
            os.path.join(src, f"{name}.parquet"), index=False
        )

    stream = (
        spark.readStream.schema("doc_id long, text string, lang string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        pq.qsketch_hist_frame(pq.qsketch_tokens_frame(stream))
        .writeStream.format("memory")
        .queryName("qsketch_hist_stream")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(120), "histogram stream did not drain"

    streamed = {
        (r["lang"], r["b"]): r["c"]
        for r in spark.sql("SELECT * FROM qsketch_hist_stream").collect()
    }
    batch = spark.createDataFrame(
        rows1 + rows2, "doc_id long, text string, lang string"
    )
    expected = {
        (r["lang"], r["b"]): r["c"]
        for r in pq.qsketch_hist_frame(pq.qsketch_tokens_frame(batch)).collect()
    }
    assert streamed == expected
    # planted bins: 4,5,7 -> b=2; 33 -> b=5; 1 -> b=0; 260 -> b=8
    assert expected == {("a", 2): 3, ("b", 5): 1, ("b", 0): 1, ("b", 8): 1}
    assert len(streamed) <= 2 * 64  # bounded state, by construction


def test_streaming_line_dedup_census_learns_boilerplate(spark, tmp_path):
    """The daily-ingest line-dedup loop run as a STREAM (the span-dedup
    precedent at line granularity): each micro-batch rewrites its documents
    against the accumulated line census (plans.text_queries.line_dedup_step),
    then appends its batch census. The incremental contract: a line is
    dropped as soon as census-so-far + batch occurrences exceed the C4
    max-frequency -- boilerplate learned in earlier ingests is removed from
    every later batch, unique lines always survive, and a single batch over
    an empty census reproduces the one-shot rule exactly."""
    import os

    import pandas as pd

    from flink_cdc_fluss_quickstart_spark.functions import dedup
    from flink_cdc_fluss_quickstart_spark.plans import text_queries as tq

    assert tq.LINE_DEDUP_MAX == 2  # fixture arithmetic below assumes 2
    boiler = "SUBSCRIBE NOW"
    rows1 = [
        (1, f"{boiler}\nalpha one\nbeta two"),     # 1st + 2nd corpus copies of
        (2, f"gamma three\n{boiler}"),             #   the boilerplate: both KEPT
        (3, "delta four\nepsilon five"),
    ]
    rows2 = [
        (11, f"{boiler}\nzeta six"),               # census already at 2 -> dropped
        (12, "eta seven\neta seven\neta seven"),   # batch-internal x3 -> dropped
    ]
    rows3 = [
        (21, f"theta eight\n{boiler}\niota nine"), # still dropped in batch 3
    ]
    src, ckpt, census = (str(tmp_path / p) for p in ("src", "ckpt", "census"))
    os.makedirs(src)
    for name, rows in (("e1", rows1), ("e2", rows2), ("e3", rows3)):
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
            os.path.join(src, f"{name}.parquet"), index=False
        )

    emitted = {}

    def fb(batch_df, batch_id):
        idx = spark.read.parquet(census) if os.path.exists(census) else None
        rebuilt, bc = tq.line_dedup_step(batch_df, idx)
        emitted.update({r["doc_id"]: r.asDict() for r in rebuilt.collect()})
        bc.write.mode("append").parquet(census)
        dedup.release_caches()  # the step's cache contract

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(fb)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "line dedup stream did not drain"

    # batch 1 over an empty census == the one-shot rule on batch 1
    b1 = spark.createDataFrame(rows1, "doc_id bigint, text string")
    one_shot = {r["doc_id"]: r.asDict() for r in tq.line_dedup_frame(b1).collect()}
    assert {k: emitted[k] for k in (1, 2, 3)} == one_shot
    assert emitted[1]["text_dedup"] == f"{boiler}\nalpha one\nbeta two"  # kept at n=2
    # later ingests: the census has learned the boilerplate
    assert emitted[11]["text_dedup"] == "zeta six"
    assert emitted[21]["text_dedup"] == "theta eight\niota nine"
    # batch-internal over-frequency drops every occurrence: doc 12 vanishes
    assert 12 not in emitted


def test_hashed_langid_trained_model_scores_stream_like_batch(spark, tmp_path):
    """Model serving: fit the hashed-gram langid classifier ONCE on the
    reference corpus (batch), then score arriving docs per micro-batch with
    the broadcast (weights, hot-gram) state. Per-doc scoring is row-local
    given the trained state -- no cross-doc coupling -- so streaming scores
    must equal the batch scoring of the union regardless of how the stream
    is batched, and the trained boundary transfers to unseen docs built
    from the same marker pools."""
    import os

    import pandas as pd

    from flink_cdc_fluss_quickstart_spark.plans import text_queries as tq

    train = []
    for i in range(20):
        mk = [f"enmark{(i + k) % 10}" for k in range(3)]
        train.append((i, " ".join(["filler common soup word"] * 3 + mk * 4), "en"))
    for i in range(20, 40):
        mk = [f"demark{(i + k) % 10}" for k in range(3)]
        train.append((i, " ".join(["filler common soup word"] * 3 + mk * 4), "de"))
    d = spark.createDataFrame(train, "doc_id bigint, text string, lang string")
    weights, hot = tq.hashed_langid_fit(d)
    weights, hot = weights.localCheckpoint(), hot.localCheckpoint()

    # unseen serving traffic from the same marker pools (plus one blank doc)
    serve = [
        (100, "filler common enmark1 enmark4 enmark7 extra"),
        (101, "demark2 demark5 word demark8 soup"),
        (102, "enmark0 enmark0 brand new doc"),
        (103, "   "),
    ]
    batch = spark.createDataFrame(serve, "doc_id bigint, text string")
    expected = {
        r["doc_id"]: (r["score_micro"], r["predicted"])
        for r in tq.hashed_langid_score(batch, weights, hot).collect()
    }
    assert expected[100][1] is True and expected[101][1] is False
    assert expected[102][1] is True
    assert expected[103][1] is False  # no grams -> z=0 -> 0.5, strict > loses

    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    for name, rows in (("e1", serve[:2]), ("e2", serve[2:])):
        pd.DataFrame(rows, columns=["doc_id", "text"]).to_parquet(
            os.path.join(src, f"{name}.parquet"), index=False
        )
    emitted = {}

    def fb(batch_df, batch_id):
        for r in tq.hashed_langid_score(batch_df, weights, hot).collect():
            emitted[r["doc_id"]] = (r["score_micro"], r["predicted"])

    q = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
        .writeStream.foreachBatch(fb)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    assert q.awaitTermination(300), "langid scoring stream did not drain"
    assert emitted == expected
