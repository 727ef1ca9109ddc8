"""Tests for the applyInPandasWithState custom stateful operator."""

from __future__ import annotations

import os

from flink_cdc_fluss_quickstart_spark.streaming.stateful import running_user_totals

SCHEMA = "user_id long, value double"


def _write_epoch(d, name, rows):
    import pandas as pd

    pdf = pd.DataFrame(rows, columns=["user_id", "value"])
    pdf.to_parquet(os.path.join(d, f"{name}.parquet"), index=False)


def _run_once(spark, src, ckpt):
    """One availableNow pass; returns the emitted rows (foreachBatch sink:
    supports checkpoint recovery, unlike the memory sink)."""
    stream = (
        spark.readStream.schema(SCHEMA).option("maxFilesPerTrigger", 1).parquet(src)
    )
    emitted = []

    def fb(batch_df, batch_id):
        emitted.extend(batch_df.collect())

    q = (
        running_user_totals(stream)
        .writeStream.foreachBatch(fb)
        .outputMode("update")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    return {r["user_id"]: (r["total_events"], r["total_value"]) for r in emitted}


def test_running_totals_accumulate_across_microbatches(spark, tmp_path):
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)

    _write_epoch(src, "e1", [(1, 1.5), (1, 2.25), (2, 10.0)])
    first = _run_once(spark, src, ckpt)
    assert first == {1: (2, 3.75), 2: (1, 10.0)}

    # second pass over the same checkpoint: keyed state survives the restart,
    # only users present in the new batch re-emit
    _write_epoch(src, "e2", [(1, 0.25), (3, 7.0)])
    second = _run_once(spark, src, ckpt)
    assert second == {1: (3, 4.0), 3: (1, 7.0)}


def test_running_totals_fixed_point_rounds_not_floors(spark, tmp_path):
    """2.01 * 1e6 is 2009999.9999999998 in float64; flooring loses a
    micro-unit on every such value (systematic negative drift in the running
    total). The accumulator must ROUND into fixed point."""
    src, ckpt = str(tmp_path / "src"), str(tmp_path / "ckpt")
    os.makedirs(src)
    _write_epoch(src, "e1", [(1, 2.01), (1, 2.03), (1, 2.05)])
    got = _run_once(spark, src, ckpt)
    assert got == {1: (3, 6.09)}
