"""CDC replication pipelines: changelog stream -> PK staging table.

Mirrors users/movies/tickets-cdc.sql: each reference job is
`INSERT INTO <staging> SELECT <cols> FROM <pg_cdc_source>` with a watermark
and exactly-once checkpoints. Spark-first: readStream -> withWatermark ->
project -> foreachBatch merge into a PKTable (SURVEY.md 2.2 K1, 2.7 T1-T7).

The merge is idempotent per (writer_id, batch_id) -- together with the
streaming checkpoint this gives exactly-once table state over Spark's
at-least-once foreachBatch, which is the same contract Flink's EXACTLY_ONCE
checkpointing provides the reference (tickets-cdc.sql:2-5).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql.streaming import StreamingQuery

from flink_cdc_fluss_quickstart_spark.streaming.pk_table import PKTable


def replicate(
    changelog: DataFrame,
    target: PKTable,
    checkpoint_dir: str,
    select_cols: Sequence[str] | None = None,
    watermark: tuple[str, str] | None = None,
    writer_id: str = "cdc",
    trigger: dict | None = None,
) -> StreamingQuery:
    """Start a replication job; returns the StreamingQuery (T7: a running
    INSERT INTO statement)."""
    df = changelog
    if watermark is not None:
        # T1: bounded out-of-orderness; gates state retention for any
        # downstream event-time operator in the same stream. Spark watermarks
        # require instant-semantics TIMESTAMP; the session runs UTC so the
        # cast from NTZ is lossless.
        col, delay = watermark
        import pyspark.sql.functions as F

        declared = df.schema[col].dataType
        df = df.withColumn(col, F.col(col).cast("timestamp")).withWatermark(col, delay)
        # restore the source-declared type so the STORED staging schema
        # matches the changelog schema (NTZ in, NTZ stored); the watermark
        # gates nothing in a foreachBatch-only pipeline -- it is the T1
        # bounded-out-of-orderness declaration
        df = df.withColumn(col, F.col(col).cast(declared))
    if select_cols is not None:
        keep = list(select_cols)
        # force-keep the columns the merge itself consumes: the op column and
        # the TARGET's ordering columns (not a hardcoded 'seq' -- a table
        # ordered by e.g. 'ts' would otherwise lose its ordering column to
        # the projection and kill the query at first merge)
        for extra in ("op", *target.order_by):
            if extra not in keep:
                keep.insert(0, extra)
        df = df.select(*keep)
    elif "before" in df.columns:
        # no projection requested: still strip the CDC before-image envelope
        # -- the staging snapshot's contract is after-image payload columns
        # only, and persisting a full pre-update row struct per row roughly
        # doubles stored width for nothing (consumers that need the
        # before-image read it from the changelog, not the table)
        df = df.drop("before")

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        target.merge(batch_df, batch_id=batch_id, writer_id=writer_id)

    writer = df.writeStream.foreachBatch(apply_batch).option(
        "checkpointLocation", checkpoint_dir
    )
    writer = writer.trigger(**(trigger or {"availableNow": True}))
    return writer.start()
