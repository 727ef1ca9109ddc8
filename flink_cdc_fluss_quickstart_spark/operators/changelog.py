"""Changelog / primary-key (upsert) table operators.

The reference's central abstraction is the PK table with upsert semantics:
every Fluss table declares `PRIMARY KEY ... NOT ENFORCED` and applies the CDC
changelog by key, last-write-wins, with deletes removing the row
(tickets-cdc.sql:31, flink-gen.sh:139 `'merge-engine'='deduplicate'`).

Spark-first realization (SURVEY.md section 2.2 K1/K2):
- batch: `row_number() OVER (PARTITION BY pk ORDER BY seq DESC) = 1`,
  then drop rows whose final op is a delete. One shuffle on the PK, which is
  exactly the partitioning the downstream keyed aggregation wants.
- streaming: the same primitive applied per micro-batch inside foreachBatch,
  merged into a PK store (see streaming/pk_table.py).

Scale note: latest-by-key is a single hash-shuffle on the key -- at 100 TB
this is the unavoidable minimum. The window function evaluates within each
partition with no further exchange (verify: one Exchange in .explain).
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window

# uniform changelog envelope, mirroring Flink CDC's +I/-U/+U/-D row kinds
# (before-images are not needed for last-write-wins upsert application)
OP_INSERT = "I"
OP_UPDATE = "U"
OP_DELETE = "D"


def latest_by_key(df: DataFrame, keys: Sequence[str], order_by: Sequence[str]) -> DataFrame:
    """Latest row per key: the changelog->snapshot materialization primitive.

    ``order_by`` columns are event-time/sequence columns, descending; ties
    must be broken by a unique column for determinism.
    """
    w = Window.partitionBy(*keys).orderBy(*[F.desc(c) for c in order_by])
    return (
        df.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn")
    )


def apply_changelog(
    events: DataFrame,
    keys: Sequence[str],
    order_by: Sequence[str],
    op_col: str = "op",
) -> DataFrame:
    """Apply an I/U/D changelog to produce the current snapshot.

    Last-write-wins per key; a key whose most recent op is a delete has no row
    in the snapshot. This is the batch semantics of the Fluss PK table /
    Paimon 'deduplicate' merge engine (K1/K2).
    """
    latest = latest_by_key(events, keys, order_by)
    return latest.filter(F.col(op_col) != OP_DELETE).drop(op_col)


# Deterministic mapping from the synthetic `events` table to a CDC envelope,
# so changelog semantics are testable against a SQL oracle: signups insert,
# clicks/views/purchases update, errors delete the per-user state row.
# changelog_from_events derives its when-chain from THIS dict -- it is the
# executed mapping, not documentation.
EVENT_OP = {
    "signup": OP_INSERT,
    "click": OP_UPDATE,
    "view": OP_UPDATE,
    "purchase": OP_UPDATE,
    "error": OP_DELETE,
}


def changelog_from_events(events: DataFrame) -> DataFrame:
    """events(event_id, ts, user_id, event_type, value, props) -> changelog
    rows (op, ts, event_id, user_id, value) keyed by user_id.

    The when-chain is DERIVED from EVENT_OP (unknown event types fall back to
    UPDATE), so editing the dict is editing the executed mapping -- a
    hand-written second spelling here had already started to drift."""
    op = None
    for etype, mapped in EVENT_OP.items():
        if mapped == OP_UPDATE:
            continue  # the fallback covers every update-mapped type
        cond, val = F.col("event_type") == etype, F.lit(mapped)
        op = F.when(cond, val) if op is None else op.when(cond, val)
    op = F.lit(OP_UPDATE) if op is None else op.otherwise(F.lit(OP_UPDATE))
    return events.select(
        op.alias("op"),
        F.col("ts"),
        F.col("event_id"),
        F.col("user_id"),
        F.col("value"),
    )
