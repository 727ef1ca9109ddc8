"""Custom stateful streaming operators via applyInPandasWithState.

The engine's changelog semantics (K1/A11) run on foreachBatch + MERGE -- the
re-aggregation path that exactly matches the reference's retraction results.
This module is the OTHER stateful tool Spark offers: arbitrary per-key state
kept by the state store across micro-batches, for operators that need
incremental per-key logic rather than re-aggregation (running counters,
custom sessionization, cross-batch dedup with TTL).

Scale posture: state is partitioned by the grouping key across executors and
backed by the configured state store (RocksDB in production,
SURVEY.md 2.7 T5); each micro-batch touches only the keys present in the
batch, Arrow-batched through the Python worker.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

RUNNING_TOTALS_SCHEMA = "user_id long, total_events long, total_value double"
_STATE_SCHEMA = "total_events long, scaled_value long"

_VALUE_SCALE = 1_000_000  # fixed-point accumulation: exact + order-free


def _running_totals_fn(
    key: tuple, batches: Iterator[pd.DataFrame], state: GroupState
) -> Iterator[pd.DataFrame]:
    (user_id,) = key
    if state.exists:
        total_events, scaled_value = state.get
    else:
        total_events, scaled_value = 0, 0
    for pdf in batches:
        total_events += len(pdf)
        # round, not floor: 2.01 * 1e6 is 2009999.9999999998 in float64, so
        # flooring loses a micro-unit on every non-representable 2-decimal
        # value -- a systematic negative drift in the running total
        scaled_value += int((pdf["value"] * _VALUE_SCALE).round().sum())
    state.update((total_events, scaled_value))
    yield pd.DataFrame(
        {
            "user_id": [user_id],
            "total_events": [total_events],
            "total_value": [scaled_value / _VALUE_SCALE],
        }
    )


def running_user_totals(events: DataFrame) -> DataFrame:
    """Per-user running (event_count, value_sum) maintained in keyed state
    across micro-batches; emits one updated row per user per batch in which
    that user appears. Use with outputMode("update")."""
    return events.groupBy("user_id").applyInPandasWithState(
        _running_totals_fn,
        outputStructType=RUNNING_TOTALS_SCHEMA,
        stateStructType=_STATE_SCHEMA,
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
