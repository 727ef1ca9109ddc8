"""Stream-stream interval join over the ticket lifecycle.

Reference semantics: the betting workload (flink-gen.sh:58-110) emits a
`ticket_created` kinesis event and, minutes later, a settle UPDATE on the
cdc_tickets changelog; correlating the two is a Flink interval join. Here it
is Structured Streaming's stream-stream inner join with symmetric watermarks
and a time-range predicate.

Scale posture: the range predicate is what bounds the join state. Each side's
state store retains only rows newer than the other side's watermark minus the
interval, so state is O(ingest rate x interval width) regardless of total
stream length -- the same bound Flink's interval join maintains. Without the
time bounds Spark would have to keep both sides forever.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def interval_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    upper_bound: str = "2 hours",
    watermark: str = "30 seconds",
) -> DataFrame:
    """Inner-join `right` rows occurring within [left_time, left_time +
    upper_bound] for matching keys. Works for two streaming frames (state
    bounded by the watermark + range predicate) and equally for two batch
    frames (the condition degenerates to a plain range join)."""
    l = left.withWatermark(left_time, watermark) if left.isStreaming else left
    r = right.withWatermark(right_time, watermark) if right.isStreaming else right
    cond = (
        (l[left_key] == r[right_key])
        & (r[right_time] >= l[left_time])
        & (r[right_time] <= l[left_time] + F.expr(f"INTERVAL {upper_bound}"))
    )
    return l.join(r, cond, "inner")
