"""As-of (temporal) join: for each left row, the most recent right row at or
before its timestamp, per key.

Beyond-reference operator (SURVEY.md 2.4 notes no as-of join in the
reference); standard in market-data/feature-store pipelines, so the engine
ships it designed for scale:

Implementation is the union-tag pattern, NOT a range cross-join: tag both
sides, union, and run one window (`last_value` ignoring nulls over rows
between unbounded preceding and current) partitioned by key and ordered by
(ts, side). Cost is a single hash-shuffle on the key + a per-partition sort
-- the same price as a regular join; a naive `l.ts >= r.ts` theta join would
explode quadratically at 100 TB.

Tie policy: right rows at exactly the left timestamp are visible
(`allow_exact_matches`), and among equal timestamps the LAST right row by
``right_order`` wins -- callers must pass a unique tie-break for determinism.
"""

from __future__ import annotations

from collections.abc import Sequence

import pyspark.sql.functions as F
from pyspark.sql import DataFrame
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: Sequence[str],
    left_ts: str,
    right_ts: str,
    right_cols: Sequence[str],
    right_order: Sequence[str] = (),
    allow_exact_matches: bool = True,
) -> DataFrame:
    """Returns ``left`` with ``right_cols`` from the as-of matching right row
    (null when no right row precedes)."""
    on = list(on)
    lcols = left.columns
    # side=0 sorts right rows before left rows at equal ts when exact matches
    # are allowed (so they are visible), after when not
    right_side, left_side = (0, 1) if allow_exact_matches else (1, 0)

    # pack the right payload into ONE struct so the window's last-non-null is
    # atomic per right row (independent per-column fills could mix rows)
    r_struct_type = (
        right.select(F.struct(*[F.col(c) for c in right_cols]).alias("__r"))
        .schema["__r"]
        .dataType
    )
    l_tag = left.select(
        *[F.col(c) for c in lcols],
        F.col(left_ts).alias("__ts"),
        F.lit(left_side).alias("__side"),
        F.lit(None).cast(r_struct_type).alias("__r"),
    )
    # a right row with a NULL timestamp can never be "at or before" any left
    # timestamp (r.ts <= l.ts is never true for NULL -- the theta-join
    # spelling the oracle uses), but NULLs sort FIRST in the ascending
    # window, where last-non-null would hand them to every left row with no
    # earlier real right row; drop them up front
    r_tag = right.filter(F.col(right_ts).isNotNull()).select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c not in on],
        *[F.col(k) for k in on],
        F.col(right_ts).alias("__ts"),
        F.lit(right_side).alias("__side"),
        F.struct(*[F.col(c) for c in right_cols]).alias("__r"),
    ).select(*l_tag.columns)  # align column order for union

    order = [F.col("__ts").asc(), F.col("__side").asc()] + [
        F.col("__r").getField(c).asc() for c in right_order
    ]
    w = (
        Window.partitionBy(*on)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = l_tag.unionByName(r_tag).select(
        *[c for c in l_tag.columns if c != "__r"],
        F.last("__r", ignorenulls=True).over(w).alias("__r"),
    )
    out = filled.filter(F.col("__side") == left_side)
    for c in right_cols:
        out = out.withColumn(c, F.col("__r").getField(c))
    return out.drop("__ts", "__side", "__r")
