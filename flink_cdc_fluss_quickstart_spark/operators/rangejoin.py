"""Binned range (interval) join: match left rows whose scalar value falls in
[lo, hi) intervals of a right-side table.

Beyond-reference operator (SURVEY.md section 2.4: the reference has no range
joins). The naive plan for `l.v >= r.lo AND l.v < r.hi` is a broadcast
nested-loop / cartesian theta join -- quadratic and fatal at 100 TB. This
operator bins both sides to a coarse grid: each interval expands to the bins
it covers (small: width/bin_size rows), the left side computes one bin per
row, and Catalyst gets a plain equi hash join on the bin followed by the
exact bounds filter. One shuffle, linear cost, skew handled by AQE.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame


def bin_range_join(
    left: DataFrame,
    val_col: str,
    intervals: DataFrame,
    lo_col: str,
    hi_col: str,
    bin_size: float,
    how: str = "inner",
) -> DataFrame:
    """Join `left` to `intervals` where `lo_col <= val_col < hi_col`.

    `bin_size` should be on the order of the typical interval width: too
    small explodes the interval side, too large degrades to many false
    candidates (the exact filter stays correct either way).

    Supported `how`: inner plus the LEFT-preserving variants. The interval
    side is exploded to one row per covered bin BEFORE the join, so a
    right/full outer join would emit one null-extended duplicate per
    unmatched (interval, bin) row -- width/bin_size copies of each interval
    -- instead of one row per interval; those joins are rejected rather
    than silently multiplied.
    """
    allowed = {"inner", "cross", "left", "left_outer", "leftouter",
               "semi", "left_semi", "leftsemi", "anti", "left_anti", "leftanti"}
    if how.lower() not in allowed:
        raise ValueError(
            f"bin_range_join supports inner/left-preserving joins only, got {how!r}:"
            " the interval side is bin-exploded, so interval-preserving outer"
            " joins would duplicate each unmatched interval per covered bin"
        )
    bin_of = lambda c: F.floor(c / F.lit(float(bin_size))).cast("long")  # noqa: E731
    expanded = intervals.withColumn(
        "__bin",
        F.explode(F.sequence(bin_of(F.col(lo_col)), bin_of(F.col(hi_col)))),
    )
    tagged = left.withColumn("__bin", bin_of(F.col(val_col)))
    out = tagged.join(
        expanded,
        (tagged["__bin"] == expanded["__bin"])
        & (F.col(val_col) >= F.col(lo_col))
        & (F.col(val_col) < F.col(hi_col)),
        how,
    )
    return out.drop("__bin")
