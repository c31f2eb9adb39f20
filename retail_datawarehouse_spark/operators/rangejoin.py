"""Binned range join — the non-equi→equi rewrite for interval predicates.

The reference has no range/interval joins (SURVEY.md §2.3 "not
present"), but any warehouse doing banding (price tiers, age brackets,
SLA windows) needs `point BETWEEN lo AND hi` joins. Spark plans a pure
theta join as BroadcastNestedLoopJoin (every row × every interval —
fine for a 5-row band table, catastrophic when the interval side
grows) or, worse, a cartesian product when neither side broadcasts.

The scale shape is the classic *bin overlay* (the same technique behind
Databricks' range-join hint): overlay a fixed-width grid, replicate
each interval into every bin it overlaps, tag each point with its one
bin, equi-join on the bin id, then re-check the exact predicate as a
residual filter. The join becomes hash/sort-merge partitioned by bin —
shuffle-parallel, skew-splittable by AQE, no nested loop — at the cost
of interval replication (bounded by interval_width / bin_width).

Cost model: bin_width trades replication (smaller bins → more copies
of each interval) against residual selectivity (larger bins → more
false candidate pairs to filter). Pick bin_width ≈ median interval
width; replication factor is then ~2×.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_binned(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bin_width: float,
    how: str = "inner",
) -> DataFrame:
    """Join rows of ``points`` to rows of ``intervals`` where
    ``lo <= point < hi`` (half-open, the warehouse banding convention),
    via a fixed-width bin overlay instead of a nested-loop theta join.

    Both inputs may be arbitrarily large: the join is an equi-join on
    the bin id, so it shuffles by bin and never materializes the
    cross product. Intervals are exploded into one row per overlapped
    bin; points map to exactly one bin each (no point replication —
    the fact side stays 1×).
    """
    if how != "inner":
        raise ValueError("binned range join supports inner joins only")
    bw = F.lit(float(bin_width))
    p = points.withColumn("_bin", F.floor(F.col(point_col) / bw))
    # A half-open interval [lo, hi) overlaps bins floor(lo/w)..floor(hi/w),
    # except that an interval ending exactly on a bin edge does not reach
    # the next bin; the residual filter makes the edge case harmless
    # (one extra empty candidate bin), so keep the bin math simple.
    iv = intervals.withColumn(
        "_bin",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / bw),
                F.floor(F.col(hi_col) / bw),
            )
        ),
    )
    return (
        p.join(iv, "_bin")
        .filter(
            (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
        )
        .drop("_bin")
    )


def overlap_condition(point: Column, lo: Column, hi: Column) -> Column:
    """The exact residual predicate (half-open), exposed for reuse."""
    return (point >= lo) & (point < hi)
