"""As-of and range joins — operators Spark lacks natively.

Both are built from compositions of built-in ops (SURVEY.md §2.5 "not
present in reference" list):

- As-of join: union the two sides, sort within key, carry the right
  side's last value forward with a window `last(..., ignorenulls)`.
  One shuffle on the key, no per-row probing — scales like any window.
- Range join: broadcast the (small) bucket table and join on an
  interval predicate — Catalyst executes BroadcastNestedLoopJoin; for
  large range tables, bucketize the point column first so it becomes an
  equi-join.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_value: str,
    out_col: str = "asof_value",
    direction: str = "backward",
    tolerance_s: float | None = None,
) -> DataFrame:
    """pandas-merge_asof-shaped as-of join, one window pass per key.

    direction="backward" (default): for each left row, the
    `right_value` of the latest right row with right_ts <= left_ts.
    direction="forward": the earliest right row with right_ts >=
    left_ts. Equal timestamps match in both directions (<= / >=
    semantics, as in pandas).

    tolerance_s: if set, the match is kept only when
    |left_ts - matched right_ts| <= tolerance_s seconds — stale (or
    too-far-future) matches become NULL, exactly pandas' `tolerance`.
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    # the carried payload is a (value, ts) struct, NOT the bare value:
    # last/first(ignorenulls) must skip only "no right row here"
    # markers — a genuine NULL measurement in the right table is a real
    # observation and must overwrite older values, not be skipped over.
    # The matched ts rides along for the tolerance check.
    rv_type = right.schema[right_value].dataType
    rt_type = right.schema[right_ts].dataType
    null_marker = F.lit(None).cast(
        f"struct<v:{rv_type.simpleString()},t:{rt_type.simpleString()}>"
    )
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        null_marker.alias("__rv"),
    )
    r = right.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in lcols if c != on],
        F.col(on),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.struct(
            F.col(right_value).alias("v"), F.col(right_ts).alias("t")
        ).alias("__rv"),
    ).select(*lcols, "__ts", "__is_left", "__rv")
    unioned = l.unionByName(r)
    if direction == "backward":
        # right (0) sorts before left (1) at equal ts -> equal-ts right
        # rows fall inside the preceding frame and match
        w = (
            Window.partitionBy(on)
            .orderBy("__ts", "__is_left")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        )
        carried = unioned.withColumn(out_col, F.last("__rv", ignorenulls=True).over(w))
    else:
        # left (1) sorts before right (0) at equal ts -> equal-ts right
        # rows fall inside the following frame and match
        w = (
            Window.partitionBy(on)
            .orderBy(F.asc("__ts"), F.desc("__is_left"))
            .rowsBetween(Window.currentRow, Window.unboundedFollowing)
        )
        carried = unioned.withColumn(out_col, F.first("__rv", ignorenulls=True).over(w))
    matched = F.col(out_col)
    if tolerance_s is not None:
        gap = F.abs(
            F.col("__ts").cast("double") - matched["t"].cast("double")
        )
        matched = F.when(gap <= F.lit(float(tolerance_s)), matched)
    return (
        carried.filter(F.col("__is_left") == 1)
        .withColumn(out_col, matched["v"])
        .drop("__ts", "__is_left", "__rv")
    )


def range_join(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    how: str = "inner",
) -> DataFrame:
    """points ⋈ ranges ON lo <= point < hi. Broadcast the range side —
    range tables (histogram buckets, tiering rules) are small by nature."""
    cond: Column = (F.col(point_col) >= F.col(lo_col)) & (
        F.col(point_col) < F.col(hi_col)
    )
    return points.join(F.broadcast(ranges), cond, how)


def range_join_bucketized(
    points: DataFrame,
    ranges: DataFrame,
    point_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
) -> DataFrame:
    """points ⋈ ranges ON lo <= point < hi for LARGE range tables — the
    scale path `range_join`'s docstring promises: both sides map to
    integer buckets of `bucket_width`, each range replicates to every
    bucket it overlaps, and the match becomes a bucket EQUI-join with
    the exact interval predicate re-checked after. Replication factor =
    avg range width / bucket_width + 1, so pick the width near the
    typical range span. Unlike the broadcast BNLJ, this shuffles both
    sides on the bucket key — O(|P| + |R|·repl) instead of |P|·|R|
    comparisons, and no side needs to fit in memory.
    """
    pb = points.withColumn(
        "__bkt", F.floor(F.col(point_col) / F.lit(bucket_width)).cast("bigint")
    )
    rb = ranges.withColumn(
        "__bkt",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / F.lit(bucket_width)).cast("bigint"),
                # hi is exclusive, but a range ending exactly on a bucket
                # boundary still owns that boundary's bucket start: use
                # the bucket of the last INCLUDED point, conservatively
                # floor(hi/w) (the exact predicate prunes false overlap)
                F.floor(F.col(hi_col) / F.lit(bucket_width)).cast("bigint"),
            )
        ),
    )
    cond = (F.col(point_col) >= F.col(lo_col)) & (F.col(point_col) < F.col(hi_col))
    return pb.join(rb, "__bkt").filter(cond).drop("__bkt")
