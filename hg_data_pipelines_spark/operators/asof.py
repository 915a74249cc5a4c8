"""As-of (point-in-time) join — EXT-J6 (SURVEY.md §2.4).

For each left row, attach the most recent right row with the same key and
``right.time <= left.time``.

Implementation: tag + union + running ``last(ignorenulls)`` window, i.e. a
single shuffle on the key — NOT a range cross-join. At 100 TB this is the
only as-of formulation that doesn't explode: cardinality stays |L| + |R|,
the window is one pass per key partition, and skewed keys are handled by
AQE (the window itself is linear in partition size).

Determinism: right rows sort before left rows at equal timestamps (inclusive
``<=`` semantics, matching DuckDB's ``ASOF JOIN ... ON l.t >= r.t``); callers
must pre-deduplicate the right side to one row per (key, time) if several
could tie, otherwise pick-one is undefined in any engine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    left_cols: list[str] | None = None,
    direction: str = "backward",
    tolerance: str | None = None,
) -> DataFrame:
    """Return ``left`` columns + the as-of values from ``right``.

    ``value_cols`` are carried from the right side (null when no right row
    precedes the left row). ``direction="backward"`` (default) attaches
    the most recent right row with ``right.time <= left.time``;
    ``direction="forward"`` attaches the EARLIEST right row with
    ``right.time >= left.time`` — implemented by running the identical
    single-shuffle window over a descending time order, so both
    directions share cardinality |L| + |R| and one pass per key.

    ``tolerance`` (an INTERVAL literal, e.g. ``"7 days"``) bounds the
    staleness: an as-of match farther than the tolerance from the left
    time is nulled out, matching pandas ``merge_asof(tolerance=...)`` /
    kdb ``wj`` window semantics. Enforced as a post-attach projection —
    the plan shape (one key shuffle, one window pass) is unchanged.
    """
    from pyspark.sql import types as T

    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    left_cols = left_cols if left_cols is not None else left.columns

    # The right side's values travel as ONE struct, not as separate columns:
    # the struct is non-null for every right row even when its fields are
    # null, so last(ignorenulls) picks the most recent right ROW and a null
    # value column stays null (DuckDB ASOF JOIN semantics) instead of being
    # backfilled from an older right row.
    vrow_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in value_cols]
        + [T.StructField("_rt", right.schema[right_time].dataType)]
    )
    lhs = left.select(
        F.col(left_on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left_cols],
        F.lit(None).cast(vrow_type).alias("_vrow"),
    )
    rhs = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_time).alias("_t"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        F.struct(
            *[F.col(c).alias(c) for c in value_cols],
            F.col(right_time).alias("_rt"),
        ).alias("_vrow"),
    )

    # One shuffle: partition by key, order by (time, side). Right rows sort
    # first at equal times so inclusive matches see them. Forward direction
    # = the same running-last over a time-reversed order.
    if direction == "backward":
        order = [F.col("_t").asc(), F.col("_is_left").asc()]
    else:
        order = [F.col("_t").desc(), F.col("_is_left").asc()]
    w = (
        Window.partitionBy("_k")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = lhs.unionByName(rhs).select(
        "*", F.last("_vrow", ignorenulls=True).over(w).alias("_asof_row")
    )
    if tolerance is not None:
        if direction == "backward":
            in_band = F.col("_asof_row._rt") >= F.expr(
                f"_t - INTERVAL {tolerance}"
            )
        else:
            in_band = F.col("_asof_row._rt") <= F.expr(
                f"_t + INTERVAL {tolerance}"
            )
        carried = carried.withColumn(
            "_asof_row", F.when(in_band, F.col("_asof_row"))
        )
    return carried.filter(F.col("_is_left") == 1).select(
        *left_cols,
        *[F.col("_asof_row")[c].alias(f"asof_{c}") for c in value_cols],
    )


def asof_join_nearest(
    left: DataFrame,
    right: DataFrame,
    left_on: str,
    right_on: str,
    left_time: str,
    right_time: str,
    value_cols: list[str],
    left_cols: list[str] | None = None,
) -> DataFrame:
    """As-of join, NEAREST direction: attach the right row minimizing
    |right.time − left.time|; exact ties prefer the backward (≤) side —
    pandas ``merge_asof(direction="nearest")`` semantics.

    Same single-shuffle design as ``asof_join``: left and right union
    into one frame partitioned by key, and TWO windows over that one
    partitioning (ascending running-last = best backward candidate,
    descending running-last = best forward candidate) share the exchange
    — Catalyst plans one Exchange with two Sort+Window passes, never a
    second shuffle or a join. Distances compare in integer microseconds
    (``unix_micros``) so tie resolution is exact and engine-portable.

    Right rows that DUPLICATE a ``(key, time)`` pair are tie-broken
    deterministically by ``xxhash64`` of the value row (appended to the
    window ordering), so repeated runs and different input orderings pick
    the same row — but WHICH duplicate wins is hash-arbitrary, not
    semantic. Pre-aggregate the right side to one row per (key, time)
    (as ``J6_asof_nearest_order`` does with MAX) when the choice matters.
    Hash ordering requires hashable value columns (no MapType); with map
    values, dedupe the right side instead.
    """
    from pyspark.sql import types as T

    left_cols = left_cols if left_cols is not None else left.columns
    vrow_type = T.StructType(
        [T.StructField(c, right.schema[c].dataType) for c in value_cols]
        + [T.StructField("_rt", T.LongType())]
    )
    rt_us = F.expr(f"unix_micros(CAST({right_time} AS TIMESTAMP))")
    lhs = left.select(
        F.col(left_on).alias("_k"),
        F.col(left_time).alias("_t"),
        F.expr(f"unix_micros(CAST({left_time} AS TIMESTAMP))").alias("_tus"),
        F.lit(1).alias("_is_left"),
        *[F.col(c) for c in left_cols],
        F.lit(None).cast(vrow_type).alias("_vrow"),
    )
    rhs = right.select(
        F.col(right_on).alias("_k"),
        F.col(right_time).cast(left.schema[left_time].dataType).alias("_t"),
        rt_us.alias("_tus"),
        F.lit(0).alias("_is_left"),
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_cols],
        F.struct(
            *[F.col(c).alias(c) for c in value_cols],
            rt_us.alias("_rt"),
        ).alias("_vrow"),
    )
    unioned = lhs.unionByName(rhs)
    # Final ordering key: deterministic tie-break among right rows that
    # share (key, time) — without it, last(_vrow) picks whichever
    # duplicate the shuffle happened to order last (ADVICE r6).
    tiebreak = F.xxhash64(F.col("_vrow")).asc()
    w_back = (
        Window.partitionBy("_k")
        .orderBy(F.col("_tus").asc(), F.col("_is_left").asc(), tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_fwd = (
        Window.partitionBy("_k")
        .orderBy(F.col("_tus").desc(), F.col("_is_left").asc(), tiebreak)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        "*",
        F.last("_vrow", ignorenulls=True).over(w_back).alias("_back"),
        F.last("_vrow", ignorenulls=True).over(w_fwd).alias("_fwd"),
    )
    d_back = F.col("_tus") - F.col("_back._rt")
    d_fwd = F.col("_fwd._rt") - F.col("_tus")
    nearest = (
        F.when(F.col("_back").isNull(), F.col("_fwd"))
        .when(F.col("_fwd").isNull(), F.col("_back"))
        .when(d_back <= d_fwd, F.col("_back"))
        .otherwise(F.col("_fwd"))
    )
    return (
        carried.filter(F.col("_is_left") == 1)
        .withColumn("_nearest", nearest)
        .select(
            *left_cols,
            *[F.col("_nearest")[c].alias(f"nearest_{c}") for c in value_cols],
        )
    )
