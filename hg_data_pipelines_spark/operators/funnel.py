"""Ordered-funnel conversion (SURVEY.md X12).

Classic product-analytics funnel: a user converts through stage i only
with an event of that type at-or-after their stage i-1 conversion time.
Each stage is one filtered aggregation joined to the previous stage's
(user, ts) table — the user set shrinks monotonically, so at scale every
stage after the first is a join against an ever-smaller (usually
broadcastable) table, never a self-join of the full event log. All
timestamps are exact micros; no float anywhere, so results are
engine/partitioning independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def funnel_stage_times(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> list[DataFrame]:
    """Per-stage conversion tables [(user, t)] — earliest qualifying event
    per user per stage, each at-or-after the user's previous stage time."""
    out: list[DataFrame] = []
    prev: DataFrame | None = None
    for stage in stages:
        ev = events.filter(F.col(type_col) == stage).select(
            F.col(user_col).alias("user_id"), F.col(ts_col).alias("_ts")
        )
        if prev is not None:
            ev = ev.join(prev, "user_id").filter(
                F.col("_ts") >= F.col("_prev_ts")
            )
        cur = ev.groupBy("user_id").agg(F.min("_ts").alias("_t"))
        out.append(cur.select("user_id", F.col("_t").alias("t")))
        prev = cur.select("user_id", F.col("_t").alias("_prev_ts"))
    return out


def funnel_counts(
    events: DataFrame,
    stages: list[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(stage, stage_idx, n_users) — users reaching each funnel prefix."""
    tables = funnel_stage_times(events, stages, user_col, ts_col, type_col)
    parts = [
        t.agg(F.count(F.lit(1)).alias("n_users")).select(
            F.lit(stage).alias("stage"),
            F.lit(i + 1).alias("stage_idx"),
            "n_users",
        )
        for i, (stage, t) in enumerate(zip(stages, tables))
    ]
    res = parts[0]
    for p in parts[1:]:
        res = res.unionAll(p)
    return res
