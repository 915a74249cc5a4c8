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
    user_col: str | list[str] = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> list[DataFrame]:
    """Per-stage conversion tables [(*keys, t)] — earliest qualifying event
    per key per stage, each at-or-after the key's previous stage time.
    ``user_col`` may be a composite key list (e.g. ``["user_id",
    "session_id"]`` for within-session funnels)."""
    keys = [user_col] if isinstance(user_col, str) else list(user_col)
    out: list[DataFrame] = []
    prev: DataFrame | None = None
    for stage in stages:
        ev = events.filter(F.col(type_col) == stage).select(
            *keys, F.col(ts_col).alias("_ts")
        )
        if prev is not None:
            ev = ev.join(prev, keys).filter(F.col("_ts") >= F.col("_prev_ts"))
        cur = ev.groupBy(*keys).agg(F.min("_ts").alias("_t"))
        out.append(cur.select(*keys, F.col("_t").alias("t")))
        prev = cur.select(*keys, F.col("_t").alias("_prev_ts"))
    return out


def funnel_counts(
    events: DataFrame,
    stages: list[str],
    user_col: str | list[str] = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """(stage, stage_idx, n_users) — keys reaching each funnel prefix."""
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
