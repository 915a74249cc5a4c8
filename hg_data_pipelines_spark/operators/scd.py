"""Slowly-changing-dimension (Type 2) incremental maintenance.

``W6_scd2_intervals`` states the REBUILD form: one window pass over all
history. Real dimension tables are maintained incrementally — each
arriving batch closes the affected keys' current rows and appends new
versions — because rebuilding a 100 TB history for a 0.1% daily delta
re-shuffles everything. ``scd2_apply`` is that fold: cost ∝ |batch| +
|touched current rows|, one key shuffle for the in-batch window plus one
key join against the current slice; closed history is never touched.

Contract (pinned by pytest and the ``W6_scd2_incremental_fold`` oracle):
folding time-ordered batches reproduces the rebuild bit-for-bit —
``fold(b1..bn) == rebuild(b1 ∪ ... ∪ bn)`` — provided batch boundaries
respect the (ts, tiebreak) order (no key's later version arrives in an
earlier batch).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def scd2_init(
    updates: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Build an SCD2 table from a first batch: one interval per row,
    ``valid_to`` = next version's ``valid_from`` within the key,
    ``is_current`` on the last."""
    order = [ts_col, *(tiebreak_cols or [])]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    nxt = F.lead(ts_col).over(w)
    return updates.select(
        "*",
        F.col(ts_col).alias("valid_from"),
        nxt.alias("valid_to"),
        nxt.isNull().alias("is_current"),
    )


def scd2_apply(
    current: DataFrame,
    updates: DataFrame,
    key_cols: list[str],
    ts_col: str,
    tiebreak_cols: list[str] | None = None,
) -> DataFrame:
    """Fold an update batch into an existing SCD2 table.

    ``current`` carries ``valid_from``/``valid_to``/``is_current``;
    ``updates`` carries the raw new version rows (same columns minus the
    interval bookkeeping). Per key: the open row closes at the batch's
    first new ``valid_from``, in-batch versions chain by the window, the
    batch's last version becomes current. Keys absent from the batch are
    untouched; closed history rows pass through untouched.

    Long fold chains: each apply nests the previous result's plan — in a
    real nightly job ``current`` is a warehouse table read back per run
    (a natural lineage cut), so plans stay constant-size; when chaining
    many folds in one session, localCheckpoint the result between folds
    (the ``connected_components`` contract).
    """
    order = [ts_col, *(tiebreak_cols or [])]
    batch = scd2_init(updates, key_cols, ts_col, tiebreak_cols)
    first_ts = updates.groupBy(*key_cols).agg(
        F.min(ts_col).alias("_first_ts")
    )
    open_rows = current.filter(F.col("is_current"))
    closed_rows = current.filter(~F.col("is_current"))
    # no broadcast hint: the per-key batch summary is usually small (AQE
    # upgrades the join at runtime) but a backfill batch may not be
    touched = open_rows.join(first_ts, key_cols)
    closing = touched.select(
        *[c for c in current.columns if c not in ("valid_to", "is_current")],
        F.col("_first_ts").alias("valid_to"),
        F.lit(False).alias("is_current"),
    ).select(*current.columns)
    untouched = open_rows.join(first_ts, key_cols, "left_anti")
    return (
        closed_rows.unionByName(closing)
        .unionByName(untouched)
        .unionByName(batch.select(*current.columns))
    )
