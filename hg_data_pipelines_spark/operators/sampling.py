"""Weighted sampling — deterministic, single-pass, engine-portable.

Efraimidis–Spirakis priority sampling: to draw k items WITHOUT
replacement with inclusion probability proportional to a weight column,
give each item the key u^(1/w) (u uniform on (0,1)) and keep the k largest
keys. One pass, no sequential state — the distributed-friendly form of
weighted reservoir sampling, and the right primitive for token-budget-
proportional corpus subsampling (weight = document token/char count).

Determinism/portability: u derives from the md5 of the item id (the
same trick as the deterministic train/val/test split), so the sample is
identical across runs, partitionings, AND engines — which makes the
declared query fully oracle-checkable in DuckDB. The key is compared as
ln(u)/w (monotone in u^(1/w)) rounded to 9 dp with an id tiebreak, so a
last-ulp libm difference between engines cannot flip the ranking.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _unit_uniform(id_col: str) -> F.Column:
    """Deterministic u ∈ (0, 1): first 32 bits of md5(id), shifted off 0."""
    h = (
        F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 8), 16, 10)
        .cast("double")
    )
    return (h + 1.0) / 4294967297.0  # (2^32 + 1): u never 0 or 1


def weighted_sample(
    df: DataFrame,
    weight_col: str,
    k: int,
    id_col: str,
    strata: list[str] | None = None,
) -> DataFrame:
    """k-item weighted sample without replacement (per stratum if given).

    Rows with non-positive weight are excluded (their inclusion
    probability is 0 and ln(u)/w would flip sign). Global sampling plans
    as TakeOrderedAndProject (per-partition top-k, k-row merge — no
    global sort, no single-task window); stratified sampling is one
    partitioned window per stratum. Adds a ``sample_rank`` column
    (1 = highest priority).
    """
    key = F.round(F.log(_unit_uniform(id_col)) / F.col(weight_col), 9)
    keyed = df.filter(F.col(weight_col) > 0).withColumn("_k", key)
    if strata:
        w = Window.partitionBy(*strata).orderBy(F.desc("_k"), F.asc(id_col))
        return (
            keyed.withColumn("sample_rank", F.row_number().over(w))
            .filter(F.col("sample_rank") <= k)
            .drop("_k")
        )
    top = keyed.orderBy(F.desc("_k"), F.asc(id_col)).limit(k)
    w = Window.orderBy(F.desc("_k"), F.asc(id_col))  # over ≤ k rows
    return top.withColumn("sample_rank", F.row_number().over(w)).drop("_k")
