"""Banded range join (SURVEY.md EXT-J8): a range/theta join with NO equi
key, made shuffle-joinable by time-grain banding.

A raw ``l.ts < r.ts <= l.ts + W`` join with no equi component forces a
nested-loop/cartesian plan. Banding restores an equi key: each left row
explodes into the grain buckets its window covers (``W/grain + 1`` rows),
each right row keys by its own bucket, the bucket equi-join bounds
candidates to |window density|, and the exact range predicate filters
residually. This is the same candidate-bounding substitution LSH makes
for similarity joins, applied to time — at 100 TB the bucket join
shuffles on a well-distributed integer key instead of nothing at all.

Grain choice trades replication (left rows × buckets covered) against
candidate precision (right rows per bucket); grain ≈ W is the usual
sweet spot (≤2 buckets per left row).

All bucket arithmetic is exact integer epoch-microseconds, so results
are engine- and layout-independent.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def banded_range_join(
    left: DataFrame,
    right: DataFrame,
    left_ts: str,
    right_ts: str,
    lower_us: int,
    upper_us: int,
    grain_us: int | None = None,
) -> DataFrame:
    """Pairs (l, r) with ``l_ts + lower_us < r_ts <= l_ts + upper_us``.

    Returns all left columns plus all right columns (names must be
    disjoint). Inner-join semantics; aggregate and re-join to the left
    table for left-join counts.
    """
    if grain_us is None:
        grain_us = max(upper_us - lower_us, 1)
    lts = f"unix_micros(cast({left_ts} as timestamp))"
    rts = f"unix_micros(cast({right_ts} as timestamp))"
    banded_left = left.withColumn(
        "_bucket",
        F.explode(
            F.expr(
                f"sequence(({lts} + {lower_us}) DIV {grain_us},"
                f" ({lts} + {upper_us}) DIV {grain_us})"
            )
        ),
    )
    banded_right = right.withColumn("_bucket", F.expr(f"{rts} DIV {grain_us}"))
    return (
        banded_left.join(banded_right, "_bucket")
        .filter(
            F.expr(f"{rts} > {lts} + {lower_us}")
            & F.expr(f"{rts} <= {lts} + {upper_us}")
        )
        .drop("_bucket")
    )
