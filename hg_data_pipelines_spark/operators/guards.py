"""Mechanical fences for fixture-scale-only operators.

Some declared queries exist ONLY as exact oracle twins of a bucketed
scale path (the O(n²) all-pairs cosine join next to the LSH variant, the
exact k-NN graph next to ``lsh_topk``). Their quadratic shape is by
contract — the oracle needs the exact answer — but nothing used to stop
someone pointing them at sf10+ and melting a cluster. ``fence_rows``
makes the fence mechanical instead of documentary: it counts the input
and raises before any quadratic work starts, unless the caller opts in
with ``force=True``.

The ``count()`` is an eager action at plan-build time; that is the
point — a fenced twin must refuse to even *construct* the quadratic plan
on oversized input. The count itself is a linear scan (columnar,
count-only, no row materialization), negligible next to the O(n²) body
it protects.
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# Fixture-scale ceiling: sf0.1 embeddings ≈ 12k rows; 200k keeps all test
# scales comfortably inside while stopping anything cluster-sized.
QUADRATIC_FENCE_ROWS = 200_000


def fence_rows(
    df: DataFrame,
    *,
    what: str,
    scale_path: str,
    limit: int | None = None,
    force: bool = False,
) -> DataFrame:
    """Raise unless ``df`` has at most ``limit`` rows (or ``force``).

    ``what`` names the fenced operator; ``scale_path`` names the bucketed
    sibling the error message points the caller to. ``limit`` defaults to
    ``QUADRATIC_FENCE_ROWS`` read at call time (tests shrink it).
    """
    if force:
        return df
    if limit is None:
        limit = QUADRATIC_FENCE_ROWS
    n = df.count()
    if n > limit:
        raise ValueError(
            f"{what} is a fixture-scale exact oracle twin fenced at "
            f"{limit} input rows (got {n}). Use {scale_path} at scale, "
            f"or pass force=True if you really want the quadratic form."
        )
    return df


def fence_unique_keys(
    df: DataFrame,
    keys: list[str],
    *,
    what: str,
    sample_violations: int = 5,
    force: bool = False,
) -> DataFrame:
    """Raise unless ``keys`` are unique in ``df`` (or ``force``).

    The join-fanout fence: a dimension side that silently stops being
    key-unique turns every downstream inner join into a row multiplier —
    the classic quiet corruption that no schema check catches. One
    count/count-distinct aggregate (struct-wrapped, so NULL-containing
    tuples count as real keys — DQ7 semantics); on violation the error
    carries the worst offending keys so the failure is diagnosable
    without a re-run. At 100 TB this is one partial-aggregated pass over
    the dim — negligible next to the join it protects.
    """
    from pyspark.sql import functions as F

    if force:
        return df
    key_struct = F.struct(*[F.col(c) for c in keys])
    row = df.agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct(key_struct).alias("d"),
    ).collect()[0]
    if row["n"] != row["d"]:
        worst = (
            df.groupBy(*keys)
            .agg(F.count(F.lit(1)).alias("n"))
            .filter(F.col("n") > 1)
            .orderBy(F.col("n").desc(), *keys)
            .limit(sample_violations)
            .collect()
        )
        detail = ", ".join(
            f"{tuple(r[c] for c in keys)}×{r['n']}" for r in worst
        )
        raise ValueError(
            f"{what}: join key {keys} not unique "
            f"({row['n']} rows, {row['d']} distinct keys; worst: {detail}). "
            f"A join on this side would multiply rows. Deduplicate first, "
            f"or pass force=True if fan-out is intended."
        )
    return df
