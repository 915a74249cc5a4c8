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
