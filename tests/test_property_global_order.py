"""Property tests for the closed-form ntile math behind
operators/scale.py::global_ntile.

The distributed plumbing (range partitions, offsets, pid consistency) is
swept by fixed Spark tests in test_scale.py; what hypothesis can drive
cheaply is the FORMULA: bucket(rank, N, k) must equal SQL ntile
semantics (first N % k tiles hold ceil(N/k) rows, the rest floor(N/k))
for any N, k, rank — including the float-division path the Spark
expression uses (floor((r-1)/big)+1 in IEEE doubles), which must stay
exact while r < 2^53.
"""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


def _formula(r: int, n: int, k: int) -> int:
    """Mirror of the column expression in global_ntile (double division)."""
    q = n // k
    rem = n % k
    big = q + 1
    cut = big * rem
    if r <= cut:
        return int(math.floor((r - 1) / big)) + 1
    return rem + int(math.floor((r - cut - 1) / q)) + 1


def _ntile_ref(r: int, n: int, k: int) -> int:
    """SQL ntile by definition: walk tile sizes."""
    q, rem = divmod(n, k)
    # tile i (1-based) has q+1 rows for i <= rem else q
    upper = 0
    for i in range(1, k + 1):
        upper += q + 1 if i <= rem else q
        if r <= upper:
            return i
    raise AssertionError("rank beyond N")


@settings(max_examples=300)
@given(
    n=st.integers(min_value=1, max_value=10_000),
    k=st.integers(min_value=1, max_value=64),
    data=st.data(),
)
def test_formula_matches_ntile_definition(n, k, data):
    r = data.draw(st.integers(min_value=1, max_value=n))
    assert _formula(r, n, k) == _ntile_ref(r, n, k)


@settings(max_examples=200)
@given(
    n=st.integers(min_value=1, max_value=2**50),
    k=st.integers(min_value=1, max_value=10_000),
    data=st.data(),
)
def test_formula_exact_at_scale_boundaries(n, k, data):
    """At 100 TB row counts the double division must not lose a rank:
    check the boundary ranks of every formula regime (first/last of the
    big-tile region and of the small-tile region)."""
    q, rem = divmod(n, k)
    big = q + 1
    cut = big * rem
    candidates = [c for c in {1, cut, cut + 1, n, max(1, cut - 1)} if 1 <= c <= n]
    r = data.draw(st.sampled_from(candidates))
    got = _formula(r, n, k)
    # reference without walking k tiles: tile index from exact int math
    if r <= cut:
        want = (r - 1) // big + 1
    else:
        want = rem + (r - cut - 1) // q + 1
    assert got == want
    assert 1 <= got <= min(k, n)


class TestQuantileBucketAssign:
    def test_ties_at_cutpoint_land_low_and_counts_partition(self, spark):
        from pyspark.sql import functions as F

        from hg_data_pipelines_spark.operators.scale import (
            quantile_bucket_assign,
        )

        # 1..100: quartile cutpoints are 25.75/50.5/75.25; values equal to
        # a cutpoint can't occur, so buckets are exactly 25/25/25/25
        df = spark.range(1, 101).select(F.col("id").cast("double").alias("v"))
        out = quantile_bucket_assign(df, "v", [0.25, 0.5, 0.75])
        counts = {
            r["bucket"]: r["n"]
            for r in out.groupBy("bucket").agg(F.count("*").alias("n")).collect()
        }
        assert counts == {1: 25, 2: 25, 3: 25, 4: 25}

        # explicit tie: every value equals the single cutpoint → all low
        tie = spark.createDataFrame([(5.0,)] * 8, "v double")
        got = quantile_bucket_assign(tie, "v", [0.5]).select("bucket").collect()
        assert {r["bucket"] for r in got} == {1}
