"""Property tests for the DRIVER-SIDE math inside the round-9 selection
operators: the bucket-walk/offset arithmetic of exact_quantiles_twopass
and the convex containment sign test of grid_containment_join. The Spark
plumbing is swept by fixed tests (test_scale.py, the J16/A28 oracles);
hypothesis drives the kernels over adversarial inputs — ties at bucket
boundaries, degenerate groups, points ON polygon edges."""

from __future__ import annotations

import math

from hypothesis import given, settings
from hypothesis import strategies as st


def _twopass_rank_select(xs: list[float], q: float, n_buckets: int = 16):
    """Mirror of the operator's histogram walk: locate target bucket via
    monotone bucketing, pick the (k - cum_before)-th value within it."""
    n = len(xs)
    k = max(1, min(int(math.ceil(q * n)), n))
    lo, hi = min(xs), max(xs)
    if hi > lo:
        def bucket(x):
            return min(int(math.floor((x - lo) * n_buckets / (hi - lo))),
                       n_buckets - 1)
    else:
        def bucket(x):
            return 0
    counts = [0] * n_buckets
    for x in xs:
        counts[bucket(x)] += 1
    cum = 0
    for b in range(n_buckets):
        if cum + counts[b] >= k:
            within = sorted(x for x in xs if bucket(x) == b)
            return within[k - cum - 1]
        cum += counts[b]
    raise AssertionError("walk must terminate")


class TestTwopassQuantileWalk:
    @settings(max_examples=300, deadline=None)
    @given(
        xs=st.lists(
            st.floats(min_value=-1e6, max_value=1e6,
                      allow_nan=False, allow_infinity=False),
            min_size=1, max_size=80,
        ),
        q=st.sampled_from([0.01, 0.25, 0.5, 0.9, 0.99, 1.0]),
    )
    def test_walk_equals_sorted_rank(self, xs, q):
        n = len(xs)
        k = max(1, min(int(math.ceil(q * n)), n))
        assert _twopass_rank_select(xs, q) == sorted(xs)[k - 1]

    @settings(max_examples=100, deadline=None)
    @given(
        v=st.floats(min_value=-10, max_value=10,
                    allow_nan=False, allow_infinity=False),
        n=st.integers(min_value=1, max_value=50),
        q=st.sampled_from([0.5, 0.99]),
    )
    def test_degenerate_all_equal(self, v, n, q):
        assert _twopass_rank_select([v] * n, q) == v


def _inside_convex(xs, ys, px, py):
    """Mirror of the operator's all-edges CCW sign test."""
    m = len(xs)
    return all(
        (xs[(k + 1) % m] - xs[k]) * (py - ys[k])
        - (ys[(k + 1) % m] - ys[k]) * (px - xs[k]) >= 0
        for k in range(m)
    )


class TestConvexContainment:
    @settings(max_examples=200, deadline=None)
    @given(
        cx=st.floats(-5, 5), cy=st.floats(-5, 5),
        r=st.floats(0.1, 3),
        t=st.floats(0, 2 * math.pi),
        rho=st.floats(0, 2),
    )
    def test_interior_and_exterior_of_regular_pentagon(
        self, cx, cy, r, t, rho
    ):
        xs = [cx + r * math.cos(math.radians(90 + 72 * k)) for k in range(5)]
        ys = [cy + r * math.sin(math.radians(90 + 72 * k)) for k in range(5)]
        apothem = r * math.cos(math.pi / 5)
        px = cx + rho * r * math.cos(t)
        py = cy + rho * r * math.sin(t)
        d = math.hypot(px - cx, py - cy)
        if d < apothem * 0.999:  # strictly inside the inscribed circle
            assert _inside_convex(xs, ys, px, py)
        elif d > r * 1.001:  # strictly outside the circumscribed circle
            assert not _inside_convex(xs, ys, px, py)
        # annulus between the circles: either answer is geometrically valid

    def test_boundary_inclusive_where_arithmetic_is_exact(self):
        # An axis-aligned unit square: vertices, edge midpoints, and the
        # center all evaluate their cross products EXACTLY (0 or ±1
        # halves), so >= 0 must classify every boundary point as inside.
        # (On a rotated polygon an FP midpoint is epsilon-off the edge —
        # the contract is exact-inequality inclusivity, not geometric.)
        xs, ys = [0.0, 1.0, 1.0, 0.0], [0.0, 0.0, 1.0, 1.0]
        for px, py in [(0, 0), (1, 0), (1, 1), (0, 1),
                       (0.5, 0), (1, 0.5), (0.5, 1), (0, 0.5), (0.5, 0.5)]:
            assert _inside_convex(xs, ys, px, py)
        for px, py in [(-0.1, 0.5), (1.1, 0.5), (0.5, -0.1), (0.5, 1.1)]:
            assert not _inside_convex(xs, ys, px, py)
