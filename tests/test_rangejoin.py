"""Banded range join (operators/rangejoin.py)."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from hg_data_pipelines_spark.operators.rangejoin import banded_range_join


def _df(spark, rows, ts_name):
    return spark.createDataFrame(
        [(i, datetime(2024, 1, 1, 0, 0, s)) for i, s in rows],
        f"id_{ts_name} long, {ts_name} timestamp",
    )


def _pairs(spark, lrows, rrows, lower, upper, grain=None):
    left = _df(spark, lrows, "l")
    right = _df(spark, rrows, "r")
    out = banded_range_join(
        left, right, "l", "r", lower_us=lower, upper_us=upper, grain_us=grain
    )
    return {(r["id_l"], r["id_r"]) for r in out.collect()}


class TestBandedRangeJoin:
    def test_half_open_boundaries(self, spark):
        # window (0, 10s]: r at exactly l is excluded, at l+10s included
        got = _pairs(
            spark,
            [(1, 10)],
            [(1, 10), (2, 15), (3, 20), (4, 21)],
            lower=0,
            upper=10_000_000,
        )
        assert got == {(1, 2), (1, 3)}

    def test_grain_invariance(self, spark):
        lrows = [(i, 3 * i) for i in range(1, 12)]
        rrows = [(i, 2 * i + 1) for i in range(1, 18)]
        expected = _pairs(spark, lrows, rrows, 0, 7_000_000, grain=7_000_000)
        for grain in (1_000_000, 3_000_000, 20_000_000):
            assert _pairs(spark, lrows, rrows, 0, 7_000_000, grain=grain) == expected

    def test_nonzero_lower_bound(self, spark):
        # window (5s, 15s] after each left row
        got = _pairs(
            spark,
            [(1, 0)],
            [(1, 4), (2, 5), (3, 6), (4, 15), (5, 16)],
            lower=5_000_000,
            upper=15_000_000,
        )
        assert got == {(1, 3), (1, 4)}


class TestIntervalOverlapJoin:
    def _run(self, spark, a_rows, b_rows, grain=31):
        from hg_data_pipelines_spark.operators.rangejoin import (
            interval_overlap_join,
        )

        a = spark.createDataFrame(a_rows, "a_id long, s timestamp, e timestamp")
        b = spark.createDataFrame(b_rows, "b_id long, s2 timestamp, e2 timestamp")
        out = interval_overlap_join(a, b, "s", "e", "s2", "e2", grain)
        return {(r["a_id"], r["b_id"]) for r in out.collect()}

    def test_overlap_touching_and_disjoint(self, spark):
        import datetime as dt

        T = dt.datetime
        a = [(1, T(2024, 1, 1), T(2024, 1, 31))]
        b = [
            (10, T(2024, 1, 31), T(2024, 2, 5)),   # touches at a.e == b.s2
            (11, T(2024, 2, 1), T(2024, 2, 5)),    # disjoint
            (12, T(2023, 12, 1), T(2024, 1, 1)),   # touches at a.s == b.e2
            (13, T(2024, 1, 10), T(2024, 1, 12)),  # contained
        ]
        got = self._run(spark, a, b)
        assert got == {(1, 10), (1, 12), (1, 13)}

    def test_pair_spanning_many_bands_appears_once(self, spark):
        import datetime as dt

        T = dt.datetime
        # 100-day intervals with a 7-day grain: the pair meets in many
        # bands; first-shared-band filter must emit it exactly once
        a = [(1, T(2024, 1, 1), T(2024, 4, 10))]
        b = [(10, T(2024, 2, 1), T(2024, 5, 1))]
        got_rows = self._run(spark, a, b, grain=7)
        assert got_rows == {(1, 10)}

    def test_matches_theta_join_on_random_intervals(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        a = [
            (i, base + dt.timedelta(days=(i * 13) % 90),
             base + dt.timedelta(days=(i * 13) % 90 + (i % 11) + 1))
            for i in range(40)
        ]
        b = [
            (100 + j, base + dt.timedelta(days=(j * 7) % 95),
             base + dt.timedelta(days=(j * 7) % 95 + (j % 5) + 1))
            for j in range(40)
        ]
        want = {
            (ai, bj)
            for ai, s, e in a
            for bj, s2, e2 in b
            if s <= e2 and s2 <= e
        }
        assert self._run(spark, a, b, grain=12) == want

    def test_duplicate_input_rows_keep_multiplicity(self, spark):
        """Theta-join semantics: a duplicated input row pairs twice.
        (The old full-row distinct() collapsed these — regression for
        the first-shared-band dedup.)"""
        import datetime as dt

        from hg_data_pipelines_spark.operators.rangejoin import (
            interval_overlap_join,
        )

        T = dt.datetime
        a = spark.createDataFrame(
            [(1, T(2024, 1, 1), T(2024, 3, 20))] * 2,
            "a_id long, s timestamp, e timestamp",
        )
        b = spark.createDataFrame(
            [(10, T(2024, 2, 1), T(2024, 4, 1))],
            "b_id long, s2 timestamp, e2 timestamp",
        )
        out = interval_overlap_join(a, b, "s", "e", "s2", "e2", 7).collect()
        assert len(out) == 2  # once per duplicate left row, no band dup


class TestGridNeighborJoin:
    def _brute(self, pts_a, pts_b, r):
        import math

        out = set()
        for ia, xa, ya in pts_a:
            for ib, xb, yb in pts_b:
                if math.sqrt((xa - xb) ** 2 + (ya - yb) ** 2) <= r:
                    out.add((ia, ib))
        return out

    def _spark_pairs(self, spark, pts_a, pts_b, r):
        from hg_data_pipelines_spark.operators.rangejoin import grid_neighbor_join

        a = spark.createDataFrame(pts_a, "id_a long, ax double, ay double")
        b = spark.createDataFrame(pts_b, "id_b long, bx double, by double")
        out = grid_neighbor_join(a, b, "ax", "ay", "bx", "by", r)
        return {(row["id_a"], row["id_b"]) for row in out.collect()}

    def test_matches_bruteforce_pseudorandom(self, spark):
        # deterministic LCG points spread over many cells
        def lcg(seed, n):
            x, out = seed, []
            for _ in range(n):
                x = (x * 1103515245 + 12345) % (2**31)
                out.append(x / 2**31 - 0.5)
            return out

        xs, ys = lcg(7, 120), lcg(11, 120)
        pts = [(i, xs[i], ys[i]) for i in range(120)]
        r = 0.07
        assert self._spark_pairs(spark, pts, [
            (i + 1000, x, y) for i, x, y in pts
        ], r) == self._brute(pts, [(i + 1000, x, y) for i, x, y in pts], r)

    def test_boundary_pair_included_once(self, spark):
        # dist exactly r (horizontal), straddling a cell boundary
        pts_a = [(1, 0.0199, 0.0)]
        pts_b = [(2, 0.0399, 0.0), (3, 0.05, 0.0)]
        got = self._spark_pairs(spark, pts_a, pts_b, 0.02)
        assert got == {(1, 2)}

    def test_no_duplicate_candidates(self, spark):
        # same-cell AND adjacent-cell candidates emit exactly once
        from hg_data_pipelines_spark.operators.rangejoin import grid_neighbor_join

        a = spark.createDataFrame(
            [(1, 0.001, 0.001)], "id_a long, ax double, ay double"
        )
        b = spark.createDataFrame(
            [(2, 0.0015, 0.0015), (3, -0.001, -0.001)],
            "id_b long, bx double, by double",
        )
        rows = grid_neighbor_join(a, b, "ax", "ay", "bx", "by", 0.02).collect()
        assert sorted(r["id_b"] for r in rows) == [2, 3]
