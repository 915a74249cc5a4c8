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
