"""Approximate-percentile sketch accuracy vs the exact A10 values."""

from __future__ import annotations

from hg_data_pipelines_spark.queries.common import QUERIES

SF_DIR = "/root/testdata/sf0.001"


class TestApproxPercentiles:
    def test_within_rank_error_of_exact(self, spark):
        exact = {
            r["l_returnflag"]: r
            for r in QUERIES["A10_exact_percentiles"](spark, SF_DIR).collect()
        }
        approx = {
            r["l_returnflag"]: r
            for r in QUERIES["A16_approx_percentiles"](spark, SF_DIR).collect()
        }
        assert set(exact) == set(approx)
        for flag, e in exact.items():
            a = approx[flag]
            spread = e["hi"] - e["lo"]
            for p in ("p50", "p90", "p99"):
                # accuracy=10000 → rank error ≤ 1/10000; value tolerance
                # generous (1% of the group's spread) since exact uses
                # interpolation and the sketch returns sample values
                assert abs(a[p] - e[p]) <= 0.01 * spread, (flag, p)
