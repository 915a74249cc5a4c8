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


class TestHllSketchRollup:
    def test_union_rollup_within_relative_error(self, spark):
        from pyspark.sql import functions as F

        from hg_data_pipelines_spark.io import load_table

        got = {
            r["region_name"]: r["n_customers"]
            for r in QUERIES["A9_hll_sketch_rollup"](spark, SF_DIR).collect()
        }
        c, n, reg = (
            load_table(spark, SF_DIR, t) for t in ("customer", "nation", "region")
        )
        exact = {
            r["r_name"]: r["n"]
            for r in c.join(n, c["c_nationkey"] == n["n_nationkey"])
            .join(reg, n["n_regionkey"] == reg["r_regionkey"])
            .groupBy("r_name")
            .agg(F.countDistinct("c_custkey").alias("n"))
            .collect()
        }
        assert set(got) == set(exact)
        for region, est in got.items():
            # lgConfigK=14 → relative standard error ≈ 0.8%; allow 3σ
            assert abs(est - exact[region]) <= max(2, 0.025 * exact[region])
