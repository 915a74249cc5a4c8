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

        # the declared query outputs 5σ-band VIOLATIONS (empty, oracle-
        # checked); the estimate side is the helper it filters
        from hg_data_pipelines_spark.queries.stats_q import _hll_region_rollup

        assert QUERIES["A9_hll_sketch_rollup"](spark, SF_DIR).count() == 0
        got = {
            r["region_name"]: r["hll_estimate"]
            for r in _hll_region_rollup(spark, SF_DIR).collect()
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


class TestCountMinBloom:
    def test_cms_estimates_bound_exact_counts(self, spark, sf_dir):
        # rebuild the estimate side of A18 WITHOUT the violation filter:
        # every estimate must sit in [exact, total_rows]
        from hg_data_pipelines_spark.queries import stats_q
        from pyspark.sql import functions as F

        ev_types = stats_q.load(spark, sf_dir, "events").select("event_type")
        total = ev_types.count()
        cells = ev_types.select(
            "event_type",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, {stats_q._CMS_DEPTH - 1}),"
                    f" d -> pmod(xxhash64(event_type, d), {stats_q._CMS_WIDTH}))"
                )
            ).alias("depth", "bucket"),
        )
        counters = cells.groupBy("depth", "bucket").agg(
            F.count(F.lit(1)).alias("counter")
        )
        exact = ev_types.groupBy("event_type").agg(
            F.count(F.lit(1)).alias("exact_n")
        )
        keyed = exact.select(
            "event_type",
            "exact_n",
            F.posexplode(
                F.expr(
                    f"transform(sequence(0, {stats_q._CMS_DEPTH - 1}),"
                    f" d -> pmod(xxhash64(event_type, d), {stats_q._CMS_WIDTH}))"
                )
            ).alias("depth", "bucket"),
        )
        est = (
            keyed.join(F.broadcast(counters), ["depth", "bucket"])
            .groupBy("event_type", "exact_n")
            .agg(F.min("counter").alias("cms_estimate"))
            .collect()
        )
        assert est, "no event types"
        for r in est:
            assert r["exact_n"] <= r["cms_estimate"] <= total

    def test_bloom_filter_passes_all_members_and_prunes_some(self, spark, sf_dir):
        from hg_data_pipelines_spark.queries.stats_q import (
            _bloom_bits,
            _might_contain,
        )
        from hg_data_pipelines_spark.queries.common import load
        from pyspark.sql import functions as F

        cust, orders = load(spark, sf_dir, "customer", "orders")
        rich = cust.filter(F.col("c_acctbal") > 9000).select("c_custkey")
        bits = _bloom_bits(rich, "c_custkey")
        pruned = _might_contain(orders.select("o_custkey"), "o_custkey", bits)
        # no false negatives: every order whose customer is rich survives
        true_hits = orders.join(
            rich, orders["o_custkey"] == rich["c_custkey"], "left_semi"
        ).count()
        surviving_true = pruned.join(
            rich, pruned["o_custkey"] == rich["c_custkey"], "left_semi"
        ).count()
        assert surviving_true == true_hits
        # and the filter actually prunes (not a pass-through)
        assert pruned.count() < orders.count()


class TestCountMinSketch:
    def test_per_shard_grids_merge_to_global_estimates(self, spark, tmp_path):
        # THE Count-Min property worth a test: grids built per shard
        # (here per source) merge by elementwise addition into exactly
        # the grid a global build produces — the warehouse-rollup /
        # streaming-state contract. Verified end to end: merged-grid
        # estimates == global-grid estimates, and neither underestimates.
        import os

        from pyspark.sql import functions as F

        from hg_data_pipelines_spark.queries.corpus import (
            _CMS_W,
            cms_heavy_hitters_portable,
        )

        sf = "/root/testdata/sf0.001"
        from hg_data_pipelines_spark.queries.common import load

        docs = load(spark, sf, "documents")

        def bucket(jcol, termcol):
            return (
                F.conv(
                    F.substring(
                        F.md5(F.concat(jcol.cast("string"), F.lit(":"), termcol)),
                        1, 8,
                    ),
                    16, 10,
                ).cast("bigint")
                % _CMS_W
            )

        terms = docs.select(
            "source",
            F.explode(
                F.split(F.trim("text"), r"\s+")
            ).alias("term"),
        )
        hrows = spark.range(4).select(F.col("id").cast("int").alias("j"))
        keyed = terms.crossJoin(hrows).withColumn(
            "bucket", bucket(F.col("j"), F.col("term"))
        )
        per_shard = keyed.groupBy("source", "j", "bucket").agg(
            F.count(F.lit(1)).alias("counter")
        )
        merged = {
            (r["j"], r["bucket"]): r["c"]
            for r in per_shard.groupBy("j", "bucket")
            .agg(F.sum("counter").alias("c"))
            .collect()
        }
        global_grid = {
            (r["j"], r["bucket"]): r["c"]
            for r in keyed.groupBy("j", "bucket")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        }
        assert merged == global_grid

        out = cms_heavy_hitters_portable(spark, sf).collect()
        assert out and all(r["never_underestimates"] for r in out)
        assert all(r["overestimate"] >= 0 for r in out)
