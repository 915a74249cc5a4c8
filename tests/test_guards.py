"""Mechanical fences on fixture-scale-only quadratic twins (guards.py)."""

from __future__ import annotations

import pytest

from hg_data_pipelines_spark.operators.guards import fence_rows


class TestFenceRows:
    def test_under_limit_passes_through(self, spark):
        df = spark.range(10)
        assert fence_rows(df, what="x", scale_path="y", limit=10) is df

    def test_over_limit_raises_with_scale_pointer(self, spark):
        df = spark.range(11)
        with pytest.raises(ValueError, match="fixture-scale.*lsh_sibling"):
            fence_rows(df, what="x", scale_path="lsh_sibling", limit=10)

    def test_force_skips_even_count(self, spark):
        # force=True must not even run the count action
        df = spark.range(1_000_000_000_000)
        assert fence_rows(df, what="x", scale_path="y", limit=1, force=True) is df

    def test_knn_graph_exact_is_fenced(self, spark, monkeypatch):
        from hg_data_pipelines_spark.operators import guards
        from hg_data_pipelines_spark.operators.similarity import knn_graph_exact

        monkeypatch.setattr(guards, "QUADRATIC_FENCE_ROWS", 10)
        big = spark.range(20).selectExpr(
            "id AS vec_id", "array(1.0d, 2.0d) AS embedding"
        )
        with pytest.raises(ValueError, match="knn_graph_exact"):
            knn_graph_exact(big, k=2)
        # force=True bypasses the fence
        out = knn_graph_exact(big, k=2, n_chunks=2, force=True)
        assert out.count() == 40  # 20 queries × k=2

    def test_knn_graph_exact_runs_under_fence(self, spark):
        from hg_data_pipelines_spark.operators.similarity import knn_graph_exact

        small = spark.range(6).selectExpr(
            "id AS vec_id", "array(cast(id as double), 1.0d) AS embedding"
        )
        out = knn_graph_exact(small, k=2, n_chunks=2)
        assert out.count() == 12  # 6 queries × k=2


class TestFenceUniqueKeys:
    def test_unique_passes_through(self, spark):
        from hg_data_pipelines_spark.operators.guards import fence_unique_keys

        df = spark.createDataFrame([(1, "a"), (2, "b")], "k long, v string")
        assert fence_unique_keys(df, ["k"], what="dim") is df

    def test_duplicate_keys_raise_with_worst_offenders(self, spark):
        from hg_data_pipelines_spark.operators.guards import fence_unique_keys

        df = spark.createDataFrame(
            [(1, "a")] * 3 + [(2, "b")] * 2 + [(3, "c")], "k long, v string"
        )
        with pytest.raises(ValueError, match=r"dim.*not unique.*\(1,\)×3"):
            fence_unique_keys(df, ["k"], what="dim")

    def test_null_keys_follow_dq7_semantics(self, spark):
        from hg_data_pipelines_spark.operators.guards import fence_unique_keys

        # two NULL keys are duplicates of each other (struct counting)
        df = spark.createDataFrame(
            [(None, "a"), (None, "b")], "k string, v string"
        )
        with pytest.raises(ValueError, match="not unique"):
            fence_unique_keys(df, ["k"], what="dim")
        # a single NULL key is a real, unique key
        one = spark.createDataFrame([(None, "a"), ("x", "b")], "k string, v string")
        assert fence_unique_keys(one, ["k"], what="dim") is one

    def test_force_skips(self, spark):
        from hg_data_pipelines_spark.operators.guards import fence_unique_keys

        df = spark.createDataFrame([(1,), (1,)], "k long")
        assert fence_unique_keys(df, ["k"], what="dim", force=True) is df
