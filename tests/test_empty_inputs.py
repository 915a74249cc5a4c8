"""Degenerate-input behavior: every operator must return an empty (or
correctly-shaped) result for empty inputs, not throw — the guarantee
pipelines rely on when a filter stage happens to drain a partition."""

from __future__ import annotations

from pyspark.sql import functions as F

from hg_data_pipelines_spark.operators.dedup import (
    connected_components,
    dedup_exact,
    ngram_jaccard_pairs,
)
from hg_data_pipelines_spark.operators.quality import (
    Constraint,
    check_constraints,
    profile,
)
from hg_data_pipelines_spark.operators.scale import approx_top_k


class TestEmptyInputs:
    def test_connected_components_empty_edges(self, spark):
        edges = spark.createDataFrame([], "id_a long, id_b long")
        assert connected_components(edges).count() == 0

    def test_dedup_exact_empty(self, spark):
        df = spark.createDataFrame([], "k long, v long")
        assert dedup_exact(df, ["k"], ["v"]).count() == 0

    def test_jaccard_pairs_empty_docs(self, spark):
        docs = spark.createDataFrame([], "doc_id long, text string")
        assert ngram_jaccard_pairs(docs).count() == 0

    def test_profile_empty_table_reports_zero_rows(self, spark):
        df = spark.createDataFrame([], "id long, v double")
        rows = {r["column"]: r for r in profile(df, exact_distinct=True).collect()}
        assert rows["id"]["n_rows"] == 0
        assert rows["id"]["n_null"] == 0
        assert rows["v"]["min_value"] is None

    def test_constraints_empty_table_pass(self, spark):
        df = spark.createDataFrame([], "id long")
        out = check_constraints(df, [Constraint("pos", F.col("id") > 0)]).collect()
        assert out[0]["n_violations"] == 0 and out[0]["passed"]

    def test_approx_top_k_empty(self, spark):
        df = spark.createDataFrame([], "v string")
        assert approx_top_k(df, "v", k=5).count() == 0

    def test_asof_join_empty_right_yields_null_values(self, spark):
        from hg_data_pipelines_spark.operators.asof import asof_join

        left = spark.createDataFrame([(1, 10)], "k long, t long")
        right = spark.createDataFrame([], "k long, t long, val double")
        out = asof_join(
            left, right, "k", "k", "t", "t", value_cols=["val"]
        ).collect()
        assert len(out) == 1
        assert out[0]["asof_val"] is None


class TestEmptyInputsRound2:
    def test_pagerank_empty_edges(self, spark):
        from hg_data_pipelines_spark.operators.graph import pagerank_fixed_point

        edges = spark.createDataFrame([], "src long, dst long")
        assert pagerank_fixed_point(edges).count() == 0

    def test_funnel_empty_events(self, spark):
        from hg_data_pipelines_spark.operators.funnel import funnel_counts

        ev = spark.createDataFrame([], "user_id long, ts timestamp, event_type string")
        rows = {r["stage"]: r["n_users"] for r in funnel_counts(
            ev, ["signup", "view"]
        ).collect()}
        assert rows == {"signup": 0, "view": 0}

    def test_banded_range_join_empty_sides(self, spark):
        from hg_data_pipelines_spark.operators.rangejoin import banded_range_join

        left = spark.createDataFrame([], "id_l long, l timestamp")
        right = spark.createDataFrame([], "id_r long, r timestamp")
        assert banded_range_join(left, right, "l", "r", 0, 1_000_000).count() == 0

    def test_hamming_near_pairs_empty(self, spark):
        from hg_data_pipelines_spark.operators.dedup import hamming_near_pairs

        fp = spark.createDataFrame([], "doc_id long, h long")
        assert hamming_near_pairs(fp, "doc_id", "h").count() == 0

    def test_knn_graph_single_vector(self, spark):
        from hg_data_pipelines_spark.operators.similarity import knn_graph_exact

        one = spark.createDataFrame(
            [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
        )
        # a single vector has no neighbors; must not throw
        assert knn_graph_exact(one, k=3).count() == 0

    def test_video_metadata_empty(self, spark):
        from hg_data_pipelines_spark.multimodal import video_metadata

        df = spark.createDataFrame([], "path string, content binary")
        assert video_metadata(df).count() == 0

    def test_referential_integrity_empty_fact(self, spark):
        from hg_data_pipelines_spark.operators.quality import (
            ForeignKey,
            referential_integrity,
        )

        fact = spark.createDataFrame([], "id long, fk long")
        dim = spark.createDataFrame([(1,)], "pk long")
        r = referential_integrity(
            [ForeignKey("empty", fact, "fk", dim, "pk")]
        ).collect()[0]
        assert r["n_checked"] == 0 and r["n_orphans"] == 0 and r["passed"]

    def test_shortest_paths_empty_edges(self, spark):
        from hg_data_pipelines_spark.operators.graph import shortest_paths_bounded

        edges = spark.createDataFrame([], "src long, dst long, w long")
        got = shortest_paths_bounded(edges, source=7, rounds=2).collect()
        # only the source itself, at distance 0
        assert [(r["node"], r["dist_scaled"]) for r in got] == [(7, 0)]


class TestEmptyInputsRound9:
    def test_grid_neighbor_join_empty_sides(self, spark):
        from hg_data_pipelines_spark.operators.rangejoin import grid_neighbor_join

        a = spark.createDataFrame([], "id_a long, ax double, ay double")
        b = spark.createDataFrame(
            [(1, 0.0, 0.0)], "id_b long, bx double, by double"
        )
        assert grid_neighbor_join(a, b, "ax", "ay", "bx", "by", 0.1).count() == 0
        assert grid_neighbor_join(
            b.selectExpr("id_b as id_a", "bx as ax", "by as ay"),
            a.selectExpr("id_a as id_b", "ax as bx", "ay as by"),
            "ax", "ay", "bx", "by", 0.1,
        ).count() == 0

    def test_snapshot_diff_identical_versions_empty_feed(self, spark, tmp_path):
        from hg_data_pipelines_spark.snapshots import (
            snapshot_diff,
            write_table_snapshot,
        )

        df = spark.createDataFrame([(1, 10.0), (2, 20.0)], "id long, v double")
        wh = str(tmp_path / "wh")
        write_table_snapshot(df, wh, "t")
        write_table_snapshot(df, wh, "t")
        assert snapshot_diff(spark, wh, "t", 1, 2, ["id"]).count() == 0

    def test_incremental_join_empty_deltas_is_base_join(self, spark):
        # with both deltas empty the maintenance equation degenerates to
        # the stored view — union of 4 terms must equal the plain join
        a = spark.createDataFrame([(1, 5), (2, 6)], "o_custkey long, o long")
        b = spark.createDataFrame([(1, 7)], "c_custkey long, c long")
        ea = spark.createDataFrame([], "o_custkey long, o long")
        eb = spark.createDataFrame([], "c_custkey long, c long")
        base = a.join(b, a["o_custkey"] == b["c_custkey"]).count()
        terms = (
            a.join(b, a["o_custkey"] == b["c_custkey"]).count()
            + ea.join(b, ea["o_custkey"] == b["c_custkey"]).count()
            + a.join(eb, a["o_custkey"] == eb["c_custkey"]).count()
            + ea.join(eb, ea["o_custkey"] == eb["c_custkey"]).count()
        )
        assert terms == base
