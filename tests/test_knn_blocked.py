"""Pivot-pruned blocked exact kNN (operators/similarity.py
knn_graph_blocked): output must equal knn_graph_exact bit-for-bit — the
triangle-inequality pruning affects COST only, never the result. These
tests pin the equality on adversarial shapes (duplicates / rounding
ties / tiny cells) that the declared X11 oracle can't construct.
"""

from __future__ import annotations

import pytest

from hg_data_pipelines_spark.operators.similarity import (
    knn_graph_blocked,
    knn_graph_exact,
)


def _rows(df):
    return sorted(
        (r["query_id"], r["neighbor_id"], r["cosine"], r["rank"])
        for r in df.collect()
    )


def _vec(seed, dim=8):
    # deterministic pseudo-vectors without Python RNG state
    return [float(((seed * 1103515245 + d * 12345 + 6789) % 2000) - 1000) / 997.0
            for d in range(dim)]


class TestKnnBlockedEqualsExact:
    def test_fixture_embeddings_equal(self, spark):
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        exact = _rows(knn_graph_exact(emb, k=3))
        blocked = _rows(knn_graph_blocked(emb, k=3, small_n=0))
        assert blocked == exact
        assert len(blocked) > 0

    def test_duplicate_vectors_and_ties(self, spark):
        # 30 points in 3 exact-duplicate families: every cosine within a
        # family is 1.0, so ranking is decided purely by the rounded-tie
        # path (neighbor_id ASC) the slack term exists for
        rows = [(i, _vec(i % 3)) for i in range(30)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        assert _rows(knn_graph_blocked(df, k=4, small_n=0)) == _rows(
            knn_graph_exact(df, k=4, force=True)
        )

    def test_small_cells_fall_back_to_full_scan(self, spark):
        # n_cells == n: every cell is a singleton, every tau is inf,
        # every query scans everything — still exact, never wrong
        rows = [(i, _vec(i)) for i in range(12)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        assert _rows(knn_graph_blocked(df, k=3, n_cells=12, small_n=0)) == _rows(
            knn_graph_exact(df, k=3, force=True)
        )

    def test_single_cell_degenerates_to_exact(self, spark):
        rows = [(i, _vec(i * 7 + 1)) for i in range(15)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        assert _rows(knn_graph_blocked(df, k=2, n_cells=1, small_n=0)) == _rows(
            knn_graph_exact(df, k=2, force=True)
        )

    def test_string_ids(self, spark):
        rows = [(f"doc{i:03d}", _vec(i * 3 + 2)) for i in range(20)]
        df = spark.createDataFrame(rows, "vec_id string, embedding array<double>")
        assert _rows(knn_graph_blocked(df, k=3, small_n=0)) == _rows(
            knn_graph_exact(df, k=3, force=True)
        )


class TestSizeGate:
    def test_small_input_dispatches_to_all_pairs_kernel(self, spark):
        # Below the small_n gate the plan must be the chunked all-pairs
        # kernel (one cogroup, no tau FlatMapGroupsInPandas stage); the
        # blocked machinery only engages above the gate. Results are
        # bit-identical either way (pinned above), so this pins COST.
        rows = [(i, _vec(i)) for i in range(40)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        gated = knn_graph_blocked(df, k=3)  # default small_n ≫ 40
        plan = gated._jdf.queryExecution().executedPlan().toString()
        assert "FlatMapGroupsInPandas" not in plan  # tau stage absent
        forced = knn_graph_blocked(df, k=3, small_n=0)
        fplan = forced._jdf.queryExecution().executedPlan().toString()
        assert "FlatMapGroupsInPandas" in fplan  # tau stage present
        assert _rows(gated) == _rows(forced)
