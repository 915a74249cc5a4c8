"""Connected-components dedup grouping (operators/dedup.py)."""

from __future__ import annotations

from hg_data_pipelines_spark.operators.dedup import connected_components


def _cc(spark, edges):
    df = spark.createDataFrame(edges, ["id_a", "id_b"])
    return {
        (r["node"], r["comp"]) for r in connected_components(df).collect()
    }


class TestConnectedComponents:
    def test_two_components_min_label(self, spark):
        # chain 1-2-3 plus pair 10-11; labels collapse to the min node id
        got = _cc(spark, [(1, 2), (2, 3), (10, 11)])
        assert got == {(1, 1), (2, 1), (3, 1), (10, 10), (11, 10)}

    def test_long_chain_converges(self, spark):
        # a 12-node path needs multiple propagation rounds (diameter 11)
        edges = [(i, i + 1) for i in range(12)]
        got = _cc(spark, edges)
        assert got == {(i, 0) for i in range(13)}

    def test_edge_order_and_direction_irrelevant(self, spark):
        got_fwd = _cc(spark, [(5, 4), (3, 4), (9, 3)])
        got_rev = _cc(spark, [(3, 9), (4, 3), (4, 5)])
        assert got_fwd == got_rev == {(3, 3), (4, 3), (5, 3), (9, 3)}

    def test_self_loop_singleton(self, spark):
        got = _cc(spark, [(7, 7)])
        assert got == {(7, 7)}

    def test_reliable_checkpoint_mode_identical(self, spark, tmp_path):
        # checkpoint_dir switches localCheckpoint -> reliable checkpoint();
        # labels must be identical in both modes.
        edges = [(i, i + 1) for i in range(8)] + [(20, 21), (21, 22)]
        df = spark.createDataFrame(edges, ["id_a", "id_b"])
        local = {
            (r["node"], r["comp"]) for r in connected_components(df).collect()
        }
        reliable = {
            (r["node"], r["comp"])
            for r in connected_components(
                df, checkpoint_dir=str(tmp_path / "ckpt")
            ).collect()
        }
        assert local == reliable
        # the reliable checkpoint actually wrote to the requested dir
        assert any((tmp_path / "ckpt").iterdir())
