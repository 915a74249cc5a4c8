"""Fixed-point k-means (operators/clustering.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hg_data_pipelines_spark.operators.clustering import (
    cluster_balanced_sample,
    kmeans_fixed_point,
)


def _vecs(spark, rows):
    return spark.createDataFrame(
        rows, "vec_id bigint, embedding array<float>"
    )


class TestKmeansFixedPoint:
    def test_two_obvious_clusters(self, spark):
        # ids 0,1 seed the two clusters; the rest sit clearly nearer one
        rows = [
            (0, [0.0, 0.0]),
            (1, [10.0, 10.0]),
            (2, [0.1, -0.1]),
            (3, [9.9, 10.2]),
            (4, [0.2, 0.1]),
            (5, [10.1, 9.8]),
        ]
        out = kmeans_fixed_point(_vecs(spark, rows), k=2, iters=3)
        got = {r["vec_id"]: r["cluster"] for r in out.collect()}
        assert got == {0: 0, 2: 0, 4: 0, 1: 1, 3: 1, 5: 1}

    def test_partitioning_invariance(self, spark):
        rows = [
            (i, [float((i * 7) % 13), float((i * 5) % 11), float(i % 3)])
            for i in range(40)
        ]
        base = kmeans_fixed_point(_vecs(spark, rows), k=4, iters=3)
        shuffled = kmeans_fixed_point(
            _vecs(spark, rows).repartition(7), k=4, iters=3
        )
        assert sorted(map(tuple, base.collect())) == sorted(
            map(tuple, shuffled.collect())
        )

    def test_dist_is_integer_grid_squared_l2(self, spark):
        rows = [(0, [0.0, 0.0]), (1, [1.0, 0.0]), (2, [0.0, 0.0])]
        out = {
            r["vec_id"]: r for r in kmeans_fixed_point(
                _vecs(spark, rows), k=2, iters=1
            ).collect()
        }
        # vec 2 equals seed 0 exactly -> dist 0
        assert out[2]["cluster"] == 0 and out[2]["dist"] == 0

    def test_missing_seeds_raise(self, spark):
        with pytest.raises(ValueError, match="seed"):
            kmeans_fixed_point(_vecs(spark, [(0, [1.0])]), k=3, iters=1)


class TestClusterBalancedSample:
    def test_head_per_cluster(self, spark):
        df = spark.createDataFrame(
            [(i, i % 3) for i in range(30)], "vec_id bigint, cluster int"
        )
        out = cluster_balanced_sample(df, per_cluster=2)
        got = sorted((r["cluster"], r["vec_id"]) for r in out.collect())
        assert got == [(0, 0), (0, 3), (1, 1), (1, 4), (2, 2), (2, 5)]

    def test_small_cluster_kept_whole(self, spark):
        df = spark.createDataFrame(
            [(1, 0), (2, 0), (3, 1)], "vec_id bigint, cluster int"
        )
        assert cluster_balanced_sample(df, per_cluster=5).count() == 3
