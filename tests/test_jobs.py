"""Scheduled-job layer: run the registered pipelines end-to-end through
``run_pipeline`` — stages materialize Parquet in topological order, reports
carry the Dagster-style schema/rows metadata, and DuckDB (the warehouse
consumer) reads every landed table."""

from __future__ import annotations

import json

import duckdb
import numpy as np
import pytest

from hg_data_pipelines_spark.jobs import get_pipeline, run_pipeline

from test_pipelines import _fixture_pose, _fixture_results


@pytest.fixture(scope="module")
def job_fixtures(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("jobs")
    results_path, photos = _fixture_results(tmp)
    pose_path = _fixture_pose(tmp, photos)
    return {"results": results_path, "pose": pose_path, "tmp": tmp}


def _box_mesh():
    cx, cy, cz, s = 582102.0, 6002248.0, 97.3, 50.0
    v = np.array(
        [[cx - s, cy - s, cz - s], [cx + s, cy - s, cz - s],
         [cx + s, cy + s, cz - s], [cx - s, cy + s, cz - s],
         [cx - s, cy - s, cz + s], [cx + s, cy - s, cz + s],
         [cx + s, cy + s, cz + s], [cx - s, cy + s, cz + s]]
    )
    tris = []
    for a, b, c, d in [(0, 1, 2, 3), (4, 5, 6, 7), (0, 1, 5, 4),
                       (2, 3, 7, 6), (1, 2, 6, 5), (0, 3, 7, 4)]:
        tris += [[v[a], v[b], v[c]], [v[a], v[c], v[d]]]
    return np.array(tris)


class TestJobLayer:
    def test_detected_objects_pipeline(self, spark, job_fixtures):
        wh = str(job_fixtures["tmp"] / "wh1")
        ctx = run_pipeline(
            spark,
            "detected_objects_processing",
            wh,
            {"results_json_path": job_fixtures["results"]},
        )
        rep = ctx.reports["detected_objects"]
        assert rep["rows"] == 40
        assert "polygon:string" in rep["schema"]
        # warehouse consumer: DuckDB reads the landed table directly (S9)
        con = duckdb.connect()
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{wh}/detected_objects/*.parquet')"
        ).fetchone()[0]
        assert n == 40

    def test_street_level_pipeline_chain(self, spark, job_fixtures):
        wh = str(job_fixtures["tmp"] / "wh2")
        ctx = run_pipeline(
            spark,
            "street_level_grouping",
            wh,
            {
                "results_json_path": job_fixtures["results"],
                "pose_csv_path": job_fixtures["pose"],
                "mesh_triangles": _box_mesh(),
            },
        )
        # stages ran in order and materialized
        assert list(ctx.reports) == [
            "grouped_detected_objects",
            "best_lines_3d",
            "point_and_mesh_intersection",
        ]
        assert ctx.reports["grouped_detected_objects"]["rows"] == 40
        assert ctx.reports["best_lines_3d"]["rows"] > 0
        final = ctx.reports["point_and_mesh_intersection"]
        assert final["rows"] > 0
        con = duckdb.connect()
        n = con.execute(
            f"SELECT count(*) FROM read_parquet('{wh}/point_and_mesh_intersection/*.parquet')"
        ).fetchone()[0]
        assert n == final["rows"]

    def test_rerun_is_idempotent(self, spark, job_fixtures):
        wh = str(job_fixtures["tmp"] / "wh3")
        cfg = {"results_json_path": job_fixtures["results"], "with_uuid": False}
        r1 = run_pipeline(spark, "detected_objects_processing", wh, cfg)
        r2 = run_pipeline(spark, "detected_objects_processing", wh, cfg)
        assert r1.reports["detected_objects"]["rows"] == r2.reports[
            "detected_objects"
        ]["rows"]

    def test_unknown_pipeline_raises(self, spark):
        with pytest.raises(KeyError):
            get_pipeline("no_such_pipeline")
