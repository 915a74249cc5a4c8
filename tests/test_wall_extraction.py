"""Wall-plane extraction (U7) on a synthetic building mesh: two parallel
walls with distinct azimuths must come out as distinct planes with correct
normals/bounds; roof faces (non-vertical normals) must be excluded."""

from __future__ import annotations

import numpy as np
import pytest

from hg_data_pipelines_spark.pipelines.wall_extraction import (
    DBSCAN_MIN_SAMPLES,
    extract_wall_planes,
    parse_obj_faces,
)


def _grid_wall(x0, y0, z0, dx, dy, nx=128, nz=4, height=10.0):
    """OBJ chunk: a wall plane tessellated into nx×nz quads (2 tris each).

    Density matters: features are (azimuth, cx, cy) only and standard
    scaling normalizes the spread, so with the reference's eps=0.03 the
    column gap (~3.4/nx scaled units) must stay under eps for the wall to
    connect into ONE cluster — nx=128 gives gap≈0.027 with ≥20 points in
    each eps-neighborhood (tuned empirically; 2 clusters, 0 noise)."""
    lines = []
    verts = []
    for i in range(nx + 1):
        for k in range(nz + 1):
            verts.append(
                (x0 + dx * i, y0 + dy * i, z0 + height * k / nz)
            )
    base = len(verts)
    vtx_lines = [f"v {x} {y} {z}" for x, y, z in verts]
    face_lines = []
    for i in range(nx):
        for k in range(nz):
            a = i * (nz + 1) + k + 1
            b = (i + 1) * (nz + 1) + k + 1
            face_lines.append(f"f {a} {b} {b + 1}")
            face_lines.append(f"f {a} {b + 1} {a + 1}")
    return vtx_lines, face_lines


def _building_obj():
    """Two orthogonal tessellated walls + a flat roof (filtered out)."""
    v1, f1 = _grid_wall(0, 0, 0, 1.0, 0.0)       # along +x → normal ±y
    out = list(v1)
    faces = list(f1)
    off = len(v1)
    v2, f2 = _grid_wall(20, 0, 0, 0.0, 1.0)      # along +y → normal ±x
    out += v2
    for line in f2:
        idx = [int(t) + off for t in line.split()[1:]]
        faces.append("f " + " ".join(str(i) for i in idx))
    off2 = off + len(v2)
    # roof: one horizontal quad (normal ±z → excluded by vertical filter)
    out += ["v 0 0 10", "v 8 0 10", "v 8 8 10", "v 0 8 10"]
    faces.append(f"f {off2+1} {off2+2} {off2+3}")
    faces.append(f"f {off2+1} {off2+3} {off2+4}")
    return "\n".join(out + faces)


class TestMeshLoaders:
    def test_obj_negative_indices(self):
        # relative indices (-3,-2,-1) = the last three vertices, per spec
        obj = "v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n"
        from hg_data_pipelines_spark.pipelines.wall_extraction import (
            parse_obj_triangles,
        )

        tris = parse_obj_triangles(obj)
        assert tris.shape == (1, 3, 3)
        assert tris[0, 1, 0] == 1.0 and tris[0, 2, 1] == 1.0

    def test_binary_stl_round_trip(self):
        import struct

        from hg_data_pipelines_spark.pipelines.wall_extraction import (
            parse_stl_triangles,
        )

        tri = [(0, 0, 0), (2, 0, 0), (0, 3, 0)]
        rec = struct.pack("<3f", 0, 0, 1)
        for v in tri:
            rec += struct.pack("<3f", *v)
        rec += b"\x00\x00"
        data = b"\x00" * 80 + struct.pack("<I", 1) + rec
        tris = parse_stl_triangles(data)
        assert tris.shape == (1, 3, 3)
        assert tris[0, 1, 0] == 2.0 and tris[0, 2, 1] == 3.0

    def test_ascii_stl(self):
        from hg_data_pipelines_spark.pipelines.wall_extraction import (
            parse_stl_triangles,
        )

        text = (
            "solid t\n facet normal 0 0 1\n  outer loop\n"
            "   vertex 0 0 0\n   vertex 1 0 0\n   vertex 0 1 0\n"
            "  endloop\n endfacet\nendsolid t\n"
        )
        tris = parse_stl_triangles(text.encode())
        assert tris.shape == (1, 3, 3)


class TestWallExtraction:
    def test_two_walls_extracted(self, spark):
        pdf = parse_obj_faces(_building_obj())
        assert len(pdf) == 128 * 4 * 2 * 2 + 2
        faces = spark.createDataFrame(pdf)
        walls = extract_wall_planes(faces).collect()

        assert len(walls) == 2, [
            (w["n_faces"], w["avg_nx"], w["avg_ny"]) for w in walls
        ]
        for w in walls:
            assert w["n_faces"] >= DBSCAN_MIN_SAMPLES
            # each wall normal is horizontal and axis-aligned
            n = np.array([w["avg_nx"], w["avg_ny"], w["avg_nz"]])
            assert abs(n[2]) < 1e-9
            assert max(abs(n[0]), abs(n[1])) == pytest.approx(1.0, abs=1e-9)
        # bounds: wall 1 spans x∈[0,128] at y=0; wall 2 spans y∈[0,128]
        # at x=20 (128 columns × dx=1)
        by_axis = {round(abs(w["avg_ny"])): w for w in walls}
        wall_y = by_axis[1]  # normal ±y → the wall running along x
        assert wall_y["min_x"] >= 0 and wall_y["max_x"] <= 128.0
        assert wall_y["min_y"] == pytest.approx(0.0, abs=1e-9)
        wall_x = by_axis[0]
        assert wall_x["min_x"] == pytest.approx(20.0, abs=1e-9)
        assert wall_x["max_y"] <= 128.0

    def test_roof_excluded_and_tiling_matches_global(self, spark):
        pdf = parse_obj_faces(_building_obj())
        faces = spark.createDataFrame(pdf)
        # huge tile = same result set as the global run (order-insensitive)
        global_walls = {
            (w["n_faces"], round(w["avg_nx"], 6), round(w["avg_ny"], 6))
            for w in extract_wall_planes(faces).collect()
        }
        tiled_walls = {
            (w["n_faces"], round(w["avg_nx"], 6), round(w["avg_ny"], 6))
            for w in extract_wall_planes(faces, tile_size=1000.0).collect()
        }
        assert global_walls == tiled_walls
