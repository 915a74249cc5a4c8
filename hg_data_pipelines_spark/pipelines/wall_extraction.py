"""Wall-plane extraction from a LiDAR mesh (U7).

Reference (helpers/MeshWallExtractror.py:34-90): load mesh → face normals →
keep near-vertical faces (|nz| < 0.1) → features = (azimuth°×1e4,
centroid_xy×1e-3) → StandardScaler → DBSCAN(eps=0.03, min_samples=20) →
per-cluster mean normal + centroid bounds. Single machine, sklearn.

Spark-first translation: the mesh faces become a DataFrame of
(face_id, normal, centroid); the vertical filter and azimuth are built-in
column expressions (JVM-side); clustering runs per *spatial tile* inside
``applyInPandas`` with the engine's own StandardScaler/DBSCAN kernels
(functions/geometry.py — sklearn isn't a dependency), and the per-cluster
aggregation (A4) is a plain groupBy over (tile, label).

Scale: a 100 TB point-cloud campaign has many meshes/tiles; each tile's
face count is bounded (DBSCAN is O(n²) within a tile only). The reference
clusters one whole mesh at once — identical semantics when a single tile
covers the mesh (``tile_size=None``), which is what the parity tests use.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import geometry as G

VERTICAL_THRESHOLD = 0.1  # radians-ish |nz| bound (MeshWallExtractror.py:18)
ANGLE_WEIGHT = 10000.0
CENTROID_WEIGHT = 0.001
DBSCAN_EPS = 0.03
DBSCAN_MIN_SAMPLES = 20

FACES_SCHEMA = T.StructType(
    [
        T.StructField("face_id", T.LongType()),
        T.StructField("normal", T.ArrayType(T.DoubleType())),
        T.StructField("centroid", T.ArrayType(T.DoubleType())),
    ]
)


def parse_obj_faces(obj_text: str) -> pd.DataFrame:
    """Tiny OBJ reader → (face_id, normal, centroid) rows.

    Replaces ``pv.read`` for test fixtures; triangulates fan-wise, normals
    from the cross product (what pyvista's ``compute_normals`` yields for
    planar cells). Deployment swaps in a real mesh loader at this seam.
    """
    verts: list[list[float]] = []
    rows = []
    fid = 0
    for line in obj_text.splitlines():
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "v":
            verts.append([float(x) for x in parts[1:4]])
        elif parts[0] == "f":
            idx = [_obj_index(p, len(verts)) for p in parts[1:]]
            for k in range(1, len(idx) - 1):
                tri = np.array([verts[idx[0]], verts[idx[k]], verts[idx[k + 1]]])
                n = np.cross(tri[1] - tri[0], tri[2] - tri[0])
                norm = np.linalg.norm(n)
                if norm > 0:
                    n = n / norm
                rows.append(
                    {
                        "face_id": fid,
                        "normal": [float(x) for x in n],
                        "centroid": [float(x) for x in tri.mean(axis=0)],
                    }
                )
                fid += 1
    return pd.DataFrame(rows, columns=["face_id", "normal", "centroid"])


def parse_obj_triangles(obj_text: str) -> np.ndarray:
    """OBJ text → (M, 3, 3) triangle vertex array (fan triangulation).

    The mesh-intersection stage's input shape
    (``point_and_mesh_intersection`` broadcasts it); same seam as
    ``parse_obj_faces`` — a production deployment swaps in a real loader.
    """
    verts: list[list[float]] = []
    tris: list[list[list[float]]] = []
    for line in obj_text.splitlines():
        parts = line.split()
        if not parts:
            continue
        if parts[0] == "v":
            verts.append([float(x) for x in parts[1:4]])
        elif parts[0] == "f":
            idx = [_obj_index(p, len(verts)) for p in parts[1:]]
            for k in range(1, len(idx) - 1):
                tris.append([verts[idx[0]], verts[idx[k]], verts[idx[k + 1]]])
    return np.asarray(tris, dtype=np.float64).reshape(-1, 3, 3)


def _obj_index(token: str, n_verts: int) -> int:
    """OBJ face index → 0-based: positive is 1-based, negative is relative
    to the vertices seen so far (both forms are in the OBJ spec and both
    appear in exporter output)."""
    i = int(token.split("/")[0])
    return i - 1 if i > 0 else n_verts + i


def parse_stl_triangles(data: bytes) -> np.ndarray:
    """STL bytes (binary or ASCII) → (M, 3, 3) triangle vertex array.

    Same contract as ``parse_obj_triangles`` for the broadcast
    mesh-intersection input. Binary STL: 80-byte header, uint32 count,
    50-byte records (normal + 3 vertices float32 + attribute uint16).
    ASCII STL: ``vertex x y z`` lines, three per facet.
    """
    import struct as _struct

    if len(data) >= 84:
        (count,) = _struct.unpack("<I", data[80:84])
        # exact binary record length is the discriminator — an ASCII file
        # matching it by coincidence is (2^-32)-level unlikely
        if len(data) == 84 + 50 * count:
            arr = np.frombuffer(data, dtype=np.uint8, offset=84)
            recs = arr.reshape(count, 50)
            floats = recs[:, :48].copy().view("<f4").reshape(count, 4, 3)
            return floats[:, 1:4, :].astype(np.float64)
    text = data.decode("ascii", errors="ignore")
    verts = [
        [float(x) for x in line.split()[1:4]]
        for line in text.splitlines()
        if line.strip().startswith("vertex")
    ]
    if len(verts) % 3:
        raise ValueError("ASCII STL vertex count not a multiple of 3")
    return np.asarray(verts, dtype=np.float64).reshape(-1, 3, 3)


_CLUSTERED = T.StructType(
    [
        T.StructField("tile", T.LongType()),
        T.StructField("face_id", T.LongType()),
        T.StructField("normal", T.ArrayType(T.DoubleType())),
        T.StructField("centroid", T.ArrayType(T.DoubleType())),
        T.StructField("label", T.IntegerType()),
    ]
)


def _cluster_tile(pdf: pd.DataFrame) -> pd.DataFrame:
    # Stable order: DBSCAN label numbering follows row order (sklearn too).
    pdf = pdf.sort_values("face_id").reset_index(drop=True)
    normals = np.array([list(n) for n in pdf["normal"]])
    centroids = np.array([list(c) for c in pdf["centroid"]])
    azimuth_deg = np.degrees(np.arctan2(normals[:, 1], normals[:, 0])) % 360.0
    features = np.hstack(
        [
            (azimuth_deg * ANGLE_WEIGHT).reshape(-1, 1),
            centroids[:, :2] * CENTROID_WEIGHT,
        ]
    )
    scaled = G.standard_scale(features)
    pdf["label"] = G.dbscan(scaled, DBSCAN_EPS, DBSCAN_MIN_SAMPLES).astype("int32")
    return pdf


def extract_wall_planes(
    faces: DataFrame, tile_size: float | None = None
) -> DataFrame:
    """Cluster near-vertical faces into wall planes; aggregate per plane.

    ``faces``: FACES_SCHEMA rows. ``tile_size``: spatial tiling edge in
    mesh units (None = one global tile, exact reference semantics).
    Output: one row per (tile, wall) with the reference's plane summary —
    avg normal/centroid and the centroid bounding box
    (MeshWallExtractror.py:74-88).
    """
    vertical = faces.filter(
        F.abs(F.col("normal").getItem(2)) < VERTICAL_THRESHOLD
    )
    if tile_size is None:
        tiled = vertical.withColumn("tile", F.lit(0).cast("long"))
    else:
        # Grid tile id from the 2D centroid — clustering never crosses a
        # tile boundary, which bounds the per-task O(n²) DBSCAN.
        tiled = vertical.withColumn(
            "tile",
            (
                F.floor(F.col("centroid").getItem(0) / tile_size) * 100000
                + F.floor(F.col("centroid").getItem(1) / tile_size)
            ).cast("long"),
        )

    clustered = tiled.groupBy("tile").applyInPandas(_cluster_tile, _CLUSTERED)

    walls = (
        clustered.filter(F.col("label") >= 0)  # -1 = DBSCAN noise
        .groupBy("tile", "label")
        .agg(
            F.count(F.lit(1)).alias("n_faces"),
            *[
                F.avg(F.col("normal").getItem(i)).alias(f"avg_n{ax}")
                for i, ax in enumerate("xyz")
            ],
            *[
                F.avg(F.col("centroid").getItem(i)).alias(f"avg_c{ax}")
                for i, ax in enumerate("xyz")
            ],
            *[
                F.min(F.col("centroid").getItem(i)).alias(f"min_{ax}")
                for i, ax in enumerate("xyz")
            ],
            *[
                F.max(F.col("centroid").getItem(i)).alias(f"max_{ax}")
                for i, ax in enumerate("xyz")
            ],
        )
    )
    return walls
