"""Panorama → perspective-crop fan-out (the image pipeline, §3.3).

Reference (tls_photo_processing.py:42-49): nested Python loops — for each
photo on disk, for each of 20 theta angles, project and write a crop.

Spark-first translation: ``photos ⨯ thetas`` is a literal ``crossJoin``
against a 20-row theta DataFrame, repartitioned so each (photo, theta) task
lands on an executor; the projection is one vectorized numpy kernel per row
inside ``mapInPandas`` (U2). This is the multimodal fan-out template (X5):
at 100 TB the input is a binaryFile scan and the cross join multiplies rows,
not bytes — each task re-reads only its photo's content column.

Pixels use the RAW stand-in codec (multimodal.py) because no image codec
ships in this container; the projection math is the real
``GetPerspective`` sampling grid (Equirec2Perspec.py:74-91) with bilinear
wrap resampling standing in for cv2's bicubic (documented deviation).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions import geometry as G
from ..multimodal import decode_image, encode_image

FOV = 60  # reference: ProjectionsConfig (tls_photo_processing.py:9-13)
PHI = -10
CROP_W = 1000
CROP_H = 1000


def theta_subdivisions(n: int = 20) -> list[int]:
    """[0, 18, 36, ..., 342] for n=20 (tls_photo_processing.py:16-21)."""
    return [int(i * (360 / n)) for i in range(n)]


_PROJ_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("theta", T.IntegerType()),
        T.StructField("crop_name", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def generate_projections(
    spark: SparkSession,
    photos: DataFrame,
    subdivisions: int = 20,
    crop_w: int = CROP_W,
    crop_h: int = CROP_H,
    fov: float = FOV,
    phi: float = PHI,
) -> DataFrame:
    """All (photo, theta) perspective crops as a lazy DataFrame.

    ``photos``: binaryFile-shaped (path, content) with RAW-encoded pixels.
    The crop file name convention ``{theta}_{photo_stem}`` matches the
    reference's writer (tls_photo_processing.py:37) — downstream
    ``results_file`` parses theta back out of it.
    """
    thetas = spark.createDataFrame(
        [(t,) for t in theta_subdivisions(subdivisions)], "theta int"
    )
    # 20 rows × photos: broadcast the tiny side; repartition the product so
    # every projection task can run in parallel (the fan-out is the point).
    fanout = photos.select("path", "content").crossJoin(F.broadcast(thetas))

    def _project(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        grid_cache: dict[tuple, object] = {}
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                img = decode_image(bytes(r["content"]))
                theta = int(r["theta"])
                key = (theta, img.shape[0], img.shape[1])
                if key not in grid_cache:
                    grid_cache[key] = G.perspective_grid(
                        fov, theta, phi, crop_h, crop_w, img.shape[0], img.shape[1]
                    )
                crop = G.sample_bicubic_wrap(img, grid_cache[key])
                stem = r["path"].rsplit("/", 1)[-1]
                rows.append(
                    {
                        "path": r["path"],
                        "theta": theta,
                        "crop_name": f"{theta}_{stem}",
                        "width": crop_w,
                        "height": crop_h,
                        "content": encode_image(crop),
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in _PROJ_SCHEMA.fields])

    return fanout.mapInPandas(_project, _PROJ_SCHEMA)
