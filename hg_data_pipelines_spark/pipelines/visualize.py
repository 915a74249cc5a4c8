"""The ``visualize`` asset: draw grouped detections onto panoramas.

Reference (street_level_grouping.py:313-337): PIL draws per-group colored
rectangles for detections with score > 0.9, resizes 1/5, writes annotated
photos and a base64 preview.

Spark-first translation: photos (binary RAW) broadcast-join their photo's
detections collected to one array; one ``mapInPandas`` pass draws borders
with pure numpy slicing (PIL absent — the RAW codec is the deployment
seam, multimodal.py), downscales by striding, and emits annotated RAW
bytes. Colors come from the reference's HSV wheel (colorsys, stdlib) —
deterministic: the reference shuffles with an unseeded ``random.shuffle``
(street_level_grouping.py:253), dropped per SURVEY.md §7.2 determinism
rules.
"""

from __future__ import annotations

import colorsys
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..multimodal import decode_image, encode_image

SCORE_CUTOFF = 0.9  # reference :323
RESIZE_STEP = 5     # reference :327 (w/5, h/5)
BORDER = 5          # reference :325 (width=5)


def unique_colors(n: int) -> list[tuple[int, int, int]]:
    """The reference's HSV color wheel (:237-254), without the unseeded
    shuffle."""
    out = []
    for i in range(max(n, 1)):
        r, g, b = colorsys.hsv_to_rgb(i / max(n, 1), 0.7, 0.9)
        out.append((int(r * 255), int(g * 255), int(b * 255)))
    return out


def _draw_rect(img: np.ndarray, x1: int, y1: int, x2: int, y2: int,
               color: tuple[int, int, int], width: int) -> None:
    h, w = img.shape[:2]
    x1, x2 = sorted((max(0, min(x1, w - 1)), max(0, min(x2, w - 1))))
    y1, y2 = sorted((max(0, min(y1, h - 1)), max(0, min(y2, h - 1))))
    c = np.array(color, dtype=np.uint8)
    img[y1 : y1 + width, x1 : x2 + 1] = c
    img[max(y2 - width + 1, 0) : y2 + 1, x1 : x2 + 1] = c
    img[y1 : y2 + 1, x1 : x1 + width] = c
    img[y1 : y2 + 1, max(x2 - width + 1, 0) : x2 + 1] = c


_OUT = T.StructType(
    [
        T.StructField("file_name", T.StringType()),
        T.StructField("n_drawn", T.IntegerType()),
        T.StructField("content", T.BinaryType()),
    ]
)


def annotate_detections(
    photos: DataFrame,
    grouped: DataFrame,
    score_cutoff: float = SCORE_CUTOFF,
) -> DataFrame:
    """(file_name, content) photos × grouped detections → annotated RAW.

    ``grouped`` needs (file_name, bbox, score, group_idx) — the
    ``grouped_detected_objects`` output. One shuffle: detections collect
    per photo (bounded per-photo cardinality), then the join against the
    photo bytes is by file_name.
    """
    dets = (
        grouped.filter(F.col("score") > score_cutoff)
        .groupBy("file_name")
        .agg(
            F.collect_list(
                F.struct("group_idx", "bbox")
            ).alias("dets"),
            # Palette indexed directly by group_idx (reference :325 does
            # colors[group_idx] over a detections-sized palette); sizing by
            # distinct-group COUNT and mod-indexing collides colors.
            (F.max("group_idx") + 1).alias("n_colors"),
        )
    )
    joined = photos.join(dets, "file_name", "left")

    def _annotate(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                img = decode_image(bytes(r["content"])).copy()
                n = 0
                if r["dets"] is not None and len(r["dets"]) > 0:
                    colors = unique_colors(int(r["n_colors"]))
                    for d in r["dets"]:
                        x1, y1, x2, y2 = (int(v) for v in d["bbox"])
                        _draw_rect(
                            img, x1, y1, x2, y2, colors[int(d["group_idx"])], BORDER
                        )
                        n += 1
                small = img[::RESIZE_STEP, ::RESIZE_STEP]
                rows.append(
                    {
                        "file_name": r["file_name"],
                        "n_drawn": n,
                        "content": encode_image(small),
                    }
                )
            yield pd.DataFrame(rows, columns=["file_name", "n_drawn", "content"])

    return joined.mapInPandas(_annotate, _OUT)
