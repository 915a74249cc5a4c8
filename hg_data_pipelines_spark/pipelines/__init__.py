"""The reference's three asset pipelines, re-expressed as Spark jobs.

Each module is one Dagster asset group from the reference
(SURVEY.md §3.1-3.3):

- ``detected_objects``: results.json → warehouse table (§3.2, the t2 shape)
- ``street_level``: IoU grouping → best rows → 3D rays → mesh intersection
- ``photo_fanout``: panorama × theta cross join → perspective crops (§3.3)

The Dagster DAG becomes an ordered list of DataFrame stages; each stage
reads upstream Parquet (or takes the upstream DataFrame directly for a
fused single-job run) and writes Parquet.
"""

from .detected_objects import build_detected_objects  # noqa: F401
from .street_level import (  # noqa: F401
    best_lines_3d,
    grouped_detected_objects,
    point_and_mesh_intersection,
)
from .photo_fanout import generate_projections, theta_subdivisions  # noqa: F401
from .results_builder import build_results  # noqa: F401
