"""Oracle-checked geometry queries (U1, P11) + the SQL surface.

The panorama fixtures aren't TESTDATA tables, so these queries derive
pixel/bbox inputs deterministically from lineitem integers and check the
geometric math itself against DuckDB computing the same formulas — putting
the pixel→ray kernel (the street-level pipeline's hot path) and the seam
bbox normalization under the value-hash gate instead of only pytest.

Trig outputs are quantized to 6dp with ``floor(v*1e6 + 0.5)/1e6`` — the
identical IEEE operation sequence on both engines (library ``round()``
semantics differ: Python half-even on the decimal value, DuckDB half-away
on the double product). 6dp absorbs last-ulp libm noise while catching any
formula error, which shifts values by orders of magnitude more.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.functions import pandas_udf

from .common import load, query

W, H = 8000, 4000

# Fixed pose for the U1 check (arbitrary but non-trivial angles).
_ROLL, _PITCH, _HEADING = -1.2, 0.35, 3.7  # radians
_ORIGIN = (582100.0, 6002250.0, 97.3)


@pandas_udf(T.ArrayType(T.LongType()))
def _ray_udf(px: pd.Series, py: pd.Series) -> pd.Series:
    # Vectorized reference math (street_level_grouping.py:257-299) — the
    # same kernel the street-level pipeline uses.
    from ..functions.geometry import pixels_to_rays

    # Declared output is the origin-relative ray (unit-sphere magnitudes),
    # computed with a ZERO origin — adding the 6e6-magnitude origin and
    # subtracting it back would cost ~1e-9 (one ulp at 6e6), visible at 6dp.
    rays = pixels_to_rays(
        px.to_numpy(dtype=np.float64),
        py.to_numpy(dtype=np.float64),
        _ROLL,
        _PITCH,
        _HEADING,
        np.zeros(3),
        W,
        H,
    )
    # Quantization is floor(v*1e6 + 0.5) kept as a BIGINT micro-unit —
    # the same IEEE operation sequence DuckDB's oracle runs. Library
    # round() is NOT portable: Python rounds the correctly-converted
    # decimal (half-even), DuckDB rounds the double product (half-away),
    # and they disagree near half-points even on bit-identical inputs.
    # Integers (not /1e6 doubles) keep the declared output scalar-exact:
    # the driver's pandas canonicalizer is dtype-sensitive and cannot
    # sort/hash array columns, so the query surfaces the three components
    # as int64 scalars.
    return pd.Series(
        [[int(math.floor(float(v) * 1e6 + 0.5)) for v in r] for r in rays]
    )


def _sql_ray() -> str:
    """The same R = Rz·Ry·Rx pixel→ray formula, expanded symbolically for
    DuckDB (fixed pose → scalar trig folds at plan time)."""
    sr, cr = f"sin({_ROLL})", f"cos({_ROLL})"
    sp, cp = f"sin({_PITCH})", f"cos({_PITCH})"
    sh, ch = f"sin({_HEADING})", f"cos({_HEADING})"
    # R rows (reference matrix layout, SURVEY.md U1):
    r = [
        [f"({ch}*{cp})", f"({ch}*{sp}*{sr} + {sh}*{cr})", f"({ch}*{sp}*{cr} - {sh}*{sr})"],
        [f"(-{sh}*{cp})", f"(-{sh}*{sp}*{sr} + {ch}*{cr})", f"(-{sh}*{sp}*{cr} - {ch}*{sr})"],
        [f"(-{sp})", f"({cp}*{sr})", f"({cp}*{cr})"],
    ]
    pre = (
        f"theta AS (SELECT *, 2*pi()*({W} - px)/{W} AS th, pi()*py/{H} AS ph FROM px_py),"
        f" cart AS (SELECT *, sin(ph)*cos(th) AS xc, sin(ph)*sin(th) AS yc, cos(ph) AS zc FROM theta)"
    )
    def q(expr: str) -> str:
        # CAST(floor(v*1e6 + 0.5) AS BIGINT) — identical IEEE sequence to
        # the UDF side, surfaced as an int64 micro-unit scalar.
        return f"CAST(floor(({expr}) * 1e6 + 0.5) AS BIGINT)"

    out = (
        f"SELECT l_orderkey, l_linenumber,"
        f" {q(f'{r[0][0]}*xc + {r[0][1]}*yc + {r[0][2]}*zc')} AS ray_x_e6,"
        f" {q(f'{r[1][0]}*xc + {r[1][1]}*yc + {r[1][2]}*zc')} AS ray_y_e6,"
        f" {q(f'{r[2][0]}*xc + {r[2][1]}*yc + {r[2][2]}*zc')} AS ray_z_e6"
        f" FROM cart"
    )
    return pre, out


_PRE, _OUT = _sql_ray()


@query(
    "U1_pixel_to_ray",
    f"""
    WITH px_py AS (
        SELECT l_orderkey, l_linenumber,
               CAST(l_orderkey % {W} AS DOUBLE) AS px,
               CAST(l_partkey % {H} AS DOUBLE) AS py
        FROM lineitem WHERE l_orderkey < 600
    ), {_PRE}
    {_OUT}
    """,
)
def pixel_to_ray(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_orderkey") < 600)
        .select(
            "l_orderkey",
            "l_linenumber",
            (F.col("l_orderkey") % W).cast("double").alias("px"),
            (F.col("l_partkey") % H).cast("double").alias("py"),
        )
        .select("l_orderkey", "l_linenumber", _ray_udf("px", "py").alias("ray"))
        .select(
            "l_orderkey",
            "l_linenumber",
            F.element_at("ray", 1).alias("ray_x_e6"),
            F.element_at("ray", 2).alias("ray_y_e6"),
            F.element_at("ray", 3).alias("ray_z_e6"),
        )
    )


# --------------------------------------------------------------------------
# P11: seam-crossing bbox normalization + modular width/area (bbox.py:15-41)
# as pure integer CASE arithmetic — bit-exact on both engines.
# --------------------------------------------------------------------------


@query(
    "P11_seam_bbox_normalize",
    f"""
    WITH raw AS (
        SELECT l_orderkey, l_linenumber,
               (l_orderkey * 37) % {W} AS a,
               (l_partkey * 13) % {H} AS b,
               (l_orderkey * 37 + CASE WHEN l_linenumber % 3 = 0
                                       THEN 7900 ELSE 400 END) % {W} AS c,
               (l_partkey * 13 + 300) % {H} AS d
        FROM lineitem WHERE l_orderkey < 2000
    ), norm AS (
        SELECT l_orderkey, l_linenumber,
               CASE WHEN c - a > {int(W * 0.95)} THEN c ELSE a END AS x_min,
               CASE WHEN c - a > {int(W * 0.95)} THEN a ELSE c END AS x_max,
               b AS y_min, d AS y_max
        FROM raw
    )
    SELECT l_orderkey, l_linenumber, x_min, x_max, y_min, y_max,
           ((x_max - x_min) % {W} + {W}) % {W} AS width,
           (((x_max - x_min) % {W} + {W}) % {W}) * (y_max - y_min) AS area
    FROM norm
    """,
)
def seam_bbox_normalize(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    crossing_span = F.when(F.col("l_linenumber") % 3 == 0, 7900).otherwise(400)
    raw = li.filter(F.col("l_orderkey") < 2000).select(
        "l_orderkey",
        "l_linenumber",
        ((F.col("l_orderkey") * 37) % W).alias("a"),
        ((F.col("l_partkey") * 13) % H).alias("b"),
        ((F.col("l_orderkey") * 37 + crossing_span) % W).alias("c"),
        ((F.col("l_partkey") * 13 + 300) % H).alias("d"),
    )
    crosses = (F.col("c") - F.col("a")) > int(W * 0.95)
    norm = raw.select(
        "l_orderkey",
        "l_linenumber",
        F.when(crosses, F.col("c")).otherwise(F.col("a")).alias("x_min"),
        F.when(crosses, F.col("a")).otherwise(F.col("c")).alias("x_max"),
        F.col("b").alias("y_min"),
        F.col("d").alias("y_max"),
    )
    # pmod: Spark's % keeps sign; the reference's Python % is non-negative.
    width = F.pmod(F.col("x_max") - F.col("x_min"), F.lit(W))
    return norm.select(
        "l_orderkey",
        "l_linenumber",
        "x_min",
        "x_max",
        "y_min",
        "y_max",
        width.alias("width"),
        (width * (F.col("y_max") - F.col("y_min"))).alias("area"),
    )


# --------------------------------------------------------------------------
# The SQL surface: temp views + spark.sql come free (SURVEY.md §2 note:
# "no SQL parser is needed"). One declared query runs AS SQL text to prove
# the surface end-to-end.
# --------------------------------------------------------------------------


@query(
    "SQL_surface_revenue_by_status",
    """
    SELECT o_orderstatus,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_revenue
    FROM orders GROUP BY 1
    """,
)
def sql_surface(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    orders.createOrReplaceTempView("_sql_orders")
    return spark.sql(
        """
        SELECT o_orderstatus,
               COUNT(*) AS n_orders,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE)
                   AS total_revenue
        FROM _sql_orders GROUP BY 1
        """
    )


# --------------------------------------------------------------------------
# J4: the 360°-wraparound IoU (bbox.py:71-109) as pure arithmetic on both
# engines. Bboxes derive from lineitem ints (some seam-crossing); pairs come
# from a within-order self-join (i < j) — the theta-join shape the grouping
# pipeline runs inside applyInPandas, here oracle-checked value-for-value.
# Integer-derived doubles + identical op order → exact hash match, no
# rounding needed.
# --------------------------------------------------------------------------


def _iou_sql() -> str:
    # Mirrors the Spark expression structure EXACTLY (op order matters for
    # bit equality).
    def fields(p):
        return f"""
            CASE WHEN {p}c - {p}a > {int(W * 0.95)} THEN {p}c ELSE {p}a END AS {p}x_min,
            CASE WHEN {p}c - {p}a > {int(W * 0.95)} THEN {p}a ELSE {p}c END AS {p}x_max
        """

    return f"""
    WITH raw AS (
        SELECT l_orderkey, l_linenumber,
               (l_orderkey * 37 + l_linenumber * 911) % {W} AS a,
               (l_partkey * 13) % ({H} - 300) AS b,
               (l_orderkey * 37 + l_linenumber * 911 +
                CASE WHEN l_linenumber % 3 = 0 THEN 7900 ELSE 500 END) % {W} AS c
        FROM lineitem WHERE l_orderkey < 1500
    ), boxes AS (
        SELECT l_orderkey, l_linenumber,
               CASE WHEN c - a > {int(W * 0.95)} THEN c ELSE a END AS x_min,
               CASE WHEN c - a > {int(W * 0.95)} THEN a ELSE c END AS x_max,
               b AS y_min, b + 300 AS y_max
        FROM raw
    ), fields AS (
        SELECT *,
               (CAST(x_min AS DOUBLE) / {W}) * 360 AS tmin,
               (CAST(x_max AS DOUBLE) / {W}) * 360 AS tmax,
               CAST(((x_max - x_min) % {W} + {W}) % {W} AS DOUBLE)
                   * (y_max - y_min) AS area
        FROM boxes
    ), pairs AS (
        SELECT p.l_orderkey,
               p.l_linenumber AS ln_a, q.l_linenumber AS ln_b,
               p.tmin AS tmin1, p.tmax AS tmax1, p.y_min AS ymin1, p.y_max AS ymax1, p.area AS area1,
               q.tmin AS tmin2, q.tmax AS tmax2, q.y_min AS ymin2, q.y_max AS ymax2, q.area AS area2
        FROM fields p JOIN fields q
          ON p.l_orderkey = q.l_orderkey AND p.l_linenumber < q.l_linenumber
    ), ov AS (
        SELECT *,
               (tmax1 < tmin1) AS cross1, (tmax2 < tmin2) AS cross2
        FROM pairs
    ), t_ov AS (
        SELECT *,
               CASE WHEN NOT cross1 AND NOT cross2 THEN
                        greatest(0, least(tmax1, tmax2) - greatest(tmin1, tmin2))
                    ELSE
                        least(greatest(0,
                            least(CASE WHEN cross1 THEN tmax1 + 360 ELSE tmax1 END,
                                  CASE WHEN cross2 THEN tmax2 + 360 ELSE tmax2 END)
                            - greatest(tmin1, tmin2)), 360)
               END AS theta_overlap,
               CAST(greatest(0, least(ymax1, ymax2) - greatest(ymin1, ymin2)) AS DOUBLE)
                   AS y_overlap
        FROM ov
    )
    SELECT l_orderkey, ln_a, ln_b, theta_overlap,
           CASE WHEN area1 + area2 - theta_overlap * y_overlap = 0 THEN 0.0
                ELSE (theta_overlap * y_overlap)
                     / (area1 + area2 - theta_overlap * y_overlap) END AS iou
    FROM t_ov
    """


@query("J4_bbox_iou_pairs", _iou_sql())
def bbox_iou_pairs(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    crossing_span = F.when(F.col("l_linenumber") % 3 == 0, 7900).otherwise(500)
    raw = li.filter(F.col("l_orderkey") < 1500).select(
        "l_orderkey",
        "l_linenumber",
        ((F.col("l_orderkey") * 37 + F.col("l_linenumber") * 911) % W).alias("a"),
        ((F.col("l_partkey") * 13) % (H - 300)).alias("b"),
        (
            (F.col("l_orderkey") * 37 + F.col("l_linenumber") * 911 + crossing_span)
            % W
        ).alias("c"),
    )
    crosses = (F.col("c") - F.col("a")) > int(W * 0.95)
    boxes = raw.select(
        "l_orderkey",
        "l_linenumber",
        F.when(crosses, F.col("c")).otherwise(F.col("a")).alias("x_min"),
        F.when(crosses, F.col("a")).otherwise(F.col("c")).alias("x_max"),
        F.col("b").alias("y_min"),
        (F.col("b") + 300).alias("y_max"),
    )
    fields = boxes.select(
        "l_orderkey",
        "l_linenumber",
        ((F.col("x_min").cast("double") / W) * 360).alias("tmin"),
        ((F.col("x_max").cast("double") / W) * 360).alias("tmax"),
        "y_min",
        "y_max",
        (
            F.pmod(F.col("x_max") - F.col("x_min"), F.lit(W)).cast("double")
            * (F.col("y_max") - F.col("y_min"))
        ).alias("area"),
    )
    p = fields.select(
        "l_orderkey",
        F.col("l_linenumber").alias("ln_a"),
        F.col("tmin").alias("tmin1"),
        F.col("tmax").alias("tmax1"),
        F.col("y_min").alias("ymin1"),
        F.col("y_max").alias("ymax1"),
        F.col("area").alias("area1"),
    )
    q = fields.select(
        "l_orderkey",
        F.col("l_linenumber").alias("ln_b"),
        F.col("tmin").alias("tmin2"),
        F.col("tmax").alias("tmax2"),
        F.col("y_min").alias("ymin2"),
        F.col("y_max").alias("ymax2"),
        F.col("area").alias("area2"),
    )
    pairs = p.join(q, ["l_orderkey"]).filter(F.col("ln_a") < F.col("ln_b"))
    cross1 = F.col("tmax1") < F.col("tmin1")
    cross2 = F.col("tmax2") < F.col("tmin2")
    adj1 = F.when(cross1, F.col("tmax1") + 360).otherwise(F.col("tmax1"))
    adj2 = F.when(cross2, F.col("tmax2") + 360).otherwise(F.col("tmax2"))
    plain = F.greatest(
        F.lit(0), F.least("tmax1", "tmax2") - F.greatest("tmin1", "tmin2")
    )
    adjusted = F.least(
        F.greatest(F.lit(0), F.least(adj1, adj2) - F.greatest("tmin1", "tmin2")),
        F.lit(360),
    )
    theta_overlap = F.when(~cross1 & ~cross2, plain).otherwise(adjusted)
    y_overlap = F.greatest(
        F.lit(0), F.least("ymax1", "ymax2") - F.greatest("ymin1", "ymin2")
    ).cast("double")
    scored = pairs.select(
        "l_orderkey",
        "ln_a",
        "ln_b",
        theta_overlap.alias("theta_overlap"),
        y_overlap.alias("y_overlap"),
        "area1",
        "area2",
    )
    union = F.col("area1") + F.col("area2") - F.col("theta_overlap") * F.col("y_overlap")
    iou = F.when(union == 0, F.lit(0.0)).otherwise(
        (F.col("theta_overlap") * F.col("y_overlap")) / union
    )
    return scored.select(
        "l_orderkey", "ln_a", "ln_b", "theta_overlap", iou.alias("iou")
    )


# --------------------------------------------------------------------------
# U3: inverse projection (GetBboxInverse, Equirec2Perspec.py:93-119) —
# crop-space bboxes → panorama-space bboxes, oracle-checked. The Spark side
# runs the engine's real ``bbox_inverse`` kernel in a pandas UDF; the SQL
# oracle replays the same two-stage K^-1→R transform with the matrices'
# exact double values inlined (repr round-trips), lon/lat normalization in
# the reference's op order (atan2(x/n, z/n), asin(y/n)), and int32
# truncation-toward-zero.
# --------------------------------------------------------------------------

_FOV, _THETA, _PHI = 60.0, 54.0, -10.0
_CROP = 1000


def _u3_matrices():
    from ..functions.geometry import compute_calib_matrix, compute_rotation_matrix

    _, k_inv = compute_calib_matrix(_CROP, _CROP, _FOV)
    r = compute_rotation_matrix(_THETA, _PHI)
    return np.asarray(k_inv, dtype=np.float64), np.asarray(r, dtype=np.float64)


@pandas_udf(T.ArrayType(T.LongType()))
def _bbox_inverse_udf(
    x1: pd.Series, y1: pd.Series, x2: pd.Series, y2: pd.Series
) -> pd.Series:
    from ..functions.geometry import bbox_inverse

    bboxes = np.stack(
        [
            x1.to_numpy(np.float64),
            y1.to_numpy(np.float64),
            x2.to_numpy(np.float64),
            y2.to_numpy(np.float64),
        ],
        axis=1,
    )
    out = bbox_inverse(_FOV, _THETA, _PHI, _CROP, _CROP, bboxes, H, W)
    return pd.Series([[int(v) for v in row] for row in out])


def _u3_sql() -> str:
    k_inv, r = _u3_matrices()

    def corner(cx: str, cy: str, tag: str) -> str:
        v = [
            f"({k_inv[0,0]!r}*{cx} + {k_inv[0,1]!r}*{cy} + {k_inv[0,2]!r})",
            f"({k_inv[1,0]!r}*{cx} + {k_inv[1,1]!r}*{cy} + {k_inv[1,2]!r})",
            f"({k_inv[2,0]!r}*{cx} + {k_inv[2,1]!r}*{cy} + {k_inv[2,2]!r})",
        ]
        w = [
            f"({r[0,0]!r}*{v[0]} + {r[0,1]!r}*{v[1]} + {r[0,2]!r}*{v[2]})",
            f"({r[1,0]!r}*{v[0]} + {r[1,1]!r}*{v[1]} + {r[1,2]!r}*{v[2]})",
            f"({r[2,0]!r}*{v[0]} + {r[2,1]!r}*{v[1]} + {r[2,2]!r}*{v[2]})",
        ]
        n = f"sqrt({w[0]}*{w[0]} + {w[1]}*{w[1]} + {w[2]}*{w[2]})"
        lon = f"atan2({w[0]}/{n}, {w[2]}/{n})"
        lat = f"asin({w[1]}/{n})"
        px = f"CAST(trunc(({lon}/(2*pi()) + 0.5) * ({W} - 1)) AS BIGINT)"
        py = f"CAST(trunc(({lat}/pi() + 0.5) * ({H} - 1)) AS BIGINT)"
        return f"{px} AS {tag}x, {py} AS {tag}y"

    corners = ", ".join(
        [
            corner("x1", "y1", "c1"),
            corner("x2", "y1", "c2"),
            corner("x1", "y2", "c3"),
            corner("x2", "y2", "c4"),
        ]
    )
    return f"""
    WITH crop AS (
        SELECT l_orderkey, l_linenumber,
               CAST((l_orderkey * 7) % 800 AS DOUBLE) AS x1,
               CAST((l_partkey * 11) % 800 AS DOUBLE) AS y1,
               CAST((l_orderkey * 7) % 800 + (l_suppkey % 190) + 10 AS DOUBLE) AS x2,
               CAST((l_partkey * 11) % 800 + (l_linenumber * 23) % 190 + 10 AS DOUBLE) AS y2
        FROM lineitem WHERE l_orderkey < 800
    ), proj AS (
        SELECT l_orderkey, l_linenumber, {corners} FROM crop
    )
    SELECT l_orderkey, l_linenumber,
           least(c1x, c2x, c3x, c4x) AS bx1,
           least(c1y, c2y, c3y, c4y) AS by1,
           greatest(c1x, c2x, c3x, c4x) AS bx2,
           greatest(c1y, c2y, c3y, c4y) AS by2
    FROM proj
    """


@query("U3_bbox_inverse", _u3_sql())
def bbox_inverse_query(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    crop = li.filter(F.col("l_orderkey") < 800).select(
        "l_orderkey",
        "l_linenumber",
        ((F.col("l_orderkey") * 7) % 800).cast("double").alias("x1"),
        ((F.col("l_partkey") * 11) % 800).cast("double").alias("y1"),
        ((F.col("l_orderkey") * 7) % 800 + (F.col("l_suppkey") % 190) + 10)
        .cast("double")
        .alias("x2"),
        ((F.col("l_partkey") * 11) % 800 + (F.col("l_linenumber") * 23) % 190 + 10)
        .cast("double")
        .alias("y2"),
    )
    # Surface the 4-int bbox as scalar int64 columns: the driver's pandas
    # canonicalizer cannot sort/hash array columns, and scalar schemas
    # stay dtype-exact across both engines.
    return crop.select(
        "l_orderkey",
        "l_linenumber",
        _bbox_inverse_udf("x1", "y1", "x2", "y2").alias("bbox_360"),
    ).select(
        "l_orderkey",
        "l_linenumber",
        F.element_at("bbox_360", 1).alias("bx1"),
        F.element_at("bbox_360", 2).alias("by1"),
        F.element_at("bbox_360", 3).alias("bx2"),
        F.element_at("bbox_360", 4).alias("by2"),
    )
