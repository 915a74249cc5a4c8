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


@pandas_udf(T.ArrayType(T.DoubleType()))
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
    # Quantization is floor(v*1e6 + 0.5)/1e6 — the same IEEE operation
    # sequence DuckDB's oracle runs. Library round() is NOT portable:
    # Python rounds the correctly-converted decimal (half-even), DuckDB
    # rounds the double product (half-away), and they disagree near
    # half-points even on bit-identical inputs.
    return pd.Series(
        [[math.floor(float(v) * 1e6 + 0.5) / 1e6 for v in r] for r in rays]
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
        # floor(v*1e6 + 0.5)/1e6 — identical IEEE sequence to the UDF side.
        return f"floor(({expr}) * 1e6 + 0.5) / 1e6"

    out = (
        f"SELECT l_orderkey, l_linenumber,"
        f" [{q(f'{r[0][0]}*xc + {r[0][1]}*yc + {r[0][2]}*zc')},"
        f"  {q(f'{r[1][0]}*xc + {r[1][1]}*yc + {r[1][2]}*zc')},"
        f"  {q(f'{r[2][0]}*xc + {r[2][1]}*yc + {r[2][2]}*zc')}] AS ray"
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
