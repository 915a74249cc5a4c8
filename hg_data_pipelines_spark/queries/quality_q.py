"""Data-quality declared queries (operators/quality.py): column profiling
and constraint gating over the fact tables — the validate-before-publish
step of an ETL pipeline, oracle-checked.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from ..operators.quality import Constraint, check_constraints, profile
from .common import load, query

# --------------------------------------------------------------------------
# DQ1: one-pass column profile of orders (exact-distinct form so DuckDB
# can mirror it; the HLL form is the declared-by-design approximate path,
# see A9).
# --------------------------------------------------------------------------


@query(
    "DQ1_profile_orders",
    """
    WITH t AS (SELECT COUNT(*) AS n_rows FROM orders)
    SELECT * FROM (
        SELECT 'o_orderkey' AS column, t.n_rows,
               t.n_rows - COUNT(o_orderkey) AS n_null,
               COUNT(DISTINCT o_orderkey) AS n_distinct,
               CAST(MIN(o_orderkey) AS DOUBLE) AS min_value,
               CAST(MAX(o_orderkey) AS DOUBLE) AS max_value,
               CAST(AVG(o_orderkey) AS DOUBLE) AS mean_value
        FROM orders, t GROUP BY t.n_rows
        UNION ALL
        SELECT 'o_totalprice', t.n_rows, t.n_rows - COUNT(o_totalprice),
               COUNT(DISTINCT o_totalprice),
               CAST(MIN(o_totalprice) AS DOUBLE),
               CAST(MAX(o_totalprice) AS DOUBLE),
               CAST(AVG(o_totalprice) AS DOUBLE)
        FROM orders, t GROUP BY t.n_rows
        UNION ALL
        SELECT 'o_orderstatus', t.n_rows, t.n_rows - COUNT(o_orderstatus),
               COUNT(DISTINCT o_orderstatus),
               CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
        FROM orders, t GROUP BY t.n_rows
    )
    """,
)
def profile_orders(spark, sf_dir):
    orders = load(spark, sf_dir, "orders")
    return profile(
        orders,
        columns=["o_orderkey", "o_totalprice", "o_orderstatus"],
        exact_distinct=True,
    )


# --------------------------------------------------------------------------
# DQ2: constraint gate over lineitem — per-rule violation counts in one
# pass. Includes one deliberately failing rule so the query is
# non-vacuous in both directions (passing and failing rules).
# --------------------------------------------------------------------------


@query(
    "DQ2_constraints_lineitem",
    """
    SELECT * FROM (
        SELECT 'quantity_positive' AS constraint, COUNT(*) AS n_rows,
               CAST(SUM(CASE WHEN NOT (l_quantity > 0) OR l_quantity IS NULL
                        THEN 1 ELSE 0 END) AS BIGINT) AS n_violations,
               CAST(SUM(CASE WHEN NOT (l_quantity > 0) OR l_quantity IS NULL
                        THEN 1 ELSE 0 END) AS BIGINT) = 0 AS passed
        FROM lineitem
        UNION ALL
        SELECT 'discount_in_unit_range', COUNT(*),
               CAST(SUM(CASE WHEN NOT (l_discount BETWEEN 0 AND 1)
                             OR l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN NOT (l_discount BETWEEN 0 AND 1)
                             OR l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) = 0
        FROM lineitem
        UNION ALL
        SELECT 'price_over_10000', COUNT(*),
               CAST(SUM(CASE WHEN NOT (l_extendedprice > 10000)
                             OR l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
               CAST(SUM(CASE WHEN NOT (l_extendedprice > 10000)
                             OR l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) = 0
        FROM lineitem
    )
    """,
)
def constraints_lineitem(spark, sf_dir):
    li = load(spark, sf_dir, "lineitem")
    return check_constraints(
        li,
        [
            Constraint("quantity_positive", F.col("l_quantity") > 0),
            Constraint(
                "discount_in_unit_range", F.col("l_discount").between(0, 1)
            ),
            # deliberately violated on the fixture: exercises the failing path
            Constraint("price_over_10000", F.col("l_extendedprice") > 10000),
        ],
    )


# --------------------------------------------------------------------------
# DQ3: Benford first-digit profile — the classic anomaly screen for
# invented numeric data. Digit extraction is pure string/int arithmetic
# (identical on both engines); the observed share is one int/int double
# division. A synthetic-uniform fixture won't FOLLOW Benford — the query
# reports the profile, it doesn't assert the law.
# --------------------------------------------------------------------------


@query(
    "DQ3_benford_first_digit",
    """
    WITH digits AS (
        SELECT CAST(substr(CAST(CAST(FLOOR(o_totalprice) AS BIGINT) AS VARCHAR), 1, 1)
                    AS BIGINT) AS first_digit
        FROM orders WHERE o_totalprice >= 1
    )
    SELECT first_digit, COUNT(*) AS n,
           CAST(COUNT(*) AS DOUBLE)
           / CAST(SUM(COUNT(*)) OVER () AS DOUBLE) AS observed_share
    FROM digits GROUP BY first_digit
    """,
)
def benford_first_digit(spark, sf_dir):
    from pyspark.sql import Window

    orders = load(spark, sf_dir, "orders")
    digits = orders.filter(F.col("o_totalprice") >= 1).select(
        F.substring(
            F.floor(F.col("o_totalprice")).cast("bigint").cast("string"), 1, 1
        )
        .cast("bigint")
        .alias("first_digit")
    )
    counts = digits.groupBy("first_digit").agg(F.count(F.lit(1)).alias("n"))
    total = F.sum("n").over(Window.partitionBy())
    return counts.select(
        "first_digit",
        "n",
        (F.col("n").cast("double") / total.cast("double")).alias(
            "observed_share"
        ),
    )
