"""Extended TPC-H-style declared queries (EXT-A7 widening, SURVEY.md §2.5).

Adaptations of the remaining TPC-H queries to the TESTDATA star schema (no
partsupp table — lineitem's (l_partkey, l_suppkey) pairs stand in for it;
lineitem carries no commit/receipt dates or shipmode, so lateness
correlates l_shipdate against o_orderdate and Q12 groups by returnflag).
With these, all 22 TPC-H query shapes are declared (q5 lives in
relational.py as J1_q5_local_supplier_revenue).
Each exercises an operator shape the rest of the surface doesn't:

- Q2  correlated per-group scalar MIN consumed by the outer join chain
- Q4  correlated EXISTS (left-semi join with a compound, non-equi clause)
- Q7  nation-pair disjunctive join filter + year rollup
- Q8  conditional market-share ratio (CASE inside an exact-decimal sum)
- Q9  6-way join + expression profit + nation×year rollup
- Q10 outer-fact top-N with group-by over 4 grouping columns
- Q11 HAVING against a scalar-subquery threshold
- Q12 dual conditional counts (CASE-sum) over a non-equi late predicate
- Q13 LEFT OUTER join + two-level aggregation (count histogram)
- Q14 conditional-numerator ratio over one scan
- Q15 scalar-subquery max against an aggregated view (ties kept)
- Q16 NOT-IN exclusion + COUNT(DISTINCT) over 3 grouping columns
- Q17 per-group scalar threshold (0.2×avg) consumed by the same scan
- Q19 OR-of-ANDs pushdown across a part⋈lineitem join
- Q20 nested semi-join chain against two aggregated views
- Q21 EXISTS + NOT-EXISTS self-correlation on the fact table
- Q22 scalar-average threshold + anti-join + segment rollup

Determinism: every float aggregate goes through DECIMAL(38,6) (dsum/davg
and their SQL twins); every LIMIT carries a unique tiebreak; thresshold
comparisons (Q17/Q22) compute the threshold identically on both engines so
boundary membership cannot diverge.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from .common import davg, dsum, load, query, sql_davg, sql_dsum


def _ts(s: str):
    return F.lit(s).cast("timestamp_ntz")


# --------------------------------------------------------------------------
# Q4: order-priority checking — correlated EXISTS
# --------------------------------------------------------------------------


@query(
    "A7_q4_priority_exists",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND EXISTS (
          SELECT 1 FROM lineitem l
          WHERE l.l_orderkey = o.o_orderkey AND l.l_shipdate > o.o_orderdate
      )
    GROUP BY o_orderpriority
    """,
)
def q4_priority_exists(spark, sf_dir):
    orders, li = load(spark, sf_dir, "orders", "lineitem")
    filtered = orders.filter(
        (F.col("o_orderdate") >= _ts("1996-01-01"))
        & (F.col("o_orderdate") < _ts("1996-07-01"))
    )
    # correlated EXISTS = left-semi join with the compound non-equi clause
    exists = filtered.join(
        li,
        (F.col("l_orderkey") == F.col("o_orderkey"))
        & (F.col("l_shipdate") > F.col("o_orderdate")),
        "left_semi",
    )
    return exists.groupBy("o_orderpriority").agg(
        F.count(F.lit(1)).alias("order_count")
    )


# --------------------------------------------------------------------------
# Q7: volume shipping between a nation pair, by year
# --------------------------------------------------------------------------


@query(
    "A7_q7_volume_shipping",
    f"""
    SELECT sn.n_name AS supp_nation, cn.n_name AS cust_nation,
           CAST(EXTRACT(year FROM l_shipdate) AS BIGINT) AS l_year,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')}
    FROM lineitem
    JOIN orders   ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey  = c_custkey
    JOIN supplier ON l_suppkey  = s_suppkey
    JOIN nation sn ON s_nationkey = sn.n_nationkey
    JOIN nation cn ON c_nationkey = cn.n_nationkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
      AND ((sn.n_name = 'NATION_1' AND cn.n_name = 'NATION_2')
        OR (sn.n_name = 'NATION_2' AND cn.n_name = 'NATION_1'))
    GROUP BY 1, 2, 3
    """,
)
def q7_volume_shipping(spark, sf_dir):
    li, orders, cust, supp, nation = load(
        spark, sf_dir, "lineitem", "orders", "customer", "supplier", "nation"
    )
    sn = nation.select(
        F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation")
    )
    cn = nation.select(
        F.col("n_nationkey").alias("_ck"), F.col("n_name").alias("cust_nation")
    )
    pair = (
        ((F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2"))
        | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    )
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1998-01-01"))
        )
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("_sk"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("_ck"))
        .filter(pair)
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("long").alias("l_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# --------------------------------------------------------------------------
# Q8: market share of one nation inside a region, by year
# --------------------------------------------------------------------------


@query(
    "A7_q8_market_share",
    """
    SELECT l_year,
           CAST(SUM(CASE WHEN supp_nation = 'NATION_1'
                         THEN CAST(volume AS DECIMAL(38,6))
                         ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
           / CAST(SUM(CAST(volume AS DECIMAL(38,6))) AS DOUBLE) AS mkt_share
    FROM (
        SELECT CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS l_year,
               l_extendedprice * (1 - l_discount) AS volume,
               sn.n_name AS supp_nation
        FROM lineitem
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN customer ON o_custkey  = c_custkey
        JOIN nation cn ON c_nationkey = cn.n_nationkey
        JOIN region    ON cn.n_regionkey = r_regionkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation sn ON s_nationkey = sn.n_nationkey
        JOIN part     ON l_partkey = p_partkey
        WHERE r_name = 'EUROPE'
          AND p_type = 'PROMO'
          AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
    ) nations
    GROUP BY l_year
    """,
)
def q8_market_share(spark, sf_dir):
    li, orders, cust, supp, nation, region, part = load(
        spark, sf_dir,
        "lineitem", "orders", "customer", "supplier", "nation", "region", "part",
    )
    cn = nation.select(
        F.col("n_nationkey").alias("_ck"), F.col("n_regionkey").alias("_crk")
    )
    sn = nation.select(
        F.col("n_nationkey").alias("_sk"), F.col("n_name").alias("supp_nation")
    )
    base = (
        li.join(
            orders.filter(
                (F.col("o_orderdate") >= _ts("1996-01-01"))
                & (F.col("o_orderdate") < _ts("1998-01-01"))
            ),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(cust), F.col("o_custkey") == F.col("c_custkey"))
        .join(F.broadcast(cn), F.col("c_nationkey") == F.col("_ck"))
        .join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("_crk") == F.col("r_regionkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(F.broadcast(sn), F.col("s_nationkey") == F.col("_sk"))
        .join(
            F.broadcast(part.filter(F.col("p_type") == "PROMO")),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .select(
            F.year("o_orderdate").cast("long").alias("l_year"),
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("volume"),
            "supp_nation",
        )
    )
    dec = "decimal(38,6)"
    return base.groupBy("l_year").agg(
        (
            F.sum(
                F.when(
                    F.col("supp_nation") == "NATION_1", F.col("volume").cast(dec)
                ).otherwise(F.lit(0).cast(dec))
            ).cast("double")
            / F.sum(F.col("volume").cast(dec)).cast("double")
        ).alias("mkt_share")
    )


# --------------------------------------------------------------------------
# Q10: returned-item reporting — top 20 customers by lost revenue
# --------------------------------------------------------------------------


@query(
    "A7_q10_returned_items",
    f"""
    SELECT c_custkey, c_name,
           {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           c_acctbal, n_name
    FROM customer
    JOIN orders   ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    JOIN nation   ON c_nationkey = n_nationkey
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate <  TIMESTAMP '1996-07-01 00:00:00'
      AND l_returnflag = 'R'
    GROUP BY c_custkey, c_name, c_acctbal, n_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_items(spark, sf_dir):
    cust, orders, li, nation = load(
        spark, sf_dir, "customer", "orders", "lineitem", "nation"
    )
    return (
        cust.join(
            orders.filter(
                (F.col("o_orderdate") >= _ts("1996-01-01"))
                & (F.col("o_orderdate") < _ts("1996-07-01"))
            ),
            F.col("c_custkey") == F.col("o_custkey"),
        )
        .join(
            li.filter(F.col("l_returnflag") == "R"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("c_custkey", "c_name", "c_acctbal", "n_name")
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
        .select("c_custkey", "c_name", "revenue", "c_acctbal", "n_name")
        .orderBy(F.desc("revenue"), "c_custkey")
        .limit(20)
    )


# --------------------------------------------------------------------------
# Q13: customer order-count distribution — LEFT OUTER + histogram
# --------------------------------------------------------------------------


@query(
    "A7_q13_order_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
        SELECT c_custkey, COUNT(o_orderkey) AS c_count
        FROM customer LEFT OUTER JOIN orders ON c_custkey = o_custkey
        GROUP BY c_custkey
    ) c_orders
    GROUP BY c_count
    """,
)
def q13_order_distribution(spark, sf_dir):
    cust, orders = load(spark, sf_dir, "customer", "orders")
    per_cust = (
        cust.join(orders, F.col("c_custkey") == F.col("o_custkey"), "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# Q14: promotion effect — conditional-numerator ratio over one scan
# --------------------------------------------------------------------------


@query(
    "A7_q14_promo_effect",
    """
    SELECT 100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                   THEN CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))
                   ELSE CAST(0 AS DECIMAL(38,6)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(38,6))) AS DOUBLE)
           AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-03-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
    """,
)
def q14_promo_effect(spark, sf_dir):
    li, part = load(spark, sf_dir, "lineitem", "part")
    dec = "decimal(38,6)"
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-03-01"))
            & (F.col("l_shipdate") < _ts("1996-04-01"))
        )
        .join(F.broadcast(part), F.col("l_partkey") == F.col("p_partkey"))
        .agg(
            (
                F.lit(100.0)
                * F.sum(
                    F.when(F.col("p_type") == "PROMO", vol.cast(dec)).otherwise(
                        F.lit(0).cast(dec)
                    )
                ).cast("double")
                / F.sum(vol.cast(dec)).cast("double")
            ).alias("promo_revenue_pct")
        )
    )


# --------------------------------------------------------------------------
# Q15: top supplier — scalar-subquery max over an aggregated view
# --------------------------------------------------------------------------


@query(
    "A7_q15_top_supplier",
    f"""
    WITH revenue AS (
        SELECT l_suppkey AS supplier_no,
               {sql_dsum('l_extendedprice * (1 - l_discount)', 'total_revenue')}
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
        GROUP BY 1
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier JOIN revenue ON s_suppkey = supplier_no
    WHERE total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
)
def q15_top_supplier(spark, sf_dir):
    li, supp = load(spark, sf_dir, "lineitem", "supplier")
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1996-04-01"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue"))
    )
    best = revenue.agg(F.max("total_revenue").alias("_max"))
    return (
        revenue.join(F.broadcast(best), F.col("total_revenue") == F.col("_max"))
        .join(F.broadcast(supp), F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
    )


# --------------------------------------------------------------------------
# Q17: small-quantity-order revenue — per-part 0.2×avg threshold
# --------------------------------------------------------------------------


@query(
    "A7_q17_small_qty_revenue",
    f"""
    WITH part_avg AS (
        SELECT l_partkey AS pk, {sql_davg('l_quantity', 'avg_qty')}
        FROM lineitem GROUP BY 1
    )
    SELECT {sql_dsum('l_extendedprice', 'total_price')} , COUNT(*) AS n_small
    FROM lineitem
    JOIN part ON l_partkey = p_partkey
    JOIN part_avg ON l_partkey = pk
    WHERE p_brand = 'Brand#1' AND l_quantity < 0.2 * avg_qty
    """,
)
def q17_small_qty_revenue(spark, sf_dir):
    li, part = load(spark, sf_dir, "lineitem", "part")
    part_avg = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        davg("l_quantity", "avg_qty")
    )
    return (
        li.join(F.broadcast(part.filter(F.col("p_brand") == "Brand#1")),
                F.col("l_partkey") == F.col("p_partkey"))
        .join(part_avg, F.col("l_partkey") == F.col("pk"))
        .filter(F.col("l_quantity") < 0.2 * F.col("avg_qty"))
        .agg(
            dsum("l_extendedprice", "total_price"),
            F.count(F.lit(1)).alias("n_small"),
        )
    )


# --------------------------------------------------------------------------
# Q19: discounted revenue — OR-of-ANDs predicate pushdown
# --------------------------------------------------------------------------


@query(
    "A7_q19_disjunctive_revenue",
    f"""
    SELECT {sql_dsum('l_extendedprice * (1 - l_discount)', 'revenue')},
           COUNT(*) AS n_rows
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#1' AND p_size BETWEEN 1 AND 15
           AND l_quantity >= 1 AND l_quantity <= 20)
       OR (p_brand = 'Brand#2' AND p_size BETWEEN 5 AND 25
           AND l_quantity >= 10 AND l_quantity <= 30)
       OR (p_brand = 'Brand#3' AND p_size BETWEEN 10 AND 50
           AND l_quantity >= 20 AND l_quantity <= 40)
    """,
)
def q19_disjunctive_revenue(spark, sf_dir):
    li, part = load(spark, sf_dir, "lineitem", "part")
    joined = li.join(F.broadcast(part), F.col("p_partkey") == F.col("l_partkey"))

    def clause(brand, s_lo, s_hi, q_lo, q_hi):
        return (
            (F.col("p_brand") == brand)
            & F.col("p_size").between(s_lo, s_hi)
            & (F.col("l_quantity") >= q_lo)
            & (F.col("l_quantity") <= q_hi)
        )

    cond = (
        clause("Brand#1", 1, 15, 1, 20)
        | clause("Brand#2", 5, 25, 10, 30)
        | clause("Brand#3", 10, 50, 20, 40)
    )
    return joined.filter(cond).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"),
        F.count(F.lit(1)).alias("n_rows"),
    )


# --------------------------------------------------------------------------
# Q22: idle rich customers — scalar-avg threshold + anti-join + rollup.
# Every fixture customer has at least one order, so "idle" is adapted to
# "no orders since 2000-01-01" (the anti-join gains a non-equi clause,
# which is the more general shape anyway).
# --------------------------------------------------------------------------


@query(
    "A7_q22_idle_customers",
    f"""
    SELECT c_mktsegment, COUNT(*) AS numcust,
           {sql_dsum('c_acctbal', 'total_acctbal')}
    FROM customer
    WHERE c_acctbal > (
            SELECT {sql_davg('c_acctbal', 'a')} FROM customer WHERE c_acctbal > 0
          )
      AND NOT EXISTS (
            SELECT 1 FROM orders
            WHERE o_custkey = c_custkey
              AND o_orderdate >= TIMESTAMP '2000-01-01 00:00:00'
          )
    GROUP BY c_mktsegment
    """,
)
def q22_idle_customers(spark, sf_dir):
    cust, orders = load(spark, sf_dir, "customer", "orders")
    # threshold computed identically to the SQL oracle (exact decimal mean)
    avg_bal = cust.filter(F.col("c_acctbal") > 0).agg(davg("c_acctbal", "_avg"))
    recent = orders.filter(F.col("o_orderdate") >= _ts("2000-01-01"))
    return (
        cust.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("_avg"))
        .join(recent, F.col("c_custkey") == F.col("o_custkey"), "left_anti")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            dsum("c_acctbal", "total_acctbal"),
        )
    )


# --------------------------------------------------------------------------
# Q2: minimum-cost supplier — correlated per-part scalar MIN. partsupp is
# derived from lineitem: a supplier's unit cost for a part is the exact-
# decimal ratio sum(extendedprice)/sum(quantity) over their lines. Both
# engines compute the ratio from the same exact sums, so the double
# equality against the per-part regional minimum cannot diverge.
# --------------------------------------------------------------------------


@query(
    "A7_q2_min_cost_supplier",
    """
    WITH ps AS (
        SELECT l_partkey AS partkey, l_suppkey AS suppkey,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
               / CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS unit_cost
        FROM lineitem GROUP BY 1, 2
    ),
    regional AS (
        SELECT partkey, suppkey, unit_cost,
               s_acctbal, s_name, n_name
        FROM ps
        JOIN supplier ON suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        JOIN region   ON n_regionkey = r_regionkey
        WHERE r_name = 'EUROPE'
    )
    SELECT s_acctbal, s_name, n_name, p_partkey, unit_cost
    FROM part
    JOIN regional ON p_partkey = partkey
    WHERE p_size = 10
      AND unit_cost = (SELECT MIN(r2.unit_cost) FROM regional r2
                       WHERE r2.partkey = p_partkey)
    ORDER BY s_acctbal DESC, n_name, s_name, p_partkey
    LIMIT 100
    """,
)
def q2_min_cost_supplier(spark, sf_dir):
    from pyspark.sql import Window

    li, part, supp, nation, region = load(
        spark, sf_dir, "lineitem", "part", "supplier", "nation", "region"
    )
    ps = li.groupBy(
        F.col("l_partkey").alias("partkey"), F.col("l_suppkey").alias("suppkey")
    ).agg(
        (
            F.sum(F.col("l_extendedprice").cast("decimal(38,6)")).cast("double")
            / F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double")
        ).alias("unit_cost")
    )
    nr = (
        nation.join(
            F.broadcast(region.filter(F.col("r_name") == "EUROPE")),
            F.col("n_regionkey") == F.col("r_regionkey"),
        ).select("n_nationkey", "n_name")
    )
    regional = ps.join(
        F.broadcast(
            supp.join(F.broadcast(nr), F.col("s_nationkey") == F.col("n_nationkey"))
        ),
        F.col("suppkey") == F.col("s_suppkey"),
    ).select("partkey", "suppkey", "unit_cost", "s_acctbal", "s_name", "n_name")
    # correlated per-part MIN = window min over the regional view (one
    # shuffle on partkey, no second scan of the aggregate)
    w = Window.partitionBy("partkey")
    best = regional.withColumn("_min", F.min("unit_cost").over(w)).filter(
        F.col("unit_cost") == F.col("_min")
    )
    return (
        best.join(
            F.broadcast(part.filter(F.col("p_size") == 10)),
            F.col("partkey") == F.col("p_partkey"),
        )
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "unit_cost")
        .orderBy(F.desc("s_acctbal"), "n_name", "s_name", "p_partkey")
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q9: product-type profit by nation and year. partsupp's supplycost is
# replaced by 0.5 × p_retailprice per unit, keeping the 5-way join +
# expression-profit + nation×year rollup shape.
# --------------------------------------------------------------------------


@query(
    "A7_q9_product_profit",
    f"""
    SELECT nation, o_year, {sql_dsum('amount', 'sum_profit')}
    FROM (
        SELECT n_name AS nation,
               CAST(EXTRACT(year FROM o_orderdate) AS BIGINT) AS o_year,
               l_extendedprice * (1 - l_discount)
                 - 0.5 * p_retailprice * l_quantity AS amount
        FROM lineitem
        JOIN part     ON l_partkey = p_partkey
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN orders   ON l_orderkey = o_orderkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE p_name LIKE '%red%'
    ) profit
    GROUP BY nation, o_year
    """,
)
def q9_product_profit(spark, sf_dir):
    li, part, supp, orders, nation = load(
        spark, sf_dir, "lineitem", "part", "supplier", "orders", "nation"
    )
    amount = (
        F.col("l_extendedprice") * (1 - F.col("l_discount"))
        - 0.5 * F.col("p_retailprice") * F.col("l_quantity")
    )
    return (
        li.join(
            F.broadcast(part.filter(F.col("p_name").like("%red%"))),
            F.col("l_partkey") == F.col("p_partkey"),
        )
        .join(F.broadcast(supp), F.col("l_suppkey") == F.col("s_suppkey"))
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(F.broadcast(nation), F.col("s_nationkey") == F.col("n_nationkey"))
        .select(
            F.col("n_name").alias("nation"),
            F.year("o_orderdate").cast("long").alias("o_year"),
            amount.alias("amount"),
        )
        .groupBy("nation", "o_year")
        .agg(dsum("amount", "sum_profit"))
    )


# --------------------------------------------------------------------------
# Q11: important parts — HAVING against a scalar-subquery threshold. Part
# value for NATION_1's suppliers = sum(extendedprice × (1-discount)); a
# part qualifies when its value exceeds 0.1% of the nation-wide total.
# --------------------------------------------------------------------------


@query(
    "A7_q11_important_parts",
    f"""
    WITH natline AS (
        SELECT l_partkey, l_extendedprice * (1 - l_discount) AS value
        FROM lineitem
        JOIN supplier ON l_suppkey = s_suppkey
        JOIN nation   ON s_nationkey = n_nationkey
        WHERE n_name = 'NATION_1'
    )
    SELECT l_partkey, {sql_dsum('value', 'part_value')}
    FROM natline
    GROUP BY l_partkey
    HAVING CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) >
           0.001 * (SELECT CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE)
                    FROM natline)
    """,
)
def q11_important_parts(spark, sf_dir):
    li, supp, nation = load(spark, sf_dir, "lineitem", "supplier", "nation")
    natline = (
        li.join(
            F.broadcast(
                supp.join(
                    F.broadcast(nation.filter(F.col("n_name") == "NATION_1")),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                )
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        ).select(
            "l_partkey",
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("value"),
        )
    )
    per_part = natline.groupBy("l_partkey").agg(dsum("value", "part_value"))
    total = natline.agg(dsum("value", "_total"))
    return (
        per_part.crossJoin(F.broadcast(total))
        .filter(F.col("part_value") > 0.001 * F.col("_total"))
        .select("l_partkey", "part_value")
    )


# --------------------------------------------------------------------------
# Q12: late-shipment priority counts. lineitem has no shipmode, so the
# grouping dimension is l_returnflag and "late" is l_shipdate after
# o_orderdate; the dual CASE-sum count shape is Q12's point.
# --------------------------------------------------------------------------


@query(
    "A7_q12_late_priority_counts",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                    THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
      AND l_shipdate > o_orderdate
    GROUP BY l_returnflag
    """,
)
def q12_late_priority_counts(spark, sf_dir):
    orders, li = load(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        orders.join(li, F.col("o_orderkey") == F.col("l_orderkey"))
        .filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
            & (F.col("l_shipdate") > F.col("o_orderdate"))
        )
        .groupBy("l_returnflag")
        .agg(
            F.sum(F.when(high, 1).otherwise(0)).alias("high_line_count"),
            F.sum(F.when(~high, 1).otherwise(0)).alias("low_line_count"),
        )
    )


# --------------------------------------------------------------------------
# Q16: supplier diversity per part attribute — NOT-IN exclusion plus
# COUNT(DISTINCT). Supplier-part pairs come from lineitem; excluded
# suppliers (the reference's complaints filter) are those with negative
# account balance.
# --------------------------------------------------------------------------


@query(
    "A7_q16_supplier_diversity",
    """
    SELECT p_brand, p_type, p_size,
           COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE p_brand <> 'Brand#1'
      AND p_size IN (1, 5, 10, 15, 20, 25, 30, 35)
      AND l_suppkey NOT IN (
          SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
      )
    GROUP BY p_brand, p_type, p_size
    """,
)
def q16_supplier_diversity(spark, sf_dir):
    li, part, supp = load(spark, sf_dir, "lineitem", "part", "supplier")
    bad = supp.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    return (
        li.join(bad, F.col("l_suppkey") == F.col("s_suppkey"), "left_anti")
        .join(
            F.broadcast(
                part.filter(
                    (F.col("p_brand") != "Brand#1")
                    & F.col("p_size").isin(1, 5, 10, 15, 20, 25, 30, 35)
                )
            ),
            F.col("p_partkey") == F.col("l_partkey"),
        )
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q20: suppliers who concentrated a part's volume — nested semi-join chain
# against two aggregated views. partsupp availability is derived from
# lineitem: a (supplier, part) qualifies when its 1996 shipped quantity
# exceeds half its all-time quantity for a matching part.
# --------------------------------------------------------------------------


@query(
    "A7_q20_concentrated_suppliers",
    """
    WITH alltime AS (
        SELECT l_suppkey AS sk, l_partkey AS pk,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS total_qty
        FROM lineitem GROUP BY 1, 2
    ),
    y96 AS (
        SELECT l_suppkey AS sk, l_partkey AS pk,
               CAST(SUM(CAST(l_quantity AS DECIMAL(38,6))) AS DOUBLE) AS qty96
        FROM lineitem
        WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
        GROUP BY 1, 2
    )
    SELECT s_name, s_acctbal
    FROM supplier
    JOIN nation ON s_nationkey = n_nationkey
    WHERE n_name = 'NATION_1'
      AND s_suppkey IN (
          SELECT a.sk FROM alltime a
          JOIN y96 ON a.sk = y96.sk AND a.pk = y96.pk
          JOIN part ON a.pk = p_partkey
          WHERE p_name LIKE '%blue%' AND y96.qty96 > 0.5 * a.total_qty
      )
    ORDER BY s_name
    """,
)
def q20_concentrated_suppliers(spark, sf_dir):
    li, part, supp, nation = load(
        spark, sf_dir, "lineitem", "part", "supplier", "nation"
    )
    alltime = li.groupBy(
        F.col("l_suppkey").alias("sk"), F.col("l_partkey").alias("pk")
    ).agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double").alias("total_qty"))
    y96 = (
        li.filter(
            (F.col("l_shipdate") >= _ts("1996-01-01"))
            & (F.col("l_shipdate") < _ts("1997-01-01"))
        )
        .groupBy(F.col("l_suppkey").alias("sk2"), F.col("l_partkey").alias("pk2"))
        .agg(F.sum(F.col("l_quantity").cast("decimal(38,6)")).cast("double").alias("qty96"))
    )
    qualifying = (
        alltime.join(
            y96, (F.col("sk") == F.col("sk2")) & (F.col("pk") == F.col("pk2"))
        )
        .join(
            F.broadcast(part.filter(F.col("p_name").like("%blue%"))),
            F.col("pk") == F.col("p_partkey"),
        )
        .filter(F.col("qty96") > 0.5 * F.col("total_qty"))
        .select("sk")
    )
    return (
        supp.join(
            F.broadcast(nation.filter(F.col("n_name") == "NATION_1")),
            F.col("s_nationkey") == F.col("n_nationkey"),
        )
        .join(qualifying, F.col("s_suppkey") == F.col("sk"), "left_semi")
        .select("s_name", "s_acctbal")
        .orderBy("s_name")
    )


# --------------------------------------------------------------------------
# Q21: suppliers who were the sole latest shipper of a finished multi-
# supplier order — EXISTS + NOT EXISTS self-correlation on the fact table,
# adapted to shipdate (no receipt/commit dates in TESTDATA).
# --------------------------------------------------------------------------


@query(
    "A7_q21_waiting_suppliers",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier
    JOIN lineitem l1 ON s_suppkey = l1.l_suppkey
    JOIN orders ON o_orderkey = l1.l_orderkey
    JOIN nation ON s_nationkey = n_nationkey
    WHERE o_orderstatus = 'F'
      AND n_name = 'NATION_1'
      AND l1.l_shipdate > o_orderdate
      AND EXISTS (
          SELECT 1 FROM lineitem l2
          WHERE l2.l_orderkey = l1.l_orderkey
            AND l2.l_suppkey <> l1.l_suppkey
      )
      AND NOT EXISTS (
          SELECT 1 FROM lineitem l3
          WHERE l3.l_orderkey = l1.l_orderkey
            AND l3.l_suppkey <> l1.l_suppkey
            AND l3.l_shipdate > l1.l_shipdate
      )
    GROUP BY s_name
    ORDER BY numwait DESC, s_name
    LIMIT 100
    """,
)
def q21_waiting_suppliers(spark, sf_dir):
    li, orders, supp, nation = load(
        spark, sf_dir, "lineitem", "orders", "supplier", "nation"
    )
    l1 = (
        li.join(
            orders.filter(F.col("o_orderstatus") == "F"),
            F.col("l_orderkey") == F.col("o_orderkey"),
        )
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .select("l_orderkey", "l_suppkey", "l_shipdate")
    )
    other = li.select(
        F.col("l_orderkey").alias("_ok"),
        F.col("l_suppkey").alias("_sk"),
        F.col("l_shipdate").alias("_sd"),
    )
    # EXISTS → left-semi on (same order, different supplier); NOT EXISTS →
    # left-anti on (same order, different supplier, strictly later ship).
    # Both are one shuffle each on l_orderkey; AQE coalesces the plans.
    waited = l1.join(
        other,
        (F.col("l_orderkey") == F.col("_ok")) & (F.col("l_suppkey") != F.col("_sk")),
        "left_semi",
    ).join(
        other,
        (F.col("l_orderkey") == F.col("_ok"))
        & (F.col("l_suppkey") != F.col("_sk"))
        & (F.col("_sd") > F.col("l_shipdate")),
        "left_anti",
    )
    return (
        waited.join(
            F.broadcast(
                supp.join(
                    F.broadcast(nation.filter(F.col("n_name") == "NATION_1")),
                    F.col("s_nationkey") == F.col("n_nationkey"),
                )
            ),
            F.col("l_suppkey") == F.col("s_suppkey"),
        )
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.desc("numwait"), "s_name")
        .limit(100)
    )
