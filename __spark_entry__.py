"""Driver contract for the spark-graft builder (PySpark target).

``queries()`` / ``oracle_sql()`` are aggregated from
``hg_data_pipelines_spark.queries`` — each operator from SURVEY.md §2 is
declared there as a (DataFrame plan, DuckDB oracle SQL) pair; queries with
no SQL-expressible oracle (hash-based LSH/SimHash, HLL sketches) are
declared without one and get the driver's rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H Q1-style pricing summary) on sf0.001."""
    from hg_data_pipelines_spark.queries import QUERIES

    return QUERIES["A7_q1_pricing_summary"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    from hg_data_pipelines_spark.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL oracle per query (omitted → rows-only)."""
    from hg_data_pipelines_spark.queries import ORACLES

    return dict(ORACLES)
