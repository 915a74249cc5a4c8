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

from .common import dsum, query, sql_dsum, utc

_SLICE_LO, _SLICE_HI = "2024-01-10", "2024-01-12"


def _warehouse_dir(sf_dir: str) -> str:
    return os.path.join(
        tempfile.gettempdir(),
        f"hg_wh_{os.getpid()}_{os.path.basename(os.path.abspath(sf_dir))}",
    )


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
    from ..jobs import run_pipeline

    utc(spark)
    wh = _warehouse_dir(sf_dir)
    ctx = run_pipeline(spark, "events_warehouse", wh, {"sf_dir": sf_dir})
    fact_path = ctx.reports["events_fact"]["path"]
    ev = spark.read.parquet(fact_path)
    pruned = ev.filter(
        F.col("event_date").between(F.lit(_SLICE_LO).cast("date"),
                                    F.lit(_SLICE_HI).cast("date"))
    )
    return pruned.groupBy(
        F.col("event_date").cast("date").alias("event_date"), "event_type"
    ).agg(F.count(F.lit(1)).alias("n"), dsum("value", "sum_value"))
