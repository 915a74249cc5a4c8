"""Structured Streaming declared queries (SURVEY.md X6) — batch-checkable.

``X6_streaming_tumbling`` genuinely runs a Structured Streaming job
(readStream → window agg → memory sink, availableNow trigger) in complete
output mode, so its final state equals the batch aggregation — which is the
DuckDB oracle. Watermark/append-mode semantics (X7/X9) have no batch oracle
and live in ``hg_data_pipelines_spark.streaming`` with pytest goldens.
"""

from __future__ import annotations

import itertools
import os
import shutil
import tempfile

from pyspark.sql import functions as F
from pyspark.sql import types as T

from .common import query, sql_dsum, utc

_COUNTER = itertools.count()

# Physical schema of events.parquet: ts is INT64 nanoseconds (see io.py).
_RAW_EVENTS = T.StructType(
    [
        T.StructField("event_id", T.LongType()),
        T.StructField("ts", T.LongType()),
        T.StructField("user_id", T.LongType()),
        T.StructField("event_type", T.StringType()),
        T.StructField("value", T.DoubleType()),
        T.StructField("props", T.StringType()),
    ]
)


@query(
    "X6_streaming_tumbling",
    f"""
    SELECT time_bucket(INTERVAL '5 minutes', ts) AS window_start,
           event_type, COUNT(*) AS n, {sql_dsum('value', 'sum_value')}
    FROM events GROUP BY 1, 2
    """,
)
def streaming_tumbling(spark, sf_dir):
    utc(spark)
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    # The file stream source requires a *directory*; stage the single
    # parquet file into a temp dir (testdata is read-only).
    stage = tempfile.mkdtemp(prefix="x6_events_")
    shutil.copy(os.path.join(sf_dir, "events.parquet"), stage)
    stream = (
        spark.readStream.schema(_RAW_EVENTS)
        .parquet(stage)
        .withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)").cast("timestamp_ntz"))
    )
    agg = (
        stream.groupBy(F.window("ts", "5 minutes").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )
    sink = f"x6_streaming_tumbling_{os.getpid()}_{next(_COUNTER)}"
    q = (
        agg.writeStream.format("memory")
        .queryName(sink)
        .outputMode("complete")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()
    return spark.table(sink)
