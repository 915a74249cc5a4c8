"""Streaming observability: a StreamingQueryListener that captures
per-micro-batch progress into a queryable metrics table.

The ops story for long-running 100 TB/day streams: input rate, processing
rate, batch duration, and state-store size are the four signals that
predict falling behind (duration approaching trigger interval, state rows
growing without bound → watermark misconfigured). The listener keeps them
driver-side as plain dicts; ``metrics_df`` turns the captured history into
a DataFrame for the same declared-query machinery as any table — in
production the natural sink is ``write_warehouse_table`` on a schedule.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql.streaming import StreamingQueryListener

METRICS_SCHEMA = (
    "query_id string, batch_id long, num_input_rows long,"
    " input_rows_per_second double, process_rows_per_second double,"
    " batch_duration_ms long, state_rows long"
)


class BatchMetricsListener(StreamingQueryListener):
    """Collects one row per completed micro-batch."""

    def __init__(self) -> None:
        self.rows: list[tuple] = []

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        pass

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = json.loads(event.progress.json)
        state = p.get("stateOperators") or []
        state_rows = sum(int(s.get("numRowsTotal", 0)) for s in state)
        durations = p.get("durationMs") or {}
        self.rows.append(
            (
                p.get("id"),
                int(p.get("batchId", -1)),
                int(p.get("numInputRows", 0)),
                float(p.get("inputRowsPerSecond") or 0.0),
                float(p.get("processedRowsPerSecond") or 0.0),
                int(durations.get("triggerExecution", 0)),
                state_rows,
            )
        )

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass


def metrics_df(spark: SparkSession, listener: BatchMetricsListener) -> DataFrame:
    """Captured batch metrics as a DataFrame (empty-safe)."""
    return spark.createDataFrame(listener.rows, METRICS_SCHEMA)
