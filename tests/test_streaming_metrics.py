"""Streaming metrics listener (streaming/metrics.py)."""

from __future__ import annotations

import time

from hg_data_pipelines_spark.sources import register_sources
from hg_data_pipelines_spark.streaming.metrics import (
    BatchMetricsListener,
    metrics_df,
)


class TestBatchMetricsListener:
    def test_captures_per_batch_progress(self, spark, tmp_path):
        register_sources(spark)
        listener = BatchMetricsListener()
        spark.streams.addListener(listener)
        q = (
            spark.readStream.format("synth_events")
            .option("rows_per_batch", 25)
            .load()
            .writeStream.format("memory")
            .queryName("metrics_probe")
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            deadline = time.time() + 60
            while time.time() < deadline and len(listener.rows) < 3:
                time.sleep(0.5)
        finally:
            q.stop()
            spark.streams.removeListener(listener)

        assert len(listener.rows) >= 3
        df = metrics_df(spark, listener).collect()
        by_batch = {r["batch_id"]: r for r in df}
        # every observed batch ingested the configured row count
        assert all(r["num_input_rows"] == 25 for r in df if r["batch_id"] > 0)
        assert all(r["batch_duration_ms"] >= 0 for r in df)
        # batches are consecutively numbered for one query
        ids = sorted(by_batch)
        assert ids == list(range(ids[0], ids[0] + len(ids)))
