"""Pinned state-store metrics for the true-streaming declared queries.

These 8 queries are the only declared surface without plan budgets (no
batch physical plan to fence), so state growth was the one regression the
suite could not see: a watermark accidentally dropped, a dedup horizon
widened, a join condition losing its time bound — all silently balloon
``stateOperators.numRowsTotal`` long before they break correctness
goldens. The staged micro-batches are deterministic by construction
(``_stage_event_batches``: global-order chunking, strictly increasing
mtimes), so the final state size, total input rows, and watermark-dropped
counts are exact goldens at sf0.001.

A failure here means the STATE behavior changed: re-derive the golden by
rerunning with the printout in the assert message, and justify the new
value in the commit (bigger state at the same semantics = a 100 TB
regression even when outputs match).
"""

from __future__ import annotations

import json
import time

import pytest

from hg_data_pipelines_spark.queries import QUERIES

_SF = "/root/testdata/sf0.001"

# (input_rows, state_rows_final, dropped_by_watermark) per query, sf0.001.
_GOLDENS = {
    "X6_streaming_tumbling": (1000, 987, 0),
    "X7_streaming_watermarked_window": (1000, 1, 0),
    "X10_streaming_stream_join": (2000, 3, 0),
    # left-outer: same bounded join state as the inner form — the null
    # emission path reads evicted state, it must not RETAIN more
    "X10_streaming_left_outer_join": (2000, 3, 0),
    # full-outer: both null directions read evicted state; the buffered
    # footprint must stay the inner form's
    "X10_streaming_full_outer_join": (2000, 3, 0),
    "X9_streaming_dedup_within_watermark": (1000, 1, 0),
    "X17_streaming_session_window": (1000, 946, 0),
    "X6_streaming_ohlc": (1000, 868, 0),
    "S16_streaming_warehouse_landing": (1000, 0, 0),  # stateless landing
    "X10_streaming_static_enrich": (1000, 50, 0),
}


def _observe(spark, name):
    from pyspark.sql.streaming import StreamingQueryListener

    progresses: list[dict] = []

    class L(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            progresses.append(json.loads(event.progress.json))

        def onQueryIdle(self, event):
            pass

        def onQueryTerminated(self, event):
            pass

    listener = L()
    spark.streams.addListener(listener)
    try:
        QUERIES[name](spark, _SF).collect()
        # listener delivery is async — wait for the event stream to drain
        seen, deadline = len(progresses), time.time() + 30
        while time.time() < deadline:
            time.sleep(1.0)
            if progresses and len(progresses) == seen:
                break
            seen = len(progresses)
    finally:
        spark.streams.removeListener(listener)
    assert progresses, f"{name}: no progress events observed"
    last = max(progresses, key=lambda p: p.get("batchId", -1))
    return (
        sum(int(p.get("numInputRows", 0)) for p in progresses),
        sum(op.get("numRowsTotal", 0) for op in last.get("stateOperators", [])),
        sum(
            op.get("numRowsDroppedByWatermark", 0)
            for p in progresses
            for op in p.get("stateOperators", [])
        ),
    )


@pytest.mark.parametrize("name", sorted(_GOLDENS))
def test_streaming_state_metrics_pinned(spark, name):
    got = _observe(spark, name)
    assert got == _GOLDENS[name], (
        f"{name}: (input_rows, state_rows_final, dropped_by_watermark) "
        f"= {got}, pinned {_GOLDENS[name]} — state behavior changed"
    )
