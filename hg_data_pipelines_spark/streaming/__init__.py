"""Structured Streaming operators with no batch oracle (X7, X9, stateful).

Batch-checkable streaming shapes (tumbling/sliding windows, sessionization)
live in ``queries/events.py``/``queries/streaming_q.py`` with DuckDB
oracles; this package holds the genuinely streaming-only semantics —
watermarks dropping late data, stateful dedup, custom per-key state — tested
with deterministic file-source micro-batches and expected-state goldens
(SURVEY.md §7.2 "streaming state").
"""

from .jobs import (  # noqa: F401
    sessionize_transform_with_state,
    sessionize_with_state,
    stream_dedup_within_watermark,
    stream_merge_to_warehouse,
    stream_stream_join,
    stream_to_warehouse,
    watermarked_tumbling_agg,
)
