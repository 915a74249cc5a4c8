"""Streaming job builders: watermarked windows (X7), stateful dedup (X9),
custom per-key state (applyInPandasWithState).

Each builder takes a *streaming* DataFrame (``spark.readStream...``) and
returns the transformed streaming DataFrame; callers attach the sink. The
same transformations compile for batch DataFrames where Spark allows it —
that's the micro-batch model's unification (SURVEY.md X6 note).

Scale notes: watermarks bound state size (state store holds only windows
newer than watermark − lateness); ``dropDuplicatesWithinWatermark`` keeps a
key set only within the lateness horizon — both are what make 100 TB/day
streams feasible. The stateful sessionizer holds one small tuple per active
user key.
"""

from __future__ import annotations

from collections.abc import Iterator
from typing import Any

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def watermarked_tumbling_agg(
    events: DataFrame,
    window: str = "5 minutes",
    watermark: str = "10 minutes",
) -> DataFrame:
    """X7: tumbling-window counts/sums that drop data later than the
    watermark; append output mode emits each window once, when it closes."""
    return (
        events.withWatermark("ts", watermark)
        .groupBy(F.window("ts", window).alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("value").alias("sum_value"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            "event_type",
            "n",
            "sum_value",
        )
    )


def stream_dedup_within_watermark(
    events: DataFrame,
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """X9: drop duplicate events whose keys re-appear within the watermark
    horizon; state for keys older than the horizon is evicted."""
    return events.withWatermark("ts", watermark).dropDuplicatesWithinWatermark(
        keys or ["event_id"]
    )


# ---------------------------------------------------------------------------
# Custom stateful operator: per-user session accumulator
# ---------------------------------------------------------------------------

_SESSION_OUT = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_start", T.TimestampType()),
        T.StructField("session_end", T.TimestampType()),
        T.StructField("n_events", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_SESSION_STATE = T.StructType(
    [
        T.StructField("start_ms", T.LongType()),
        T.StructField("end_ms", T.LongType()),
        T.StructField("n", T.LongType()),
        T.StructField("sum_value", T.DoubleType()),
    ]
)

_GAP_MS = 30 * 60 * 1000  # 30-minute session gap


def _sessionize(
    key: tuple[Any, ...],
    pdfs: Iterator[pd.DataFrame],
    state: GroupState,
) -> Iterator[pd.DataFrame]:
    """Emit closed sessions per user; keep the open session in state.

    A new event more than _GAP_MS after the open session's end closes that
    session (emitted) and opens a new one. Timeout closes the open session
    when the watermark passes it.
    """
    user_id = key[0]
    if state.hasTimedOut:
        start_ms, end_ms, n, sv = state.get
        state.remove()
        yield pd.DataFrame(
            {
                "user_id": [user_id],
                "session_start": [pd.Timestamp(start_ms, unit="ms")],
                "session_end": [pd.Timestamp(end_ms, unit="ms")],
                "n_events": [n],
                "sum_value": [sv],
            }
        )
        return

    rows = pd.concat(list(pdfs)).sort_values("ts")
    if state.exists:
        start_ms, end_ms, n, sv = state.get
    else:
        start_ms, end_ms, n, sv = None, None, 0, 0.0

    closed = []
    for _, r in rows.iterrows():
        t_ms = int(r["ts"].value // 1_000_000)
        if start_ms is None:
            start_ms, end_ms, n, sv = t_ms, t_ms, 1, float(r["value"])
        elif t_ms - end_ms > _GAP_MS:
            closed.append((start_ms, end_ms, n, sv))
            start_ms, end_ms, n, sv = t_ms, t_ms, 1, float(r["value"])
        else:
            end_ms = max(end_ms, t_ms)
            n += 1
            sv += float(r["value"])

    state.update((start_ms, end_ms, n, sv))
    state.setTimeoutTimestamp(end_ms + _GAP_MS)

    if closed:
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(closed),
                "session_start": [pd.Timestamp(s, unit="ms") for s, *_ in closed],
                "session_end": [pd.Timestamp(e, unit="ms") for _, e, *_ in closed],
                "n_events": [c[2] for c in closed],
                "sum_value": [c[3] for c in closed],
            }
        )


def sessionize_with_state(events: DataFrame, watermark: str = "1 hour") -> DataFrame:
    """Custom stateful sessionization via ``applyInPandasWithState``.

    The streaming counterpart of the batch lag-sessionization
    (queries/events.py X8) — state is one open session per user, bounded by
    the event-time timeout.
    """
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .applyInPandasWithState(
            _sessionize,
            outputStructType=_SESSION_OUT,
            stateStructType=_SESSION_STATE,
            outputMode="append",
            timeoutConf=GroupStateTimeout.EventTimeTimeout,
        )
    )


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    key: str = "user_id",
    watermark: str = "10 minutes",
    within: str = "30 minutes",
    how: str = "inner",
) -> DataFrame:
    """Watermarked stream-stream join: match right-side events to the
    left-side event they follow within ``within`` on the same ``key``.

    The conversion-attribution shape (click stream ⋈ purchase stream).
    Both sides are watermarked and the join condition carries a time-range
    bound — together they let Spark evict buffered rows once the watermark
    passes ``left.ts + within``, so state is bounded by (rate × horizon),
    not by stream length. Without the range condition the state store
    would grow forever; this is the required shape for stream-stream joins
    at 100 TB/day. Outer variants emit unmatched rows only after the
    watermark proves no match can arrive.
    """
    l = left.withWatermark("ts", watermark).select(
        F.col(key).alias("l_key"),
        F.col("ts").alias("l_ts"),
        F.col("event_id").alias("l_event_id"),
        F.col("value").alias("l_value"),
    )
    r = right.withWatermark("ts", watermark).select(
        F.col(key).alias("r_key"),
        F.col("ts").alias("r_ts"),
        F.col("event_id").alias("r_event_id"),
        F.col("value").alias("r_value"),
    )
    return l.join(
        r,
        (F.col("l_key") == F.col("r_key"))
        & (F.col("r_ts") >= F.col("l_ts"))
        & (F.col("r_ts") <= F.col("l_ts") + F.expr(f"INTERVAL {within}")),
        how,
    )


def stream_to_warehouse(
    stream_df: DataFrame,
    warehouse_dir: str,
    table: str,
    checkpoint_dir: str,
    partition_by: list[str] | None = None,
):
    """Streaming → Parquet warehouse sink via foreachBatch, exactly-once.

    Each micro-batch lands through the same ``write_warehouse_table`` S9
    path batch jobs use, into a batch-keyed subdirectory
    (``table/_batch_id=N/``) with overwrite mode — so a batch replayed
    after failure (Spark re-invokes foreachBatch with the SAME batch_id
    from the checkpoint) overwrites its own output instead of duplicating
    rows. DuckDB/Spark read the table as ``table/*/*.parquet`` (or via
    partition discovery of the _batch_id key) mid-stream. Returns the
    started StreamingQuery (caller awaits/stops).
    """
    import os

    from ..io import write_warehouse_table

    def _land(batch_df: DataFrame, batch_id: int) -> None:
        write_warehouse_table(
            batch_df,
            warehouse_dir,
            f"{table}/_batch_id={batch_id}",
            partition_by=partition_by,
            mode="overwrite",
        )

    return (
        stream_df.writeStream.foreachBatch(_land)
        .option("checkpointLocation", os.path.join(checkpoint_dir, table))
        .trigger(availableNow=True)
        .start()
    )


def stream_merge_to_warehouse(
    stream_df: DataFrame,
    warehouse_dir: str,
    table: str,
    keys: list[str],
    order: list[str],
    checkpoint_dir: str,
    partition_by: list[str] | None = None,
):
    """Streaming UPSERT sink: each micro-batch MERGEs into the warehouse
    table by key via ``io.merge_warehouse_table`` (foreachBatch).

    Complements ``stream_to_warehouse`` (append-shaped): here a key seen
    again — a corrected record, a CDC update, a replayed batch — rewrites
    the row instead of duplicating it. Replay safety comes from MERGE
    idempotence: re-merging a batch whose rows are already present leaves
    the table unchanged, so at-least-once foreachBatch delivery still
    yields exactly-once table state. With ``partition_by`` the per-batch
    rewrite cost stays proportional to the partitions the batch touches
    (dynamic partition overwrite), which is what keeps a continuous
    upsert stream viable against a 100 TB table.
    """
    import os

    from ..io import merge_warehouse_table

    def _land(batch_df: DataFrame, batch_id: int) -> None:
        merge_warehouse_table(
            batch_df.sparkSession,
            batch_df,
            warehouse_dir,
            table,
            keys=keys,
            order=order,
            partition_by=partition_by,
        )

    return (
        stream_df.writeStream.foreachBatch(_land)
        .option("checkpointLocation", os.path.join(checkpoint_dir, table))
        .trigger(availableNow=True)
        .start()
    )


# ---------------------------------------------------------------------------
# Same sessionizer on Spark 4's transformWithState API (StatefulProcessor):
# typed state handles (ValueState) + explicit timers instead of the single
# packed GroupState tuple. Requires the RocksDB state store provider.
# ---------------------------------------------------------------------------


def _session_processor_cls():
    """Deferred class build: StatefulProcessor subclasses pickle to
    executors, so keep the import local and the class free of module
    state."""
    import pandas as pd  # noqa: PLC0415 (re-import inside executor)

    from pyspark.sql.streaming.stateful_processor import (
        ExpiredTimerInfo,
        StatefulProcessor,
        StatefulProcessorHandle,
        TimerValues,
    )

    gap_ms = _GAP_MS

    class SessionProcessor(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            self._handle = handle
            self._open = handle.getValueState("open_session", _SESSION_STATE)

        def _emit(self, user_id, start_ms, end_ms, n, sv):
            return pd.DataFrame(
                {
                    "user_id": [user_id],
                    "session_start": [pd.Timestamp(start_ms, unit="ms")],
                    "session_end": [pd.Timestamp(end_ms, unit="ms")],
                    "n_events": [n],
                    "sum_value": [sv],
                }
            )

        def handleInputRows(self, key, rows, timerValues: TimerValues):
            user_id = key[0]
            pdf = pd.concat(list(rows)).sort_values("ts")
            if self._open.exists():
                start_ms, end_ms, n, sv = self._open.get()
            else:
                start_ms, end_ms, n, sv = None, None, 0, 0.0
            for _, r in pdf.iterrows():
                t_ms = int(r["ts"].value // 1_000_000)
                if start_ms is None:
                    start_ms, end_ms, n, sv = t_ms, t_ms, 1, float(r["value"])
                elif t_ms - end_ms > gap_ms:
                    yield self._emit(user_id, start_ms, end_ms, n, sv)
                    start_ms, end_ms, n, sv = t_ms, t_ms, 1, float(r["value"])
                else:
                    end_ms = max(end_ms, t_ms)
                    n += 1
                    sv += float(r["value"])
            # replace any stale timer with the open session's close time
            for t in self._handle.listTimers():
                self._handle.deleteTimer(t)
            self._open.update((start_ms, end_ms, n, sv))
            self._handle.registerTimer(end_ms + gap_ms)

        def handleExpiredTimer(self, key, timerValues, expiredTimerInfo: ExpiredTimerInfo):
            user_id = key[0]
            if self._open.exists():
                start_ms, end_ms, n, sv = self._open.get()
                # only the CURRENT close timer may close the session —
                # stale timers (already deleted above, belt+braces) no-op
                if expiredTimerInfo.getExpiryTimeInMs() >= end_ms + gap_ms:
                    self._open.clear()
                    yield self._emit(user_id, start_ms, end_ms, n, sv)

        def close(self) -> None:
            pass

    return SessionProcessor


def sessionize_transform_with_state(
    events: DataFrame, watermark: str = "1 hour"
) -> DataFrame:
    """Sessionization via ``transformWithStateInPandas`` — the Spark 4
    arbitrary-stateful API: named typed state (ValueState) + explicit
    event-time timers, the successor to ``applyInPandasWithState``'s
    packed GroupState. Same contract as ``sessionize_with_state`` (the
    golden test asserts identical output); needs
    ``spark.sql.streaming.stateStore.providerClass`` =
    RocksDBStateStoreProvider, and the ``protobuf`` package (the TWS
    state-server protocol is protobuf-encoded — an explicit dependency
    seam: environments without it keep the GroupState sessionizer).
    """
    try:
        import google.protobuf  # noqa: F401
    except ImportError as e:
        raise ImportError(
            "transformWithStateInPandas requires the 'protobuf' package "
            "(its state-server protocol is protobuf-encoded); use "
            "sessionize_with_state (applyInPandasWithState) instead"
        ) from e
    return (
        events.withWatermark("ts", watermark)
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=_session_processor_cls()(),
            outputStructType=_SESSION_OUT,
            outputMode="Append",
            timeMode="EventTime",
        )
    )
