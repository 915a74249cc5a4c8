"""Custom Python data sources (Spark 4 DataSource API).

The engine's sources are overwhelmingly built-in (`parquet`, `json`, `csv`,
`binaryFile` — io.py); this module covers the remaining seam: formats Spark
has no reader for. The Python DataSource API slots them into the normal
``spark.read.format(...)`` surface, so downstream code sees an ordinary
DataFrame with schema, partition-parallel reads, and Catalyst on top
(column pruning applies after the scan; these sources emit fixed narrow
schemas by design).

Two sources:

- ``wavfile``: a directory of WAV files → one metadata+features row per
  file. Partitioning is per-file (the natural unit — each file is decoded
  independently on executors; at 100 TB this is the same embarrassingly
  parallel shape as binaryFile + mapInPandas, packaged as a source).
- ``synth_events``: a deterministic synthetic event generator — rows are a
  pure function of (seed, row index), so any partition layout yields the
  same table. The load-generation / soak-test source: no input files, N
  partitions generate ranges in parallel.
"""

from __future__ import annotations

import os
from collections.abc import Iterator, Sequence

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)
from pyspark.sql.types import StructType


class _WavPartition(InputPartition):
    def __init__(self, path: str):
        self.path = path


class WavDirectoryReader(DataSourceReader):
    def __init__(self, options: dict):
        if "path" not in options:
            raise ValueError("wavfile source requires .load(path)")
        self.path = options["path"]

    def partitions(self) -> Sequence[InputPartition]:
        found = []
        for root, _dirs, files in os.walk(self.path):
            for f in sorted(files):
                if f.lower().endswith(".wav"):
                    found.append(_WavPartition(os.path.join(root, f)))
        if not found and os.path.isfile(self.path):
            found = [_WavPartition(self.path)]
        return found

    def read(self, partition: _WavPartition) -> Iterator[tuple]:
        # Runs on executors: one file per task, decoded locally.
        from .audio import audio_feature_row

        with open(partition.path, "rb") as fh:
            data = fh.read()
        row = audio_feature_row(data)
        yield (
            partition.path,
            row["sample_rate"],
            row["channels"],
            row["duration_s"],
            row["rms"],
            row["peak"],
            row["zero_crossing_rate"],
        )


class WavDirectorySource(DataSource):
    """``spark.read.format("wavfile").load(dir)`` → audio feature table."""

    @classmethod
    def name(cls) -> str:
        return "wavfile"

    def schema(self) -> str:
        return (
            "path string, sample_rate int, channels int, duration_s double,"
            " rms double, peak double, zero_crossing_rate double"
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return WavDirectoryReader(self.options)


class _RangePartition(InputPartition):
    def __init__(self, start: int, end: int):
        self.start = start
        self.end = end


class SynthEventsReader(DataSourceReader):
    def __init__(self, options: dict):
        self.n_rows = int(options.get("rows", 1000))
        self.n_parts = int(options.get("partitions", 8))
        self.seed = int(options.get("seed", 42))

    def partitions(self) -> Sequence[InputPartition]:
        per = (self.n_rows + self.n_parts - 1) // self.n_parts
        return [
            _RangePartition(i, min(i + per, self.n_rows))
            for i in range(0, self.n_rows, per)
        ]

    def read(self, partition: _RangePartition) -> Iterator[tuple]:
        # Pure function of (seed, i): identical output for any partition
        # layout — the determinism contract every test source needs.
        for i in range(partition.start, partition.end):
            yield _synth_event_row(self.seed, i)


def _synth_event_row(seed: int, i: int) -> tuple:
    """Pure function of (seed, i) — shared by the batch and stream readers
    so a replayed stream equals the batch table over the same index range."""
    import hashlib

    types = ("click", "view", "purchase", "signup", "error")
    h = hashlib.md5(f"{seed}:{i}".encode()).digest()
    user = int.from_bytes(h[0:4], "big") % 1000
    etype = types[h[4] % len(types)]
    value = round(int.from_bytes(h[5:9], "big") % 100_000 / 100.0, 2)
    ts_us = 1_704_067_200_000_000 + i * 1_000_000  # 2024-01-01 + i sec
    return (i, ts_us, user, etype, value)


class SynthEventsStreamReader(SimpleDataSourceStreamReader):
    """Micro-batch stream over the same deterministic generator.

    Offsets are plain row indices, so recovery/replay
    (``readBetweenOffsets``) regenerates exactly the rows of any earlier
    batch — the exactly-once contract a file-backed source gets from
    immutable files, here from purity.
    """

    def __init__(self, options: dict):
        self.rate = int(options.get("rows_per_batch", 100))
        self.seed = int(options.get("seed", 42))

    def initialOffset(self) -> dict:
        return {"index": 0}

    def read(self, start: dict):
        i0 = int(start["index"])
        i1 = i0 + self.rate
        return (
            iter([_synth_event_row(self.seed, i) for i in range(i0, i1)]),
            {"index": i1},
        )

    def readBetweenOffsets(self, start: dict, end: dict):
        return iter(
            _synth_event_row(self.seed, i)
            for i in range(int(start["index"]), int(end["index"]))
        )


class SynthEventsSource(DataSource):
    """``spark.read.format("synth_events").option("rows", N).load()`` —
    batch; ``spark.readStream.format("synth_events")`` — micro-batch
    stream over the same deterministic rows."""

    @classmethod
    def name(cls) -> str:
        return "synth_events"

    def schema(self) -> str:
        return (
            "event_id long, ts_us long, user_id long, event_type string,"
            " value double"
        )

    def reader(self, schema: StructType) -> DataSourceReader:
        return SynthEventsReader(self.options)

    def simpleStreamReader(self, schema: StructType) -> SimpleDataSourceStreamReader:
        return SynthEventsStreamReader(self.options)


def register_sources(spark) -> None:
    """Register the custom sources on a session (idempotent)."""
    spark.dataSource.register(WavDirectorySource)
    spark.dataSource.register(SynthEventsSource)
