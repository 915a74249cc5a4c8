"""Audio as an opaque-binary multimodal column (X5, audio leg).

Same pattern as ``multimodal.py`` images: a ``binaryFile`` source yields
(path, length, content); header parsing and feature extraction run inside
Arrow-batched ``mapInPandas`` so bytes never leave their partition and the
operator is row-local (no shuffle) at any scale.

Unlike the image path (where JPEG needed a full entropy decoder), WAV/PCM
is a pure container format, so the codec here is REAL, not a stand-in:
RIFF/WAVE chunk walk, PCM 8-bit unsigned / 16-bit signed little-endian,
any channel count. Compressed codecs (MP3/AAC/Opus) would slot in at the
same seam with an external decoder; their absence raises explicitly.

Features are the standard cheap audio-curation set: duration, RMS energy,
peak, zero-crossing rate, plus a fixed-grain windowed RMS profile (the
1-D analogue of an image thumbnail) — enough to drive silence filtering,
clipping detection, and energy-based near-dup blocking.
"""

from __future__ import annotations

import struct
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import types as T

AUDIO_META_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("length", T.LongType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("bits_per_sample", T.IntegerType()),
        T.StructField("n_frames", T.LongType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)

AUDIO_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("sample_rate", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
        T.StructField("rms", T.DoubleType()),
        T.StructField("peak", T.DoubleType()),
        T.StructField("zero_crossing_rate", T.DoubleType()),
        T.StructField("rms_windows", T.ArrayType(T.DoubleType())),
    ]
)


# ---------------------------------------------------------------------------
# Codec (real: RIFF/WAVE PCM)
# ---------------------------------------------------------------------------


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """(n,) or (n, channels) int16 samples → WAV (RIFF/PCM16-LE) bytes."""
    arr = np.asarray(samples, dtype="<i2")
    if arr.ndim == 1:
        arr = arr[:, None]
    n, ch = arr.shape
    data = arr.tobytes()  # C order = interleaved frames
    byte_rate = sample_rate * ch * 2
    fmt = struct.pack("<HHIIHH", 1, ch, sample_rate, byte_rate, ch * 2, 16)
    body = b"WAVE" + b"fmt " + struct.pack("<I", len(fmt)) + fmt
    body += b"data" + struct.pack("<I", len(data)) + data
    return b"RIFF" + struct.pack("<I", len(body)) + body


def wav_info(data: bytes) -> tuple[int, int, int, int]:
    """WAV bytes → (sample_rate, channels, bits_per_sample, n_frames).

    Header-only RIFF chunk walk — no sample decode. Raises on non-WAV or
    non-PCM (compressed) streams.
    """
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not RIFF/WAVE bytes")
    pos, n = 12, len(data)
    fmt = None
    data_len = None
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        clen = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        if cid == b"fmt ":
            fmt = struct.unpack("<HHIIHH", data[pos + 8 : pos + 24])
        elif cid == b"data":
            data_len = clen
            if fmt is not None:
                break
        # chunks are word-aligned: odd sizes carry a pad byte
        pos += 8 + clen + (clen & 1)
    if fmt is None or data_len is None:
        raise ValueError("WAV missing fmt/data chunk")
    audio_format, channels, sample_rate, _, _, bits = fmt
    if audio_format != 1 or bits not in (8, 16):
        raise ValueError(
            f"unsupported WAV: format={audio_format} bits={bits}"
            " (PCM 8/16-bit only; compressed codecs need an external decoder)"
        )
    n_frames = data_len // (channels * (bits // 8))
    return sample_rate, channels, bits, n_frames


def decode_wav(data: bytes) -> tuple[np.ndarray, int]:
    """WAV bytes → ((n_frames, channels) float64 in [-1, 1], sample_rate)."""
    sample_rate, channels, bits, n_frames = wav_info(data)
    pos, n = 12, len(data)
    raw = None
    while pos + 8 <= n:
        cid = data[pos : pos + 4]
        clen = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
        if cid == b"data":
            raw = data[pos + 8 : pos + 8 + clen]
            break
        pos += 8 + clen + (clen & 1)
    assert raw is not None  # wav_info already validated
    if bits == 16:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.float64) / 32768.0
    else:  # 8-bit WAV is unsigned, midpoint 128
        arr = (np.frombuffer(raw, dtype=np.uint8).astype(np.float64) - 128.0) / 128.0
    n_full = (len(arr) // channels) * channels
    return arr[:n_full].reshape(-1, channels), sample_rate


# ---------------------------------------------------------------------------
# Feature kernels (numpy, deterministic)
# ---------------------------------------------------------------------------


def _mono(x: np.ndarray) -> np.ndarray:
    """Channel-mean downmix, float64."""
    return x.mean(axis=1)


def audio_feature_row(data: bytes, n_windows: int = 16) -> dict:
    """One WAV blob → the feature dict for AUDIO_FEATURES_SCHEMA."""
    x, rate = decode_wav(data)
    mono = _mono(x)
    n = mono.shape[0]
    duration = n / rate
    rms = float(np.sqrt(np.mean(mono * mono))) if n else 0.0
    peak = float(np.max(np.abs(mono))) if n else 0.0
    # sign changes per sample step (silence-safe: exact zeros count once)
    zcr = (
        float(np.mean(np.signbit(mono[1:]) != np.signbit(mono[:-1]))) if n > 1 else 0.0
    )
    # fixed-count windowed RMS profile (truncates the <1-window tail)
    win = max(n // n_windows, 1)
    usable = (n // win) * win
    prof = (
        np.sqrt(np.mean(mono[:usable].reshape(-1, win) ** 2, axis=1))[:n_windows]
        if usable
        else np.zeros(0)
    )
    return {
        "sample_rate": int(rate),
        "channels": int(x.shape[1]),
        "duration_s": float(duration),
        "rms": rms,
        "peak": peak,
        "zero_crossing_rate": zcr,
        "rms_windows": [float(v) for v in prof],
    }


# ---------------------------------------------------------------------------
# Spark plumbing
# ---------------------------------------------------------------------------


def extract_audio_metadata(binary_df: DataFrame) -> DataFrame:
    """binaryFile rows → typed audio metadata (header-only, no decode)."""

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"])
                try:
                    rate, ch, bits, frames = wav_info(content)
                    rows.append(
                        {
                            "path": r["path"],
                            "length": int(r["length"]),
                            "sample_rate": rate,
                            "channels": ch,
                            "bits_per_sample": bits,
                            "n_frames": frames,
                            "duration_s": frames / rate,
                        }
                    )
                except ValueError:
                    rows.append(
                        {
                            "path": r["path"],
                            "length": int(r["length"]),
                            "sample_rate": None,
                            "channels": None,
                            "bits_per_sample": None,
                            "n_frames": None,
                            "duration_s": None,
                        }
                    )
            yield pd.DataFrame(rows, columns=[f.name for f in AUDIO_META_SCHEMA.fields])

    return binary_df.select("path", "length", "content").mapInPandas(
        _meta, AUDIO_META_SCHEMA
    )


def audio_features(binary_df: DataFrame, n_windows: int = 16) -> DataFrame:
    """Per-file audio features via mapInPandas (row-local, no shuffle)."""

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                row = {"path": r["path"]}
                row.update(audio_feature_row(bytes(r["content"]), n_windows))
                rows.append(row)
            yield pd.DataFrame(
                rows, columns=[f.name for f in AUDIO_FEATURES_SCHEMA.fields]
            )

    return binary_df.select("path", "content").mapInPandas(
        _feat, AUDIO_FEATURES_SCHEMA
    )
