"""Multimodal opaque-binary columns (X5): images as ``binary`` + typed
metadata, processed by Arrow-batched pandas UDFs.

The reference's whole image path (cv2.imread / PIL.Image.open / cv2.imwrite,
reference: Equirec2Perspec.py:66, street_level_grouping.py:318,
tls_photo_processing.py:38) generalizes to this pattern: a ``binaryFile``
source yields (path, length, content); decode/resize/frame-sample run inside
``mapInPandas`` so each executor touches only its partition's bytes; outputs
are either new binary columns or extracted feature columns.

No cv2/PIL ships in this container; all codecs are implemented here:
- ``decode_png``/``encode_png``: stdlib-zlib PNG — 8-bit gray/RGB/RGBA
  (+alpha-gray), all five scanline filters on decode.
- ``decode_jpeg``/``functions/jpeg.py``: pure-Python JPEG — baseline
  (SOF0/SOF1) and progressive (SOF2, spectral selection + successive
  approximation): Huffman entropy decode, dequantize, IDCT, chroma
  upsampling up to 2×2, restart markers; plus a 4:4:4 baseline encoder
  with the spec's Annex K tables. Real JPEGs flow end-to-end; only
  arithmetic-coded/hierarchical/12-bit frames raise.
- ``decode_image``/``encode_image``: the codec dispatch. The
  deterministic RAW format (magic + dims header + uint8 pixels) remains
  the internal interchange encoding.
- ``jpeg_dimensions`` parses JPEG SOF markers byte-wise (the *correct*
  replacement for the reference's fixed-offset-163 sniff,
  street_level_grouping.py:302-310, which SURVEY.md §7.2 flags as a bug).
"""

from __future__ import annotations

import struct
import zlib
from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_RAW_MAGIC = b"RAWIMG1\x00"

IMAGE_META_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("length", T.LongType()),
        T.StructField("format", T.StringType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
    ]
)


# ---------------------------------------------------------------------------
# Codec seam
# ---------------------------------------------------------------------------


def encode_image(arr: np.ndarray) -> bytes:
    """ndarray (H, W[, C]) uint8 → RAW bytes (deterministic stand-in codec)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    return _RAW_MAGIC + struct.pack("<III", h, w, c) + arr.tobytes()


def decode_image(data: bytes) -> np.ndarray:
    """Image bytes → ndarray (H, W, C) uint8. Dispatches RAW, PNG, JPEG."""
    if data.startswith(_RAW_MAGIC):
        h, w, c = struct.unpack("<III", data[8:20])
        return np.frombuffer(data, dtype=np.uint8, offset=20).reshape(h, w, c)
    if data.startswith(_PNG_MAGIC):
        return decode_png(data)
    if data[:2] == b"\xff\xd8":
        return decode_jpeg(bytes(data))
    raise ValueError("unsupported image bytes (RAW, PNG, baseline JPEG)")


_PNG_MAGIC = b"\x89PNG\r\n\x1a\n"
_PNG_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}  # color type → samples/pixel
_PNG_COLOR_TYPE = {1: 0, 2: 4, 3: 2, 4: 6}  # channels → color type


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes → (H, W, C) uint8 — pure Python + stdlib zlib.

    Supports bit depth 8, color types gray/gray+alpha/RGB/RGBA, no
    interlacing; all five scanline filters (None/Sub/Up/Average/Paeth) are
    un-applied per the PNG spec. Palette, 16-bit, and Adam7 inputs raise.
    """
    if not data.startswith(_PNG_MAGIC):
        raise ValueError("not PNG bytes")
    pos, n = 8, len(data)
    width = height = None
    bit_depth = color_type = interlace = None
    idat = bytearray()
    while pos + 8 <= n:
        length = int.from_bytes(data[pos : pos + 4], "big")
        ctype = data[pos + 4 : pos + 8]
        chunk = data[pos + 8 : pos + 8 + length]
        if ctype == b"IHDR":
            width = int.from_bytes(chunk[0:4], "big")
            height = int.from_bytes(chunk[4:8], "big")
            bit_depth, color_type, interlace = chunk[8], chunk[9], chunk[12]
        elif ctype == b"IDAT":
            idat += chunk
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if width is None:
        raise ValueError("PNG missing IHDR")
    if bit_depth != 8 or color_type not in _PNG_CHANNELS or interlace != 0:
        raise NotImplementedError(
            f"PNG bit_depth={bit_depth} color_type={color_type} "
            f"interlace={interlace} unsupported (8-bit non-interlaced "
            "gray/GA/RGB/RGBA only)"
        )
    channels = _PNG_CHANNELS[color_type]
    raw = zlib.decompress(bytes(idat))
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError("PNG IDAT size mismatch")
    bpp = channels
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    at = 0
    for y in range(height):
        ftype = raw[at]
        at += 1
        line = np.frombuffer(raw, np.uint8, stride, at).astype(np.int32)
        at += stride
        if ftype == 0:
            cur = line
        elif ftype == 2:  # Up
            cur = (line + prev) & 0xFF
        elif ftype == 1:  # Sub — per-pixel recurrence along the row
            cur = line
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 3:  # Average
            cur = line
            for x in range(stride):
                a = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((a + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = line
            for x in range(stride):
                a = int(cur[x - bpp]) if x >= bpp else 0
                b = int(prev[x])
                c = int(prev[x - bpp]) if x >= bpp else 0
                p = a + b - c
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
                cur[x] = (cur[x] + pred) & 0xFF
        else:
            raise ValueError(f"PNG filter type {ftype} invalid")
        out[y] = cur.astype(np.uint8)
        prev = cur
    return out.reshape(height, width, channels)


def encode_png(arr: np.ndarray) -> bytes:
    """(H, W[, C]) uint8 → PNG bytes (filter 0 scanlines, zlib level 6)."""
    arr = np.ascontiguousarray(arr, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    if c not in _PNG_COLOR_TYPE:
        raise ValueError(f"{c} channels unsupported (1/2/3/4)")
    ihdr = (
        w.to_bytes(4, "big")
        + h.to_bytes(4, "big")
        + bytes([8, _PNG_COLOR_TYPE[c], 0, 0, 0])
    )
    raw = b"".join(b"\x00" + arr[y].tobytes() for y in range(h))

    def chunk(tag: bytes, body: bytes) -> bytes:
        return (
            len(body).to_bytes(4, "big")
            + tag
            + body
            + (zlib.crc32(tag + body) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    return (
        _PNG_MAGIC
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw, 6))
        + chunk(b"IEND", b"")
    )


def png_dimensions(data: bytes) -> tuple[int, int, int] | None:
    """(width, height, channels) from the IHDR, without decompressing."""
    if not data.startswith(_PNG_MAGIC) or len(data) < 26:
        return None
    if data[12:16] != b"IHDR":
        return None
    w = int.from_bytes(data[16:20], "big")
    h = int.from_bytes(data[20:24], "big")
    channels = _PNG_CHANNELS.get(data[25])
    return (w, h, channels) if channels else None


def decode_jpeg(data: bytes) -> np.ndarray:
    """Baseline JPEG decode — pure Python/numpy (functions/jpeg.py).

    Replaces the former cv2/PIL deployment seam: Huffman entropy decode,
    dequantize, IDCT, chroma upsample, BT.601 YCbCr→RGB. Progressive and
    arithmetic-coded JPEGs still raise NotImplementedError.
    """
    from .functions.jpeg import decode_jpeg as _dec

    return _dec(bytes(data))


def jpeg_dimensions(data: bytes) -> tuple[int, int] | None:
    """(width, height) from JPEG SOF marker, without decoding (U8).

    Walks the marker stream to the first SOF0-SOF15 segment (skipping
    DHT/DAC/RST-style non-frame markers) — correct for any JPEG, unlike the
    reference's hard-coded ``seek(163)`` (street_level_grouping.py:302-310).
    """
    if len(data) < 4 or data[0:2] != b"\xff\xd8":
        return None
    i = 2
    n = len(data)
    while i + 4 <= n:
        if data[i] != 0xFF:
            i += 1
            continue
        marker = data[i + 1]
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        seg_len = struct.unpack(">H", data[i + 2 : i + 4])[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 9 > n:
                return None
            height = struct.unpack(">H", data[i + 5 : i + 7])[0]
            width = struct.unpack(">H", data[i + 7 : i + 9])[0]
            return width, height
        i += 2 + seg_len
    return None


def image_dimensions(data: bytes) -> tuple[int, int, int] | None:
    """(width, height, channels) for any supported container."""
    if data.startswith(_RAW_MAGIC):
        h, w, c = struct.unpack("<III", data[8:20])
        return w, h, c
    pd_ = png_dimensions(bytes(data))
    if pd_ is not None:
        return pd_
    jd = jpeg_dimensions(bytes(data))
    if jd is not None:
        return jd[0], jd[1], 3
    return None


# ---------------------------------------------------------------------------
# Spark plumbing (production-real)
# ---------------------------------------------------------------------------


def extract_image_metadata(binary_df: DataFrame) -> DataFrame:
    """binaryFile rows → typed metadata table (no pixel decode).

    Header-only parsing per Arrow batch: at 100 TB this reads only file
    headers if the source supports range reads; the full-content scan here
    matches ``binaryFile``'s contract.
    """

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                content = bytes(r["content"])
                fmt = (
                    "raw"
                    if content.startswith(_RAW_MAGIC)
                    else "png"
                    if content.startswith(_PNG_MAGIC)
                    else "jpeg"
                    if content[:2] == b"\xff\xd8"
                    else "unknown"
                )
                dims = image_dimensions(content)
                rows.append(
                    {
                        "path": r["path"],
                        "length": int(r["length"]),
                        "format": fmt,
                        "width": dims[0] if dims else None,
                        "height": dims[1] if dims else None,
                        "channels": dims[2] if dims else None,
                    }
                )
            yield pd.DataFrame(
                rows, columns=[f.name for f in IMAGE_META_SCHEMA.fields]
            )

    return binary_df.select("path", "length", "content").mapInPandas(
        _meta, IMAGE_META_SCHEMA
    )


def resize_images(binary_df: DataFrame, scale: float) -> DataFrame:
    """Downscale RAW images by nearest-neighbor striding (the reference's
    ``image.resize((w/5, h/5))``, street_level_grouping.py:327).

    Returns (path, content) with resized RAW bytes. Row-local → no shuffle.
    """
    out_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        step = max(int(round(1.0 / scale)), 1)
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                arr = decode_image(bytes(r["content"]))
                rows.append(
                    {"path": r["path"], "content": encode_image(arr[::step, ::step])}
                )
            yield pd.DataFrame(rows, columns=["path", "content"])

    return binary_df.select("path", "content").mapInPandas(_resize, out_schema)


def sample_frames(binary_df: DataFrame, every_nth: int) -> DataFrame:
    """Frame-sampling plumbing for video-like multi-frame blobs.

    Treats a RAW blob of H frames as frame-major and emits every Nth row
    band — the operator shape (explode binary → frames) is what matters; a
    real deployment decodes containers with pyav/ffmpeg at this seam.
    """
    out_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                arr = decode_image(bytes(r["content"]))
                for idx in range(0, arr.shape[0], every_nth):
                    rows.append(
                        {
                            "path": r["path"],
                            "frame_idx": idx,
                            "content": encode_image(arr[idx : idx + 1]),
                        }
                    )
            yield pd.DataFrame(rows, columns=["path", "frame_idx", "content"])

    return binary_df.select("path", "content").mapInPandas(_sample, out_schema)


def image_features(binary_df: DataFrame) -> DataFrame:
    """Per-image numeric features (mean/std/histogram head) — the
    feature-extraction UDF shape for embedding pipelines."""
    out_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("mean_intensity", T.DoubleType()),
            T.StructField("std_intensity", T.DoubleType()),
            T.StructField("hist8", T.ArrayType(T.LongType())),
        ]
    )

    def _feat(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                arr = decode_image(bytes(r["content"])).astype(np.float64)
                hist, _ = np.histogram(arr, bins=8, range=(0, 256))
                rows.append(
                    {
                        "path": r["path"],
                        "mean_intensity": float(arr.mean()),
                        "std_intensity": float(arr.std()),
                        "hist8": [int(x) for x in hist],
                    }
                )
            yield pd.DataFrame(
                rows, columns=["path", "mean_intensity", "std_intensity", "hist8"]
            )

    return binary_df.select("path", "content").mapInPandas(_feat, out_schema)


def write_images(binary_df: DataFrame, out_dir: str) -> int:
    """S10: image sink — executors write one file per row via
    ``foreachPartition`` (the reference's ``cv2.imwrite`` loop,
    tls_photo_processing.py:37-38, distributed).

    File name = basename of the ``path`` column (or ``crop_name`` when
    present). Returns the number of rows written. Partition-parallel: no
    data moves to the driver.
    """
    import os

    os.makedirs(out_dir, exist_ok=True)
    name_col = "crop_name" if "crop_name" in binary_df.columns else "path"
    rows = binary_df.select(F.col(name_col).alias("name"), "content")

    def _write(part):
        for r in part:
            fname = r["name"].rsplit("/", 1)[-1]
            with open(os.path.join(out_dir, fname), "wb") as f:
                f.write(bytes(r["content"]))

    rows.foreachPartition(_write)
    return len(os.listdir(out_dir))


# ---------------------------------------------------------------------------
# Video modality (X5): opaque binary container + typed metadata. The
# deterministic RAWVID container (magic + frame-count/fps/dims header +
# frame-major uint8 pixels) is the test-path codec; real containers
# (MP4/Matroska) are detected by magic and raise at the clearly-marked
# pyav/ffmpeg seam — the Spark-side plumbing (schemas, mapInPandas batch
# shapes, per-frame explode) is identical for both.
# ---------------------------------------------------------------------------

_VID_MAGIC = b"RAWVID1\x00"

VIDEO_META_SCHEMA = T.StructType(
    [
        T.StructField("path", T.StringType()),
        T.StructField("length", T.LongType()),
        T.StructField("n_frames", T.IntegerType()),
        T.StructField("fps_num", T.IntegerType()),
        T.StructField("fps_den", T.IntegerType()),
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("channels", T.IntegerType()),
        T.StructField("duration_s", T.DoubleType()),
    ]
)


def encode_video(frames: np.ndarray, fps: tuple[int, int] = (30, 1)) -> bytes:
    """(F, H, W[, C]) uint8 frames → RAWVID bytes."""
    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim == 3:
        frames = frames[:, :, :, None]
    f, h, w, c = frames.shape
    num, den = fps
    header = struct.pack("<IIIIII", f, num, den, h, w, c)
    return _VID_MAGIC + header + frames.tobytes()


# ---------------------------------------------------------------------------
# MJPEG-in-AVI: a REAL interchange container (RIFF, the same chunk
# grammar as the WAV reader in audio.py) whose frames are baseline JPEGs
# from the repo's own codec (functions/jpeg.py) — no external decoder.
# Other AVI codecs (DivX/XviD/h264-in-AVI) stay behind the explicit seam.
# ---------------------------------------------------------------------------


def _riff_chunk(fourcc: bytes, payload: bytes) -> bytes:
    """fourcc + length + payload, word-aligned (odd sizes carry a pad)."""
    return (
        fourcc
        + struct.pack("<I", len(payload))
        + payload
        + (b"\x00" if len(payload) & 1 else b"")
    )


def _riff_list(kind: bytes, payload: bytes) -> bytes:
    return _riff_chunk(b"LIST", kind + payload)


def encode_avi_mjpeg(
    frames: np.ndarray, fps: tuple[int, int] = (30, 1), quality: int = 90
) -> bytes:
    """(F, H, W[, C]) uint8 frames → MJPEG-in-AVI bytes (hdrl + movi +
    idx1), each frame one '00dc' chunk holding a baseline JPEG."""
    from .functions.jpeg import encode_jpeg

    frames = np.ascontiguousarray(frames, dtype=np.uint8)
    if frames.ndim == 3:
        frames = frames[:, :, :, None]
    f, h, w, c = frames.shape
    num, den = fps
    jpegs = [encode_jpeg(frames[i], quality=quality) for i in range(f)]

    movi_payload = b""
    idx_entries = b""
    for j in jpegs:
        # idx1 offsets are relative to the 'movi' fourcc (list-type word)
        idx_entries += b"00dc" + struct.pack(
            "<III", 0x10, 4 + len(movi_payload), len(j)
        )
        movi_payload += _riff_chunk(b"00dc", j)

    avih = struct.pack(
        "<14I",
        1_000_000 * den // num,  # dwMicroSecPerFrame
        0, 0, 0x10,              # maxbytes, padding, AVIF_HASINDEX
        f, 0, 1, 0, w, h,        # totalframes, initial, streams, bufsize, w, h
        0, 0, 0, 0,
    )
    strh = (
        b"vidsMJPG"
        + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0, den, num, 0, f, 0, 0, 0)
        + struct.pack("<4h", 0, 0, w, h)
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 8 * c, b"MJPG", w * h * c, 0, 0, 0, 0
    )
    hdrl = _riff_list(
        b"hdrl",
        _riff_chunk(b"avih", avih)
        + _riff_list(b"strl", _riff_chunk(b"strh", strh) + _riff_chunk(b"strf", strf)),
    )
    body = (
        b"AVI "
        + hdrl
        + _riff_list(b"movi", movi_payload)
        + _riff_chunk(b"idx1", idx_entries)
    )
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _avi_walk(data: bytes) -> dict:
    """RIFF chunk walk (the WAV reader's loop, recursing into LISTs):
    returns {"avih": bytes, "strh": bytes, "strf": bytes,
    "frames": [bytes, ...]} without decoding any pixels."""
    out: dict = {"frames": []}

    def walk(pos: int, end: int) -> None:
        while pos + 8 <= end:
            cid = data[pos : pos + 4]
            clen = struct.unpack("<I", data[pos + 4 : pos + 8])[0]
            payload_start = pos + 8
            if cid == b"LIST":
                walk(payload_start + 4, payload_start + clen)
            elif cid in (b"avih", b"strf") or (
                cid == b"strh" and "strh" not in out
            ):
                out[cid.decode()] = data[payload_start : payload_start + clen]
            elif cid[2:4] in (b"dc", b"db") and clen > 0:
                out["frames"].append(data[payload_start : payload_start + clen])
            pos = payload_start + clen + (clen & 1)

    walk(12, 8 + struct.unpack("<I", data[4:8])[0])
    return out


def avi_info(data: bytes) -> dict:
    """AVI bytes → header metadata dict (header walk only, no pixel
    decode): n_frames, fps_num, fps_den, width, height, channels."""
    if len(data) < 12 or data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise ValueError("not RIFF/AVI bytes")
    parsed = _avi_walk(data)
    if "avih" not in parsed:
        raise ValueError("AVI missing avih header")
    avih = struct.unpack("<14I", parsed["avih"][:56])
    n_frames, width, height = avih[4], avih[8], avih[9]
    num, den = 30, 1
    if "strh" in parsed and len(parsed["strh"]) >= 32:
        scale, rate = struct.unpack_from("<II", parsed["strh"], 20)
        if scale and rate:
            num, den = rate, scale
    channels = 3
    compression = b""
    if "strf" in parsed and len(parsed["strf"]) >= 20:
        bitcount = struct.unpack_from("<H", parsed["strf"], 14)[0]
        compression = parsed["strf"][16:20]
        channels = max(bitcount // 8, 1)
    if compression not in (b"MJPG", b"mjpg", b"dmb1"):
        raise NotImplementedError(
            f"AVI codec {compression!r} detected: only MJPEG decodes"
            " natively; other codecs require pyav/ffmpeg (seam)"
        )
    return {
        "n_frames": n_frames,
        "fps_num": num,
        "fps_den": den,
        "width": width,
        "height": height,
        "channels": channels,
        "n_chunks": len(parsed["frames"]),
    }


def decode_avi_mjpeg(data: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """MJPEG-in-AVI bytes → ((F, H, W, C) uint8, (fps_num, fps_den)),
    every '00dc'/'00db' chunk decoded by the repo's own JPEG decoder."""
    from .functions.jpeg import decode_jpeg

    info = avi_info(data)  # validates container + codec seam
    frames = [decode_jpeg(j) for j in _avi_walk(data)["frames"]]
    if not frames:
        raise ValueError("AVI contains no video chunks")
    return np.stack(frames), (info["fps_num"], info["fps_den"])


def _decode_video_av(data: bytes, container: str) -> tuple[np.ndarray, tuple[int, int]]:
    """Real-container decode via the optional `video` extra (pyav).

    Import-gated like the protobuf/TWS seam: environments without pyav
    get an actionable NotImplementedError naming the extra, never a
    mid-query worker crash. With pyav installed, frames decode to the
    same (F, H, W, 3) uint8 / (fps_num, fps_den) contract as the
    in-repo RAWVID and MJPEG-in-AVI decoders.
    """
    try:
        import av  # noqa: F401
    except ImportError:
        raise NotImplementedError(
            f"{container} container detected: decoding requires the "
            "optional `video` extra (pip install "
            "hg-data-pipelines-spark[video]); RAWVID and MJPEG-in-AVI "
            "decode natively without it"
        ) from None
    import io as _io

    with av.open(_io.BytesIO(data)) as f:
        stream = f.streams.video[0]
        rate = stream.average_rate or stream.base_rate
        num, den = (int(rate.numerator), int(rate.denominator)) if rate else (0, 1)
        frames = [fr.to_ndarray(format="rgb24") for fr in f.decode(stream)]
    if not frames:
        raise ValueError(f"{container} contains no decodable video frames")
    return np.stack(frames), (num, den)


def decode_video(data: bytes) -> tuple[np.ndarray, tuple[int, int]]:
    """Video bytes → ((F, H, W, C) uint8, (fps_num, fps_den)).

    Containers: RAWVID (synthetic test path) and MJPEG-in-AVI (real
    interchange format, decoded end-to-end by the repo's own RIFF walk +
    JPEG codec). Real-container seam: MP4 (ftyp) and Matroska/WebM
    (EBML) blobs — and AVIs carrying non-MJPEG codecs — route to pyav
    when the optional `video` extra is installed and raise an
    actionable error otherwise.
    """
    if data.startswith(_VID_MAGIC):
        f, num, den, h, w, c = struct.unpack_from("<IIIIII", data, len(_VID_MAGIC))
        off = len(_VID_MAGIC) + 24
        arr = np.frombuffer(data, dtype=np.uint8, count=f * h * w * c, offset=off)
        return arr.reshape(f, h, w, c), (num, den)
    if len(data) >= 12 and data[:4] == b"RIFF" and data[8:12] == b"AVI ":
        return decode_avi_mjpeg(data)
    if len(data) > 11 and data[4:8] == b"ftyp":
        return _decode_video_av(data, "MP4")
    if data.startswith(b"\x1a\x45\xdf\xa3"):
        return _decode_video_av(data, "Matroska/WebM")
    raise ValueError("unsupported video bytes (RAWVID, AVI, MP4, Matroska)")


def video_metadata(binary_df: DataFrame) -> DataFrame:
    """binaryFile rows → typed per-video metadata (header parse only —
    never materializes pixel arrays for metadata)."""

    def _meta(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                data = bytes(r["content"])
                if (
                    len(data) >= 12
                    and data[:4] == b"RIFF"
                    and data[8:12] == b"AVI "
                ):
                    # header-only RIFF walk — no pixel decode
                    info = avi_info(data)
                    rows.append(
                        {
                            "path": r["path"],
                            "length": len(data),
                            "n_frames": info["n_frames"],
                            "fps_num": info["fps_num"],
                            "fps_den": info["fps_den"],
                            "width": info["width"],
                            "height": info["height"],
                            "channels": info["channels"],
                            "duration_s": info["n_frames"]
                            * info["fps_den"]
                            / info["fps_num"],
                        }
                    )
                    continue
                if not data.startswith(_VID_MAGIC):
                    # Same container routing as decode_video: an MP4 or
                    # Matroska blob must hit the explicit pyav seam, not
                    # silently yield garbage header fields.
                    if len(data) > 11 and data[4:8] == b"ftyp":
                        raise NotImplementedError(
                            "MP4 container detected: metadata requires"
                            " pyav/ffmpeg (seam)"
                        )
                    if data.startswith(b"\x1a\x45\xdf\xa3"):
                        raise NotImplementedError(
                            "Matroska/WebM container detected: metadata"
                            " requires pyav/ffmpeg (seam)"
                        )
                    raise ValueError(
                        "unsupported video bytes (RAWVID, MP4, Matroska):"
                        f" {r['path']}"
                    )
                f, num, den, h, w, c = struct.unpack_from(
                    "<IIIIII", data, len(_VID_MAGIC)
                )
                rows.append(
                    {
                        "path": r["path"],
                        "length": len(data),
                        "n_frames": f,
                        "fps_num": num,
                        "fps_den": den,
                        "width": w,
                        "height": h,
                        "channels": c,
                        "duration_s": f * den / num,
                    }
                )
            yield pd.DataFrame(rows, columns=[f.name for f in VIDEO_META_SCHEMA])

    return binary_df.select("path", "content").mapInPandas(_meta, VIDEO_META_SCHEMA)


def sample_video_frames(binary_df: DataFrame, every_nth: int = 1) -> DataFrame:
    """Explode videos into every-Nth-frame image rows (RAW-encoded) with
    frame index and presentation time — the decode→subsample step of a
    video training-data pipeline. Row-local (no shuffle); each output
    frame is an independent image for the downstream image operators."""
    out_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("frame_idx", T.IntegerType()),
            T.StructField("t_seconds", T.DoubleType()),
            T.StructField("content", T.BinaryType()),
        ]
    )

    def _sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                frames, (num, den) = decode_video(bytes(r["content"]))
                for idx in range(0, frames.shape[0], every_nth):
                    rows.append(
                        {
                            "path": r["path"],
                            "frame_idx": idx,
                            "t_seconds": idx * den / num,
                            "content": encode_image(frames[idx]),
                        }
                    )
            yield pd.DataFrame(
                rows, columns=["path", "frame_idx", "t_seconds", "content"]
            )

    return binary_df.select("path", "content").mapInPandas(_sample, out_schema)


# ---------------------------------------------------------------------------
# Perceptual image hashing (X5→X2 bridge): 64-bit pHash (DCT) and dHash
# (gradient) fingerprints, joinable into the generic Hamming-blocked
# near-dup machinery (operators/dedup.py hamming_near_pairs).
# ---------------------------------------------------------------------------


def _to_gray(arr: np.ndarray) -> np.ndarray:
    """(H, W, C) uint8 → (H, W) float64 luma (ITU-R BT.601)."""
    a = arr.astype(np.float64)
    if a.ndim == 3:
        if a.shape[2] >= 3:
            return 0.299 * a[:, :, 0] + 0.587 * a[:, :, 1] + 0.114 * a[:, :, 2]
        return a[:, :, 0]
    return a


def _resize_nearest(img: np.ndarray, out_h: int, out_w: int) -> np.ndarray:
    """Deterministic nearest-neighbor downsample (no codec dependence)."""
    h, w = img.shape
    ys = np.minimum(((np.arange(out_h) + 0.5) * h / out_h).astype(np.int64), h - 1)
    xs = np.minimum(((np.arange(out_w) + 0.5) * w / out_w).astype(np.int64), w - 1)
    return img[np.ix_(ys, xs)]


def _dct_matrix(n: int) -> np.ndarray:
    k = np.arange(n)[:, None]
    i = np.arange(n)[None, :]
    return np.cos(np.pi * (2 * i + 1) * k / (2 * n))


def _pack_bits(bits: np.ndarray) -> int:
    """Bit array (MSB first) → signed 64-bit int (Spark LongType range)."""
    val = 0
    for b in bits.ravel():
        val = (val << 1) | int(b)
    return val - (1 << 64) if val >= 1 << 63 else val


def phash64(arr: np.ndarray) -> int:
    """Perceptual hash: 32×32 luma → 2D DCT-II → low-frequency 8×8 block
    (DC excluded) thresholded at its median → 64 bits. Identical images
    hash equal; small blur/noise/re-encode flips few bits."""
    g = _resize_nearest(_to_gray(arr), 32, 32)
    d = _dct_matrix(32)
    coeffs = d @ g @ d.T
    block = coeffs[:8, :8].copy().ravel()
    rest = block[1:]  # exclude DC
    med = np.median(rest)
    bits = np.concatenate([[False], rest > med])
    return _pack_bits(bits)


def dhash64(arr: np.ndarray) -> int:
    """Difference hash: 9×8 luma, horizontal gradient sign → 64 bits."""
    g = _resize_nearest(_to_gray(arr), 8, 9)
    return _pack_bits(g[:, 1:] > g[:, :-1])


def image_fingerprints(binary_df: DataFrame) -> DataFrame:
    """binaryFile rows → (path, phash, dhash) for Hamming-blocked image
    dedup: ``hamming_near_pairs(image_fingerprints(df), 'path', 'phash')``."""
    out_schema = T.StructType(
        [
            T.StructField("path", T.StringType()),
            T.StructField("phash", T.LongType()),
            T.StructField("dhash", T.LongType()),
        ]
    )

    def _fp(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                arr = decode_image(bytes(r["content"]))
                rows.append(
                    {"path": r["path"], "phash": phash64(arr), "dhash": dhash64(arr)}
                )
            yield pd.DataFrame(rows, columns=["path", "phash", "dhash"])

    return binary_df.select("path", "content").mapInPandas(_fp, out_schema)
