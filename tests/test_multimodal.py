"""Multimodal binary-column plumbing (X5): codec round trip, JPEG header
sniff, metadata extraction, resize, frame sampling, feature extraction."""

from __future__ import annotations

import struct

import numpy as np
import pytest

from hg_data_pipelines_spark import multimodal as M


def _fake_jpeg(width: int, height: int) -> bytes:
    """Minimal JPEG byte stream: SOI, APP0 (65 bytes of padding the naive
    offset-163 sniff would misread), DHT (a segment the walker must skip),
    SOF0 with real dims, EOI."""
    app0 = b"\xff\xe0" + struct.pack(">H", 18) + b"JFIF\x00" + b"\x00" * 12
    dht = b"\xff\xc4" + struct.pack(">H", 5) + b"\x00\x00\x00"
    sof0 = (
        b"\xff\xc0"
        + struct.pack(">H", 11)
        + b"\x08"
        + struct.pack(">HH", height, width)
        + b"\x01\x11\x00"
    )
    return b"\xff\xd8" + app0 + dht + sof0 + b"\xff\xd9"


class TestCodec:
    def test_round_trip(self):
        rng = np.random.default_rng(0)
        arr = rng.integers(0, 255, (37, 53, 3), dtype=np.uint8)
        assert np.array_equal(M.decode_image(M.encode_image(arr)), arr)

    def test_grayscale_gets_channel_axis(self):
        arr = np.arange(12, dtype=np.uint8).reshape(3, 4)
        out = M.decode_image(M.encode_image(arr))
        assert out.shape == (3, 4, 1)

    def test_decode_rejects_foreign_bytes(self):
        with pytest.raises(ValueError):
            M.decode_image(b"\xff\xd8 not raw")

    def test_jpeg_decode_is_real(self):
        from hg_data_pipelines_spark.functions.jpeg import encode_jpeg

        img = np.full((8, 8, 3), 99, np.uint8)
        out = M.decode_jpeg(encode_jpeg(img, quality=95))
        assert out.shape == (8, 8, 3)
        assert np.abs(out.astype(int) - img.astype(int)).max() <= 2

    def test_jpeg_decode_rejects_garbage(self):
        with pytest.raises(ValueError):
            M.decode_jpeg(b"\xff\xd8")


class TestJpegSniff:
    def test_sof_dimensions(self):
        assert M.jpeg_dimensions(_fake_jpeg(8000, 4000)) == (8000, 4000)
        assert M.jpeg_dimensions(_fake_jpeg(640, 480)) == (640, 480)

    def test_non_jpeg_returns_none(self):
        assert M.jpeg_dimensions(b"PNG whatever") is None
        assert M.jpeg_dimensions(b"") is None


class TestSparkPlumbing:
    @pytest.fixture(scope="class")
    def binary_df(self, spark):
        rng = np.random.default_rng(1)
        rows = []
        for i, (h, w) in enumerate([(32, 64), (16, 16), (48, 24)]):
            arr = rng.integers(0, 255, (h, w, 3), dtype=np.uint8)
            content = M.encode_image(arr)
            rows.append((f"/imgs/{i}.raw", len(content), bytearray(content)))
        rows.append(
            ("/imgs/real.jpg", 100, bytearray(_fake_jpeg(800, 600)))
        )
        return spark.createDataFrame(
            rows, "path string, length long, content binary"
        )

    def test_metadata(self, binary_df):
        meta = {r["path"]: r for r in M.extract_image_metadata(binary_df).collect()}
        assert meta["/imgs/0.raw"]["width"] == 64
        assert meta["/imgs/0.raw"]["height"] == 32
        assert meta["/imgs/0.raw"]["format"] == "raw"
        assert meta["/imgs/real.jpg"]["format"] == "jpeg"
        assert meta["/imgs/real.jpg"]["width"] == 800
        assert meta["/imgs/real.jpg"]["channels"] == 3

    def test_resize(self, spark, binary_df):
        raw_only = binary_df.filter("path like '%.raw'")
        out = {r["path"]: r for r in M.resize_images(raw_only, 0.5).collect()}
        arr = M.decode_image(bytes(out["/imgs/0.raw"]["content"]))
        assert arr.shape == (16, 32, 3)

    def test_frame_sampling(self, spark, binary_df):
        raw0 = binary_df.filter("path = '/imgs/0.raw'")
        frames = M.sample_frames(raw0, every_nth=8).collect()
        assert [f["frame_idx"] for f in frames] == [0, 8, 16, 24]

    def test_features(self, spark, binary_df):
        raw_only = binary_df.filter("path like '%.raw'")
        feats = {r["path"]: r for r in M.image_features(raw_only).collect()}
        assert len(feats) == 3
        f0 = feats["/imgs/0.raw"]
        assert 0 <= f0["mean_intensity"] <= 255
        assert sum(f0["hist8"]) == 32 * 64 * 3


def _filter_scanlines(img: np.ndarray, filters: list[int]) -> bytes:
    """Apply PNG spec forward filtering per scanline (test-side reference),
    producing the raw stream decode_png must invert."""
    h, w, c = img.shape
    bpp = c
    stride = w * c
    flat = img.reshape(h, stride).astype(np.int32)
    out = bytearray()
    prev = np.zeros(stride, dtype=np.int32)
    for y in range(h):
        cur = flat[y]
        ft = filters[y % len(filters)]
        out.append(ft)
        for x in range(stride):
            a = int(cur[x - bpp]) if x >= bpp else 0
            b = int(prev[x])
            cc = int(prev[x - bpp]) if x >= bpp else 0
            if ft == 0:
                pred = 0
            elif ft == 1:
                pred = a
            elif ft == 2:
                pred = b
            elif ft == 3:
                pred = (a + b) >> 1
            else:  # Paeth
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            out.append((int(cur[x]) - pred) & 0xFF)
        prev = cur
    return bytes(out)


def _png_with_filters(img: np.ndarray, filters: list[int]) -> bytes:
    """Assemble a real PNG whose scanlines use the given filter types."""
    import zlib

    h, w, c = img.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = w.to_bytes(4, "big") + h.to_bytes(4, "big") + bytes(
        [8, color_type, 0, 0, 0]
    )
    raw = _filter_scanlines(img, filters)

    def chunk(tag, body):
        return (
            len(body).to_bytes(4, "big") + tag + body
            + (zlib.crc32(tag + body) & 0xFFFFFFFF).to_bytes(4, "big")
        )

    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


class TestPngCodec:
    def test_round_trip_rgb(self):
        rng = np.random.default_rng(3)
        img = rng.integers(0, 256, (13, 17, 3)).astype(np.uint8)
        np.testing.assert_array_equal(M.decode_png(M.encode_png(img)), img)

    def test_round_trip_gray_and_rgba(self):
        rng = np.random.default_rng(4)
        gray = rng.integers(0, 256, (5, 9)).astype(np.uint8)
        assert M.decode_png(M.encode_png(gray)).shape == (5, 9, 1)
        rgba = rng.integers(0, 256, (6, 4, 4)).astype(np.uint8)
        np.testing.assert_array_equal(M.decode_png(M.encode_png(rgba)), rgba)

    def test_all_five_filter_types_unapplied(self):
        # a PNG whose scanlines cycle through None/Sub/Up/Average/Paeth —
        # the decoder must invert each per the spec
        rng = np.random.default_rng(5)
        img = rng.integers(0, 256, (10, 7, 3)).astype(np.uint8)
        data = _png_with_filters(img, [0, 1, 2, 3, 4])
        np.testing.assert_array_equal(M.decode_png(data), img)

    def test_known_pixels(self):
        # hand-built 2x2 RGB: exact pixel values survive the codec
        img = np.array(
            [[[255, 0, 0], [0, 255, 0]], [[0, 0, 255], [10, 20, 30]]],
            dtype=np.uint8,
        )
        got = M.decode_png(M.encode_png(img))
        assert got[0, 0].tolist() == [255, 0, 0]
        assert got[1, 1].tolist() == [10, 20, 30]

    def test_decode_image_dispatches_png(self):
        img = np.full((4, 6, 3), 77, np.uint8)
        np.testing.assert_array_equal(M.decode_image(M.encode_png(img)), img)

    def test_png_dimensions_and_metadata_format(self):
        img = np.zeros((12, 34, 3), np.uint8)
        assert M.png_dimensions(M.encode_png(img)) == (34, 12, 3)
        assert M.image_dimensions(M.encode_png(img)) == (34, 12, 3)

    def test_unsupported_pngs_raise(self):
        img = np.zeros((2, 2, 3), np.uint8)
        data = bytearray(M.encode_png(img))
        data[24] = 16  # bit depth 16
        with pytest.raises(NotImplementedError):
            M.decode_png(bytes(data))


class TestPngEndToEnd:
    def test_png_flows_through_photo_fanout(self, spark, tmp_path):
        from hg_data_pipelines_spark.pipelines.photo_fanout import (
            generate_projections,
        )

        rng = np.random.default_rng(11)
        pano = rng.integers(0, 256, (64, 128, 3)).astype(np.uint8)
        p = tmp_path / "pano_0000.png"
        p.write_bytes(M.encode_png(pano))
        photos = spark.read.format("binaryFile").load(str(tmp_path))
        crops = generate_projections(
            spark, photos, subdivisions=4, crop_w=16, crop_h=16
        ).collect()
        assert len(crops) == 4
        for r in crops:
            arr = M.decode_image(bytes(r["content"]))
            assert arr.shape == (16, 16, 3)

    def test_png_metadata_via_spark(self, spark, tmp_path):
        img = np.zeros((8, 9, 3), np.uint8)
        (tmp_path / "a.png").write_bytes(M.encode_png(img))
        df = spark.read.format("binaryFile").load(str(tmp_path))
        meta = M.extract_image_metadata(df).collect()[0]
        assert meta["format"] == "png"
        assert (meta["width"], meta["height"], meta["channels"]) == (9, 8, 3)
