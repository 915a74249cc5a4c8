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

    def test_jpeg_decode_is_a_marked_stub(self):
        with pytest.raises(NotImplementedError):
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
