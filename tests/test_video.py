"""Video container modality + perceptual image hashing (multimodal.py)."""

from __future__ import annotations

import numpy as np
import pytest

from hg_data_pipelines_spark.multimodal import (
    decode_video,
    dhash64,
    encode_image,
    encode_video,
    image_fingerprints,
    phash64,
    sample_video_frames,
    video_metadata,
)
from hg_data_pipelines_spark.operators.dedup import hamming_near_pairs


def _rng_frames(n=10, h=6, w=8, c=3, seed=7):
    rng = np.random.RandomState(seed)
    return rng.randint(0, 256, size=(n, h, w, c), dtype=np.uint8)


class TestVideoCodec:
    def test_round_trip(self):
        frames = _rng_frames()
        data = encode_video(frames, fps=(24, 1))
        got, fps = decode_video(data)
        assert fps == (24, 1)
        np.testing.assert_array_equal(got, frames)

    def test_gray_frames_gain_channel_dim(self):
        frames = _rng_frames(c=3)[:, :, :, 0]  # (F, H, W)
        got, _ = decode_video(encode_video(frames))
        assert got.shape == frames.shape + (1,)

    def test_real_container_seams(self):
        # MP4/Matroska route to the pyav seam. Both environments pin a
        # contract (no silent skip, matching the TWS no-skip pattern):
        # - without the optional `video` extra: the actionable
        #   NotImplementedError naming the extra;
        # - with pyav installed: these truncated headers must fail
        #   loudly inside av's demuxer (its FFmpegError family) or in
        #   our no-frames check — never return a frames array.
        try:
            import av  # noqa: F401

            has_av = True
        except ImportError:
            has_av = False
        mp4 = b"\x00\x00\x00\x18ftypisom" + b"\x00" * 16
        mkv = b"\x1a\x45\xdf\xa3" + b"\x00" * 16
        if not has_av:
            with pytest.raises(NotImplementedError, match="MP4.*video"):
                decode_video(mp4)
            with pytest.raises(NotImplementedError, match="Matroska.*video"):
                decode_video(mkv)
        else:
            # av.FFmpegError subclasses OSError; a truncated moov-less
            # blob may instead demux zero frames → our ValueError.
            for blob in (mp4, mkv):
                with pytest.raises((av.FFmpegError, OSError, ValueError)):
                    decode_video(blob)
        with pytest.raises(ValueError):
            decode_video(b"garbage")


class TestVideoOps:
    def _binary_df(self, spark, blobs):
        return spark.createDataFrame(
            [(f"v{i}.rawvid", bytearray(b)) for i, b in enumerate(blobs)],
            "path string, content binary",
        )

    def test_metadata(self, spark):
        frames = _rng_frames(n=12, h=4, w=5, c=1)
        df = self._binary_df(spark, [encode_video(frames, fps=(24, 1))])
        row = video_metadata(df).collect()[0]
        assert (row["n_frames"], row["height"], row["width"], row["channels"]) == (
            12, 4, 5, 1,
        )
        assert row["duration_s"] == 12 / 24

    def test_frame_sampling(self, spark):
        frames = _rng_frames(n=10)
        df = self._binary_df(spark, [encode_video(frames, fps=(5, 1))])
        out = sample_video_frames(df, every_nth=3).collect()
        assert [r["frame_idx"] for r in out] == [0, 3, 6, 9]
        assert [r["t_seconds"] for r in out] == [0.0, 0.6, 1.2, 1.8]
        # each sampled frame round-trips through the RAW image codec
        assert bytes(out[2]["content"]) == encode_image(frames[6])


class TestPerceptualHash:
    def _img(self, seed=3):
        rng = np.random.RandomState(seed)
        # smooth gradient + structure so pHash has low-frequency content
        base = np.add.outer(np.arange(64) * 2, np.arange(64) * 3) % 256
        return (base + rng.randint(0, 8, size=(64, 64))).astype(np.uint8)[
            :, :, None
        ].repeat(3, axis=2)

    def test_identical_images_hash_equal(self):
        a, b = self._img(), self._img()
        assert phash64(a) == phash64(b)
        assert dhash64(a) == dhash64(b)

    def test_small_noise_small_distance(self):
        a = self._img()
        noisy = a.astype(np.int16).copy()
        rng = np.random.RandomState(9)
        noisy += rng.randint(-4, 5, size=a.shape)
        noisy = np.clip(noisy, 0, 255).astype(np.uint8)
        d = bin((phash64(a) ^ phash64(noisy)) & ((1 << 64) - 1)).count("1")
        assert d <= 8

    def test_different_images_far_apart(self):
        a = self._img(3)
        rng = np.random.RandomState(11)
        b = rng.randint(0, 256, size=a.shape, dtype=np.uint8)
        d = bin((phash64(a) ^ phash64(b)) & (1 << 64) - 1).count("1")
        assert d >= 16

    def test_hash_in_long_range(self):
        v = phash64(np.full((16, 16, 3), 255, dtype=np.uint8))
        assert -(1 << 63) <= v < 1 << 63

    def test_spark_near_dup_pairs(self, spark):
        a = self._img()
        near = np.clip(a.astype(np.int16) + 2, 0, 255).astype(np.uint8)
        rng = np.random.RandomState(5)
        other = rng.randint(0, 256, size=a.shape, dtype=np.uint8)
        df = spark.createDataFrame(
            [
                ("a.raw", bytearray(encode_image(a))),
                ("a_near.raw", bytearray(encode_image(near))),
                ("other.raw", bytearray(encode_image(other))),
            ],
            "path string, content binary",
        )
        fp = image_fingerprints(df)
        pairs = hamming_near_pairs(fp, "path", "phash", max_hamming=8)
        got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
        assert ("a.raw", "a_near.raw") in got
        assert all("other.raw" not in p for p in got)


class TestAviMjpeg:
    """MJPEG-in-AVI: real RIFF container decoded end-to-end by the
    repo's own chunk walk + baseline JPEG codec (no external decoder)."""

    def _smooth_frames(self, n=4, h=16, w=16):
        # smooth gradients survive JPEG quantization with small error
        f = np.arange(n)[:, None, None]
        r = np.arange(h)[None, :, None]
        c = np.arange(w)[None, None, :]
        base = (f * 9 + r * 4 + c * 3) % 200 + 20
        return np.stack([base, base, base], axis=-1).astype(np.uint8)

    def test_round_trip_real_avi_bytes(self):
        from hg_data_pipelines_spark.multimodal import (
            decode_avi_mjpeg,
            encode_avi_mjpeg,
        )

        frames = self._smooth_frames()
        data = encode_avi_mjpeg(frames, fps=(25, 1), quality=95)
        assert data[:4] == b"RIFF" and data[8:12] == b"AVI "
        got, fps = decode_avi_mjpeg(data)
        assert fps == (25, 1)
        assert got.shape == frames.shape
        # JPEG is lossy; smooth content must stay close
        assert np.abs(got.astype(int) - frames.astype(int)).max() <= 12
        # decode_video routes AVI bytes automatically
        got2, fps2 = decode_video(data)
        assert np.array_equal(got, got2) and fps2 == (25, 1)

    def test_encode_is_byte_deterministic(self):
        from hg_data_pipelines_spark.multimodal import encode_avi_mjpeg

        frames = self._smooth_frames()
        assert encode_avi_mjpeg(frames) == encode_avi_mjpeg(frames)

    def test_metadata_header_only(self, spark):
        from hg_data_pipelines_spark.multimodal import encode_avi_mjpeg

        frames = self._smooth_frames(n=6, h=8, w=12)
        df = spark.createDataFrame(
            [("a.avi", bytearray(encode_avi_mjpeg(frames, fps=(30, 1))))],
            "path string, content binary",
        )
        row = video_metadata(df).collect()[0]
        assert (row["n_frames"], row["height"], row["width"], row["channels"]) == (
            6, 8, 12, 3,
        )
        assert row["fps_num"] == 30 and row["duration_s"] == 6 / 30

    def test_frame_sampling_on_avi(self, spark):
        from hg_data_pipelines_spark.multimodal import encode_avi_mjpeg

        frames = self._smooth_frames(n=6)
        df = spark.createDataFrame(
            [("a.avi", bytearray(encode_avi_mjpeg(frames, fps=(10, 1))))],
            "path string, content binary",
        )
        out = sample_video_frames(df, every_nth=2).collect()
        assert [r["frame_idx"] for r in out] == [0, 2, 4]
        assert [r["t_seconds"] for r in out] == [0.0, 0.2, 0.4]

    def test_non_mjpeg_avi_hits_seam(self):
        from hg_data_pipelines_spark.multimodal import encode_avi_mjpeg

        data = bytearray(encode_avi_mjpeg(self._smooth_frames()))
        # rewrite every codec tag in the header region (strh fccHandler
        # AND strf biCompression — avi_info checks the latter)
        end = data.find(b"movi")
        header = bytes(data[:end]).replace(b"MJPG", b"XVID")
        data[:end] = header
        with pytest.raises(NotImplementedError, match="XVID"):
            decode_video(bytes(data))
