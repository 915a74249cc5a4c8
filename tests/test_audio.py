"""Audio multimodal leg (X5): WAV codec correctness and Spark plumbing."""

from __future__ import annotations

import numpy as np
import pytest

from hg_data_pipelines_spark.audio import (
    audio_feature_row,
    audio_features,
    decode_wav,
    encode_wav,
    extract_audio_metadata,
    wav_info,
)


def _sine(freq=440.0, rate=8000, secs=0.5, amp=0.5):
    t = np.arange(int(rate * secs)) / rate
    return np.round(amp * 32767 * np.sin(2 * np.pi * freq * t)).astype(np.int16)


class TestWavCodec:
    def test_round_trip_mono(self):
        s = _sine()
        blob = encode_wav(s, 8000)
        x, rate = decode_wav(blob)
        assert rate == 8000
        assert x.shape == (len(s), 1)
        np.testing.assert_allclose(x[:, 0], s / 32768.0)

    def test_round_trip_stereo(self):
        s = np.stack([_sine(440.0), _sine(220.0)], axis=1)
        blob = encode_wav(s, 8000)
        x, rate = decode_wav(blob)
        assert x.shape == s.shape
        np.testing.assert_allclose(x, s / 32768.0)

    def test_info_header_only(self):
        blob = encode_wav(_sine(rate=16000, secs=1.25), 16000)
        assert wav_info(blob) == (16000, 1, 16, 20000)

    def test_rejects_non_wav(self):
        with pytest.raises(ValueError):
            wav_info(b"\x89PNG not audio at all............")

    def test_rejects_compressed_format(self):
        blob = bytearray(encode_wav(_sine(), 8000))
        # flip the fmt audio_format field (offset 20) to 85 (MP3)
        blob[20:22] = (85).to_bytes(2, "little")
        with pytest.raises(ValueError, match="unsupported WAV"):
            wav_info(bytes(blob))

    def test_8bit_decode(self):
        # hand-build an 8-bit WAV: silence at midpoint 128 + full-scale pair
        import struct

        raw = bytes([128, 128, 255, 0])
        fmt = struct.pack("<HHIIHH", 1, 1, 8000, 8000, 1, 8)
        body = (
            b"WAVE"
            + b"fmt "
            + struct.pack("<I", len(fmt))
            + fmt
            + b"data"
            + struct.pack("<I", len(raw))
            + raw
        )
        blob = b"RIFF" + struct.pack("<I", len(body)) + body
        x, rate = decode_wav(blob)
        np.testing.assert_allclose(x[:, 0], [0.0, 0.0, 127 / 128, -1.0])


class TestFeatureKernels:
    def test_sine_rms_and_zcr(self):
        rate, freq, amp = 8000, 400.0, 0.5
        blob = encode_wav(_sine(freq, rate, 1.0, amp), rate)
        row = audio_feature_row(blob)
        assert row["duration_s"] == pytest.approx(1.0)
        # RMS of a sine = amp/sqrt(2); zcr = 2 crossings/cycle * f/rate
        assert row["rms"] == pytest.approx(amp / np.sqrt(2), rel=1e-3)
        assert row["zero_crossing_rate"] == pytest.approx(2 * freq / rate, rel=0.02)
        assert row["peak"] == pytest.approx(amp, rel=1e-3)
        assert len(row["rms_windows"]) == 16

    def test_silence(self):
        blob = encode_wav(np.zeros(1000, dtype=np.int16), 8000)
        row = audio_feature_row(blob)
        assert row["rms"] == 0.0 and row["peak"] == 0.0
        assert row["zero_crossing_rate"] == 0.0


class TestSparkPlumbing:
    @pytest.fixture(scope="class")
    def binary_df(self, spark):
        rows = [
            ("a.wav", encode_wav(_sine(440.0, 8000, 0.25), 8000)),
            ("b.wav", encode_wav(np.zeros(4000, dtype=np.int16), 16000)),
            ("bad.bin", b"not a wav file at all...."),
        ]
        return spark.createDataFrame(
            [(p, len(c), bytearray(c)) for p, c in rows],
            "path string, length long, content binary",
        )

    def test_metadata(self, binary_df):
        got = {r["path"]: r.asDict() for r in extract_audio_metadata(binary_df).collect()}
        assert got["a.wav"]["sample_rate"] == 8000
        assert got["a.wav"]["n_frames"] == 2000
        assert got["b.wav"]["duration_s"] == pytest.approx(0.25)
        assert got["bad.bin"]["sample_rate"] is None

    def test_features(self, binary_df):
        ok = binary_df.filter("path != 'bad.bin'")
        got = {r["path"]: r.asDict() for r in audio_features(ok).collect()}
        assert got["a.wav"]["rms"] == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)
        assert got["b.wav"]["rms"] == 0.0
        assert len(got["a.wav"]["rms_windows"]) == 16


class TestCustomSources:
    def test_wavfile_source_reads_directory(self, spark, tmp_path):
        from hg_data_pipelines_spark.sources import register_sources

        d = tmp_path / "wavs"
        d.mkdir()
        (d / "tone.wav").write_bytes(encode_wav(_sine(440.0, 8000, 0.25), 8000))
        (d / "quiet.wav").write_bytes(
            encode_wav(np.zeros(2000, dtype=np.int16), 8000)
        )
        (d / "ignored.txt").write_text("not audio")

        register_sources(spark)
        df = spark.read.format("wavfile").load(str(d))
        rows = {r["path"].split("/")[-1]: r.asDict() for r in df.collect()}
        assert set(rows) == {"tone.wav", "quiet.wav"}
        assert rows["tone.wav"]["sample_rate"] == 8000
        assert rows["tone.wav"]["rms"] == pytest.approx(0.5 / np.sqrt(2), rel=1e-3)
        assert rows["quiet.wav"]["rms"] == 0.0

    def test_synth_events_deterministic_across_layouts(self, spark):
        from hg_data_pipelines_spark.sources import register_sources

        register_sources(spark)

        def table(parts):
            return sorted(
                spark.read.format("synth_events")
                .option("rows", 500)
                .option("partitions", parts)
                .option("seed", 7)
                .load()
                .collect()
            )

        a, b = table(2), table(16)
        assert a == b
        assert len(a) == 500
        # generated values look sane
        assert all(0 <= r["user_id"] < 1000 for r in a[:50])

    def test_synth_events_streaming_equals_batch(self, spark, tmp_path):
        """The Python streaming source (SimpleDataSourceStreamReader)
        replays the same pure-function rows as the batch reader over the
        same index range."""
        from hg_data_pipelines_spark.sources import register_sources

        register_sources(spark)
        sink = "synth_stream_sink"
        q = (
            spark.readStream.format("synth_events")
            .option("rows_per_batch", 50)
            .option("seed", 7)
            .load()
            .writeStream.format("memory")
            .queryName(sink)
            .option("checkpointLocation", str(tmp_path / "ckpt"))
            .trigger(processingTime="0 seconds")
            .start()
        )
        try:
            import time

            deadline = time.time() + 60
            while time.time() < deadline:
                if spark.table(sink).count() >= 100:
                    break
                time.sleep(0.5)
        finally:
            q.stop()
        got = sorted(spark.table(sink).collect())[:100]
        batch = sorted(
            spark.read.format("synth_events")
            .option("rows", 100)
            .option("seed", 7)
            .load()
            .collect()
        )
        assert [tuple(r) for r in got] == [tuple(r) for r in batch]


class TestAudioFingerprint:
    """Haitsma-Kalker energy-difference fingerprints (the declared
    X5_audio_fingerprint_neardups pipeline). The unrolled SQL oracle
    proves engine equality; these pin the ROBUSTNESS properties a hash
    match can't express."""

    def test_power_of_two_gain_is_bit_exact_and_planted_pairs_surface(
        self, spark
    ):
        from hg_data_pipelines_spark.queries import QUERIES

        rows = QUERIES["X5_audio_fingerprint_neardups"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
        planted = {
            (r["vec_id"], r["vec_id"] + 5_000_000)
            for r in emb.filter("vec_id % 11 = 0").collect()
        }
        got = {(r["a_id"], r["b_id"]) for r in rows}
        assert planted <= got  # every gained copy recovered exactly

    def test_no_degenerate_fingerprint_cliques(self, spark):
        from hg_data_pipelines_spark.queries import QUERIES

        rows = QUERIES["X5_audio_fingerprint_neardups"](
            spark, "/root/testdata/sf0.001"
        ).collect()
        from collections import Counter

        per_fp = Counter(r["fingerprint"] for r in rows)
        # planted pairs contribute 1 row per fingerprint; a degenerate
        # hash (too few effective bits) would produce giant cliques
        assert max(per_fp.values()) <= 3

    def test_small_noise_flips_few_bits(self):
        import numpy as np

        from hg_data_pipelines_spark.audio import decode_wav, encode_wav

        H = np.array(
            [[-1 if bin(b & j).count("1") % 2 else 1 for j in range(8)]
             for b in range(8)], dtype=np.int64)

        def fp(x):
            peak = np.abs(x).max()
            s16 = np.trunc(x / (peak if peak else 1.0) * 32767.0)
            dec, _ = decode_wav(encode_wav(s16.astype(np.int16), 8000))
            s = np.rint(dec[:, 0] * 32768.0).astype(np.int64).reshape(8, 8)
            eng = (s @ H.T) ** 2
            d = eng[:, 1:7] - eng[:, 2:8]
            bits = (d[1:, :] - d[:-1, :]) > 0
            out = 0
            for f in range(7):
                for b in range(6):
                    if bits[f, b]:
                        out |= 1 << (f * 6 + b)
            return out

        rng = np.random.default_rng(7)
        flips = []
        for _ in range(20):
            x = rng.standard_normal(64)
            noisy = x * (1.0 + rng.uniform(-1e-4, 1e-4, 64))
            flips.append(bin(fp(x) ^ fp(noisy)).count("1"))
        assert np.mean(flips) < 8  # robust hash: tiny noise, few bit flips
