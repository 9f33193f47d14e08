"""WAV codec + integer-exact resampler: roundtrips, mixdown, the
Python-spec differential for the resampler, and the real
decode -> resample chain through resample_audio."""

from __future__ import annotations

import numpy as np
import pytest

from kubenetmon_spark.functions.wav import (
    WavFormatError,
    decode_wav,
    encode_wav,
    resample_linear_int,
)


def _spec_resample(s: list[int], src: int, dst: int) -> list[int]:
    """The docstring formula, written independently per sample."""
    n_out = len(s) * dst // src
    out = []
    for i in range(n_out):
        pos = i * src
        idx, frac = pos // dst, pos % dst
        nxt = s[min(idx + 1, len(s) - 1)]
        out.append((s[idx] * (dst - frac) + nxt * frac) // dst)
    return out


class TestCodec:
    def test_roundtrip_mono_16bit(self):
        s = np.array([0, 1000, -1000, 32767, -32768, 5], dtype=np.int64)
        mono, rate = decode_wav(encode_wav(s, 8000))
        assert rate == 8000 and np.array_equal(mono, s)

    def test_stereo_mixes_down_by_integer_mean(self):
        # encode duplicates mono across channels; mean returns it
        s = np.array([10, -3, 7], dtype=np.int64)
        mono, rate = decode_wav(encode_wav(s, 44100, channels=2))
        assert rate == 44100 and np.array_equal(mono, s)

    def test_refusals(self):
        with pytest.raises(WavFormatError):
            decode_wav(b"not a wav at all")
        good = encode_wav(np.arange(10), 8000)
        with pytest.raises(WavFormatError):
            decode_wav(good[:20])  # truncated header/body


class TestResampler:
    def test_differential_vs_spec(self):
        rng = np.random.default_rng(5)
        s = rng.integers(-32768, 32768, 257, dtype=np.int64)
        for src, dst in [(8000, 16000), (16000, 8000), (44100, 16000),
                         (3, 7), (7, 3)]:
            got = resample_linear_int(s, src, dst)
            assert got.tolist() == _spec_resample(s.tolist(), src, dst)

    def test_identity_and_empty(self):
        s = np.array([1, 2, 3], dtype=np.int64)
        assert resample_linear_int(s, 16000, 16000).tolist() == [1, 2, 3]
        assert resample_linear_int(np.array([], dtype=np.int64), 1, 2).size == 0

    def test_upsample_2x_shape(self):
        # doubling interleaves exact midpoints (floor) between samples
        s = np.array([0, 10, -10], dtype=np.int64)
        got = resample_linear_int(s, 8000, 16000).tolist()
        assert got == [0, 5, 10, 0, -10, -10]


class TestSparkChain:
    def test_resample_audio_real_bytes(self, spark):
        rng = np.random.default_rng(9)
        a = rng.integers(-2000, 2000, 800, dtype=np.int64)
        b = rng.integers(-2000, 2000, 400, dtype=np.int64)
        media = spark.createDataFrame(
            [
                (1, bytearray(encode_wav(a, 8000))),
                (2, bytearray(encode_wav(b, 32000, channels=2))),
                (3, bytearray(b"corrupt blob")),
            ],
            "media_id long, content binary",
        )
        from kubenetmon_spark.operators.media import resample_audio

        rows = {r.media_id: r for r in resample_audio(media, 16000).collect()}
        # upsample 8k -> 16k
        got1 = np.frombuffer(bytes(rows[1].samples), dtype="<i4")
        assert rows[1].src_rate == 8000 and rows[1].n_samples == 1600
        assert got1.tolist() == resample_linear_int(a, 8000, 16000).tolist()
        # downsample 32k -> 16k (stereo mixdown first)
        got2 = np.frombuffer(bytes(rows[2].samples), dtype="<i4")
        assert rows[2].src_rate == 32000 and rows[2].n_samples == 200
        assert got2.tolist() == resample_linear_int(b, 32000, 16000).tolist()
        # corrupt blob nulls its row, task alive
        assert rows[3].samples is None and rows[3].src_rate is None
