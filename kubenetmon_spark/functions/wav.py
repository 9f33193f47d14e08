"""Minimal WAV (PCM) codec + integer-exact linear resampler, no
third-party audio libraries.

The audio twin of functions/png.py: the multimodal pipeline treats
audio as opaque binary with an injectable codec, and this environment
ships no soundfile/librosa — so until now the resample step was a
documented stub. Python's stdlib ``wave`` module reads/writes RIFF WAV
PCM, which makes a REAL audio path implementable from public pieces:
decode (8/16-bit PCM, any channel count, integer mono mixdown),
resample (linear interpolation in pure int64 arithmetic — engine-exact
and oracle-reproducible, the repo's decimal-exact design rule), and
encode for tests/synthetic data.

Scale posture: decode+resample run inside ``mapInPandas`` batches on
executors — NumPy-vectorized per row, no Python-per-sample loops.
"""

from __future__ import annotations

import io
import wave


class WavFormatError(ValueError):
    """Not a WAV, or uses a feature outside this codec's subset."""


def decode_wav(data: bytes):
    """WAV bytes -> ``(mono_samples int64 ndarray, sample_rate)``.

    8-bit PCM (unsigned, recentred and scaled x256 to the 16-bit
    range) and 16-bit PCM supported; multi-channel mixes down by
    integer mean (floor). Compressed/float WAV raises
    :class:`WavFormatError`."""
    import numpy as np

    try:
        with wave.open(io.BytesIO(bytes(data)), "rb") as w:
            ch = w.getnchannels()
            sw = w.getsampwidth()
            rate = w.getframerate()
            n = w.getnframes()
            raw = w.readframes(n)
    except (wave.Error, EOFError) as e:
        raise WavFormatError(str(e)) from e
    if ch < 1 or rate <= 0:
        raise WavFormatError("empty channel/rate header")
    if sw == 2:
        arr = np.frombuffer(raw, dtype="<i2").astype(np.int64)
    elif sw == 1:
        arr = (np.frombuffer(raw, dtype="u1").astype(np.int64) - 128) * 256
    else:
        raise WavFormatError(
            f"sample width {sw} bytes not supported (8/16-bit PCM only)"
        )
    if arr.size % ch:
        raise WavFormatError("truncated frame data")
    mono = arr.reshape(-1, ch).sum(axis=1) // ch  # integer (floor) mean
    return mono, rate


def encode_wav(samples, rate: int, channels: int = 1) -> bytes:
    """int array (clipped to int16) -> 16-bit PCM WAV bytes. Mono
    samples are duplicated across ``channels`` (test coverage for the
    mixdown path)."""
    import numpy as np

    s = np.clip(np.asarray(samples, dtype=np.int64), -32768, 32767).astype(
        "<i2"
    )
    if channels > 1:
        s = np.repeat(s[:, None], channels, axis=1).reshape(-1)
    buf = io.BytesIO()
    with wave.open(buf, "wb") as w:
        w.setnchannels(channels)
        w.setsampwidth(2)
        w.setframerate(int(rate))
        w.writeframes(s.tobytes())
    return buf.getvalue()


def resample_linear_int(samples, src_rate: int, dst_rate: int):
    """Linear-interpolation resample in EXACT int64 arithmetic.

    Output length ``n_out = n_in * dst // src``; output i sits at
    source position ``i * src / dst``:

        idx  = (i*src) // dst
        frac = (i*src) %  dst
        out  = (s[idx] * (dst - frac) + s[idx+1] * frac) // dst

    (``s[idx+1]`` clamps to the last sample.) All integers — floor
    division, negative-safe — so a SQL oracle reproduces every output
    value exactly; no float phase accumulation to drift across
    engines. Identity when rates match."""
    import numpy as np

    s = np.asarray(samples, dtype=np.int64)
    src, dst = int(src_rate), int(dst_rate)
    if src <= 0 or dst <= 0:
        raise ValueError("rates must be positive")
    if s.size == 0:
        return s
    if src == dst:
        return s.copy()
    n_out = s.size * dst // src
    i = np.arange(n_out, dtype=np.int64)
    pos = i * src
    idx = pos // dst
    frac = pos % dst
    idx2 = np.minimum(idx + 1, s.size - 1)
    return (s[idx] * (dst - frac) + s[idx2] * frac) // dst
