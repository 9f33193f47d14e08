"""Multimodal columns: image/audio/video as opaque ``binary`` content plus
typed metadata, with Arrow-batched Pandas plumbing for the decode path.

Design (SURVEY.md §7.2 M6 / BASELINE extensions): media is a first-class
column, not a side channel —

- ``MEDIA_SCHEMA``: ``content: binary`` + a typed ``meta`` struct. The
  engine never interprets content JVM-side; all byte-level work happens in
  ``mapInPandas`` over Arrow record batches, so a 100 TB corpus streams
  through Python in vectorized chunks without ever materializing a
  partition in one process.
- ``extract_media_features`` — the real, tested plumbing: schema in/out,
  Arrow batch iteration, per-batch vectorized hashing. Pure byte features
  (size, digest, header) are computed for real.
- ``decode_image`` / ``resample_audio`` — the codec step. Image/audio
  libraries are not available in this environment, so decode is gated
  behind an import-try and raises ``NotImplementedError`` with the
  dependency named; the surrounding Spark plumbing (UDF signature, batch
  shape, schema) is identical to what a real decoder would use.
- ``sample_frames`` — video frame sampling as pure metadata arithmetic
  (frame timestamps from duration/fps); selecting which frames to decode
  never needs the codec.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator
from typing import TYPE_CHECKING

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

if TYPE_CHECKING:  # pragma: no cover
    import pandas as pd

MEDIA_META_SCHEMA = StructType(
    [
        StructField("media_type", StringType(), False),  # image | audio | video
        StructField("format", StringType(), True),  # png/jpeg/wav/mp4/...
        StructField("width", IntegerType(), True),
        StructField("height", IntegerType(), True),
        StructField("duration_ms", IntegerType(), True),
        StructField("sample_rate", IntegerType(), True),
        StructField("fps", IntegerType(), True),
    ]
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("content", BinaryType(), True),
        StructField("meta", MEDIA_META_SCHEMA, False),
    ]
)

FEATURE_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("n_bytes", LongType(), True),
        StructField("digest", StringType(), True),
        StructField("header_hex", StringType(), True),
    ]
)


def media_from_text(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Deterministic demo corpus: wrap each document's UTF-8 bytes as a
    fake image payload with metadata derived from the content length.
    Exercises the full binary-column path without a codec."""
    content = F.encode(F.col(text_col), "UTF-8")
    n = F.length(content)
    return df.select(
        F.col(id_col).cast("long").alias("media_id"),
        content.alias("content"),
        F.struct(
            F.lit("image").alias("media_type"),
            F.lit("raw").alias("format"),
            (n % 640 + 1).cast("int").alias("width"),
            (n % 480 + 1).cast("int").alias("height"),
            F.lit(None).cast("int").alias("duration_ms"),
            F.lit(None).cast("int").alias("sample_rate"),
            F.lit(None).cast("int").alias("fps"),
        ).alias("meta"),
    )


def extract_media_features(media: DataFrame) -> DataFrame:
    """Byte-level features via Arrow-batched ``mapInPandas``.

    The Python stage sees ``pandas.DataFrame`` chunks (Arrow transfer, no
    per-row pickling); output schema is fixed (FEATURE_SCHEMA). This is
    the template every real decoder plugs into: same signature, same
    batch shape, heavier per-batch body.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd

        for pdf in it:
            content = pdf["content"]
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "n_bytes": content.map(lambda b: len(b) if b is not None else None),
                    "digest": content.map(
                        lambda b: hashlib.md5(b).hexdigest() if b is not None else None
                    ),
                    "header_hex": content.map(
                        lambda b: bytes(b[:8]).hex() if b is not None else None
                    ),
                }
            )

    return media.select("media_id", "content").mapInPandas(batches, FEATURE_SCHEMA)


def sample_frames(
    media: DataFrame, every_ms: int = 1000, max_frames: int = 32
) -> DataFrame:
    """Video frame-sampling plan: one row per (media_id, frame_ts_ms),
    pure metadata arithmetic — deciding WHAT to decode is engine work;
    decoding is the (stubbed) codec's."""
    dur = F.coalesce(F.col("meta.duration_ms"), F.lit(0))
    ts = F.sequence(
        F.lit(0),
        F.least(dur - 1, F.lit(every_ms * (max_frames - 1))),
        F.lit(every_ms),
    )
    return (
        media.filter(F.col("meta.media_type") == "video")
        .filter(dur > 0)
        .select(
            "media_id",
            F.posexplode(ts).alias("frame_index", "frame_ts_ms"),
        )
    )


DECODED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("width", IntegerType(), False),
        StructField("height", IntegerType(), False),
        StructField("pixels", BinaryType(), True),  # H*W*3 interleaved RGB
    ]
)


def decode_image(
    media: DataFrame,
    out_width: int = 224,
    out_height: int = 224,
    codec: str = "auto",
    decoder=None,
) -> DataFrame:
    """Decode+resize images to fixed-size ``H*W*3`` RGB byte buffers.

    Codecs:

    - ``codec='png'`` — REAL decode via the vendored pure-Python PNG
      codec (functions/png.py, zlib + NumPy, no third-party image
      libs): 8-bit gray/RGB/palette/alpha PNGs decode to true pixels
      inside the Arrow batches. This is the default real path in
      environments without PIL/opencv.
    - ``codec='auto'`` — prefer an installed image library (PIL) for
      full-format coverage; falls back to the pure-Python PNG codec
      when no library is present (PNG-only, other formats raise
      ``PngFormatError`` per row -> null pixels, see below).
    - ``codec='fake'`` runs the identical Spark plumbing (mapInPandas,
      Arrow batches, DECODED_SCHEMA, NumPy vectorized per batch) with
      a deterministic stand-in decode: the content bytes are treated
      as a flat pixel stream and nearest-neighbor-resampled — resize
      geometry, batch shapes, and downstream feature code exercised
      for real with synthetic bytes.

    ``decoder`` is the injection point for a real codec (the feed
    fetcher's injectable-callable design, sources/fetch.py): a picklable
    ``bytes -> np.ndarray[H, W, 3] uint8`` callable that runs inside the
    Arrow batches; this function supplies the nearest-neighbor resize to
    (out_height, out_width) and the DECODED_SCHEMA packaging. Production
    passes e.g. a PIL/turbojpeg wrapper; tests pass a deterministic
    double — the full decode -> features -> near-dup chain is covered in
    tests/test_media_chain.py either way.
    """
    if decoder is not None:
        def decode_batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
            import numpy as np
            import pandas as pd

            def one(b) -> bytes | None:
                if b is None:
                    return None
                # Per-row decode tolerance (the proto-ingest posture,
                # sources/proto.py): one corrupt/foreign-format blob
                # nulls ITS pixels instead of failing the whole task —
                # at 100 TB some fraction of scraped bytes is always
                # broken. Contract violations by the DECODER itself
                # (wrong shape) still fail loud — that's a code bug,
                # not a data defect.
                try:
                    img = np.asarray(decoder(bytes(b)), dtype=np.uint8)
                except Exception:
                    return None
                if img.ndim != 3 or img.shape[2] != 3:
                    raise ValueError(
                        f"decoder must return (H, W, 3) uint8, got {img.shape}"
                    )
                h, w = img.shape[:2]
                ri = (np.arange(out_height, dtype=np.int64) * h) // out_height
                ci = (np.arange(out_width, dtype=np.int64) * w) // out_width
                return img[ri][:, ci].tobytes()

            for pdf in it:
                yield pd.DataFrame(
                    {
                        "media_id": pdf["media_id"],
                        "width": out_width,
                        "height": out_height,
                        "pixels": pdf["content"].map(one),
                    }
                )

        return media.select("media_id", "content").mapInPandas(
            decode_batches, DECODED_SCHEMA
        )
    if codec in ("auto", "png"):
        if codec == "auto":
            try:
                import PIL.Image as _PIL

                def _pil_decoder(b: bytes):
                    import io

                    import numpy as np

                    return np.asarray(
                        _PIL.open(io.BytesIO(b)).convert("RGB"), dtype=np.uint8
                    )

                return decode_image(
                    media, out_width, out_height, decoder=_pil_decoder
                )
            except ImportError:
                pass  # fall through to the pure-Python PNG codec
        from kubenetmon_spark.functions.png import decode_png

        return decode_image(media, out_width, out_height, decoder=decode_png)
    if codec != "fake":
        raise ValueError("codec must be 'auto', 'png', or 'fake'")
    n_out = out_width * out_height * 3

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        # nearest-neighbor index map is shared by every row of a batch
        def resample(buf: bytes) -> bytes:
            src = np.frombuffer(buf, dtype=np.uint8)
            if src.size == 0:
                src = np.zeros(1, dtype=np.uint8)
            idx = (np.arange(n_out, dtype=np.int64) * src.size) // n_out
            return src[idx].tobytes()

        for pdf in it:
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "width": out_width,
                    "height": out_height,
                    "pixels": pdf["content"].map(
                        lambda b: resample(bytes(b)) if b is not None else None
                    ),
                }
            )

    return media.select("media_id", "content").mapInPandas(
        batches, DECODED_SCHEMA
    )


def mean_channel_features(decoded: DataFrame) -> DataFrame:
    """Per-image mean of each RGB channel from the decoded buffer —
    the smallest real "feature extraction over decoded pixels" stage,
    JVM-free NumPy over the same Arrow batches."""
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("mean_r_e2", LongType(), True),
            StructField("mean_g_e2", LongType(), True),
            StructField("mean_b_e2", LongType(), True),
        ]
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            out = {"media_id": pdf["media_id"]}
            means = {0: [], 1: [], 2: []}
            for b in pdf["pixels"]:
                if b is None:
                    for c in means:
                        means[c].append(None)
                    continue
                a = np.frombuffer(b, dtype=np.uint8).reshape(-1, 3)
                # integer centi-units: floor(mean*100) exactly via sums
                for c in means:
                    s = int(a[:, c].astype(np.int64).sum())
                    means[c].append(s * 100 // a.shape[0])
            out["mean_r_e2"] = means[0]
            out["mean_g_e2"] = means[1]
            out["mean_b_e2"] = means[2]
            yield pd.DataFrame(out)

    return decoded.select("media_id", "pixels").mapInPandas(batches, schema)


RESAMPLED_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("src_rate", IntegerType(), True),
        StructField("rate", IntegerType(), False),
        StructField("n_samples", LongType(), True),
        StructField("samples", BinaryType(), True),  # int32 LE mono PCM
    ]
)


def resample_audio(
    media: DataFrame, target_rate: int = 16000, decoder=None
) -> DataFrame:
    """Decode audio content and resample to ``target_rate`` — mono
    int32 little-endian PCM buffers, one row per media item.

    Real path by default: the vendored stdlib WAV codec
    (functions/wav.py — 8/16-bit PCM, integer mono mixdown) decodes,
    and an EXACT int64 linear interpolator resamples (engine-exact, so
    gates can oracle every output value). ``decoder`` is the injection
    point for richer codecs (soundfile/librosa wrappers): a picklable
    ``bytes -> (samples int array, sample_rate)`` callable running
    inside the Arrow batches. Per-row tolerance like decode_image:
    corrupt/foreign-format content nulls ITS row's samples (rate
    carries the target; src_rate/n_samples null) instead of failing
    the task.
    """
    rate = int(target_rate)

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        from kubenetmon_spark.functions.wav import (
            decode_wav,
            resample_linear_int,
        )

        dec = decoder if decoder is not None else decode_wav

        for pdf in it:
            src_rates, n_out, bufs = [], [], []
            for b in pdf["content"]:
                if b is None:
                    src_rates.append(None)
                    n_out.append(None)
                    bufs.append(None)
                    continue
                try:
                    samples, src = dec(bytes(b))
                    out = resample_linear_int(samples, src, rate)
                except Exception:
                    src_rates.append(None)
                    n_out.append(None)
                    bufs.append(None)
                    continue
                src_rates.append(int(src))
                n_out.append(len(out))
                bufs.append(np.asarray(out, dtype="<i4").tobytes())
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    "src_rate": pd.array(src_rates, dtype="Int32"),
                    "rate": rate,
                    "n_samples": pd.array(n_out, dtype="Int64"),
                    "samples": bufs,
                }
            )

    return media.select("media_id", "content").mapInPandas(
        batches, RESAMPLED_SCHEMA
    )


def pcm_features(resampled: DataFrame) -> DataFrame:
    """Integer amplitude features over resampled PCM buffers
    (RESAMPLED_SCHEMA) — the audio twin of mean_channel_features:
    count/sum/sum-of-abs/min/max per item, exact int64, NumPy over the
    same Arrow batches. Null buffers yield null features."""
    schema = StructType(
        [
            StructField("media_id", LongType(), False),
            StructField("n_samples", LongType(), True),
            StructField("sum_v", LongType(), True),
            StructField("sum_abs", LongType(), True),
            StructField("min_v", LongType(), True),
            StructField("max_v", LongType(), True),
        ]
    )

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        for pdf in it:
            cols = {k: [] for k in ("n_samples", "sum_v", "sum_abs", "min_v", "max_v")}
            for b in pdf["samples"]:
                if b is None:
                    for k in cols:
                        cols[k].append(None)
                    continue
                v = np.frombuffer(bytes(b), dtype="<i4").astype(np.int64)
                cols["n_samples"].append(v.size)
                cols["sum_v"].append(int(v.sum()))
                cols["sum_abs"].append(int(np.abs(v).sum()))
                cols["min_v"].append(int(v.min()) if v.size else None)
                cols["max_v"].append(int(v.max()) if v.size else None)
            yield pd.DataFrame({"media_id": pdf["media_id"], **cols})

    return resampled.select("media_id", "samples").mapInPandas(
        batches, schema
    )


AHASH_SCHEMA = StructType(
    [
        StructField("media_id", LongType(), False),
        StructField("b0", LongType(), True),
        StructField("b1", LongType(), True),
        StructField("b2", LongType(), True),
        StructField("b3", LongType(), True),
    ]
)


def ahash_bands(media: DataFrame) -> DataFrame:
    """Average-hash (aHash) of each media item's decoded signal, split
    into four 16-bit LSH bands.

    The decode stand-in (real image libs are absent here) maps content
    bytes -> UTF-8 codepoints and the 8x8 downsample -> 64 contiguous
    chunk sums ("luma"); a real decoder drops into the same mapInPandas
    body with pixels instead of codepoints — the schema, Arrow batch
    shape, and everything downstream are identical. Bit c is
    64*luma_c >= total (an integer comparison — no float mean), packed
    MSB-first into bands b0..b3 of 16 bits each. Chunks are
    position-partitioned ((pos*64) div length), so a localized edit
    perturbs few chunks and Hamming distance is a locality measure.
    Items whose decoded length < 64 leave some chunks empty (zero
    luma); callers comparing against engines that omit empty groups
    should pre-filter to length >= 64.
    """

    def batches(it: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import numpy as np
        import pandas as pd

        def hash_one(b) -> tuple[int, int, int, int] | None:
            if b is None:
                return None
            cp = np.frombuffer(
                bytes(b).decode("utf-8").encode("utf-32-le"), dtype=np.uint32
            ).astype(np.int64)
            n = cp.size
            if n == 0:
                return None
            luma = np.zeros(64, dtype=np.int64)
            np.add.at(luma, (np.arange(n) * 64) // n, cp)
            bits = (64 * luma >= luma.sum()).astype(np.int64)
            weights = 1 << (15 - (np.arange(64) % 16))
            vals = bits * weights
            return tuple(int(vals[j * 16 : (j + 1) * 16].sum()) for j in range(4))

        for pdf in it:
            hashes = pdf["content"].map(hash_one)
            yield pd.DataFrame(
                {
                    "media_id": pdf["media_id"],
                    **{
                        f"b{j}": hashes.map(
                            lambda h, j=j: h[j] if h is not None else None
                        )
                        for j in range(4)
                    },
                }
            )

    return media.select("media_id", "content").mapInPandas(batches, AHASH_SCHEMA)


def perceptual_hash_pairs(
    media: DataFrame, max_hamming: int = 3
) -> DataFrame:
    """Near-duplicate media pairs by banded aHash Hamming distance.

    LSH banding with the pigeonhole guarantee: 64 bits in 4 bands means
    any pair within Hamming distance 3 shares at least one identical
    band, so the band-equality join finds ALL such pairs (plus random
    collisions that the exact Hamming filter then removes —
    ``max_hamming`` > 3 weakens the guarantee and is rejected).

    Plan: one Arrow-batched hash pass, explode to (band_idx, value) —
    4 rows per item — one self equi-join on (band_idx, value), pair
    dedup, then the exact Hamming check on the carried band values
    (no join back to the corpus). At 100 TB the join is
    hash-partitioned on band value; a hot all-zeros band (blank media)
    is the skew risk — drop degenerate all-zero hashes upstream.
    """
    if max_hamming > 3:
        raise ValueError(
            "banding guarantee only covers max_hamming <= 3 with 4 bands"
        )
    h = ahash_bands(media)
    exploded = h.select(
        "media_id",
        "b0",
        "b1",
        "b2",
        "b3",
        F.explode(
            F.array(*[
                F.struct(F.lit(j).alias("bj"), F.col(f"b{j}").alias("bv"))
                for j in range(4)
            ])
        ).alias("_band"),
    ).select("media_id", "b0", "b1", "b2", "b3", "_band.bj", "_band.bv")
    left = exploded.alias("l")
    right = exploded.alias("r")
    cand = (
        left.join(
            right,
            (F.col("l.bj") == F.col("r.bj"))
            & (F.col("l.bv") == F.col("r.bv"))
            & (F.col("l.media_id") < F.col("r.media_id")),
        )
        .select(
            F.col("l.media_id").alias("id_1"),
            F.col("r.media_id").alias("id_2"),
            *[F.col(f"l.b{j}").alias(f"b{j}_1") for j in range(4)],
            *[F.col(f"r.b{j}").alias(f"b{j}_2") for j in range(4)],
        )
        .dropDuplicates(["id_1", "id_2"])
    )
    hamming = sum(
        F.bit_count(
            F.col(f"b{j}_1").bitwiseXOR(F.col(f"b{j}_2"))
        )
        for j in range(4)
    )
    return cand.select(
        "id_1", "id_2", hamming.cast("long").alias("hamming")
    ).filter(F.col("hamming") <= max_hamming)
