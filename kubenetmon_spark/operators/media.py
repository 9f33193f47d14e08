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


def decode_image(media: DataFrame, out_width: int = 224, out_height: int = 224) -> DataFrame:
    """Decode+resize images to fixed-size float arrays.

    STUB: requires an image library (PIL/opencv), not present in this
    environment. The mapInPandas plumbing is identical to
    ``extract_media_features``; only the per-batch body differs.
    """
    try:
        import PIL.Image  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "decode_image needs an image codec (pillow or opencv-python); "
            "not available in this environment. Use extract_media_features "
            "for byte-level work or media_from_text for plumbing tests."
        ) from e
    raise NotImplementedError("codec integration point")  # pragma: no cover


def resample_audio(media: DataFrame, target_rate: int = 16000) -> DataFrame:
    """Resample audio to a target rate. STUB: requires an audio library
    (soundfile/librosa), not present in this environment."""
    try:
        import soundfile  # noqa: F401
    except ImportError as e:
        raise NotImplementedError(
            "resample_audio needs an audio codec (soundfile/librosa); "
            "not available in this environment."
        ) from e
    raise NotImplementedError("codec integration point")  # pragma: no cover
