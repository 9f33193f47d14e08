"""End-to-end media chain with an injected codec double:
decode (fake codec) -> resize -> channel features -> exact near-dup.
Proves the Spark-side plumbing (schemas, Arrow batch shapes, resize
geometry, downstream feature/dedup code) runs for real — a production
codec replaces only the injected callable (media.py::decode_image)."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from kubenetmon_spark.operators.media import (
    decode_image,
    mean_channel_features,
    media_from_text,
)


def make_fake_codec():
    """Deterministic stand-in for PIL/opencv: tile the payload bytes
    into a content-dependent (10, 7, 3) uint8 image. Returned as a
    closure so cloudpickle ships it by VALUE to executors (a test-module
    top-level function pickles by reference and fails to import there)."""

    def fake_codec(buf: bytes) -> np.ndarray:
        import numpy as np

        src = np.frombuffer(buf, dtype=np.uint8)
        if src.size == 0:
            src = np.zeros(1, dtype=np.uint8)
        n = 10 * 7 * 3
        reps = -(-n // src.size)
        return np.tile(src, reps)[:n].reshape(10, 7, 3)

    return fake_codec


fake_codec = make_fake_codec()


@pytest.fixture(scope="module")
def media(spark):
    rows = [
        (0, "the quick brown fox"),
        (1, "jumped over the lazy dog"),
        (2, "the quick brown fox"),  # exact duplicate of 0
        (3, "completely different payload"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    return media_from_text(docs)


class TestMediaChain:
    def test_decode_with_injected_codec(self, media):
        decoded = decode_image(media, out_width=8, out_height=6, decoder=fake_codec)
        rows = {r.media_id: r for r in decoded.collect()}
        assert set(rows) == {0, 1, 2, 3}
        for r in rows.values():
            assert (r.width, r.height) == (8, 6)
            assert len(r.pixels) == 8 * 6 * 3
        # deterministic: same content -> identical pixel buffers
        assert bytes(rows[0].pixels) == bytes(rows[2].pixels)
        assert bytes(rows[0].pixels) != bytes(rows[1].pixels)

    def test_resize_geometry_nearest_neighbor(self, media):
        # independently recompute the expected resample for one row
        decoded = decode_image(media, out_width=4, out_height=3, decoder=fake_codec)
        got = bytes(
            decoded.filter(F.col("media_id") == 1).collect()[0].pixels
        )
        content = bytes(
            media.filter(F.col("media_id") == 1).collect()[0].content
        )
        img = fake_codec(content)
        ri = (np.arange(3, dtype=np.int64) * 10) // 3
        ci = (np.arange(4, dtype=np.int64) * 7) // 4
        assert got == img[ri][:, ci].tobytes()

    def test_features_and_near_dup_over_decoded_chain(self, media):
        decoded = decode_image(media, out_width=8, out_height=6, decoder=fake_codec)
        feats = mean_channel_features(decoded)
        f = {r.media_id: (r.mean_r_e2, r.mean_g_e2, r.mean_b_e2) for r in feats.collect()}
        assert f[0] == f[2]  # duplicate media -> identical features
        assert f[0] != f[3]
        # exact near-dup over the decoded buffers: one groupBy, the
        # planted pair must form the only multi-member group
        groups = (
            decoded.groupBy(F.md5(F.col("pixels")).alias("h"))
            .agg(F.collect_set("media_id").alias("ids"), F.count("*").alias("n"))
            .filter(F.col("n") > 1)
            .collect()
        )
        assert len(groups) == 1 and sorted(groups[0].ids) == [0, 2]

    def test_decoder_shape_contract_enforced(self, spark, media):
        bad = lambda b: np.zeros((4, 4), dtype=np.uint8)  # noqa: E731
        with pytest.raises(Exception, match="H, W, 3"):
            decode_image(media, decoder=bad).collect()

    def test_auto_codec_falls_back_to_pure_python_png(self, spark, media):
        # no PIL in this environment: 'auto' decodes through the
        # vendored PNG codec; the text-derived content here is NOT
        # PNG, so every row decodes to null pixels (per-row tolerance)
        # instead of raising — the stream survives foreign bytes.
        rows = decode_image(media, codec="auto").collect()
        assert len(rows) > 0
        assert all(r.pixels is None for r in rows)
