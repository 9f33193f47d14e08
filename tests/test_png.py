"""Pure-Python PNG codec: spec-reference cross-checks plus the REAL
decode -> resize -> features -> near-dup chain over actual PNG bytes
(the proof the multimodal path decodes a real format end-to-end)."""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from kubenetmon_spark.functions.png import (
    PngFormatError,
    decode_png,
    encode_png,
)


def _spec_paeth(a: int, b: int, c: int) -> int:
    """The PaethPredictor EXACTLY as written in the PNG spec's
    pseudocode — an independent reference for the codec's vectorized
    version (a shared misreading of the spec cannot cancel out)."""
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    if pb <= pc:
        return b
    return c


def _rng_image(h, w, seed):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, 3), dtype=np.uint8
    )


class TestCodecCore:
    def test_roundtrip_every_filter_type(self):
        img = _rng_image(13, 7, 1)
        for f in (0, 1, 2, 3, 4, -1):  # -1 cycles filters per row
            data = encode_png(img, filter_type=f)
            out = decode_png(data)
            assert out.shape == (13, 7, 3)
            assert np.array_equal(out, img), f"filter {f} corrupted pixels"

    def test_paeth_matches_spec_pseudocode(self):
        from kubenetmon_spark.functions.png import _paeth_predict

        rng = np.random.default_rng(2)
        a = rng.integers(0, 256, 4096, dtype=np.uint8)
        b = rng.integers(0, 256, 4096, dtype=np.uint8)
        c = rng.integers(0, 256, 4096, dtype=np.uint8)
        got = _paeth_predict(a, b, c)
        want = np.array(
            [_spec_paeth(int(x), int(y), int(z)) for x, y, z in zip(a, b, c)],
            dtype=np.uint8,
        )
        assert np.array_equal(got, want)

    def test_handcrafted_spec_literal_png(self):
        # a 2x2 RGB PNG assembled chunk-by-chunk from the spec (not via
        # encode_png), filter 0 rows: red, green / blue, white
        rows = (
            b"\x00" + bytes([255, 0, 0, 0, 255, 0])
            + b"\x00" + bytes([0, 0, 255, 255, 255, 255])
        )

        def chunk(ctype, body):
            return (
                struct.pack(">I", len(body))
                + ctype
                + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
            )

        png = (
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 2, 8, 2, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(rows))
            + chunk(b"IEND", b"")
        )
        out = decode_png(png)
        assert out.tolist() == [
            [[255, 0, 0], [0, 255, 0]],
            [[0, 0, 255], [255, 255, 255]],
        ]

    def test_grayscale_and_palette_and_alpha(self):
        def chunk(ctype, body):
            return (
                struct.pack(">I", len(body))
                + ctype
                + body
                + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
            )

        sig = b"\x89PNG\r\n\x1a\n"
        # grayscale (type 0): 1x2, values 10, 200
        g = (
            sig
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 0, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00\x0a\xc8"))
            + chunk(b"IEND", b"")
        )
        assert decode_png(g).tolist() == [[[10, 10, 10], [200, 200, 200]]]
        # palette (type 3): 2 entries, indices 1, 0
        p = (
            sig
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 2, 1, 8, 3, 0, 0, 0))
            + chunk(b"PLTE", bytes([1, 2, 3, 250, 251, 252]))
            + chunk(b"IDAT", zlib.compress(b"\x00\x01\x00"))
            + chunk(b"IEND", b"")
        )
        assert decode_png(p).tolist() == [[[250, 251, 252], [1, 2, 3]]]
        # RGBA (type 6): full-red half alpha over white -> 255,127,127
        rgba = (
            sig
            + chunk(b"IHDR", struct.pack(">IIBBBBB", 1, 1, 8, 6, 0, 0, 0))
            + chunk(b"IDAT", zlib.compress(b"\x00\xff\x00\x00\x80"))
            + chunk(b"IEND", b"")
        )
        (px,) = decode_png(rgba).reshape(1, 3).tolist()
        assert px[0] == 255 and 126 <= px[1] <= 128 and px[1] == px[2]

    def test_refusals_are_loud_and_specific(self):
        img = _rng_image(3, 3, 3)
        good = encode_png(img)
        with pytest.raises(PngFormatError, match="signature"):
            decode_png(b"JFIF not a png")
        # corrupt a byte inside IDAT: CRC must catch it
        bad = bytearray(good)
        bad[50] ^= 0xFF
        with pytest.raises(PngFormatError, match="CRC"):
            decode_png(bytes(bad))
        # interlaced refused by name
        ihdr_body = struct.pack(">IIBBBBB", 3, 3, 8, 2, 0, 0, 1)
        interlaced = (
            good[:8]
            + struct.pack(">I", 13)
            + b"IHDR"
            + ihdr_body
            + struct.pack(
                ">I", zlib.crc32(b"IHDR" + ihdr_body) & 0xFFFFFFFF
            )
            + good[8 + 12 + 13 :]
        )
        with pytest.raises(PngFormatError, match="interlaced"):
            decode_png(interlaced)


class TestRealDecodeChain:
    """decode_image(codec='png') on REAL PNG bytes: geometry, resize,
    features, and aHash near-dup — the end-to-end multimodal proof."""

    @pytest.fixture()
    def png_media(self, spark):
        # 4 images: 0 and 2 are pixel-identical (different PNG bytes —
        # different filter strategies!), 1 is a noise image, 3 is a
        # corrupt blob. Near-dup must pair (0, 2) via PIXELS, which
        # byte-level dedup cannot see.
        base = _rng_image(16, 12, 7)
        noise = _rng_image(16, 12, 8)
        rows = [
            (0, bytearray(encode_png(base, filter_type=0))),
            (1, bytearray(encode_png(noise, filter_type=-1))),
            (2, bytearray(encode_png(base, filter_type=4))),
            (3, bytearray(b"not an image at all")),
        ]
        return (
            spark.createDataFrame(rows, "media_id long, content binary"),
            base,
        )

    def test_decode_resize_and_near_dup_on_real_bytes(self, spark, png_media):
        import pyspark.sql.functions as F

        from kubenetmon_spark.operators.media import (
            decode_image,
            mean_channel_features,
        )

        media, base = png_media
        # distinct PNG byte streams for the same pixels (the reason
        # multimodal dedup must decode, not hash bytes)
        contents = {r.media_id: bytes(r.content) for r in media.collect()}
        assert contents[0] != contents[2]

        decoded = decode_image(media, out_width=8, out_height=8, codec="png")
        rows = {r.media_id: r for r in decoded.collect()}
        assert rows[0].width == 8 and rows[0].height == 8
        assert rows[3].pixels is None  # corrupt blob -> null, task alive
        # resize is the documented nearest-neighbor map of REAL pixels
        ri = (np.arange(8, dtype=np.int64) * 16) // 8
        ci = (np.arange(8, dtype=np.int64) * 12) // 8
        expect = base[ri][:, ci].tobytes()
        assert bytes(rows[0].pixels) == expect
        assert bytes(rows[2].pixels) == expect
        assert bytes(rows[1].pixels) != expect

        # features differ between images, agree between the twins
        feats = {
            r.media_id: (r.mean_r_e2, r.mean_g_e2, r.mean_b_e2)
            for r in mean_channel_features(decoded).collect()
            if r.mean_r_e2 is not None
        }
        assert feats[0] == feats[2] and feats[0] != feats[1]

        # exact near-dup over decoded pixels: only the planted pair
        groups = (
            decoded.filter(F.col("pixels").isNotNull())
            .groupBy(F.md5(F.col("pixels")).alias("h"))
            .agg(F.collect_set("media_id").alias("ids"))
            .filter(F.size("ids") > 1)
            .collect()
        )
        assert len(groups) == 1 and sorted(groups[0].ids) == [0, 2]

    def test_golden_pixel_hash_stability(self, spark, png_media):
        # decode determinism across runs/versions: md5 of the decoded
        # buffer of a fixed seeded image is a golden value
        import hashlib

        media, base = png_media
        from kubenetmon_spark.operators.media import decode_image

        decoded = decode_image(media, out_width=8, out_height=8, codec="png")
        row = {r.media_id: r for r in decoded.collect()}[0]
        got = hashlib.md5(bytes(row.pixels)).hexdigest()
        ri = (np.arange(8, dtype=np.int64) * 16) // 8
        ci = (np.arange(8, dtype=np.int64) * 12) // 8
        want = hashlib.md5(base[ri][:, ci].tobytes()).hexdigest()
        assert got == want
