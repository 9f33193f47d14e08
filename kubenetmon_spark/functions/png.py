"""Minimal pure-Python PNG codec (decoder + encoder), no third-party
image libraries.

Why this exists: the multimodal pipeline (operators/media.py) treats
image content as opaque binary and injects the codec as a callable.
This environment ships no PIL/opencv, so until now the decode step ran
only through a deterministic fake. This module is a REAL codec for the
most common interchange format, implemented from the public PNG
specification (RFC 2083 / W3C PNG), so the full decode -> features ->
near-dup chain is proven on real image bytes.

Supported (decode): 8-bit depth, color types 0 (gray), 2 (RGB),
3 (palette), 4 (gray+alpha), 6 (RGBA); all five scanline filters
(None/Sub/Up/Average/Paeth); multiple IDAT chunks. Not supported,
refused loudly: interlaced (Adam7), 16-bit, 1/2/4-bit depths —
``PngFormatError`` names the limitation, never a wrong image.

Alpha handling: composited over white (the documented convention for
feature extraction — features must not depend on undefined RGB values
under zero alpha).

Output contract matches media.decode_image's ``decoder=`` injection
point: ``bytes -> np.ndarray[H, W, 3] uint8``, picklable, safe inside
Arrow batches on executors.

The encoder exists for tests and synthetic data (filter-type coverage
is selectable); it writes valid non-interlaced 8-bit RGB PNGs.

Scale posture: decode runs inside ``mapInPandas`` batches on
executors. None/Up rows are whole-row NumPy ops and Sub is a
per-lane vectorized cumsum; Average and Paeth carry an inherently
sequential left-to-right recurrence and run as per-byte Python over
their rows — correct, and fine for the codec's role (proving the
multimodal chain on real bytes; a production deployment injects a
native decoder through the same ``decoder=`` seam).
"""

from __future__ import annotations

import struct
import zlib

_SIGNATURE = b"\x89PNG\r\n\x1a\n"

#: bytes-per-pixel by PNG color type at bit depth 8
_CHANNELS = {0: 1, 2: 3, 3: 1, 4: 2, 6: 4}


class PngFormatError(ValueError):
    """Not a PNG, or uses a feature outside this codec's subset."""


def _paeth_predict(a, b, c):
    """The spec's PaethPredictor over NumPy vectors (a=left, b=up,
    c=upper-left), elementwise."""
    import numpy as np

    a16 = a.astype(np.int16)
    b16 = b.astype(np.int16)
    c16 = c.astype(np.int16)
    p = a16 + b16 - c16
    pa, pb, pc = np.abs(p - a16), np.abs(p - b16), np.abs(p - c16)
    out = np.where((pa <= pb) & (pa <= pc), a16, np.where(pb <= pc, b16, c16))
    return out.astype(np.uint8)


def _defilter(raw: bytes, height: int, stride: int, bpp: int):
    """Invert per-scanline filtering. Returns (height, stride) uint8.

    Row-sequential by spec (each row's filter references the prior
    reconstructed row), but each row is processed as NumPy vectors;
    Sub/Paeth have an unavoidable left-to-right recurrence, run per
    pixel-column step over array slices (stride/bpp steps, not
    width*channels Python iterations).
    """
    import numpy as np

    expect = height * (stride + 1)
    if len(raw) != expect:
        raise PngFormatError(
            f"decompressed size {len(raw)} != expected {expect} "
            "(corrupt IDAT or unsupported layout)"
        )
    data = np.frombuffer(raw, dtype=np.uint8).reshape(height, stride + 1)
    filters = data[:, 0]
    out = np.empty((height, stride), dtype=np.uint8)
    zero_row = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = int(filters[y])
        cur = data[y, 1:].copy()
        prev = out[y - 1] if y > 0 else zero_row
        if f == 0:  # None
            out[y] = cur
        elif f == 1:  # Sub
            # cur[x] += cur[x-bpp] is exactly a running sum mod 256
            # within each byte LANE — a vectorized cumsum per lane
            # (uint64 keeps the raw sum exact; & 0xFF is the mod)
            for lane in range(bpp):
                s = np.cumsum(cur[lane::bpp], dtype=np.uint64)
                cur[lane::bpp] = (s & 0xFF).astype(np.uint8)
            out[y] = cur
        elif f == 2:  # Up
            out[y] = cur + prev  # uint8 wraps mod 256, per spec
        elif f == 3:  # Average
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                cur[x] = (int(cur[x]) + ((left + int(prev[x])) >> 1)) & 0xFF
            out[y] = cur
        elif f == 4:  # Paeth
            for x in range(stride):
                left = int(cur[x - bpp]) if x >= bpp else 0
                ul = int(prev[x - bpp]) if x >= bpp else 0
                up = int(prev[x])
                p = left + up - ul
                pa, pb, pc = abs(p - left), abs(p - up), abs(p - ul)
                if pa <= pb and pa <= pc:
                    pred = left
                elif pb <= pc:
                    pred = up
                else:
                    pred = ul
                cur[x] = (int(cur[x]) + pred) & 0xFF
            out[y] = cur
        else:
            raise PngFormatError(f"unknown scanline filter {f}")
    return out


def decode_png(data: bytes):
    """PNG bytes -> ``np.ndarray[H, W, 3] uint8`` (RGB, alpha
    composited over white). Raises :class:`PngFormatError` for
    non-PNG input or unsupported PNG variants."""
    import numpy as np

    if not isinstance(data, (bytes, bytearray, memoryview)):
        raise PngFormatError("decode_png expects bytes")
    data = bytes(data)
    if data[:8] != _SIGNATURE:
        raise PngFormatError("missing PNG signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    palette = None
    trns = None
    while pos + 8 <= len(data):
        length, ctype = struct.unpack(">I4s", data[pos : pos + 8])
        body = data[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise PngFormatError("truncated chunk")
        (crc,) = struct.unpack(
            ">I", data[pos + 8 + length : pos + 12 + length]
        )
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise PngFormatError(f"bad CRC in {ctype!r} chunk")
        pos += 12 + length
        if ctype == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif ctype == b"PLTE":
            palette = np.frombuffer(body, dtype=np.uint8).reshape(-1, 3)
        elif ctype == b"tRNS":
            trns = np.frombuffer(body, dtype=np.uint8)
        elif ctype == b"IDAT":
            idat += body
        elif ctype == b"IEND":
            break
    if ihdr is None:
        raise PngFormatError("no IHDR chunk")
    width, height, depth, color, comp, filt, interlace = ihdr
    if comp != 0 or filt != 0:
        raise PngFormatError("nonstandard compression/filter method")
    if interlace != 0:
        raise PngFormatError("interlaced (Adam7) PNG not supported")
    if depth != 8:
        raise PngFormatError(f"bit depth {depth} not supported (8 only)")
    if color not in _CHANNELS:
        raise PngFormatError(f"color type {color} not supported")
    if width == 0 or height == 0:
        raise PngFormatError("zero-dimension image")
    ch = _CHANNELS[color]
    stride = width * ch
    raw = zlib.decompress(bytes(idat))
    px = _defilter(raw, height, stride, ch).reshape(height, width, ch)

    if color == 2:  # RGB
        return px.copy()
    if color == 0:  # gray
        return np.repeat(px, 3, axis=2)
    if color == 3:  # palette
        if palette is None:
            raise PngFormatError("palette image without PLTE chunk")
        idx = px[:, :, 0]
        if int(idx.max(initial=0)) >= len(palette):
            raise PngFormatError("palette index out of range")
        rgb = palette[idx]
        if trns is not None:
            alpha = np.full(len(palette), 255, dtype=np.uint8)
            alpha[: len(trns)] = trns
            a = alpha[idx].astype(np.uint16)[..., None]
            rgb = ((rgb.astype(np.uint16) * a + 255 * (255 - a)) // 255).astype(
                np.uint8
            )
        return rgb
    # alpha variants: composite over white
    if color == 4:  # gray + alpha
        g = px[:, :, 0:1].astype(np.uint16)
        a = px[:, :, 1:2].astype(np.uint16)
        out = ((g * a + 255 * (255 - a)) // 255).astype(np.uint8)
        return np.repeat(out, 3, axis=2)
    # color == 6: RGBA
    rgb = px[:, :, :3].astype(np.uint16)
    a = px[:, :, 3:4].astype(np.uint16)
    return ((rgb * a + 255 * (255 - a)) // 255).astype(np.uint8)


def encode_png(img, filter_type: int = 0, level: int = 6) -> bytes:
    """``np.ndarray[H, W, 3] uint8`` -> non-interlaced 8-bit RGB PNG.

    ``filter_type`` selects the scanline filter applied to EVERY row
    (0..4) or -1 to cycle filters per row (y % 5) — the test hook that
    forces decoder coverage of all five defilters.
    """
    import numpy as np

    img = np.asarray(img, dtype=np.uint8)
    if img.ndim != 3 or img.shape[2] != 3:
        raise ValueError(f"encode_png expects (H, W, 3) uint8, got {img.shape}")
    height, width, _ = img.shape
    stride = width * 3
    bpp = 3
    rows = img.reshape(height, stride)
    out_rows = bytearray()
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        f = (y % 5) if filter_type == -1 else filter_type
        cur = rows[y]
        if f == 0:
            enc = cur
        elif f == 1:  # Sub
            left = np.concatenate([np.zeros(bpp, np.uint8), cur[:-bpp]])
            enc = cur - left
        elif f == 2:  # Up
            enc = cur - prev
        elif f == 3:  # Average
            left = np.concatenate([np.zeros(bpp, np.uint8), cur[:-bpp]])
            avg = (left.astype(np.uint16) + prev.astype(np.uint16)) >> 1
            enc = cur - avg.astype(np.uint8)
        elif f == 4:  # Paeth
            left = np.concatenate([np.zeros(bpp, np.uint8), cur[:-bpp]])
            ul = np.concatenate([np.zeros(bpp, np.uint8), prev[:-bpp]])
            enc = cur - _paeth_predict(left, prev, ul)
        else:
            raise ValueError(f"filter_type must be -1..4, got {filter_type}")
        out_rows.append(f)
        out_rows += enc.tobytes()
        prev = cur

    def chunk(ctype: bytes, body: bytes) -> bytes:
        return (
            struct.pack(">I", len(body))
            + ctype
            + body
            + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", width, height, 8, 2, 0, 0, 0)
    idat = zlib.compress(bytes(out_rows), level)
    return (
        _SIGNATURE
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", idat)
        + chunk(b"IEND", b"")
    )
