"""Minimal pure-stdlib PNG decoder (zlib + struct + numpy).

Vendored so the engine's real media-decode path runs in codec-less
containers: ``operators/multimodal.decode_media`` dispatches PIL when
importable and falls back to this module for PNG payloads, keeping the
decode stage executable (not stubbed) everywhere.

Scope — the common web-PNG subset, loudly rejected otherwise:
- 8-bit samples; color types 0 (gray), 2 (RGB), 3 (palette),
  4 (gray+alpha), 6 (RGBA)
- all five scanline filters (None/Sub/Up/Average/Paeth, RFC 2083 §6)
- non-interlaced only (Adam7 raises ValueError)

Public spec implementation (RFC 2083 / W3C PNG); no reference-repo
counterpart — the reference treats images as already-decoded tensors.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
# color type -> (channels, mode name aligned with PIL's)
_COLOR_TYPES = {0: (1, "L"), 2: (3, "RGB"), 3: (1, "P"), 4: (2, "LA"), 6: (4, "RGBA")}


def _paeth(a: int, b: int, c: int) -> int:
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def _unfilter(raw: bytes, width: int, height: int, channels: int) -> np.ndarray:
    """Reverse per-scanline filtering -> (height, width*channels) uint8."""
    stride = width * channels
    if len(raw) != height * (stride + 1):
        raise ValueError(
            f"png: IDAT size {len(raw)} != expected {height * (stride + 1)}"
        )
    out = np.zeros((height, stride), dtype=np.uint8)
    bpp = channels  # 8-bit samples: bytes per pixel == channels
    for y in range(height):
        row = np.frombuffer(
            raw, dtype=np.uint8, count=stride, offset=y * (stride + 1) + 1
        ).astype(np.int64)
        ftype = raw[y * (stride + 1)]
        prev = out[y - 1].astype(np.int64) if y > 0 else np.zeros(stride, np.int64)
        if ftype == 0:  # None
            cur = row
        elif ftype == 2:  # Up
            cur = (row + prev) & 0xFF
        elif ftype == 1:  # Sub — sequential in x, vectorize over channels
            cur = row.copy()
            for x in range(bpp, stride):
                cur[x] = (cur[x] + cur[x - bpp]) & 0xFF
        elif ftype == 3:  # Average
            cur = row.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + ((left + prev[x]) >> 1)) & 0xFF
        elif ftype == 4:  # Paeth
            cur = row.copy()
            for x in range(stride):
                left = cur[x - bpp] if x >= bpp else 0
                ul = prev[x - bpp] if x >= bpp else 0
                cur[x] = (cur[x] + _paeth(int(left), int(prev[x]), int(ul))) & 0xFF
        else:
            raise ValueError(f"png: unknown filter type {ftype}")
        out[y] = cur.astype(np.uint8)
    return out


def decode_png(raw: bytes) -> tuple[np.ndarray, str, np.ndarray | None]:
    """Decode PNG bytes -> ((height, width, channels) uint8 array, mode,
    palette-or-None).

    ``mode`` matches PIL's naming ("L", "RGB", "P", "LA", "RGBA");
    palette images return their palette INDICES plus the (n, 3) RGB
    palette, applied by :func:`luma_mean` (same division of labor as
    PIL's mode-P images). Raises ValueError on anything outside the
    supported subset or malformed input.
    """
    if raw[:8] != _SIG:
        raise ValueError("png: bad signature")
    pos = 8
    ihdr = None
    idat = bytearray()
    plte: bytes | None = None
    while pos + 8 <= len(raw):
        (length,) = struct.unpack(">I", raw[pos : pos + 4])
        tag = raw[pos + 4 : pos + 8]
        body = raw[pos + 8 : pos + 8 + length]
        if len(body) != length:
            raise ValueError("png: truncated chunk")
        if zlib.crc32(tag + body) != struct.unpack(
            ">I", raw[pos + 8 + length : pos + 12 + length]
        )[0]:
            raise ValueError(f"png: bad crc in {tag!r}")
        if tag == b"IHDR":
            ihdr = struct.unpack(">IIBBBBB", body)
        elif tag == b"IDAT":
            idat.extend(body)
        elif tag == b"PLTE":
            plte = bytes(body)
        elif tag == b"IEND":
            break
        pos += 12 + length
    if ihdr is None:
        raise ValueError("png: missing IHDR")
    width, height, depth, ctype, comp, filt, interlace = ihdr
    if depth != 8:
        raise ValueError(f"png: unsupported bit depth {depth}")
    if ctype not in _COLOR_TYPES:
        raise ValueError(f"png: unsupported color type {ctype}")
    if comp != 0 or filt != 0:
        raise ValueError("png: unsupported compression/filter method")
    if interlace != 0:
        raise ValueError("png: interlaced (Adam7) not supported")
    if width == 0 or height == 0:
        raise ValueError("png: zero dimension")
    channels, mode = _COLOR_TYPES[ctype]
    if ctype == 3 and plte is None:
        raise ValueError("png: palette image without PLTE")
    pixels = _unfilter(zlib.decompress(bytes(idat)), width, height, channels)
    arr = pixels.reshape(height, width, channels)
    palette = (
        np.frombuffer(plte, dtype=np.uint8).reshape(-1, 3)
        if ctype == 3
        else None
    )
    return arr, mode, palette


def luma_mean(arr: np.ndarray, mode: str, palette: np.ndarray | None = None) -> float:
    """Mean luminance matching ``PIL.Image.convert('L')``: ITU-R 601-2
    in PIL's fixed-point form L = (19595 R + 38470 G + 7471 B + 0x8000)
    >> 16; alpha is ignored, exactly as PIL's RGBA/LA -> L."""
    if mode == "P":
        if palette is None:
            raise ValueError("png: mode P requires a palette")
        arr = palette[arr[..., 0]]
        mode = "RGB"
    if mode in ("L", "LA"):
        return float(arr[..., 0].astype(np.float64).mean())
    r = arr[..., 0].astype(np.int64)
    g = arr[..., 1].astype(np.int64)
    b = arr[..., 2].astype(np.int64)
    l8 = (19595 * r + 38470 * g + 7471 * b + 0x8000) >> 16
    return float(l8.astype(np.float64).mean())
