"""Pure numpy+zlib PNG codec (encode + decode).

The reference's thumbnail bundles carry real PNG bytes inside ``.npz``
archives (``notebooks/preproc/textract_transformers/preproc.py:120-173``,
reader ``inference.py:236-275``).  This container has no PIL, but PNG is
just zlib-compressed filtered scanlines (RFC 2083), so the codec is
implemented directly: the engine's image payloads are REAL PNG files any
external tool can open, and the decode stage no longer needs a stub for
still images.

Supported: 8-bit depth, color types 0 (gray), 2 (RGB), 4 (gray+alpha),
6 (RGBA), non-interlaced, all five scanline filters (None/Sub/Up/
Average/Paeth).  The encoder writes any single filter type (0 by
default; 1-4 exist so decode of every filter path is exercised by
round-trip tests).  Chunk CRCs are written and verified (zlib.crc32 —
PNG's CRC-32 is the same polynomial).
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

PNG_SIGNATURE = b"\x89PNG\r\n\x1a\n"

_COLOR_TYPE_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}
_CHANNELS_COLOR_TYPE = {1: 0, 3: 2, 2: 4, 4: 6}


def _chunk(tag: bytes, body: bytes) -> bytes:
    return (struct.pack(">I", len(body)) + tag + body
            + struct.pack(">I", zlib.crc32(tag + body)))


def _filter_row(ftype: int, raw: np.ndarray, prev: np.ndarray,
                bpp: int) -> np.ndarray:
    """Apply filter ``ftype`` to one reconstructed row (encoder side)."""
    r = raw.astype(np.int64)
    left = np.zeros_like(r)
    left[bpp:] = r[:-bpp]
    up = prev.astype(np.int64)
    ul = np.zeros_like(up)
    ul[bpp:] = up[:-bpp]
    if ftype == 0:
        out = r
    elif ftype == 1:
        out = r - left
    elif ftype == 2:
        out = r - up
    elif ftype == 3:
        out = r - (left + up) // 2
    elif ftype == 4:
        p = left + up - ul
        pa, pb, pc = np.abs(p - left), np.abs(p - up), np.abs(p - ul)
        pred = np.where((pa <= pb) & (pa <= pc), left,
                        np.where(pb <= pc, up, ul))
        out = r - pred
    else:
        raise ValueError(f"bad filter type {ftype}")
    return (out % 256).astype(np.uint8)


def _unfilter_row(ftype: int, cur: np.ndarray, prev: np.ndarray,
                  bpp: int) -> np.ndarray:
    """Reconstruct one filtered scanline (decoder side)."""
    if ftype == 0:
        return cur.copy()
    if ftype == 2:
        return ((cur.astype(np.int64) + prev) % 256).astype(np.uint8)
    if ftype == 1:
        # Sub: recon[x] = raw[x] + recon[x-bpp] — a per-channel prefix
        # sum mod 256 (vectorized cumsum per channel lane):
        out = cur.astype(np.int64).copy()
        for off in range(bpp):
            lane = out[off::bpp]
            out[off::bpp] = np.cumsum(lane) % 256
        return out.astype(np.uint8)
    out = np.zeros_like(cur, dtype=np.int64)
    c = cur.astype(np.int64)
    p = prev.astype(np.int64)
    n = len(cur)
    if ftype == 3:  # Average — sequential in x (column loop, lane-wide)
        for x in range(n):
            left = out[x - bpp] if x >= bpp else 0
            out[x] = (c[x] + (left + p[x]) // 2) % 256
        return out.astype(np.uint8)
    if ftype == 4:  # Paeth — sequential in x
        for x in range(n):
            left = out[x - bpp] if x >= bpp else 0
            up = p[x]
            ul = p[x - bpp] if x >= bpp else 0
            pp = left + up - ul
            pa, pb, pc = abs(pp - left), abs(pp - up), abs(pp - ul)
            pred = left if (pa <= pb and pa <= pc) else (up if pb <= pc
                                                         else ul)
            out[x] = (c[x] + pred) % 256
        return out.astype(np.uint8)
    raise ValueError(f"bad filter type {ftype}")


def encode_png(arr: np.ndarray, filter_type: int = 0,
               compress_level: int = 6) -> bytes:
    """uint8 (H, W) or (H, W, C in {1,2,3,4}) array -> PNG bytes."""
    if arr.dtype != np.uint8:
        raise ValueError("encode_png expects uint8")
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, c = arr.shape
    color_type = _CHANNELS_COLOR_TYPE[c]
    flat = arr.reshape(h, w * c)
    prev = np.zeros(w * c, dtype=np.uint8)
    lines = []
    for y in range(h):
        lines.append(bytes([filter_type]))
        lines.append(_filter_row(filter_type, flat[y], prev, c).tobytes())
        prev = flat[y]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    return (PNG_SIGNATURE
            + _chunk(b"IHDR", ihdr)
            + _chunk(b"IDAT", zlib.compress(b"".join(lines), compress_level))
            + _chunk(b"IEND", b""))


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> uint8 (H, W, C) array (C per the file's color type)."""
    if not data.startswith(PNG_SIGNATURE):
        raise ValueError("not a PNG (bad signature)")
    pos = len(PNG_SIGNATURE)
    idat = []
    w = h = None
    color_type = None
    while pos < len(data):
        (length,) = struct.unpack(">I", data[pos:pos + 4])
        tag = data[pos + 4:pos + 8]
        body = data[pos + 8:pos + 8 + length]
        (crc,) = struct.unpack(">I", data[pos + 8 + length:pos + 12 + length])
        if zlib.crc32(tag + body) != crc:
            raise ValueError(f"bad CRC in {tag!r} chunk")
        pos += 12 + length
        if tag == b"IHDR":
            w, h, depth, color_type, comp, filt, interlace = struct.unpack(
                ">IIBBBBB", body)
            if depth != 8:
                raise ValueError(f"unsupported bit depth {depth}")
            if color_type not in _COLOR_TYPE_CHANNELS:
                raise ValueError(f"unsupported color type {color_type}")
            if interlace != 0:
                raise ValueError("interlaced PNG not supported")
        elif tag == b"IDAT":
            idat.append(body)
        elif tag == b"IEND":
            break
    if w is None:
        raise ValueError("missing IHDR")
    c = _COLOR_TYPE_CHANNELS[color_type]
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    stride = w * c
    if len(raw) != h * (stride + 1):
        raise ValueError("IDAT length mismatch")
    raw = raw.reshape(h, stride + 1)
    out = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        out[y] = _unfilter_row(int(raw[y, 0]), raw[y, 1:], prev, c)
        prev = out[y].astype(np.int64)
    return out.reshape(h, w, c)
