"""Minimal pure-stdlib PNG codec (zlib + struct + numpy).

Public-knowledge format (RFC 2083 / W3C PNG spec): 8-byte signature,
length-tagged chunks with CRC32, IHDR geometry, zlib-compressed IDAT
scanlines with one filter byte per row (filters 0-4: None, Sub, Up,
Average, Paeth). Scope: bit depth 8, color types 0 (gray), 2 (RGB),
4 (gray+alpha), 6 (RGBA), no interlace, no palette — enough to retire
the multimodal decode stub (``stages/multimodal.py``) with a REAL
decoder in a container without PIL/ffmpeg.

Decoding unfilters row by row (the spec's data dependency), with the
per-row arithmetic vectorized in numpy; Sub/Paeth carry a true
left-neighbor dependency, so those rows fall back to a C-ish scalar
loop over x — still bounded by image width, never by dataset size.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_SIG = b"\x89PNG\r\n\x1a\n"
#: color type -> samples per pixel
_CHANNELS = {0: 1, 2: 3, 4: 2, 6: 4}


def _chunk(tag: bytes, payload: bytes) -> bytes:
    return (
        struct.pack(">I", len(payload)) + tag + payload
        + struct.pack(">I", zlib.crc32(tag + payload) & 0xFFFFFFFF)
    )


def encode_png(pixels: np.ndarray) -> bytes:
    """(h, w) or (h, w, c) uint8 -> PNG bytes (filter 0 rows; zlib
    level 6; deterministic for fixed input)."""
    px = np.asarray(pixels, dtype=np.uint8)
    if px.ndim == 2:
        px = px[:, :, None]
    h, w, c = px.shape
    color_type = {1: 0, 2: 4, 3: 2, 4: 6}[c]
    ihdr = struct.pack(">IIBBBBB", w, h, 8, color_type, 0, 0, 0)
    raw = np.empty((h, 1 + w * c), dtype=np.uint8)
    raw[:, 0] = 0  # filter type None per scanline
    raw[:, 1:] = px.reshape(h, w * c)
    idat = zlib.compress(raw.tobytes(), 6)
    return (
        _SIG + _chunk(b"IHDR", ihdr) + _chunk(b"IDAT", idat)
        + _chunk(b"IEND", b"")
    )


def _paeth_row(cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    out = cur.astype(np.int64)
    p = prev.astype(np.int64)
    for i in range(len(out)):
        a = out[i - bpp] if i >= bpp else 0
        b = p[i]
        cc = p[i - bpp] if i >= bpp else 0
        pa = abs(b - cc)
        pb = abs(a - cc)
        pc = abs(a + b - 2 * cc)
        if pa <= pb and pa <= pc:
            pred = a
        elif pb <= pc:
            pred = b
        else:
            pred = cc
        out[i] = (out[i] + pred) & 0xFF
    return out.astype(np.uint8)


def _sub_row(cur: np.ndarray, bpp: int) -> np.ndarray:
    out = cur.copy()
    for i in range(bpp, len(out)):
        out[i] = (int(out[i]) + int(out[i - bpp])) & 0xFF
    return out


def _avg_row(cur: np.ndarray, prev: np.ndarray, bpp: int) -> np.ndarray:
    out = cur.astype(np.int64)
    p = prev.astype(np.int64)
    for i in range(len(out)):
        a = out[i - bpp] if i >= bpp else 0
        out[i] = (out[i] + (a + p[i]) // 2) & 0xFF
    return out.astype(np.uint8)


def decode_png(data: bytes) -> tuple[int, int, int, np.ndarray]:
    """PNG bytes -> (width, height, channels, pixels (h, w, c) uint8).

    Raises ValueError on anything outside the supported scope — callers
    (per-row fault tolerance) turn that into an error row, never a
    task failure."""
    if data[:8] != _SIG:
        raise ValueError("not a PNG (bad signature)")
    pos = 8
    width = height = None
    color_type = bit_depth = interlace = None
    idat = bytearray()
    while pos + 8 <= len(data):
        (length,) = struct.unpack_from(">I", data, pos)
        tag = data[pos + 4 : pos + 8]
        payload = data[pos + 8 : pos + 8 + length]
        pos += 12 + length  # skip CRC (we trust in-memory fixtures)
        if tag == b"IHDR":
            width, height, bit_depth, color_type, _comp, _filt, interlace = (
                struct.unpack(">IIBBBBB", payload)
            )
        elif tag == b"IDAT":
            idat += payload
        elif tag == b"IEND":
            break
    if width is None:
        raise ValueError("missing IHDR")
    if bit_depth != 8:
        raise ValueError(f"unsupported bit depth {bit_depth}")
    if color_type not in _CHANNELS:
        raise ValueError(f"unsupported color type {color_type}")
    if interlace:
        raise ValueError("interlaced PNG not supported")
    c = _CHANNELS[color_type]
    stride = width * c
    raw = np.frombuffer(zlib.decompress(bytes(idat)), dtype=np.uint8)
    if len(raw) != height * (stride + 1):
        raise ValueError("IDAT size mismatch")
    raw = raw.reshape(height, stride + 1)
    out = np.empty((height, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(height):
        ftype = raw[y, 0]
        cur = raw[y, 1:]
        if ftype == 0:
            row = cur.copy()
        elif ftype == 1:
            row = _sub_row(cur, c)
        elif ftype == 2:
            row = (cur.astype(np.int64) + prev).astype(np.uint8)
        elif ftype == 3:
            row = _avg_row(cur, prev, c)
        elif ftype == 4:
            row = _paeth_row(cur, prev, c)
        else:
            raise ValueError(f"bad filter type {ftype}")
        out[y] = row
        prev = row
    return width, height, c, out.reshape(height, width, c)
