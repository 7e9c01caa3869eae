"""Minimal WKB codec for Polygon / MultiPolygon (shapely-compatible).

The sandbox has no shapely, so boundary geometry travels as standard
ISO WKB ``binary`` columns (FIXTURES.md §2) encoded/decoded here.
Little-endian, geometry types 3 (Polygon) and 6 (MultiPolygon); rings
are (n,2) float64 arrays, first ring = outer, rest = holes.
"""

from __future__ import annotations

import struct

import numpy as np

_WKB_POLYGON = 3
_WKB_MULTIPOLYGON = 6


def encode_polygon(rings: list[np.ndarray]) -> bytes:
    """rings[0] = outer, rings[1:] = holes; rings need not be closed
    (the closing vertex is appended on encode, as consumers expect)."""
    out = [struct.pack("<BI", 1, _WKB_POLYGON), struct.pack("<I", len(rings))]
    for ring in rings:
        ring = np.asarray(ring, dtype=np.float64)
        if len(ring) and not np.array_equal(ring[0], ring[-1]):
            ring = np.vstack([ring, ring[:1]])
        out.append(struct.pack("<I", len(ring)))
        out.append(ring.astype("<f8").tobytes())
    return b"".join(out)


def encode_multipolygon(polygons: list[list[np.ndarray]]) -> bytes:
    out = [struct.pack("<BI", 1, _WKB_MULTIPOLYGON), struct.pack("<I", len(polygons))]
    for rings in polygons:
        out.append(encode_polygon(rings))
    return b"".join(out)


def _decode_polygon_body(buf: bytes, off: int) -> tuple[list[np.ndarray], int]:
    (nrings,) = struct.unpack_from("<I", buf, off)
    off += 4
    rings = []
    for _ in range(nrings):
        (npts,) = struct.unpack_from("<I", buf, off)
        off += 4
        ring = np.frombuffer(buf, dtype="<f8", count=npts * 2, offset=off).reshape(npts, 2)
        off += npts * 16
        rings.append(np.ascontiguousarray(ring))
    return rings, off


def decode(buf: bytes) -> list[list[np.ndarray]]:
    """Decode WKB -> list of polygons, each a list of rings (outer first).

    A Polygon decodes to a single-element list; MultiPolygon to one
    element per member polygon. Big-endian WKB is rejected (we only
    ever produce little-endian).
    """
    byte_order, gtype = struct.unpack_from("<BI", buf, 0)
    if byte_order != 1:
        raise ValueError("only little-endian WKB supported")
    off = 5
    if gtype == _WKB_POLYGON:
        rings, _ = _decode_polygon_body(buf, off)
        return [rings]
    if gtype == _WKB_MULTIPOLYGON:
        (npoly,) = struct.unpack_from("<I", buf, off)
        off += 4
        polys = []
        for _ in range(npoly):
            bo, gt = struct.unpack_from("<BI", buf, off)
            if bo != 1 or gt != _WKB_POLYGON:
                raise ValueError("multipolygon member must be LE polygon")
            rings, off = _decode_polygon_body(buf, off + 5)
            polys.append(rings)
        return polys
    raise ValueError(f"unsupported WKB geometry type {gtype}")
