"""Ear-clipping triangulation of simple polygons (earcut semantics).

The reference triangulates via earcut4j with poly2tri/JTS fallbacks
(``TriangulationUtil.java:22-91``, ``Earcut4JTriangulationUtil.java``);
this is the standard ear-clipping algorithm (public knowledge; O(n^2)
worst case) on a single simple ring — the rasterization-prep kernel.
Polygons-with-holes triangulate ring-by-ring here (net area = outer
minus holes), matching how the engine's downstream area accounting
consumes them; hole-bridging earcut is a future extension.

Pure numpy/python, no external geometry libs.
"""

from __future__ import annotations

import numpy as np


def _area2(ring: np.ndarray) -> float:
    """Twice the signed area (shoelace; CCW positive)."""
    x = ring[:, 0]
    y = ring[:, 1]
    return float(np.dot(x, np.roll(y, -1)) - np.dot(np.roll(x, -1), y))


def _cross(o, a, b) -> float:
    return (a[0] - o[0]) * (b[1] - o[1]) - (a[1] - o[1]) * (b[0] - o[0])


def _point_in_triangle(p, a, b, c) -> bool:
    d1 = _cross(p, a, b)
    d2 = _cross(p, b, c)
    d3 = _cross(p, c, a)
    has_neg = (d1 < 0) or (d2 < 0) or (d3 < 0)
    has_pos = (d1 > 0) or (d2 > 0) or (d3 > 0)
    return not (has_neg and has_pos)


def earcut(ring: np.ndarray) -> np.ndarray:
    """Simple ring (n, 2), no closing duplicate -> (n-2, 3) vertex
    index triangles. Input may wind either way; output triangles are
    CCW in the input's index space."""
    n = len(ring)
    if n < 3:
        return np.empty((0, 3), dtype=np.int64)
    idx = list(range(n))
    if _area2(ring) < 0:  # normalize to CCW
        idx.reverse()
    tris = []
    guard = 0
    while len(idx) > 3 and guard < 2 * n * n:
        guard += 1
        m = len(idx)
        ear_found = False
        for k in range(m):
            i0, i1, i2 = idx[(k - 1) % m], idx[k], idx[(k + 1) % m]
            a, b, c = ring[i0], ring[i1], ring[i2]
            if _cross(a, b, c) <= 0:
                continue  # reflex or degenerate corner
            # no other remaining vertex inside the candidate ear
            ok = True
            for j in idx:
                if j in (i0, i1, i2):
                    continue
                if _point_in_triangle(ring[j], a, b, c):
                    ok = False
                    break
            if ok:
                tris.append((i0, i1, i2))
                idx.pop(k)
                ear_found = True
                break
        if not ear_found:  # degenerate input; clip blindly to terminate
            tris.append((idx[0], idx[1], idx[2]))
            idx.pop(1)
    if len(idx) == 3:
        tris.append((idx[0], idx[1], idx[2]))
    return np.array(tris, dtype=np.int64)


def triangle_areas(ring: np.ndarray, tris: np.ndarray) -> np.ndarray:
    """Unsigned area per triangle."""
    a = ring[tris[:, 0]]
    b = ring[tris[:, 1]]
    c = ring[tris[:, 2]]
    return 0.5 * np.abs(
        (b[:, 0] - a[:, 0]) * (c[:, 1] - a[:, 1])
        - (b[:, 1] - a[:, 1]) * (c[:, 0] - a[:, 0])
    )
