"""Geocell index: an H3-analogue hierarchical lat/lon grid with k-ring.

The sandbox has no ``h3`` library, so the engine ships its own cell
scheme with the same *roles* H3 plays in the design (BASELINE.json
north_star): a uint64 cell id per point at a resolution, ``parent``
roll-up, and ``k_ring`` neighborhood expansion for kNN candidate
fetch — the analogue of the reference's 3x3 grid-cell probe in
``InverseDistanceWeightingInterpolator.java:14-90``.

Scheme: at resolution ``r`` the world is a regular grid of
``2**r`` cells per degree; ``ix = floor((lon+180) * 2**r)``,
``iy = floor((lat+90) * 2**r)``, packed as ``(r << 58) | (ix << 29) | iy``.
Deliberately simple enough to be re-expressed in ANSI SQL for the
DuckDB oracle.
"""

from __future__ import annotations

import numpy as np

_IX_BITS = 29
_IX_MASK = (1 << _IX_BITS) - 1


def cell_of(r: int, lat: np.ndarray, lon: np.ndarray) -> np.ndarray:
    """Vectorized point -> cell id at resolution r (0 <= r <= 20)."""
    if not (0 <= r <= 20):
        raise ValueError(f"resolution must be in [0,20], was {r}")
    lat = np.asarray(lat, dtype=np.float64)
    lon = np.asarray(lon, dtype=np.float64)
    scale = np.float64(1 << r)
    ix = np.floor((lon + 180.0) * scale).astype(np.int64)
    iy = np.floor((lat + 90.0) * scale).astype(np.int64)
    # clamp the degenerate upper edges (lon=180, lat=90) into range
    ix = np.clip(ix, 0, int(360 * scale) - 1)
    iy = np.clip(iy, 0, int(180 * scale) - 1)
    return (np.int64(r) << 58) | (ix << _IX_BITS) | iy


def unpack_cell(cell: np.ndarray):
    cell = np.asarray(cell, dtype=np.int64)
    r = cell >> 58
    ix = (cell >> _IX_BITS) & _IX_MASK
    iy = cell & _IX_MASK
    return r, ix, iy


def parent(cell: np.ndarray, r_to: int) -> np.ndarray:
    """Roll a cell up to a coarser resolution (H3 ``cell_to_parent``)."""
    r, ix, iy = unpack_cell(cell)
    shift = r - np.int64(r_to)
    if np.any(shift < 0):
        raise ValueError("parent resolution must be <= cell resolution")
    return (np.int64(r_to) << 58) | ((ix >> shift) << _IX_BITS) | (iy >> shift)


def k_ring(cell: np.ndarray, k: int):
    """Expand each cell to its (2k+1)^2 Chebyshev neighborhood.

    Returns ``(row_idx, cells)`` where ``row_idx[i]`` is the input row
    that produced ``cells[i]`` — the fan-out shape used to build kNN
    candidate lists. Neighbors are clamped at the lon/lat grid edges
    (no wraparound), matching a padded-bbox probe rather than a globe
    topology; dedup after clamping.
    """
    r, ix, iy = unpack_cell(cell)
    nrow = len(np.atleast_1d(ix))
    side = 2 * k + 1
    offs = np.arange(-k, k + 1, dtype=np.int64)
    dx = np.repeat(offs, side)
    dy = np.tile(offs, side)
    r_rep = np.repeat(np.atleast_1d(r), side * side)
    ix_all = (np.atleast_1d(ix)[:, None] + dx[None, :]).ravel()
    iy_all = (np.atleast_1d(iy)[:, None] + dy[None, :]).ravel()
    scale = np.left_shift(np.int64(1), np.atleast_1d(r))
    max_ix = np.repeat(360 * scale - 1, side * side)
    max_iy = np.repeat(180 * scale - 1, side * side)
    ix_all = np.clip(ix_all, 0, max_ix)
    iy_all = np.clip(iy_all, 0, max_iy)
    row_idx = np.repeat(np.arange(nrow, dtype=np.int64), side * side)
    cells = (r_rep << 58) | (ix_all << _IX_BITS) | iy_all
    return row_idx, cells


def cell_size_deg(r: int) -> float:
    """Edge length of a cell at resolution r, in degrees."""
    return 1.0 / float(1 << r)


def line_cells(r: int, x1, y1, x2, y2):
    """Vectorized segment -> crossed-cells traversal at resolution r.

    Returns ``(row_idx, ix, iy)`` with one output row per (segment,
    crossed cell), deduplicated. Cost is O(cells crossed) — linear in
    segment length — unlike a bbox fan-out, which is quadratic in
    extent (a 10-degree segment's bbox at r=5 covers ~10^5 cells; the
    line itself crosses ~6*10^2). This is the scale-safe assignment for
    the segment-intersection self-join: two truly intersecting
    segments always share the cell containing the intersection point,
    since that point lies on both of them.

    Method: collect the parametric t of every vertical and horizontal
    grid-line crossing plus t=0,1, lexsort within row, and sample the
    cell at each interval midpoint (x=lon, y=lat).
    """
    x1 = np.asarray(x1, dtype=np.float64)
    y1 = np.asarray(y1, dtype=np.float64)
    x2 = np.asarray(x2, dtype=np.float64)
    y2 = np.asarray(y2, dtype=np.float64)
    n = len(x1)
    if n == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e.copy(), e.copy()
    scale = np.float64(1 << r)
    fx1 = (x1 + 180.0) * scale
    fx2 = (x2 + 180.0) * scale
    fy1 = (y1 + 90.0) * scale
    fy2 = (y2 + 90.0) * scale
    ix1 = np.floor(fx1).astype(np.int64)
    ix2 = np.floor(fx2).astype(np.int64)
    iy1 = np.floor(fy1).astype(np.int64)
    iy2 = np.floor(fy2).astype(np.int64)

    def _crossings(f1, f2, i1, i2):
        lo = np.minimum(i1, i2)
        hi = np.maximum(i1, i2)
        cnt = hi - lo  # crossings at integer k in (lo, hi]
        total = int(cnt.sum())
        rows = np.repeat(np.arange(n, dtype=np.int64), cnt)
        starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
        local = np.arange(total, dtype=np.int64) - np.repeat(starts, cnt)
        k = (np.repeat(lo, cnt) + 1 + local).astype(np.float64)
        df = f2[rows] - f1[rows]
        t = (k - f1[rows]) / df
        return rows, t

    rx, tx = _crossings(fx1, fx2, ix1, ix2)
    ry, ty = _crossings(fy1, fy2, iy1, iy2)
    ends = np.arange(n, dtype=np.int64)
    rows_all = np.concatenate([ends, ends, rx, ry])
    ts_all = np.concatenate(
        [np.zeros(n), np.ones(n), np.clip(tx, 0.0, 1.0), np.clip(ty, 0.0, 1.0)]
    )
    order = np.lexsort((ts_all, rows_all))
    rows_s = rows_all[order]
    ts_s = ts_all[order]
    same = rows_s[1:] == rows_s[:-1]
    tm = (ts_s[1:] + ts_s[:-1]) * 0.5
    row_idx = rows_s[:-1][same]
    tm = tm[same]
    cx = np.floor(fx1[row_idx] + tm * (fx2[row_idx] - fx1[row_idx])).astype(np.int64)
    cy = np.floor(fy1[row_idx] + tm * (fy2[row_idx] - fy1[row_idx])).astype(np.int64)
    cx = np.clip(cx, 0, int(360 * scale) - 1)
    cy = np.clip(cy, 0, int(180 * scale) - 1)
    # dedup degenerate zero-length intervals at corner crossings: a
    # straight line never re-enters a cell, so duplicates are always
    # consecutive within a row
    if len(row_idx):
        keep = np.ones(len(row_idx), dtype=bool)
        keep[1:] = (
            (row_idx[1:] != row_idx[:-1])
            | (cx[1:] != cx[:-1])
            | (cy[1:] != cy[:-1])
        )
        row_idx, cx, cy = row_idx[keep], cx[keep], cy[keep]
    return row_idx, cx, cy
