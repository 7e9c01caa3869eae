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
