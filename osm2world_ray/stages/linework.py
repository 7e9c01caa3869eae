"""Per-node / per-line geometry operators: angular adjacency sort,
equidistant point placement, seeded pseudo-random scattering.

References:
- angular sort: ``MapNode.sortLinesByAngle`` (``MapNode.java:61-83``) —
  segments around a node in stable rotational order;
- equidistribution: ``GeometryUtil.equallyDistributePointsAlong``
  (``GeometryUtil.java:548-583``), single-segment variant, including
  its sequential floating-point accumulation (replicated via running
  sums so the oracle's windowed SUM matches bit-for-bit);
- scattering: ``GeometryUtil.distributePointsOn``
  (``GeometryUtil.java:718-798``) — ``java.util.Random(seed)`` LCG,
  box slicing, 100 candidates per box, keep-if-contained. Seed = the
  element key (``TreeModule.java:545`` uses the area's id).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources import synth

# ---------------------------------------------------------------------------
# node adjacency with angular sort
# ---------------------------------------------------------------------------


def segment_incidences(batch: pa.Table) -> pa.Table:
    """Segment rows -> 2 incidence rows each: (url, node_idx, seg_idx,
    dx, dy) with (dx, dy) the segment direction AT the node (matching
    the per-node outgoing/incoming direction used by sortLinesByAngle).
    """
    x1 = batch["x1"].to_numpy()
    y1 = batch["y1"].to_numpy()
    x2 = batch["x2"].to_numpy()
    y2 = batch["y2"].to_numpy()
    seg = batch["seg_idx"].to_numpy()
    n = len(batch)
    idx = np.arange(n, dtype=np.int64)
    take = pa.array(np.concatenate([idx, idx]))
    return pa.table(
        {
            "url": batch.select(["url"]).take(take)["url"],
            "node_idx": pa.array(np.concatenate([seg, seg + 1])),
            "seg_idx": pa.array(np.concatenate([seg, seg])),
            "dx": pa.array(np.concatenate([x2 - x1, x1 - x2])),
            "dy": pa.array(np.concatenate([y2 - y1, y1 - y2])),
        }
    )


def angular_adjacency(group: pd.DataFrame) -> pd.DataFrame:
    """Bucket of incidence rows -> per (url, node) ordered incident
    segments: sorted by direction angle ``atan2(dx, dy)`` (VectorXZ
    x-from-north convention), seg_idx tiebreak; fully vectorized."""
    if len(group) == 0:
        import pyarrow as _pa
        return _pa.table(
            {
                "url": _pa.array([], type=_pa.string()),
                "node_idx": _pa.array([], type=_pa.int64()),
                "segs_csv": _pa.array([], type=_pa.string()),
            }
        )
    import pyarrow as _pa
    import pyarrow.compute as _pc

    from .overlaps import col_np, doc_ids_of

    node = col_np(group, "node_idx", np.int64)
    seg = col_np(group, "seg_idx", np.int64)
    ang = np.arctan2(col_np(group, "dx", np.float64),
                     col_np(group, "dy", np.float64))
    doc = doc_ids_of(group)
    order = np.lexsort((seg, ang, node, doc))
    node, seg, doc = node[order], seg[order], doc[order]
    key_change = np.ones(len(doc), dtype=bool)
    key_change[1:] = (doc[1:] != doc[:-1]) | (node[1:] != node[:-1])
    group_id = np.cumsum(key_change) - 1
    # per-group CSV join via Arrow C++ (binary_join over list slices)
    seg_str = _pc.cast(_pa.array(seg), _pa.string())
    offsets = np.concatenate(
        (np.nonzero(key_change)[0], [len(doc)])
    ).astype(np.int32)
    lists = _pa.ListArray.from_arrays(_pa.array(offsets), seg_str)
    csv = _pc.binary_join(lists, ",")
    firsts = np.nonzero(key_change)[0]
    url = _pc.binary_join_element_wise(
        synth.URL_PREFIX,
        _pc.cast(_pa.array(doc[firsts]), _pa.string()),
        "",
    )
    return _pa.table(
        {
            "url": url,
            "node_idx": _pa.array(node[firsts]),
            "segs_csv": csv,
        }
    )


# ---------------------------------------------------------------------------
# equidistant points along segments
# ---------------------------------------------------------------------------


def equidistribute(batch: pa.Table, *, preferred_distance: float,
                   points_at_start_and_end: bool = True) -> pa.Table:
    """Segment rows -> equidistant points (GeometryUtil.java:548-583).

    Parity notes: numSegments = Math.round(len/d) = floor(+0.5); point
    spacing = len/numSegments along the normalized direction. One
    deliberate deviation: points are placed by CLOSED FORM (start +
    i * step) instead of the reference's sequential accumulation — the
    reference itself flags accumulation as an fp-error source and
    avoids it in the polyline variant (``GeometryUtil.java:643-648``);
    closed form is also what a SQL oracle can reproduce bit-for-bit.
    Outputs in micro-degrees.

    ``points_at_start_and_end=False`` (``GeometryUtil.java:562-571``):
    numSegments points, the first half a step from the start
    (``lineStart.add(pointDiff.mult(0.5f))`` — halving is exact, so
    closed form ``start + (i + 0.5) * step`` matches the reference's
    accumulation for the same reordering-safety reason).
    """
    if len(batch) == 0:
        return pa.table(
            {
                "url": pa.array([], type=pa.string()),
                "seg_idx": pa.array([], type=pa.int64()),
                "point_idx": pa.array([], type=pa.int64()),
                "px_udeg": pa.array([], type=pa.int64()),
                "py_udeg": pa.array([], type=pa.int64()),
            }
        )
    x1 = batch["x1"].to_numpy()
    y1 = batch["y1"].to_numpy()
    x2 = batch["x2"].to_numpy()
    y2 = batch["y2"].to_numpy()
    dx = x1 - x2
    dy = y1 - y2
    length = np.sqrt(dx * dx + dy * dy)
    nseg = np.floor(length / preferred_distance + 0.5).astype(np.int64)
    if points_at_start_and_end:
        npts = np.where(nseg == 0, 0, nseg + 1)
    else:
        npts = nseg
    safe_len = np.where(length > 0, length, 1.0)
    point_distance = length / np.maximum(nseg, 1)
    ux = (x2 - x1) / safe_len * point_distance
    uy = (y2 - y1) / safe_len * point_distance

    total = int(npts.sum())
    row_idx = np.repeat(np.arange(len(npts), dtype=np.int64), npts)
    starts = np.concatenate(([0], np.cumsum(npts)[:-1]))
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, npts)
    offset = local if points_at_start_and_end else local + 0.5
    px = x1[row_idx] + offset * ux[row_idx]
    py = y1[row_idx] + offset * uy[row_idx]
    return pa.table(
        {
            "url": batch.select(["url"]).take(pa.array(row_idx))["url"],
            "seg_idx": batch.select(["seg_idx"]).take(pa.array(row_idx))["seg_idx"],
            "point_idx": pa.array(local),
            "px_udeg": pa.array(np.floor(px * 1e6 + 0.5).astype(np.int64)),
            "py_udeg": pa.array(np.floor(py * 1e6 + 0.5).astype(np.int64)),
        }
    )


# ---------------------------------------------------------------------------
# java.util.Random-parity seeded scattering
# ---------------------------------------------------------------------------

_LCG_MULT = 0x5DEECE66D
_LCG_ADD = 0xB
_LCG_MASK = (1 << 48) - 1


class JavaRandom:
    """Bit-exact ``java.util.Random`` (the public 48-bit LCG)."""

    def __init__(self, seed: int):
        self.seed = (seed ^ _LCG_MULT) & _LCG_MASK

    def _next(self, bits: int) -> int:
        self.seed = (self.seed * _LCG_MULT + _LCG_ADD) & _LCG_MASK
        return self.seed >> (48 - bits)

    def next_double(self) -> float:
        return ((self._next(26) << 27) + self._next(27)) * (2.0 ** -53)


POINTS_PER_BOX = 100

#: closed-form LCG: S_n = (A[n] * S_0 + C[n]) mod 2^48 — makes the
#: java.util.Random candidate stream random-ACCESSIBLE, so scattering
#: vectorizes over all candidates at once and the DuckDB oracle can
#: reproduce every draw from (seed, draw index) without iterating.
_MAX_DRAWS = 4096
_LCG_A = np.empty(_MAX_DRAWS + 1, dtype=np.uint64)
_LCG_C = np.empty(_MAX_DRAWS + 1, dtype=np.uint64)
_a, _c = 1, 0
for _n in range(_MAX_DRAWS + 1):
    _LCG_A[_n] = _a
    _LCG_C[_n] = _c
    _a = (_a * _LCG_MULT) & _LCG_MASK
    _c = (_c * _LCG_MULT + _LCG_ADD) & _LCG_MASK


_M24 = np.uint64((1 << 24) - 1)
_M48 = np.uint64(_LCG_MASK)


def _mulmod48(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """(a * b) mod 2^48 for uint64 arrays < 2^48, overflow-free via
    24-bit limb splitting."""
    a1, a0 = a >> np.uint64(24), a & _M24
    b1, b0 = b >> np.uint64(24), b & _M24
    mid = (a1 * b0 + a0 * b1) & _M24  # * 2^24 mod 2^48 keeps low 24 bits
    return ((mid << np.uint64(24)) + a0 * b0) & _M48


def lcg_states(s0: np.ndarray, n: np.ndarray) -> np.ndarray:
    """State of java.util.Random after n steps from scrambled seed s0."""
    return (_mulmod48(_LCG_A[n], s0) + _LCG_C[n]) & _M48


def distribute_points_on_rect(seed: int, min_x: float, min_z: float,
                              max_x: float, max_z: float,
                              density: float) -> list[tuple[float, float]]:
    """``distributePointsOn`` for a rectangle footprint
    (GeometryUtil.java:745-798): slice the bbox into boxes of
    ``sqrt(100/density)``, draw 100 candidate points per box from ONE
    ``Random(seed)`` stream (x then z), keep points inside the rect."""
    rand = JavaRandom(seed)
    size_x = max_x - min_x
    size_z = max_z - min_z
    box_size = np.sqrt(100.0 / density)
    result = []
    for box_z in range(int(size_z / box_size) + 1):
        for box_x in range(int(size_x / box_size) + 1):
            bx = min_x + box_size * box_x
            bz = min_z + box_size * box_z
            for _ in range(POINTS_PER_BOX):
                x = bx + box_size * rand.next_double()
                z = bz + box_size * rand.next_double()
                if min_x <= x <= max_x and min_z <= z <= max_z:
                    result.append((x, z))
    return result


class ScatterPoints:
    """mentions batch -> scattered points in each mention's footprint,
    seeded by the mention key (deterministic per row, like the forest
    scattering seeded by area id, ``TreeModule.java:545``).

    Bit-exact ``distribute_points_on_rect`` semantics, fully
    vectorized: every candidate draw is addressed by its closed-form
    LCG state (``lcg_states``), so the whole batch is one fan-out +
    numpy arithmetic instead of per-mention Python Random streams.
    """

    def __init__(self, *, density: float = 100.0 / (0.02 * 0.02)):
        self.density = density
        self.box_size = float(np.sqrt(100.0 / density))

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy()
        lon = batch["lon"].to_numpy()
        midx = batch["mention_idx"].to_numpy().astype(np.int64)
        doc = pa.compute.utf8_slice_codeunits(
            batch["url"], len(synth.URL_PREFIX), 99
        ).cast(pa.int64()).to_numpy()
        bs = self.box_size

        min_x = lon - synth.RLON
        max_x = lon + synth.RLON
        min_z = lat - synth.RLAT
        max_z = lat + synth.RLAT
        nbx = (
            (max_x - min_x) / bs
        ).astype(np.int64) + 1  # int() truncation == floor (positive)
        nbz = ((max_z - min_z) / bs).astype(np.int64) + 1
        seed = (doc * 4 + midx).astype(np.uint64)
        s0 = (seed ^ np.uint64(_LCG_MULT)) & _M48

        nc = nbx * nbz * POINTS_PER_BOX
        total = int(nc.sum())
        row = np.repeat(np.arange(len(nc), dtype=np.int64), nc)
        starts = np.concatenate(([0], np.cumsum(nc)[:-1]))
        g = np.arange(total, dtype=np.int64) - np.repeat(starts, nc)

        box = g // POINTS_PER_BOX
        box_x = box % nbx[row]
        # draws 4g+1..4g+4 hold (x_hi, x_lo, z_hi, z_lo)
        s4g = lcg_states(s0[row], (4 * g).astype(np.int64))

        def step(s):
            return (_mulmod48(np.uint64(_LCG_MULT), s) + np.uint64(_LCG_ADD)) & _M48

        s1 = step(s4g)
        s2 = step(s1)
        s3 = step(s2)
        s4 = step(s3)
        xd = (((s1 >> np.uint64(22)) << np.uint64(27))
              + (s2 >> np.uint64(21))).astype(np.float64) * (2.0 ** -53)
        zd = (((s3 >> np.uint64(22)) << np.uint64(27))
              + (s4 >> np.uint64(21))).astype(np.float64) * (2.0 ** -53)
        bx = min_x[row] + bs * box_x
        bz = min_z[row] + bs * (box // nbx[row])
        x = bx + bs * xd
        z = bz + bs * zd
        keep = (
            (min_x[row] <= x) & (x <= max_x[row])
            & (min_z[row] <= z) & (z <= max_z[row])
        )
        row_k, x_k, z_k = row[keep], x[keep], z[keep]
        # point_idx = rank among the mention's kept candidates (g order)
        kept_per_row = np.bincount(row_k, minlength=len(nc))
        k_starts = np.concatenate(([0], np.cumsum(kept_per_row)[:-1]))
        point_idx = np.arange(len(row_k), dtype=np.int64) - np.repeat(
            k_starts, kept_per_row
        )
        return pa.table(
            {
                "url": batch.select(["url"]).take(pa.array(row_k))["url"],
                "mention_idx": pa.array(midx[row_k]),
                "point_idx": pa.array(point_idx),
                "px_udeg": pa.array(np.floor(x_k * 1e6 + 0.5).astype(np.int64)),
                "py_udeg": pa.array(np.floor(z_k * 1e6 + 0.5).astype(np.int64)),
            }
        )
