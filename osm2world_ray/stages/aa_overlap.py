"""Area x area typed overlap join (``addOverlapBetween(MapArea, MapArea)``).

Reference semantics (``OSMToMapDataConverter.java:623-718``):

1. *shared segment short-circuit*: if any segment of area1 shares both
   nodes with a segment of area2 -> ``SHARE_SEGMENT``, stop (:628-645).
2. otherwise compute outline intersection positions, discarding any
   within 0.01 of a node common to both areas (touch-at-node is not a
   true intersection, :658-685), and bidirectional outer-ring
   containment (:687-694).
3. emission priority: contains1 -> ``CONTAIN`` (contained area first in
   the overlap), else contains2 -> ``CONTAIN``, else ``INTERSECT``
   (:698-714).

Engine shape: the area table is the mention footprints with per-area
size factors (so containment actually occurs) plus deterministic
edge-twin / corner-twin areas (shared full edges / single corner
nodes exercising the short-circuit and the common-node exclusion),
ROTATED diamond outlines and CONCAVE L outlines. Outlines travel
through the shuffle as a parametric ``cls`` + bbox (the three synth
families are bbox-derivable — arbitrary-ring inputs would ship ring
vertex list columns instead and feed the same padded-array kernel);
the classifier itself (``classify_ring_pairs``) is fully general: it
works on padded per-row vertex arrays of ANY simple ring, with the
axis-aligned rect pairs short-cut through the interval fast path.
Same cell-bucket shuffle + min-corner ownership dedup as
``stages/overlaps``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo.segments import segment_intersection
from ..sources import synth
from .overlaps import bucket_groups, _candidate_pairs, _sweep_pair_chunks, bucket_of

#: candidate pairs classified per chunk of this size: bounds the ring
#: padding matrices (~chunk x 8 verts x 4 arrays x 8 B = 256 MB) and
#: the pair-index/mask intermediates regardless of bucket density —
#: the sf0.1x16 replicated audit OOMed a worker (10 GB anon) when the
#: whole 256x-grown pair space was classified at once
_PAIR_CHUNK = 1 << 20

#: docs carrying an edge-sharing twin / corner-touching twin of mention 0
EDGE_TWIN_MOD = 41
CORNER_TWIN_MOD = 43
#: docs carrying a rotated-diamond / concave-L outline near mention 0
DIAMOND_MOD = 23
L_MOD = 29
#: node-proximity radius for the not-a-true-intersection exclusion
#: (reference: 0.01 m, OSMToMapDataConverter.java:676 — here degrees)
NODE_EPS = 0.01
#: max ring vertices of the padded kernel arrays (6 = concave L)
_W = 6


def _sizes(akey: np.ndarray) -> np.ndarray:
    return 1.0 + (akey % 5)


def areas_from_mentions(batch: pa.Table) -> pa.Table:
    """mentions batch -> area rows (akey, cls, minx, maxx, miny, maxy).

    akey = doc_id*16 + slot (slots 0-4 = mention rects, 5/6 =
    edge/corner twin of mention 0, 7 = rotated diamond, 8 = concave L).
    cls: 0 rect, 1 diamond inscribed in the bbox, 2 L (bbox minus its
    NE quadrant). All expressions are written identically in the oracle
    SQL so twin edges coincide bit-exactly.
    """
    import pyarrow.compute as pc

    doc = pc.utf8_slice_codeunits(
        batch["url"], len(synth.URL_PREFIX), 99
    ).cast(pa.int64()).to_numpy()
    midx = batch["mention_idx"].to_numpy().astype(np.int64)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    akey = doc * 16 + midx
    s = _sizes(akey)
    parts = [
        (akey, 0, lon - synth.RLON * s, lon + synth.RLON * s,
         lat - synth.RLAT * s, lat + synth.RLAT * s)
    ]
    m0 = midx == 0
    s0 = _sizes(doc * 16)
    e = m0 & (doc % EDGE_TWIN_MOD == 0)
    if e.any():
        parts.append(
            (doc[e] * 16 + 5, 0,
             lon[e] + synth.RLON * s0[e], lon[e] + synth.RLON * s0[e] * 3,
             lat[e] - synth.RLAT * s0[e], lat[e] + synth.RLAT * s0[e]))
    c = m0 & (doc % CORNER_TWIN_MOD == 0)
    if c.any():
        parts.append(
            (doc[c] * 16 + 6, 0,
             lon[c] + synth.RLON * s0[c], lon[c] + synth.RLON * s0[c] * 3,
             lat[c] + synth.RLAT * s0[c], lat[c] + synth.RLAT * s0[c] * 3))
    d = m0 & (doc % DIAMOND_MOD == 0)
    if d.any():
        # diamond centered on mention 0, radius between the rect's half
        # extents -> rotated edges genuinely cross the rect outline
        parts.append(
            (doc[d] * 16 + 7, 1,
             lon[d] - 0.015 * s0[d], lon[d] + 0.015 * s0[d],
             lat[d] - 0.015 * s0[d], lat[d] + 0.015 * s0[d]))
    el = m0 & (doc % L_MOD == 0)
    if el.any():
        # concave L overlapping the rect's east edge
        parts.append(
            (doc[el] * 16 + 8, 2,
             lon[el] + 0.01 * s0[el], lon[el] + 0.05 * s0[el],
             lat[el] - 0.005 * s0[el], lat[el] + 0.03 * s0[el]))
    return pa.table(
        {
            "akey": pa.array(np.concatenate([p[0] for p in parts])),
            "cls": pa.array(np.concatenate(
                [np.full(len(p[0]), p[1], dtype=np.int64) for p in parts]
            )),
            "minx": pa.array(np.concatenate([p[2] for p in parts])),
            "maxx": pa.array(np.concatenate([p[3] for p in parts])),
            "miny": pa.array(np.concatenate([p[4] for p in parts])),
            "maxy": pa.array(np.concatenate([p[5] for p in parts])),
        }
    )


def _ring_arrays(cls, minx, maxx, miny, maxy):
    """Parametric outline families -> padded CCW vertex arrays.

    Returns ``(X, Y, nv)`` with shapes (n, _W): pad slots repeat the
    last real vertex (every consumer masks by ``nv``). Arbitrary-ring
    inputs would build these arrays from list columns directly.
    """
    n = len(cls)
    minx = np.asarray(minx, dtype=np.float64)
    maxx = np.asarray(maxx, dtype=np.float64)
    miny = np.asarray(miny, dtype=np.float64)
    maxy = np.asarray(maxy, dtype=np.float64)
    xm = (minx + maxx) / 2.0
    ym = (miny + maxy) / 2.0
    X = np.empty((n, _W))
    Y = np.empty((n, _W))
    # rect (cls 0): CCW from the min corner
    for i, (vx, vy) in enumerate(
        [(minx, miny), (maxx, miny), (maxx, maxy), (minx, maxy),
         (minx, maxy), (minx, maxy)]
    ):
        X[:, i] = vx
        Y[:, i] = vy
    d = cls == 1
    if d.any():
        for i, (vx, vy) in enumerate(
            [(xm, miny), (maxx, ym), (xm, maxy), (minx, ym),
             (minx, ym), (minx, ym)]
        ):
            X[d, i] = vx[d]
            Y[d, i] = vy[d]
    el = cls == 2
    if el.any():
        for i, (vx, vy) in enumerate(
            [(minx, miny), (maxx, miny), (maxx, ym), (xm, ym),
             (xm, maxy), (minx, maxy)]
        ):
            X[el, i] = vx[el]
            Y[el, i] = vy[el]
    nv = np.where(cls == 2, 6, 4).astype(np.int64)
    return X, Y, nv


def classify_ring_pairs(AX, AY, ANV, BX, BY, BNV):
    """General typed overlap classification for arbitrary simple-ring
    pairs (padded vertex arrays), exactly mirroring
    ``addOverlapBetween(MapArea, MapArea)``:

    - SHARE_SEGMENT: some edge pair shares both nodes (:628-645)
    - intersects: some getTrueLineSegmentIntersection position >= 0.01
      from every common node (:658-685)
    - contains: every vertex of one ring is a vertex of the other OR
      inside it by even-odd ray cast (PolygonShapeXZ.contains(p),
      :687-694) — checked on VERTICES only, exactly like the reference
      (its own FIXME acknowledges outline-crossing containment)
    - priority: share > contains1 (b in a) > contains2 (a in b) >
      intersect (:698-714)

    Returns int codes: 0 none, 1 SHARE_SEGMENT, 2 CONTAIN(a in b),
    3 CONTAIN(b in a), 4 INTERSECT.
    """
    n, W = AX.shape
    sl = np.arange(W)[None, :]
    avm = sl < ANV[:, None]
    bvm = sl < BNV[:, None]
    AX2 = np.take_along_axis(AX, (sl + 1) % ANV[:, None], axis=1)
    AY2 = np.take_along_axis(AY, (sl + 1) % ANV[:, None], axis=1)
    BX2 = np.take_along_axis(BX, (sl + 1) % BNV[:, None], axis=1)
    BY2 = np.take_along_axis(BY, (sl + 1) % BNV[:, None], axis=1)
    # common nodes: coordinate-identical vertex pairs (the synthetic
    # stand-in for the reference's node-identity adjacency)
    veq = (
        (AX[:, :, None] == BX[:, None, :])
        & (AY[:, :, None] == BY[:, None, :])
        & avm[:, :, None]
        & bvm[:, None, :]
    )
    common_a = veq.any(axis=2)  # (n, W) a-vertices shared with b
    a_vert_shared = common_a
    b_vert_shared = veq.any(axis=1)
    share = np.zeros(n, dtype=bool)
    true_any = np.zeros(n, dtype=bool)
    for i in range(W):
        ax1, ay1, ax2, ay2 = AX[:, i], AY[:, i], AX2[:, i], AY2[:, i]
        for j in range(W):
            bx1, by1, bx2, by2 = BX[:, j], BY[:, j], BX2[:, j], BY2[:, j]
            em = avm[:, i] & bvm[:, j]
            share |= em & (
                ((ax1 == bx1) & (ay1 == by1) & (ax2 == bx2) & (ay2 == by2))
                | ((ax1 == bx2) & (ay1 == by2) & (ax2 == bx1) & (ay2 == by1))
            )
            sep = (
                ((ax1 == bx1) & (ay1 == by1)) | ((ax1 == bx2) & (ay1 == by2))
                | ((ax2 == bx1) & (ay2 == by1)) | ((ax2 == bx2) & (ay2 == by2))
            )
            m, ix, iy = segment_intersection(
                ax1, ay1, ax2, ay2, bx1, by1, bx2, by2, true_only=False
            )
            m &= em & ~sep
            hit = np.flatnonzero(m)
            if len(hit):
                # true intersection: >= NODE_EPS from every common node
                d2 = (ix[hit][:, None] - AX[hit]) ** 2 + (
                    iy[hit][:, None] - AY[hit]
                ) ** 2
                d2 = np.where(common_a[hit], d2, np.inf)
                true_any[hit[d2.min(axis=1) >= NODE_EPS * NODE_EPS]] = True
    b_in_a = _verts_inside_all(
        BX, BY, bvm, b_vert_shared, AX, AY, AX2, AY2, avm
    )
    a_in_b = _verts_inside_all(
        AX, AY, avm, a_vert_shared, BX, BY, BX2, BY2, bvm
    )
    out = np.zeros(n, dtype=np.int64)
    out[true_any] = 4
    out[a_in_b] = 2
    out[b_in_a] = 3  # contains1 wins a (theoretical) mutual containment
    out[share] = 1
    return out


def _verts_inside_all(PX, PY, pvm, p_shared, X, Y, X2, Y2, em):
    """All masked vertices (PX, PY) are shared-with or inside the ring
    (X, Y): per-row even-odd ray cast (same crossing rule as
    ``geo.pip.points_in_ring``) over masked edges."""
    inside = np.zeros(PX.shape, dtype=bool)
    for i in range(PX.shape[1]):
        x1 = X[:, i][:, None]
        y1 = Y[:, i][:, None]
        x2 = X2[:, i][:, None]
        y2 = Y2[:, i][:, None]
        crosses = (y1 > PY) != (y2 > PY)
        with np.errstate(divide="ignore", invalid="ignore"):
            xint = (x2 - x1) * (PY - y1) / (y2 - y1) + x1
        inside ^= crosses & (PX < xint) & em[:, i][:, None]
    return ((inside | p_shared) | ~pvm).all(axis=1)


def fan_out_area_cells(batch: pa.Table, *, r: int = 5, n_buckets: int) -> pa.Table:
    """bbox cover fan-out with per-row extents + bucket key
    (``n_buckets`` driver-resolved, see overlaps.bucket_of)."""
    from ..geo import tiles

    minx = batch["minx"].to_numpy()
    maxx = batch["maxx"].to_numpy()
    miny = batch["miny"].to_numpy()
    maxy = batch["maxy"].to_numpy()
    scale = np.float64(1 << r)
    ix0 = np.floor((minx + 180.0) * scale).astype(np.int64)
    ix1 = np.floor((maxx + 180.0) * scale).astype(np.int64)
    iy0 = np.floor((miny + 90.0) * scale).astype(np.int64)
    iy1 = np.floor((maxy + 90.0) * scale).astype(np.int64)
    row_idx, ix, iy = tiles.fan_out_tile_range(ix0, iy0, ix1, iy1)
    out = batch.take(pa.array(row_idx))
    cell = (np.int64(r) << 58) | (ix << 29) | iy
    return (
        out.append_column("cell", pa.array(cell))
        .append_column("cell_ix", pa.array(ix))
        .append_column("cell_iy", pa.array(iy))
        .append_column("bucket", pa.array(bucket_of(cell, n_buckets)))
    )


def _classify(aminx, amaxx, aminy, amaxy, bminx, bmaxx, bminy, bmaxy):
    """Vectorized reference classification for rect-ring pairs.

    Returns int codes: 0 none, 1 SHARE_SEGMENT, 2 CONTAIN(a in b),
    3 CONTAIN(b in a), 4 INTERSECT.
    """
    n = len(aminx)
    ax = np.stack([aminx, aminx, amaxx, amaxx], axis=1)
    ay = np.stack([aminy, amaxy, aminy, amaxy], axis=1)
    bx = np.stack([bminx, bminx, bmaxx, bmaxx], axis=1)
    by = np.stack([bminy, bmaxy, bminy, bmaxy], axis=1)
    # corner coincidence counts + the (single) common corner position
    eq = (ax[:, :, None] == bx[:, None, :]) & (ay[:, :, None] == by[:, None, :])
    ncommon = eq.sum(axis=(1, 2))
    share = ncommon >= 2  # two shared nodes = a shared segment
    # common corner (first match) for the 0.01 exclusion
    has_common = ncommon >= 1
    flat = eq.reshape(n, 16)
    first = np.argmax(flat, axis=1)
    ci = first // 4
    cx = np.take_along_axis(ax, ci[:, None], axis=1)[:, 0]
    cy = np.take_along_axis(ay, ci[:, None], axis=1)[:, 0]
    # strict bidirectional containment (outer-ring PIP equivalent)
    a_in_b = (bminx < aminx) & (amaxx < bmaxx) & (bminy < aminy) & (amaxy < bmaxy)
    b_in_a = (aminx < bminx) & (bmaxx < amaxx) & (aminy < bminy) & (bmaxy < amaxy)
    # outline intersection positions: vertical edges of one rect x
    # horizontal edges of the other -> 8 candidate points
    intersects = np.zeros(n, dtype=bool)
    for vx_, vy0, vy1, hy_, hx0, hx1 in (
        # A vertical x B horizontal
        (ax[:, 0], aminy, amaxy, bminy, bminx, bmaxx),
        (ax[:, 0], aminy, amaxy, bmaxy, bminx, bmaxx),
        (ax[:, 2], aminy, amaxy, bminy, bminx, bmaxx),
        (ax[:, 2], aminy, amaxy, bmaxy, bminx, bmaxx),
        # B vertical x A horizontal
        (bx[:, 0], bminy, bmaxy, aminy, aminx, amaxx),
        (bx[:, 0], bminy, bmaxy, amaxy, aminx, amaxx),
        (bx[:, 2], bminy, bmaxy, aminy, aminx, amaxx),
        (bx[:, 2], bminy, bmaxy, amaxy, aminx, amaxx),
    ):
        valid = (hx0 <= vx_) & (vx_ <= hx1) & (vy0 <= hy_) & (hy_ <= vy1)
        far = ~has_common | (
            np.hypot(vx_ - cx, hy_ - cy) > NODE_EPS
        )  # not-a-true-intersection exclusion (:671-681)
        intersects |= valid & far
    out = np.zeros(n, dtype=np.int64)
    out[intersects] = 4
    out[b_in_a] = 3  # containment beats intersect (:698-706)
    out[a_in_b] = 2
    out[share] = 1  # short-circuit (:628-645)
    return out


def pairwise_aa_typed(group) -> pa.Table:
    """Per-bucket typed area x area join with min-corner ownership
    (Arrow or pandas group in, Arrow out)."""
    from .overlaps import col_np

    empty = pa.table(
        {
            "akey": pa.array([], type=pa.int64()),
            "bkey": pa.array([], type=pa.int64()),
            "ov_type": pa.array([], type=pa.string()),
        }
    )
    if len(group) < 2:
        return empty
    cell = col_np(group, "cell", np.int64)
    akey = col_np(group, "akey", np.int64)
    order = np.lexsort((akey, cell))
    cell = cell[order]
    akey = akey[order]
    cls = col_np(group, "cls", np.int64)[order]
    minx = col_np(group, "minx")[order]
    maxx = col_np(group, "maxx")[order]
    miny = col_np(group, "miny")[order]
    maxy = col_np(group, "maxy")[order]
    cell_ix = col_np(group, "cell_ix", np.int64)[order]
    cell_iy = col_np(group, "cell_iy", np.int64)[order]
    scale_row = np.ldexp(1.0, (cell >> 58).astype(np.int64))

    def classify_chunk(ii: np.ndarray, jj: np.ndarray):
        """Candidate pair chunk -> (out_a, out_b, code) survivors.
        Bounded intermediates: callers cap len(ii), so the ring
        padding matrices and boolean masks stay ~_PAIR_CHUNK-sized no
        matter how dense the bucket is (the sf0.1x16 replicated audit
        OOM-killed a reduce worker at 10 GB when this section ran over
        the partition's ENTIRE 256x-grown pair space at once)."""
        # candidate filter: touching-or-overlapping bboxes, distinct areas
        cand = (
            (minx[ii] <= maxx[jj]) & (minx[jj] <= maxx[ii])
            & (miny[ii] <= maxy[jj]) & (miny[jj] <= maxy[ii])
            & (akey[ii] != akey[jj])
        )
        ii, jj = ii[cand], jj[cand]
        # min-corner ownership over the (possibly degenerate) intersection
        ox = np.maximum(minx[ii], minx[jj])
        oy = np.maximum(miny[ii], miny[jj])
        own = (
            (np.floor((ox + 180.0) * scale_row[ii]).astype(np.int64)
             == cell_ix[ii])
            & (np.floor((oy + 90.0) * scale_row[ii]).astype(np.int64)
               == cell_iy[ii])
        )
        ii, jj = ii[own], jj[own]
        swap = akey[ii] > akey[jj]
        ii, jj = np.where(swap, jj, ii), np.where(swap, ii, jj)
        # axis-aligned rect pairs take the interval fast path; any pair
        # involving a rotated/concave outline goes through the general
        # padded-ring kernel (identical classification on rects — tested)
        code = np.zeros(len(ii), dtype=np.int64)
        rect_pair = (cls[ii] == 0) & (cls[jj] == 0)
        r = np.flatnonzero(rect_pair)
        if len(r):
            code[r] = _classify(
                minx[ii[r]], maxx[ii[r]], miny[ii[r]], maxy[ii[r]],
                minx[jj[r]], maxx[jj[r]], miny[jj[r]], maxy[jj[r]],
            )
        gidx = np.flatnonzero(~rect_pair)
        if len(gidx):
            ia, ib = ii[gidx], jj[gidx]
            AX, AY, ANV = _ring_arrays(
                cls[ia], minx[ia], maxx[ia], miny[ia], maxy[ia]
            )
            BX, BY, BNV = _ring_arrays(
                cls[ib], minx[ib], maxx[ib], miny[ib], maxy[ib]
            )
            code[gidx] = classify_ring_pairs(AX, AY, ANV, BX, BY, BNV)
        keep = code > 0
        ii, jj, code = ii[keep], jj[keep], code[keep]
        # orient CONTAIN pairs contained-first (MapOverlapAA(inner, outer))
        inner_first = code == 3
        out_a = np.where(inner_first, akey[jj], akey[ii])
        out_b = np.where(inner_first, akey[ii], akey[jj])
        return out_a, out_b, code

    outs = []
    ii0, jj0, large = _candidate_pairs(cell)
    for s in range(0, len(ii0), _PAIR_CHUNK):
        outs.append(classify_chunk(ii0[s:s + _PAIR_CHUNK],
                                    jj0[s:s + _PAIR_CHUNK]))
    del ii0, jj0
    for s, e in large:
        for I, J in _sweep_pair_chunks(minx, maxx, s, e):
            for t in range(0, len(I), _PAIR_CHUNK):
                outs.append(classify_chunk(I[t:t + _PAIR_CHUNK],
                                            J[t:t + _PAIR_CHUNK]))
    outs = [o for o in outs if len(o[0])]
    if not outs:
        return empty
    out_a = np.concatenate([o[0] for o in outs])
    out_b = np.concatenate([o[1] for o in outs])
    code = np.concatenate([o[2] for o in outs])
    names = np.array(["", "SHARE_SEGMENT", "CONTAIN", "CONTAIN", "INTERSECT"])
    return pa.table(
        {
            "akey": pa.array(out_a),
            "bkey": pa.array(out_b),
            "ov_type": pa.array(names[code], type=pa.string()),
        }
    )


def overlap_aa_unsalted(mentions_ds):
    """Plain (unsalted) variant — the pytest reference for the salted
    default; at scale the dense-cluster cells' O(n^2) pair space makes
    ``overlap_aa`` (salted) the production path."""
    from .overlaps import n_shuffle_buckets

    areas = mentions_ds.map_batches(areas_from_mentions, batch_format="pyarrow")
    fanned = areas.map_batches(
        fan_out_area_cells,
        batch_format="pyarrow",
        fn_kwargs={"n_buckets": n_shuffle_buckets()},
    )
    return bucket_groups(
        fanned, pairwise_aa_typed, batch_format="pyarrow"
    )


def fan_out_area_cells_salted(batch: pa.Table, hot_cells: np.ndarray, *,
                              r: int = 5, r_hot: int = 6,
                              n_buckets: int) -> pa.Table:
    """Skew-aware area fan-out: assignments landing in a HOT cell are
    refined to ``r_hot`` sub-cells (same partition invariant as
    ``tile_assign.fan_out_cells_salted``: hot parents wholly replaced
    by their children, ownership evaluates at each row's own packed
    resolution, so every pair is still emitted exactly once)."""
    base = fan_out_area_cells(batch, r=r, n_buckets=n_buckets)
    if len(hot_cells) == 0:
        return base
    hot_cells = np.asarray(hot_cells, dtype=np.int64)
    in_hot = np.isin(base["cell"].to_numpy(), hot_cells)
    cold = base.filter(pa.array(~in_hot))
    hot_idx = np.nonzero(in_hot)[0]
    if len(hot_idx) == 0:
        return cold
    hot_src = base.take(pa.array(hot_idx)).drop(
        ["cell", "cell_ix", "cell_iy", "bucket"]
    )
    _, first = np.unique(hot_src["akey"].to_numpy(), return_index=True)
    hot_src = hot_src.take(pa.array(np.sort(first)))
    fine = fan_out_area_cells(hot_src, r=r_hot, n_buckets=n_buckets)
    shift = r_hot - r
    parent = (
        (np.int64(r) << 58)
        | ((fine["cell_ix"].to_numpy() >> shift) << 29)
        | (fine["cell_iy"].to_numpy() >> shift)
    )
    fine = fine.filter(pa.array(np.isin(parent, hot_cells)))
    return pa.concat_tables([cold, fine])


def area_hot_cells(areas_ds, *, r: int = 5, threshold: int) -> np.ndarray:
    """Count pre-pass over the area fan-out (bounded hot set: at most
    total_assignments / threshold cells)."""
    import pyarrow.compute as pc
    import ray

    nb = 64  # count pre-pass only reads the cell column; any fixed count works

    def partial(b: pa.Table) -> pa.Table:
        fanned = fan_out_area_cells(b, r=r, n_buckets=nb)
        u, c = np.unique(fanned["cell"].to_numpy(), return_counts=True)
        return pa.table({"cell": pa.array(u), "n": pa.array(c.astype(np.int64))})

    parts = areas_ds.map_batches(partial, batch_format="pyarrow")

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by("cell").aggregate([("n", "sum")])
        return pa.table({"cell": g["cell"], "n": g["n_sum"]})

    refs = parts.repartition(1).map_batches(
        combine, batch_format="pyarrow", batch_size=None
    ).to_arrow_refs()
    tables = list(ray.get(refs))
    if not tables:
        return np.empty(0, dtype=np.int64)
    t = pa.concat_tables(tables)
    return t.filter(pc.greater(t["n"], threshold))["cell"].to_numpy().astype(np.int64)


def overlap_aa(mentions_ds, *, threshold: int = 50):
    """The registered area x area join: hot-cell salting pre-pass
    (dense-cluster cells' O(n^2) pair space split across 4^(r_hot-r)
    sub-keys); output identical to the unsalted variant (same oracle)."""
    import ray

    areas = mentions_ds.map_batches(
        areas_from_mentions, batch_format="pyarrow"
    ).materialize()
    hot = area_hot_cells(areas, r=5, threshold=threshold)
    hot_ref = ray.put(hot)

    # r_hot one level finer only: area footprints are up to ~6 base
    # cells wide, so each refinement level multiplies their fan-out ~2x
    # in each axis — deeper salting costs more in assignments than the
    # split O(n^2) saves (measured at sf0.1)
    from .overlaps import n_shuffle_buckets

    nb = n_shuffle_buckets()  # driver-resolved, captured by the closure

    def fan(b: pa.Table) -> pa.Table:
        return fan_out_area_cells_salted(b, ray.get(hot_ref), r=5, r_hot=6,
                                         n_buckets=nb)

    fanned = areas.map_batches(fan, batch_format="pyarrow")
    return bucket_groups(
        fanned, pairwise_aa_typed, batch_format="pyarrow"
    )
