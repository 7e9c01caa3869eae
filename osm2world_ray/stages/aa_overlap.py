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
edge-twin / corner-twin areas that share full edges resp. single corner
nodes with their base rect — exercising the short-circuit and the
common-node exclusion. Areas here are axis-aligned rings, so every
predicate vectorizes over the whole candidate-pair array (corner
coincidence counts, strict interval containment, the 8 vertical x
horizontal edge-intersection candidates); the same cell-bucket shuffle +
min-corner ownership dedup as ``stages/overlaps``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources import synth
from .overlaps import _candidate_pairs, bucket_of

#: docs carrying an edge-sharing twin / corner-touching twin of mention 0
EDGE_TWIN_MOD = 41
CORNER_TWIN_MOD = 43
#: node-proximity radius for the not-a-true-intersection exclusion
#: (reference: 0.01 m, OSMToMapDataConverter.java:676 — here degrees)
NODE_EPS = 0.01


def _sizes(akey: np.ndarray) -> np.ndarray:
    return 1.0 + (akey % 5)


def areas_from_mentions(batch: pa.Table) -> pa.Table:
    """mentions batch -> area rows (akey, minx, maxx, miny, maxy).

    akey = doc_id*8 + mention_idx (slots 5/6 = edge/corner twin of
    mention 0). All bbox expressions are written identically in the
    oracle SQL so twin edges coincide bit-exactly.
    """
    import pyarrow.compute as pc

    doc = pc.utf8_slice_codeunits(
        batch["url"], len(synth.URL_PREFIX), 99
    ).cast(pa.int64()).to_numpy()
    midx = batch["mention_idx"].to_numpy().astype(np.int64)
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    akey = doc * 8 + midx
    s = _sizes(akey)
    parts = [
        (akey, lon - synth.RLON * s, lon + synth.RLON * s,
         lat - synth.RLAT * s, lat + synth.RLAT * s)
    ]
    m0 = midx == 0
    s0 = _sizes(doc * 8)
    e = m0 & (doc % EDGE_TWIN_MOD == 0)
    if e.any():
        parts.append(
            (doc[e] * 8 + 5,
             lon[e] + synth.RLON * s0[e], lon[e] + synth.RLON * s0[e] * 3,
             lat[e] - synth.RLAT * s0[e], lat[e] + synth.RLAT * s0[e]))
    c = m0 & (doc % CORNER_TWIN_MOD == 0)
    if c.any():
        parts.append(
            (doc[c] * 8 + 6,
             lon[c] + synth.RLON * s0[c], lon[c] + synth.RLON * s0[c] * 3,
             lat[c] + synth.RLAT * s0[c], lat[c] + synth.RLAT * s0[c] * 3))
    return pa.table(
        {
            "akey": pa.array(np.concatenate([p[0] for p in parts])),
            "minx": pa.array(np.concatenate([p[1] for p in parts])),
            "maxx": pa.array(np.concatenate([p[2] for p in parts])),
            "miny": pa.array(np.concatenate([p[3] for p in parts])),
            "maxy": pa.array(np.concatenate([p[4] for p in parts])),
        }
    )


def fan_out_area_cells(batch: pa.Table, *, r: int = 5) -> pa.Table:
    """bbox cover fan-out with per-row extents + bucket key."""
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
        .append_column("bucket", pa.array(bucket_of(cell)))
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


def pairwise_aa_typed(group: pd.DataFrame) -> pd.DataFrame:
    """Per-bucket typed area x area join with min-corner ownership."""
    empty = pa.table(
        {
            "akey": pa.array([], type=pa.int64()),
            "bkey": pa.array([], type=pa.int64()),
            "ov_type": pa.array([], type=pa.string()),
        }
    )
    if len(group) < 2:
        return empty
    cell = group["cell"].to_numpy(dtype=np.int64)
    akey = group["akey"].to_numpy(dtype=np.int64)
    order = np.lexsort((akey, cell))
    g = group.iloc[order]
    cell = cell[order]
    akey = akey[order]
    minx = g["minx"].to_numpy()
    maxx = g["maxx"].to_numpy()
    miny = g["miny"].to_numpy()
    maxy = g["maxy"].to_numpy()
    cell_ix = g["cell_ix"].to_numpy(dtype=np.int64)
    cell_iy = g["cell_iy"].to_numpy(dtype=np.int64)
    scale_row = np.ldexp(1.0, (cell >> 58).astype(np.int64))
    ii, jj, large = _candidate_pairs(cell)
    for s, e in large:
        bi, bj = np.meshgrid(np.arange(s, e), np.arange(s, e), indexing="ij")
        m = bi.ravel() < bj.ravel()
        ii = np.concatenate([ii, bi.ravel()[m]])
        jj = np.concatenate([jj, bj.ravel()[m]])
    if len(ii) == 0:
        return empty
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
        (np.floor((ox + 180.0) * scale_row[ii]).astype(np.int64) == cell_ix[ii])
        & (np.floor((oy + 90.0) * scale_row[ii]).astype(np.int64) == cell_iy[ii])
    )
    ii, jj = ii[own], jj[own]
    swap = akey[ii] > akey[jj]
    ii, jj = np.where(swap, jj, ii), np.where(swap, ii, jj)
    code = _classify(
        minx[ii], maxx[ii], miny[ii], maxy[ii],
        minx[jj], maxx[jj], miny[jj], maxy[jj],
    )
    keep = code > 0
    ii, jj, code = ii[keep], jj[keep], code[keep]
    # orient CONTAIN pairs contained-first (MapOverlapAA(inner, outer))
    inner_first = code == 3
    out_a = np.where(inner_first, akey[jj], akey[ii])
    out_b = np.where(inner_first, akey[ii], akey[jj])
    names = np.array(["", "SHARE_SEGMENT", "CONTAIN", "CONTAIN", "INTERSECT"])
    from .overlaps import _df_to_arrow
    return _df_to_arrow(pd.DataFrame(
        {
            "akey": out_a,
            "bkey": out_b,
            "ov_type": names[code],
        }
    ))


def overlap_aa(mentions_ds):
    areas = mentions_ds.map_batches(areas_from_mentions, batch_format="pyarrow")
    fanned = areas.map_batches(fan_out_area_cells, batch_format="pyarrow")
    return fanned.groupby("bucket").map_groups(
        pairwise_aa_typed, batch_format="pandas"
    )


def fan_out_area_cells_salted(batch: pa.Table, hot_cells: np.ndarray, *,
                              r: int = 5, r_hot: int = 6) -> pa.Table:
    """Skew-aware area fan-out: assignments landing in a HOT cell are
    refined to ``r_hot`` sub-cells (same partition invariant as
    ``tile_assign.fan_out_cells_salted``: hot parents wholly replaced
    by their children, ownership evaluates at each row's own packed
    resolution, so every pair is still emitted exactly once)."""
    base = fan_out_area_cells(batch, r=r)
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
    df = hot_src.to_pandas()
    keep = df.reset_index().drop_duplicates(["akey"])["index"].to_numpy()
    hot_src = hot_src.take(pa.array(np.sort(keep)))
    fine = fan_out_area_cells(hot_src, r=r_hot)
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

    def partial(b: pa.Table) -> pa.Table:
        fanned = fan_out_area_cells(b, r=r)
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


def overlap_aa_salted(mentions_ds, *, threshold: int = 50):
    """overlap_aa with the hot-cell salting pre-pass (dense-cluster
    cells' O(n^2) pair space split across 4^(r_hot-r) sub-keys);
    output identical to the unsalted join (same oracle)."""
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
    def fan(b: pa.Table) -> pa.Table:
        return fan_out_area_cells_salted(b, ray.get(hot_ref), r=5, r_hot=6)

    fanned = areas.map_batches(fan, batch_format="pyarrow")
    return fanned.groupby("bucket").map_groups(
        pairwise_aa_typed, batch_format="pandas"
    )
