"""Nearest-landmark join: geocell ring expansion + brute-force baseline.

Reference semantics: the attachment nearest-surface join
(``O2WConverterImpl.java:243-299``) — probe a spatial index around the
query, filter candidates by a compatibility predicate, pick the
min-distance one — and the IDW interpolator's 3x3 grid-cell probe
(``InverseDistanceWeightingInterpolator.java:14-90``), which is the
reference's own k-ring precedent.

Exactness: ring expansion continues until ``best_dist <= k*cell_size``
(any landmark in an unexplored cell is at Chebyshev cell distance > k,
hence at least k*cell_size away), so the result equals the true global
argmin — required for oracle equality. Distance is squared planar
degrees ``(dlat^2 + dlon^2)`` with ties broken by landmark_id, the
exact expression the oracle SQL uses.
"""

from __future__ import annotations

from ._util import resolve_ref as _resolve

import numpy as np
import pyarrow as pa


class LandmarkIndex:
    """Cell-bucketed landmark arrays (CSR layout, built once per actor)."""

    def __init__(self, landmarks: pa.Table, r: int = 4):
        self.r = r
        self.scale = np.float64(1 << r)
        self.cell_size = 1.0 / float(1 << r)
        self.ids = landmarks["landmark_id"].to_numpy().astype(np.int64)
        self.lat = landmarks["lat"].to_numpy().astype(np.float64)
        self.lon = landmarks["lon"].to_numpy().astype(np.float64)
        self.kind = landmarks["kind"].to_numpy().astype(np.int64)
        ix = np.floor((self.lon + 180.0) * self.scale).astype(np.int64)
        iy = np.floor((self.lat + 90.0) * self.scale).astype(np.int64)
        self.ny = int(180 * self.scale)
        flat = ix * self.ny + iy
        order = np.argsort(flat, kind="stable")
        self.flat_sorted = flat[order]
        self.entry_sorted = order

    def cells_of(self, lat: np.ndarray, lon: np.ndarray):
        ix = np.floor((lon + 180.0) * self.scale).astype(np.int64)
        iy = np.floor((lat + 90.0) * self.scale).astype(np.int64)
        return ix, iy

    def gather(self, cell_flat: np.ndarray):
        """flat cell ids -> (which_input_row, landmark_positions)."""
        s = np.searchsorted(self.flat_sorted, cell_flat, side="left")
        e = np.searchsorted(self.flat_sorted, cell_flat, side="right")
        counts = e - s
        total = int(counts.sum())
        src = np.repeat(np.arange(len(cell_flat), dtype=np.int64), counts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        pos = self.entry_sorted[np.repeat(s, counts) + local]
        return src, pos


def _ring_offsets(k: int):
    """Cell offsets at Chebyshev distance exactly k."""
    if k == 0:
        return np.zeros((1, 2), dtype=np.int64)
    xs, ys = [], []
    for dx in range(-k, k + 1):
        for dy in range(-k, k + 1):
            if max(abs(dx), abs(dy)) == k:
                xs.append(dx)
                ys.append(dy)
    return np.stack([np.asarray(xs, dtype=np.int64), np.asarray(ys, dtype=np.int64)], axis=1)


class NearestLandmark:
    """Actor-pool stage: mentions batch -> nearest landmark per mention.

    ``kind_filter=True`` restricts candidates to landmarks whose kind
    equals the mention's ``kind`` column (compatible-type matching,
    ``O2WConverterImpl.java:262-272``).
    """

    def __init__(self, landmarks_ref, *, r: int = 4, kind_filter: bool = False,
                 max_k: int = 512):
        self.index = LandmarkIndex(_resolve(landmarks_ref), r=r)
        self.kind_filter = kind_filter
        self.max_k = max_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        qkind = (
            batch["kind"].to_numpy(zero_copy_only=False).astype(np.int64)
            if self.kind_filter
            else None
        )
        n = len(lat)
        ix, iy = self.index.cells_of(lat, lon)
        best_d = np.full(n, np.inf)
        best_id = np.full(n, -1, dtype=np.int64)
        active = np.arange(n, dtype=np.int64)
        cs = self.index.cell_size
        k = 0
        while len(active) and k <= self.max_k:
            offs = _ring_offsets(k)
            m = len(offs)
            cix = (ix[active][:, None] + offs[None, :, 0]).ravel()
            ciy = (iy[active][:, None] + offs[None, :, 1]).ravel()
            valid = (ciy >= 0) & (ciy < self.index.ny) & (cix >= 0)
            flat = cix * self.index.ny + ciy
            src_cell = np.repeat(np.arange(len(active), dtype=np.int64), m)
            flat = flat[valid]
            src_cell = src_cell[valid]
            src, pos = self.index.gather(flat)
            src = src_cell[src]  # -> index into `active`
            if len(pos):
                if qkind is not None:
                    keep = self.index.kind[pos] == qkind[active[src]]
                    src, pos = src[keep], pos[keep]
            if len(pos):
                g = active[src]
                dlat = self.index.lat[pos] - lat[g]
                dlon = self.index.lon[pos] - lon[g]
                d = dlat * dlat + dlon * dlon
                cid = self.index.ids[pos]
                # segment argmin with (d, id) tie-break: sort by (g, d, id)
                order = np.lexsort((cid, d, g))
                g_s, d_s, id_s = g[order], d[order], cid[order]
                first = np.concatenate(([True], g_s[1:] != g_s[:-1]))
                gf, df, idf = g_s[first], d_s[first], id_s[first]
                upd = (df < best_d[gf]) | ((df == best_d[gf]) & (idf < best_id[gf]))
                best_d[gf[upd]] = df[upd]
                best_id[gf[upd]] = idf[upd]
            # stop queries whose best cannot be beaten by unexplored cells
            done = (best_id[active] >= 0) & (np.sqrt(best_d[active]) <= k * cs)
            active = active[~done]
            k += 1
        out = batch.select(["url", "mention_idx"])
        return out.append_column("landmark_id", pa.array(best_id))


class BruteForceTopK:
    """Baseline top-k nearest landmarks per mention (vectorized matmul-
    style distance over the full broadcast landmark matrix) — the exact
    path the k-ring variant is benchmarked against."""

    def __init__(self, landmarks_ref, *, k: int = 3):
        t = _resolve(landmarks_ref)
        self.ids = t["landmark_id"].to_numpy().astype(np.int64)
        self.lat = t["lat"].to_numpy().astype(np.float64)
        self.lon = t["lon"].to_numpy().astype(np.float64)
        self.k = k

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        n = len(lat)
        dlat = self.lat[None, :] - lat[:, None]
        dlon = self.lon[None, :] - lon[:, None]
        d = dlat * dlat + dlon * dlon
        k = min(self.k, d.shape[1])
        # top-k with (dist, id) tie order
        idx = np.argpartition(d, kth=k - 1, axis=1)[:, :k]
        rowr = np.arange(n)[:, None]
        dk = d[rowr, idx]
        idk = self.ids[idx]
        order = np.lexsort((idk, dk), axis=1)
        idx_sorted = np.take_along_axis(idk, order, axis=1)
        out = batch.select(["url", "mention_idx"]).take(
            pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
        )
        return out.append_column(
            "landmark_id", pa.array(idx_sorted.ravel())
        ).append_column(
            "rank", pa.array(np.tile(np.arange(1, k + 1, dtype=np.int64), n))
        )



#: roof tie-window width (O2WConverterImpl.java:281: minDist + 0.1 —
#: meters there, degrees in our site space)
ROOF_EPS = 0.1


class RoofAttach:
    """Tie-window argmax attachment — the roof-surface rule
    (``O2WConverterImpl.java:276-287``): compute the minimum XZ distance
    over all candidates, keep those with ``dist < minDist + 0.1``, and
    among them pick the HIGHEST surface (argmax height; ties broken by
    smallest landmark_id for determinism). Ring expansion continues
    until the whole window radius is covered (``k*cell_size >=
    minDist + eps`` — unexplored cells are provably outside the
    window), with per-ring window pruning so the candidate buffer stays
    proportional to the true window population."""

    def __init__(self, landmarks_ref, *, r: int = 4, max_k: int = 512):
        from ..sources import synth as _synth

        self.index = LandmarkIndex(_resolve(landmarks_ref), r=r)
        self.heights = (self.index.ids * _synth.M1) % 1000
        self.max_k = max_k

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        n = len(lat)
        ix, iy = self.index.cells_of(lat, lon)
        best_d = np.full(n, np.inf)  # linear distance (window is linear)
        active = np.arange(n, dtype=np.int64)
        cs = self.index.cell_size
        cg, cd, ch, cid = [], [], [], []
        k = 0
        while len(active) and k <= self.max_k:
            offs = _ring_offsets(k)
            m = len(offs)
            cix = (ix[active][:, None] + offs[None, :, 0]).ravel()
            ciy = (iy[active][:, None] + offs[None, :, 1]).ravel()
            valid = (ciy >= 0) & (ciy < self.index.ny) & (cix >= 0)
            flat = (cix * self.index.ny + ciy)[valid]
            src_cell = np.repeat(np.arange(len(active), dtype=np.int64), m)[valid]
            src, pos = self.index.gather(flat)
            if len(pos):
                g = active[src_cell[src]]
                dlat = self.index.lat[pos] - lat[g]
                dlon = self.index.lon[pos] - lon[g]
                d = np.sqrt(dlat * dlat + dlon * dlon)
                np.minimum.at(best_d, g, d)
                # conservative window prune with the current best (the
                # final filter re-applies the window with the true min)
                keep = d < best_d[g] + ROOF_EPS
                cg.append(g[keep])
                cd.append(d[keep])
                ch.append(self.heights[pos][keep])
                cid.append(self.index.ids[pos][keep])
            done = np.isfinite(best_d[active]) & (best_d[active] + ROOF_EPS <= k * cs)
            active = active[~done]
            k += 1
        g = np.concatenate(cg) if cg else np.empty(0, dtype=np.int64)
        d = np.concatenate(cd) if cd else np.empty(0)
        h = np.concatenate(ch) if ch else np.empty(0, dtype=np.int64)
        lid = np.concatenate(cid) if cid else np.empty(0, dtype=np.int64)
        win = d < best_d[g] + ROOF_EPS
        g, h, lid = g[win], h[win], lid[win]
        order = np.lexsort((lid, -h, g))
        g_s, id_s = g[order], lid[order]
        first = np.concatenate(([True], g_s[1:] != g_s[:-1]))
        out_id = np.full(n, -1, dtype=np.int64)
        out_id[g_s[first]] = id_s[first]
        out = batch.select(["url", "mention_idx"])
        return out.append_column("landmark_id", pa.array(out_id))
