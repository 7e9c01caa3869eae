"""Uniform-grid spatial index (the reference's ``IndexGrid`` re-done).

Semantics follow ``core/src/main/java/org/osm2world/math/datastructures/
IndexGrid.java:22-215`` / ``SpatialIndex.java:12-64``: a regular grid
over padded data bounds; each entry is inserted into every cell its
bbox covers; probing a bbox returns the union of entries in covered
cells (a candidate superset — callers run the exact predicate after),
deduplicated like the reference's HashSet probe
(``SpatialIndex.java:30-43``).

Built once (in an actor's ``__init__`` or behind ``ray.put``), probed
per batch with vectorized numpy — the broadcast side of the PIP and
kNN joins.
"""

from __future__ import annotations

import numpy as np


class GridIndex:
    """Static uniform grid over n entry bboxes.

    Cell size defaults to extent/~sqrt(n)-ish; the reference uses
    extent/1000 for map data (``OSMToMapDataConverter.java:425-431``) —
    callers pick. Entries are referenced by integer position 0..n-1.
    """

    def __init__(
        self,
        minx: np.ndarray,
        miny: np.ndarray,
        maxx: np.ndarray,
        maxy: np.ndarray,
        n_cells_hint: int = 64,
        pad: float = 1e-9,
    ):
        minx = np.asarray(minx, dtype=np.float64)
        miny = np.asarray(miny, dtype=np.float64)
        maxx = np.asarray(maxx, dtype=np.float64)
        maxy = np.asarray(maxy, dtype=np.float64)
        self.n = len(minx)
        self.x0 = float(minx.min()) - pad if self.n else 0.0
        self.y0 = float(miny.min()) - pad if self.n else 0.0
        x1 = float(maxx.max()) + pad if self.n else 1.0
        y1 = float(maxy.max()) + pad if self.n else 1.0
        self.nx = max(1, int(n_cells_hint))
        self.ny = max(1, int(n_cells_hint))
        self.dx = max((x1 - self.x0) / self.nx, 1e-300)
        self.dy = max((y1 - self.y0) / self.ny, 1e-300)

        # insert each entry into all covered cells (IndexGrid.java:154-171)
        if self.n == 0:
            self._cell_sorted = np.empty(0, dtype=np.int64)
            self._entry_sorted = np.empty(0, dtype=np.int64)
            self._offsets = np.zeros(self.nx * self.ny + 1, dtype=np.int64)
            self._bbox = (minx, miny, maxx, maxy)
            return
        cx0 = self._cell_x(minx)
        cx1 = self._cell_x(maxx)
        cy0 = self._cell_y(miny)
        cy1 = self._cell_y(maxy)
        counts = (cx1 - cx0 + 1) * (cy1 - cy0 + 1)
        total = int(counts.sum())
        entry = np.repeat(np.arange(self.n, dtype=np.int64), counts)
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        nyr = np.repeat(cy1 - cy0 + 1, counts)
        gx = np.repeat(cx0, counts) + local // nyr
        gy = np.repeat(cy0, counts) + local % nyr
        flat = gx * self.ny + gy
        order = np.argsort(flat, kind="stable")
        self._cell_sorted = flat[order]
        self._entry_sorted = entry[order]
        # CSR offsets per flat cell id
        self._offsets = np.searchsorted(
            self._cell_sorted, np.arange(self.nx * self.ny + 1)
        )
        self._bbox = (minx, miny, maxx, maxy)

    def _cell_x(self, x):
        return np.clip(((np.asarray(x) - self.x0) / self.dx).astype(np.int64), 0, self.nx - 1)

    def _cell_y(self, y):
        return np.clip(((np.asarray(y) - self.y0) / self.dy).astype(np.int64), 0, self.ny - 1)

    def probe_points(self, px: np.ndarray, py: np.ndarray):
        """Candidate entries for each query point (the point's cell only).

        Returns ``(q_idx, e_idx)`` pair arrays: query-row index and
        candidate entry index, after an exact bbox-contains prefilter.
        """
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        flat = self._cell_x(px) * self.ny + self._cell_y(py)
        s = self._offsets[flat]
        e = self._offsets[flat + 1]
        counts = e - s
        q_idx = np.repeat(np.arange(len(px), dtype=np.int64), counts)
        total = int(counts.sum())
        starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
        local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
        e_idx = self._entry_sorted[np.repeat(s, counts) + local]
        # exact bbox prefilter
        minx, miny, maxx, maxy = self._bbox
        keep = (
            (px[q_idx] >= minx[e_idx])
            & (px[q_idx] <= maxx[e_idx])
            & (py[q_idx] >= miny[e_idx])
            & (py[q_idx] <= maxy[e_idx])
        )
        return q_idx[keep], e_idx[keep]

    def probe_bbox(self, qminx, qminy, qmaxx, qmaxy):
        """Candidate entries for each query bbox (probeLeaves,
        IndexGrid.java:120-151), deduped per query like the HashSet
        probe (SpatialIndex.java:30-43)."""
        qminx = np.asarray(qminx, dtype=np.float64)
        qminy = np.asarray(qminy, dtype=np.float64)
        qmaxx = np.asarray(qmaxx, dtype=np.float64)
        qmaxy = np.asarray(qmaxy, dtype=np.float64)
        cx0 = self._cell_x(qminx)
        cx1 = self._cell_x(qmaxx)
        cy0 = self._cell_y(qminy)
        cy1 = self._cell_y(qmaxy)
        out_q: list[np.ndarray] = []
        out_e: list[np.ndarray] = []
        # loop over query rows (queries are typically few per batch when
        # bbox-probing); the per-cell gather is vectorized
        for i in range(len(qminx)):
            cells = (
                np.arange(cx0[i], cx1[i] + 1)[:, None] * self.ny
                + np.arange(cy0[i], cy1[i] + 1)[None, :]
            ).ravel()
            s = self._offsets[cells]
            e = self._offsets[cells + 1]
            if not np.any(e > s):
                continue
            ent = np.concatenate([self._entry_sorted[a:b] for a, b in zip(s, e) if b > a])
            ent = np.unique(ent)
            minx, miny, maxx, maxy = self._bbox
            keep = (
                (qmaxx[i] >= minx[ent])
                & (qminx[i] <= maxx[ent])
                & (qmaxy[i] >= miny[ent])
                & (qminy[i] <= maxy[ent])
            )
            ent = ent[keep]
            out_q.append(np.full(len(ent), i, dtype=np.int64))
            out_e.append(ent)
        if not out_q:
            return np.empty(0, dtype=np.int64), np.empty(0, dtype=np.int64)
        return np.concatenate(out_q), np.concatenate(out_e)
