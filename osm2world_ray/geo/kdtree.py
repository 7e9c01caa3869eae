"""2D k-d tree spatial index — the ``Map2dTree`` alternative strategy.

Reference semantics (``Map2dTree.java:27-150``): inner nodes split the
plane along X and Z alternatingly; the split value is the MEAN of the
member coordinates; a leaf splits once it holds ``LEAF_SPLIT_SIZE``
(11) elements, but only if the split shrinks BOTH children by at least
5 elements (degenerate stacks stay in one leaf); an element whose
extent touches both sides goes into both children (duplication instead
of clipping), so probes must deduplicate.

Same probe API as :class:`osm2world_ray.geo.gridindex.GridIndex`
(``probe_points`` / ``probe_bbox`` -> (query_idx, entry_idx) candidate
pairs) so index strategies swap behind the ``spatialIndex`` config key.
Pure numpy/python, no Ray imports.
"""

from __future__ import annotations

import numpy as np

LEAF_SPLIT_SIZE = 11
_MIN_SHRINK = 5


class KdTreeIndex:
    def __init__(self, minx, miny, maxx, maxy, **_ignored):
        self.minx = np.asarray(minx, dtype=np.float64)
        self.miny = np.asarray(miny, dtype=np.float64)
        self.maxx = np.asarray(maxx, dtype=np.float64)
        self.maxy = np.asarray(maxy, dtype=np.float64)
        n = len(self.minx)
        # nodes: list of dicts; leaves carry entry index arrays
        self._nodes: list[dict] = []
        root = self._leaf(np.arange(n, dtype=np.int64))
        self._root = self._build(root, split_x=True, depth=0)

    def _leaf(self, entries: np.ndarray) -> int:
        self._nodes.append({"leaf": True, "entries": entries})
        return len(self._nodes) - 1

    def _build(self, node_id: int, *, split_x: bool, depth: int) -> int:
        node = self._nodes[node_id]
        e = node["entries"]
        if len(e) < LEAF_SPLIT_SIZE or depth > 48:
            return node_id
        # split value: mean of member extents (the node-coordinate mean
        # generalized to bbox entries via their center sum)
        if split_x:
            lo_c, hi_c = self.minx[e], self.maxx[e]
        else:
            lo_c, hi_c = self.miny[e], self.maxy[e]
        split = float((lo_c.mean() + hi_c.mean()) / 2.0)
        lower = e[lo_c <= split]
        upper = e[hi_c >= split]
        if (
            len(lower) >= len(e) - _MIN_SHRINK
            or len(upper) >= len(e) - _MIN_SHRINK
        ):
            return node_id  # split would not shrink both children enough
        lo_id = self._build(self._leaf(lower), split_x=not split_x, depth=depth + 1)
        hi_id = self._build(self._leaf(upper), split_x=not split_x, depth=depth + 1)
        self._nodes[node_id] = {
            "leaf": False,
            "split_x": split_x,
            "split": split,
            "lower": lo_id,
            "upper": hi_id,
        }
        return node_id

    def _probe(self, qminx, qminy, qmaxx, qmaxy):
        """bbox queries -> deduped (query_idx, entry_idx) pairs."""
        qidx = np.arange(len(qminx), dtype=np.int64)
        out_q, out_e = [], []
        stack = [(self._root, qidx)]
        while stack:
            nid, qs = stack.pop()
            if len(qs) == 0:
                continue
            node = self._nodes[nid]
            if node["leaf"]:
                e = node["entries"]
                if len(e) == 0:
                    continue
                # candidate pairs: leaf entries x queries at this leaf
                qq = np.repeat(qs, len(e))
                ee = np.tile(e, len(qs))
                keep = (
                    (self.minx[ee] <= qmaxx[qq])
                    & (self.maxx[ee] >= qminx[qq])
                    & (self.miny[ee] <= qmaxy[qq])
                    & (self.maxy[ee] >= qminy[qq])
                )
                out_q.append(qq[keep])
                out_e.append(ee[keep])
                continue
            if node["split_x"]:
                lo_sel = qminx[qs] <= node["split"]
                hi_sel = qmaxx[qs] >= node["split"]
            else:
                lo_sel = qminy[qs] <= node["split"]
                hi_sel = qmaxy[qs] >= node["split"]
            stack.append((node["lower"], qs[lo_sel]))
            stack.append((node["upper"], qs[hi_sel]))
        if not out_q:
            z = np.empty(0, dtype=np.int64)
            return z, z
        q = np.concatenate(out_q)
        e = np.concatenate(out_e)
        # entries duplicated into both children (and boundary queries
        # descending both sides) produce duplicate pairs: dedup
        key = q * (len(self.minx) + 1) + e
        _u, first = np.unique(key, return_index=True)
        return q[first], e[first]

    def probe_points(self, x: np.ndarray, y: np.ndarray):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        return self._probe(x, y, x, y)

    def probe_bbox(self, qminx, qminy, qmaxx, qmaxy):
        return self._probe(
            np.asarray(qminx, dtype=np.float64),
            np.asarray(qminy, dtype=np.float64),
            np.asarray(qmaxx, dtype=np.float64),
            np.asarray(qmaxy, dtype=np.float64),
        )
