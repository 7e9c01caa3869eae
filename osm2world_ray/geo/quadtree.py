"""Quadtree spatial index — the reference's third index strategy.

Semantics follow ``math/datastructures/MapQuadtree.java:22-256``: the
root covers the data bounds; each inner node has four equal quadrant
children; an element is inserted into EVERY child it touches; a leaf
reaching ``LEAF_SPLIT_SIZE`` (11) elements splits — unless one of the
prospective children would contain all its elements, in which case the
split cannot reduce the maximum node size and the leaf stays fat
(``trySplitLeaf``, :128-167).

Deviation for determinism: point probes use half-open quadrant bounds
(points on a split line descend into exactly one child), so candidate
sets carry no duplicates. Probe results pass the same exact bbox
post-filter as ``GridIndex``/``KdTreeIndex``, so the three strategies
return byte-identical join results (the strategy contract).

Built once on the broadcast side (tiny), probed per batch with
vectorized numpy descent — Python recursion only over tree NODES,
never over query rows.
"""

from __future__ import annotations

import numpy as np

LEAF_SPLIT_SIZE = 11


class _Node:
    __slots__ = ("x0", "x1", "y0", "y1", "children", "elements")

    def __init__(self, x0, x1, y0, y1):
        self.x0, self.x1, self.y0, self.y1 = x0, x1, y0, y1
        self.children = None  # [SW, SE, NW, NE] like the reference order
        self.elements: list[int] = []

    def _make_children(self):
        hx = (self.x0 + self.x1) / 2
        hy = (self.y0 + self.y1) / 2
        return [
            _Node(self.x0, hx, self.y0, hy),
            _Node(hx, self.x1, self.y0, hy),
            _Node(self.x0, hx, hy, self.y1),
            _Node(hx, self.x1, hy, self.y1),
        ]


class QuadTreeIndex:
    """MapQuadtree over n entry bboxes (positions 0..n-1)."""

    def __init__(self, minx, miny, maxx, maxy, pad: float = 1e-9):
        """Argument order matches ``GridIndex``/``KdTreeIndex``:
        (minx, miny, maxx, maxy)."""
        minx = np.asarray(minx, dtype=np.float64)
        miny = np.asarray(miny, dtype=np.float64)
        maxx = np.asarray(maxx, dtype=np.float64)
        maxy = np.asarray(maxy, dtype=np.float64)
        self._bbox = (minx, miny, maxx, maxy)
        self.n = len(minx)
        if self.n == 0:
            self.root = _Node(0.0, 1.0, 0.0, 1.0)
            self.root.children = self.root._make_children()
            return
        self.root = _Node(
            float(minx.min()) - pad, float(maxx.max()) + pad,
            float(miny.min()) - pad, float(maxy.max()) + pad,
        )
        # root is an inner node from the start (MapQuadtree.java:230-236)
        self.root.children = self.root._make_children()
        for i in range(self.n):
            self._add(self.root, int(i))

    # --- build (insertion with try-split, :112-167, :193-216) ---

    def _touches(self, node: _Node, i: int) -> bool:
        minx, miny, maxx, maxy = self._bbox
        return (
            minx[i] <= node.x1 and maxx[i] >= node.x0
            and miny[i] <= node.y1 and maxy[i] >= node.y0
        )

    def _add(self, node: _Node, i: int):
        if node.children is not None:
            for c in node.children:
                if self._touches(c, i):
                    self._add(c, i)  # an element can cross leaf borders
            return
        node.elements.append(i)
        if len(node.elements) >= LEAF_SPLIT_SIZE:
            self._try_split(node)

    def _try_split(self, leaf: _Node):
        children = leaf._make_children()
        # splitting must reduce the max node size: if one prospective
        # child touches ALL elements, it would inherit everything
        for c in children:
            if all(self._touches(c, i) for i in leaf.elements):
                return
        elems = leaf.elements
        leaf.children = children
        leaf.elements = []
        for i in elems:
            for c in children:
                if self._touches(c, i):
                    c.elements.append(i)
        # the reference's addAll splits recursively if a child is
        # already at the threshold
        for c in children:
            if len(c.elements) >= LEAF_SPLIT_SIZE:
                self._try_split(c)

    # --- probes (vectorized descent; exact bbox post-filter) ---

    def probe_points(self, px, py):
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        q_parts, e_parts = [], []
        stack = [(self.root, np.arange(len(px), dtype=np.int64))]
        while stack:
            node, idx = stack.pop()
            if len(idx) == 0:
                continue
            if node.children is None:
                if node.elements:
                    elems = np.asarray(node.elements, dtype=np.int64)
                    q_parts.append(np.repeat(idx, len(elems)))
                    e_parts.append(np.tile(elems, len(idx)))
                continue
            hx = (node.x0 + node.x1) / 2
            hy = (node.y0 + node.y1) / 2
            east = px[idx] >= hx  # half-open: split line goes east/north
            north = py[idx] >= hy
            stack.append((node.children[0], idx[~east & ~north]))
            stack.append((node.children[1], idx[east & ~north]))
            stack.append((node.children[2], idx[~east & north]))
            stack.append((node.children[3], idx[east & north]))
        if not q_parts:
            z = np.empty(0, dtype=np.int64)
            return z, z
        q_idx = np.concatenate(q_parts)
        e_idx = np.concatenate(e_parts)
        minx, miny, maxx, maxy = self._bbox
        keep = (
            (px[q_idx] >= minx[e_idx]) & (px[q_idx] <= maxx[e_idx])
            & (py[q_idx] >= miny[e_idx]) & (py[q_idx] <= maxy[e_idx])
        )
        return q_idx[keep], e_idx[keep]

    def probe_bbox(self, qminx, qminy, qmaxx, qmaxy):
        qminx = np.asarray(qminx, dtype=np.float64)
        qminy = np.asarray(qminy, dtype=np.float64)
        qmaxx = np.asarray(qmaxx, dtype=np.float64)
        qmaxy = np.asarray(qmaxy, dtype=np.float64)
        q_parts, e_parts = [], []
        stack = [(self.root, np.arange(len(qminx), dtype=np.int64))]
        while stack:
            node, idx = stack.pop()
            if len(idx) == 0:
                continue
            if node.children is None:
                if node.elements:
                    elems = np.asarray(node.elements, dtype=np.int64)
                    q_parts.append(np.repeat(idx, len(elems)))
                    e_parts.append(np.tile(elems, len(idx)))
                continue
            for c in node.children:
                m = (
                    (qminx[idx] <= c.x1) & (qmaxx[idx] >= c.x0)
                    & (qminy[idx] <= c.y1) & (qmaxy[idx] >= c.y0)
                )
                stack.append((c, idx[m]))
        if not q_parts:
            z = np.empty(0, dtype=np.int64)
            return z, z
        q_idx = np.concatenate(q_parts)
        e_idx = np.concatenate(e_parts)
        # dedupe (a bbox reaches many leaves; elements live in many
        # leaves) like the reference's HashSet probe, then exact filter
        packed = q_idx * np.int64(max(self.n, 1)) + e_idx
        _, first = np.unique(packed, return_index=True)
        q_idx, e_idx = q_idx[first], e_idx[first]
        minx, miny, maxx, maxy = self._bbox
        keep = (
            (qminx[q_idx] <= maxx[e_idx]) & (qmaxx[q_idx] >= minx[e_idx])
            & (qminy[q_idx] <= maxy[e_idx]) & (qmaxy[q_idx] >= miny[e_idx])
        )
        return q_idx[keep], e_idx[keep]
