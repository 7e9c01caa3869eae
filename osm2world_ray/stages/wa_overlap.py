"""Way-segment x area typed overlap with intersection positions.

Reference semantics (``addOverlapBetween(MapWaySegment, MapArea)``,
``OSMToMapDataConverter.java:515-620``):

1. *shared segment*: the way segment has the same two nodes as an area
   segment -> ``SHARE_SEGMENT``, empty position list (:520-535).
2. way not connected to the area: ``intersects =
   polygon.intersects(segment)``; ``contains = !intersects &&
   polygon.contains(segment)`` (:545-550).
3. way connected to the area (shares node(s)): intersection positions
   closer than ``segmentLength/100`` to either segment endpoint don't
   count (touch at the common node, :555-575); ``contains`` then tests
   the segment CENTER (:577-580).
4. an ``INTERSECT`` overlap carries the intersection positions with the
   area's segments (:585-607) — surfaced here as one output row per
   position in exact micro-degrees; ``CONTAIN``/``SHARE_SEGMENT`` rows
   carry the (-1, -1) sentinel.

Ray shape: the boundary table is the small broadcast side (decoded
rings + per-boundary edge arrays built once per actor); the unbounded
way-segment stream maps batch-vectorized against each boundary (few
boundaries x vectorized-over-segments edge tests — the same
broadcast-join shape as ``stages/pip_join``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo.pip import points_in_polygon
from ..geo.segments import segment_intersection
from ._util import resolve_ref as _resolve
from .pip_join import BoundaryIndex


class WAOverlapJoin:
    def __init__(self, boundaries_ref):
        self.index = BoundaryIndex(_resolve(boundaries_ref))
        self.edges = []  # per boundary: (m, 4) [ex1, ey1, ex2, ey2]
        self.corners = []  # per boundary: (k, 2)
        for outer, holes in self.index.polys:
            es, cs = [], []
            for ring in [outer] + list(holes):
                nxt = np.roll(ring, -1, axis=0)
                es.append(np.concatenate([ring, nxt], axis=1))
                cs.append(ring)
            self.edges.append(np.concatenate(es, axis=0))
            self.corners.append(np.concatenate(cs, axis=0))

    def __call__(self, batch: pa.Table) -> pa.Table:
        x1 = batch["x1"].to_numpy(zero_copy_only=False)
        y1 = batch["y1"].to_numpy(zero_copy_only=False)
        x2 = batch["x2"].to_numpy(zero_copy_only=False)
        y2 = batch["y2"].to_numpy(zero_copy_only=False)
        minx, maxx = np.minimum(x1, x2), np.maximum(x1, x2)
        miny, maxy = np.minimum(y1, y2), np.maximum(y1, y2)
        rows_i, rows_b, rows_t, rows_px, rows_py = [], [], [], [], []
        for bi in range(len(self.index.polys)):
            bb = self.index.bbox[bi]  # (minx, miny, maxx, maxy)
            cand = np.flatnonzero(
                (minx <= bb[2]) & (maxx >= bb[0]) & (miny <= bb[3]) & (maxy >= bb[1])
            )
            if len(cand) == 0:
                continue
            E = self.edges[bi]
            C = self.corners[bi]
            cx1, cy1, cx2, cy2 = x1[cand], y1[cand], x2[cand], y2[cand]
            # 1. shared segment: same two nodes, either direction
            share = np.zeros(len(cand), dtype=bool)
            for ex1, ey1, ex2, ey2 in E:
                share |= (cx1 == ex1) & (cy1 == ey1) & (cx2 == ex2) & (cy2 == ey2)
                share |= (cx1 == ex2) & (cy1 == ey2) & (cx2 == ex1) & (cy2 == ey1)
            # connectivity: either endpoint is an area node
            conn = np.zeros(len(cand), dtype=bool)
            for ccx, ccy in C:
                conn |= ((cx1 == ccx) & (cy1 == ccy)) | ((cx2 == ccx) & (cy2 == ccy))
            # per-edge TRUE intersections (getTrueLineSegmentIntersection,
            # GeometryUtil.java:267-278: inclusive t,u in [0,1], pairs
            # sharing an exact endpoint excluded, parallel excluded) —
            # the reference uses this ONE kernel for the unconnected
            # intersects flag (SimplePolygonShapeXZ.java:95-113), the
            # connected intersectionPositions (:123-139) AND the emitted
            # position list (OSMToMapDataConverter.java:592-605)
            true_any = np.zeros(len(cand), dtype=bool)
            far_any = np.zeros(len(cand), dtype=bool)
            pos_seg, pos_x, pos_y = [], [], []
            seg_len = np.hypot(cx2 - cx1, cy2 - cy1)
            for ex1, ey1, ex2, ey2 in E:
                sep = (
                    ((cx1 == ex1) & (cy1 == ey1))
                    | ((cx1 == ex2) & (cy1 == ey2))
                    | ((cx2 == ex1) & (cy2 == ey1))
                    | ((cx2 == ex2) & (cy2 == ey2))
                )
                m_in, ixp, iyp = segment_intersection(
                    cx1, cy1, cx2, cy2,
                    np.full_like(cx1, ex1), np.full_like(cx1, ey1),
                    np.full_like(cx1, ex2), np.full_like(cx1, ey2),
                    true_only=False,
                )
                m_in &= ~sep
                true_any |= m_in
                hit = np.flatnonzero(m_in)
                if len(hit):
                    d1 = np.hypot(ixp[hit] - cx1[hit], iyp[hit] - cy1[hit])
                    d2 = np.hypot(ixp[hit] - cx2[hit], iyp[hit] - cy2[hit])
                    far = (d1 > seg_len[hit] / 100) & (d2 > seg_len[hit] / 100)
                    far_any[hit[far]] = True
                    pos_seg.append(hit)
                    pos_x.append(ixp[hit])
                    pos_y.append(iyp[hit])
            outer, holes = self.index.polys[bi]
            # intersects flag per the connectivity split (:545-575):
            # unconnected = any true intersection; connected = any true
            # intersection farther than segLen/100 from both endpoints
            intersects = np.where(conn, far_any, true_any) & ~share
            emit_share = np.flatnonzero(share)
            rows_i.append(cand[emit_share])
            rows_b.append(np.full(len(emit_share), bi))
            rows_t.append(np.full(len(emit_share), 0, dtype=np.int64))
            rows_px.append(np.full(len(emit_share), -1, dtype=np.int64))
            rows_py.append(np.full(len(emit_share), -1, dtype=np.int64))
            # INTERSECT: one row per collected true-intersection position
            # (OSMToMapDataConverter.java:592-605 re-collects getIntersection
            # over ALL area segments once the flag is set — including, for
            # connected segments, positions inside the segLen/100 window)
            if pos_seg:
                ps = np.concatenate(pos_seg)
                px = np.concatenate(pos_x)
                py = np.concatenate(pos_y)
                keep = intersects[ps] & ~share[ps]
                ps, px, py = ps[keep], px[keep], py[keep]
                rows_i.append(cand[ps])
                rows_b.append(np.full(len(ps), bi))
                rows_t.append(np.full(len(ps), 1, dtype=np.int64))
                rows_px.append(np.floor(px * 1e6 + 0.5).astype(np.int64))
                rows_py.append(np.floor(py * 1e6 + 0.5).astype(np.int64))
            # CONTAIN: no intersection; probe p1 (unconnected) resp. the
            # segment center (connected)
            quiet = ~share & ~intersects
            probe_x = np.where(conn, (cx1 + cx2) / 2.0, cx1)
            probe_y = np.where(conn, (cy1 + cy2) / 2.0, cy1)
            q = np.flatnonzero(quiet)
            if len(q):
                inside = points_in_polygon(probe_x[q], probe_y[q], outer, holes)
                q = q[inside]
                rows_i.append(cand[q])
                rows_b.append(np.full(len(q), bi))
                rows_t.append(np.full(len(q), 2, dtype=np.int64))
                rows_px.append(np.full(len(q), -1, dtype=np.int64))
                rows_py.append(np.full(len(q), -1, dtype=np.int64))
        if rows_i:
            ii = np.concatenate(rows_i)
            bb_ = np.concatenate(rows_b)
            tt = np.concatenate(rows_t)
            px = np.concatenate(rows_px)
            py = np.concatenate(rows_py)
        else:
            ii = np.empty(0, dtype=np.int64)
            bb_ = tt = px = py = ii
        names = np.array(["SHARE_SEGMENT", "INTERSECT", "CONTAIN"])
        out = batch.select(["url", "seg_idx"]).take(pa.array(ii))
        return (
            out.append_column("boundary_id", pa.array(self.index.ids[bb_].astype(np.int64)))
            .append_column("ov_type", pa.array(names[tt]))
            .append_column("ix_udeg", pa.array(px))
            .append_column("iy_udeg", pa.array(py))
        )
