"""Broadcast point-in-polygon join: the node-in-area overlap stage.

Reference semantics: ``calculateIntersectionsInMapData`` node-in-area
(``OSMToMapDataConverter.java:720-733``) — every point probed against a
spatial index of areas, exact ray-cast test on candidates, holes
honored (``PolygonShapeXZ.java:58-68``). Ray Data shape: the boundary
table is SMALL relative to pages, so it is broadcast once (``ray.put``
on the driver) and each actor builds its decoded-ring ``GridIndex`` in
``__init__`` — build-once probe-many, no shuffle of the big side.

Also provides the typed-overlap variant (CONTAIN / INTERSECT) mirroring
``MapOverlapWA`` types (``OSMToMapDataConverter.java:515-620``): a
footprint bbox that intersects the boundary bbox without containing the
center is INTERSECT; a contained center is CONTAIN.
"""

from __future__ import annotations

from ._util import resolve_ref as _resolve

import numpy as np
import pyarrow as pa

from ..geo import wkb
from ..geo.gridindex import GridIndex
from ..geo.pip import points_in_polygon, ring_bbox


class BoundaryIndex:
    """Decoded boundary rings + a spatial index over their bboxes.

    ``strategy`` selects the index implementation — "IndexGrid"
    (uniform grid, the converter's default), "Map2dTree" (mean-split
    k-d tree, ``Map2dTree.java:27-150``) or "MapQuadtree" (split-at-11
    quadtree, ``MapQuadtree.java:22-256``) — behind the identical
    probe-candidates API, so join results are byte-identical across
    strategies (exact tests re-check every candidate)."""

    def __init__(self, boundaries: pa.Table, *, strategy: str = "IndexGrid"):
        self.ids = boundaries["boundary_id"].to_numpy()
        self.polys: list[tuple[np.ndarray, list[np.ndarray]]] = []
        bbs = []
        for buf in boundaries["wkb"].to_pylist():
            rings = wkb.decode(buf)[0]  # single polygon per row
            outer, holes = rings[0], rings[1:]
            self.polys.append((outer, holes))
            bbs.append(ring_bbox(outer))
        bbs = np.asarray(bbs, dtype=np.float64).reshape(-1, 4)
        self.bbox = bbs
        if strategy == "Map2dTree":
            from ..geo.kdtree import KdTreeIndex

            self.grid = KdTreeIndex(bbs[:, 0], bbs[:, 1], bbs[:, 2], bbs[:, 3])
        elif strategy == "MapQuadtree":
            from ..geo.quadtree import QuadTreeIndex

            self.grid = QuadTreeIndex(bbs[:, 0], bbs[:, 1], bbs[:, 2], bbs[:, 3])
        else:
            self.grid = GridIndex(
                bbs[:, 0], bbs[:, 1], bbs[:, 2], bbs[:, 3], n_cells_hint=32
            )

    def contains(self, lon: np.ndarray, lat: np.ndarray):
        """-> (point_idx, entry_idx) pairs where point is inside polygon."""
        q, e = self.grid.probe_points(lon, lat)
        if len(q) == 0:
            return q, e
        keep = np.zeros(len(q), dtype=bool)
        # vectorize per candidate polygon (few polygons, many points)
        for poly_i in np.unique(e):
            sel = e == poly_i
            outer, holes = self.polys[poly_i]
            keep[sel] = points_in_polygon(lon[q[sel]], lat[q[sel]], outer, holes)
        return q[keep], e[keep]

    def bbox_candidates(self, minx, miny, maxx, maxy):
        """-> (query_idx, entry_idx) pairs whose bboxes intersect."""
        return self.grid.probe_bbox(minx, miny, maxx, maxy)


class PIPJoin:
    """Actor-pool stage: mentions batch -> (url, mention_idx, boundary_id).

    ``boundaries_ref`` may be a ``ray.ObjectRef`` (broadcast once via
    ``ray.put``) or a plain Arrow table (tests).
    """

    def __init__(self, boundaries_ref, *, strategy: str = "IndexGrid"):
        boundaries = _resolve(boundaries_ref)
        self.index = BoundaryIndex(boundaries, strategy=strategy)

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        q, e = self.index.contains(lon, lat)
        out = batch.select(["url", "mention_idx"]).take(pa.array(q))
        return out.append_column("boundary_id", pa.array(self.index.ids[e]))


class TypedOverlapJoin:
    """Mentions-with-footprint vs boundaries -> typed overlap rows.

    overlap_type: 'CONTAIN' when the mention point is inside the
    polygon; 'INTERSECT' when only the footprint bbox (lat +- rlat,
    lon +- rlon) intersects the polygon's bbox — the MapOverlapWA type
    triple minus SHARE_SEGMENT (no shared-vertex concept for points).
    """

    def __init__(self, boundaries_ref, rlat: float, rlon: float):
        self.index = BoundaryIndex(_resolve(boundaries_ref))
        self.rlat = rlat
        self.rlon = rlon

    def __call__(self, batch: pa.Table) -> pa.Table:
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        qb, eb = self.index.bbox_candidates(
            lon - self.rlon, lat - self.rlat, lon + self.rlon, lat + self.rlat
        )
        qc, ec = self.index.contains(lon, lat)
        # packed-key membership instead of a per-pair Python set: the
        # entity index is bounded by the broadcast boundary table, so
        # (query_row, entity) packs collision-free into int64
        n_e = np.int64(len(self.index.ids))
        contained = np.isin(
            qb.astype(np.int64) * n_e + eb,
            qc.astype(np.int64) * n_e + ec,
        )
        types = np.where(contained, "CONTAIN", "INTERSECT")
        out = batch.select(["url", "mention_idx"]).take(pa.array(qb))
        return out.append_column(
            "boundary_id", pa.array(self.index.ids[eb])
        ).append_column("overlap_type", pa.array(types, type=pa.string()))

