"""Coastline -> sea-area assembly (createAreasForCoastlines).

Reference semantics (``MultipolygonAreaBuilder.java:344-640``): all
``natural=coastline`` ways become the member ways of an artificial
``natural=water`` multipolygon over the file boundary:

1. intersect every coastline segment with the 4 bbox sides (walked
   CLOCKWISE from the top-left), inserting fake nodes; each hit is
   classified outgoing/incoming by which side of the bbox edge the
   segment STARTS on (:401-446),
2. clip the coastlines to the bbox (outside nodes removed, sequences
   split, :459-494),
3. walk the bbox nodes clockwise; the runs from an OUTGOING hit to the
   next INCOMING hit (through any corners) become extra coastline
   sections along the boundary (:500-546),
4. stitch sections + clipped coastlines into closed rings exactly like
   multipolygon members (``buildRings``) and group them into polygons
   (:555-611),
5. with NO boundary crossings: if any closed ring is an island
   (counterclockwise, i.e. land inside: OSM draws coastlines with
   water on the right), or the tile is at sea / carries only sea tags
   (``isProbablySeaTile`` via the HardcodedRuleset land/sea sets,
   :646-668), a ring around the whole boundary is added so the sea
   covers the tile with the islands as holes (:566-597).

Per-doc work is a bounded local graph problem; the distributed axis is
tiles/docs (map_batches). Synthetic coastline classes per doc exercise
the fixture corpus (coastline_big_island / multiple_coasts /
islands_and_coast / sea-tile, ``OSMToMapDataConverterTest.java:148-190``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..functions import tags as tagfns
from ..sources import synth
from .rings import _build_rings, group_rings, rel_base


def _seg_intersection(p1, p2, q1, q2):
    """Inclusive segment intersection (getLineSegmentIntersection)."""
    rx, ry = p2[0] - p1[0], p2[1] - p1[1]
    sx, sy = q2[0] - q1[0], q2[1] - q1[1]
    denom = rx * sy - ry * sx
    if denom == 0:
        return None
    dqx, dqy = q1[0] - p1[0], q1[1] - p1[1]
    t = (dqx * sy - dqy * sx) / denom
    u = (dqx * ry - dqy * rx) / denom
    if -1e-12 <= t <= 1 + 1e-12 and -1e-12 <= u <= 1 + 1e-12:
        return (p1[0] + t * rx, p1[1] + t * ry)
    return None


def _is_right_of(p, l1, l2) -> bool:
    """GeometryUtil.isRightOf: p strictly right of the line l1->l2."""
    return (l2[0] - l1[0]) * (p[1] - l1[1]) - (l2[1] - l1[1]) * (p[0] - l1[0]) < 0


def assemble_coastlines(coastlines: list[list[tuple[float, float]]],
                        bbox: tuple[float, float, float, float],
                        entity_tags: list[tuple[str, str]],
                        *, is_at_sea: bool = False,
                        with_polygons: bool = False):
    """-> list of (hole_count, area) sea polygons. ``bbox`` is
    (minx, miny, maxx, maxy) with x=lon, y=lat."""
    minx, miny, maxx, maxy = bbox
    # node bookkeeping: ids for stitching identity, coords for geometry
    coords: dict[int, tuple[float, float]] = {}
    by_coord: dict[tuple[float, float], int] = {}
    next_id = [0]

    def node(pos) -> int:
        """Node identity by exact coordinate (the nodeIdMap analogue:
        a way closing on its first node refs the same node id)."""
        key = (float(pos[0]), float(pos[1]))
        if key in by_coord:
            return by_coord[key]
        nid = next_id[0]
        next_id[0] += 1
        coords[nid] = key
        by_coord[key] = nid
        return nid

    seqs = [[node(p) for p in line] for line in coastlines]
    # sides clockwise from top-left (:621-630); x=lon, y=lat
    tl, tr = (minx, maxy), (maxx, maxy)
    br, bl = (maxx, miny), (minx, miny)
    sides = [(tl, tr), (tr, br), (br, bl), (bl, tl)]
    bbox_nodes: list[tuple[int, bool | None]] = []
    for p1, p2 in sides:
        hits: list[tuple[int, bool]] = []
        for seq in seqs:
            i = 0
            while i + 1 < len(seq):
                r1 = coords[seq[i]]
                r2 = coords[seq[i + 1]]
                pos = _seg_intersection(p1, p2, r1, r2)
                if pos is not None:
                    if pos == r1:
                        hit_node = seq[i]
                    elif pos == r2:
                        hit_node = seq[i + 1]
                    else:
                        hit_node = node(pos)
                        seq.insert(i + 1, hit_node)
                        i += 1
                    hits.append((hit_node, _is_right_of(r1, p1, p2)))
                i += 1
        hits.sort(
            key=lambda h: (coords[h[0]][0] - p1[0]) ** 2 + (coords[h[0]][1] - p1[1]) ** 2
        )
        bbox_nodes.extend(hits)
        bbox_nodes.append((node(p2), None))  # corner fake node
    # clip coastlines to the bbox (:459-494)
    on_bbox = {n for n, _o in bbox_nodes}
    modified: list[list[int]] = []
    for seq in seqs:
        cur: list[int] = []
        for n in seq:
            x, y = coords[n]
            if (minx <= x <= maxx and miny <= y <= maxy) or n in on_bbox:
                cur.append(n)
            elif cur:
                modified.append(cur)
                cur = []
        if cur:
            modified.append(cur)
    # boundary runs outgoing -> incoming (:500-546)
    sections: list[list[int]] = []
    if len(bbox_nodes) > 4:
        first_idx = -1
        idx = 0
        cur = None
        while idx != first_idx:
            n, outgoing = bbox_nodes[idx]
            if outgoing is True:
                cur = [n]
                if first_idx == -1:
                    first_idx = idx
            elif outgoing is False:
                if cur is not None:
                    cur.append(n)
                    sections.append(cur)
                    cur = None
            else:
                if cur is not None:
                    cur.append(n)
            idx = (idx + 1) % len(bbox_nodes)
            if first_idx == -1 and idx == 0:
                break  # no outgoing hit at all
    if sections:
        rings = _build_rings(modified + sections)
    else:
        rings = _build_rings(modified)
        if rings is not None:
            def _ccw(ring):
                pts = np.array([coords[n] for n in ring[:-1]])
                x = pts[:, 0] - pts[0, 0]
                y = pts[:, 1] - pts[0, 1]
                return (np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1))) > 0

            has_island = any(_ccw(r) for r in rings)
            sea_tile = is_at_sea or _probably_sea(entity_tags)
            if has_island or sea_tile:
                corner_ids = [node(p) for p in (bl, br, (maxx, maxy), (minx, maxy))]
                rings.append(corner_ids + [corner_ids[0]])
    if rings is None:
        return []
    # coords for group_rings expect (lat, lon) tuples like stages/rings
    latlon = {n: (y, x) for n, (x, y) in coords.items()}
    if with_polygons:
        out = []
        for hc, _nn, area, outer_r, hole_rs in group_rings(
            rings, latlon, with_rings=True
        ):
            out.append((
                hc, area,
                [coords[n] for n in outer_r[:-1]],
                [[coords[n] for n in h[:-1]] for h in hole_rs],
            ))
        return out
    return [(hc, area) for hc, _nn, area in group_rings(rings, latlon)]


def _probably_sea(entity_tags: list[tuple[str, str]]) -> bool:
    """isProbablySeaTile (:646-668): any land tag -> False; else any
    sea tag."""
    if any(tagfns.is_land_tag(t) for t in entity_tags):
        return False
    return any(tagfns.is_sea_tag(t) for t in entity_tags)


# ---------------------------------------------------------------------------
# synthetic per-doc coastline classes (cls = doc % 4)
# ---------------------------------------------------------------------------
# tile bbox: lon [blon, blon+0.6], lat [blat, blat+0.4]
# 0: closed island ring, no crossings -> sea tile with island hole
# 1: single west->east coast at lat blat+0.25 (water south, OSM
#    direction convention) -> south half sea
# 2: no coastline, sea-tagged entity -> whole tile sea
# 3: coast of class 1 + island inside the water -> sea with hole

def coastline_case(doc: int, blat: float, blon: float):
    cls = doc % 4
    bbox = (blon, blat, blon + 0.6, blat + 0.4)
    island = [
        (blon + 0.2, blat + 0.1), (blon + 0.4, blat + 0.1),
        (blon + 0.4, blat + 0.2), (blon + 0.2, blat + 0.2),
        (blon + 0.2, blat + 0.1),
    ]
    coast = [(blon - 0.1, blat + 0.25), (blon + 0.7, blat + 0.25)]
    low_island = [
        (blon + 0.2, blat + 0.05), (blon + 0.4, blat + 0.05),
        (blon + 0.4, blat + 0.15), (blon + 0.2, blat + 0.15),
        (blon + 0.2, blat + 0.05),
    ]
    if cls == 0:
        return [island], bbox, []
    if cls == 1:
        return [coast], bbox, []
    if cls == 2:
        return [], bbox, [("route", "ferry"), ("maritime", "yes")]
    return [coast, low_island], bbox, []


def coastlines_batch(batch: pa.Table) -> pa.Table:
    doc = batch["doc_id"].to_numpy().astype(np.int64)
    blat, blon = rel_base(doc)
    urls, holes, areas = [], [], []
    for d, by, bx in zip(doc, blat, blon):
        lines, bbox, etags = coastline_case(int(d), float(by), float(bx))
        for hc, area in assemble_coastlines(lines, bbox, etags):
            urls.append(f"{synth.URL_PREFIX}{int(d)}")
            holes.append(hc)
            areas.append(int(np.floor(area * 1e8 + 0.5)))
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "hole_count": pa.array(holes, type=pa.int64()),
            "area_e8": pa.array(areas, type=pa.int64()),
        }
    )
