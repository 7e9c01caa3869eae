"""Multipolygon ring assembly: stitch member ways into outer+hole rings.

Reference semantics (``MultipolygonAreaBuilder.java:73-806``):

- *simple* multipolygon (exactly one ``outer`` way, all member ways
  closed, :85-110): one area; tag source is the relation if it has more
  than one tag, else the outer way (:139) — surfaced here as the
  ``is_relation`` flag; advanced areas are always relation-tagged
  (``MapArea(relation.getId(), true, ...)``, :325).
- *advanced* (:152-253): greedily stitch node sequences — start a ring
  with the LAST remaining sequence, then repeatedly attach the first
  sequence (in member order) whose endpoint matches the ring's start or
  end, reversing when needed (``NodeSequence.tryAdd`` :695-741); a
  sequence that can never close fails the WHOLE relation (returns no
  areas, :246-249).
- ring -> polygon grouping (:258-334): repeatedly pick an outer ring =
  one not contained in any other remaining ring; its holes = rings
  directly contained in it (contained in no other remaining ring);
  emit the area and remove outer+holes. Containment via polygon test
  (``Ring.containsRing`` :785-789).

Ray shape: member ways are flattened to one row per (relation, member,
node) with coordinates attached (the node-resolution join is the
separate ``resolve_relations`` stage); rows shuffle once on the bounded
bucket key of the owning relation, and each bucket assembles its
relations with numpy shoelace/PIP kernels (per-relation stitching is an
inherently sequential few-member loop). Output areas translate rings to
a local origin before the shoelace so float error stays ~1e-16 of the
area regardless of the absolute coordinates.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources import synth
from .overlaps import bucket_groups, bucket_of

#: local node id -> (dlat, dlon) offsets from the relation base point
_NODE_OFFSETS = {
    # outer rect 0.4 x 0.6
    0: (0.0, 0.0), 1: (0.0, 0.6), 2: (0.4, 0.6), 3: (0.4, 0.0),
    # hole 1: 0.1 x 0.2
    10: (0.1, 0.1), 11: (0.1, 0.3), 12: (0.2, 0.3), 13: (0.2, 0.1),
    # island inside hole 1: 0.05 x 0.1
    20: (0.12, 0.15), 21: (0.12, 0.25), 22: (0.17, 0.25), 23: (0.17, 0.15),
    # second outer rect 0.2 x 0.3
    30: (0.5, 0.0), 31: (0.5, 0.3), 32: (0.7, 0.3), 33: (0.7, 0.0),
    # hole 2: 0.05 x 0.1
    40: (0.25, 0.4), 41: (0.25, 0.5), 42: (0.3, 0.5), 43: (0.3, 0.4),
}

#: relation class (doc_id % 5) -> member list [(role, node id loop)]
#: exercising the mp_two_holes / split-ways / multiple-outers /
#: island-in-hole / unclosable fixtures
#: (OSMToMapDataConverterTest.java:27-150)
REL_TEMPLATES: dict[int, list[tuple[str, list[int]]]] = {
    0: [  # simple: one closed outer, two closed holes (mp_two_holes)
        ("inner", [10, 11, 12, 13, 10]),
        ("inner", [40, 41, 42, 43, 40]),
        ("outer", [0, 1, 2, 3, 0]),
    ],
    1: [  # advanced: outer split into two open ways (one reversed)
        ("outer", [0, 1, 2]),
        ("inner", [10, 11, 12, 13, 10]),
        ("outer", [0, 3, 2]),
    ],
    2: [  # two outer rings -> two areas
        ("outer", [0, 1, 2, 3, 0]),
        ("inner", [10, 11, 12, 13, 10]),
        ("outer", [30, 31, 32, 33, 30]),
    ],
    3: [  # island inside the hole -> second area, hole not double-used
        ("outer", [0, 1, 2, 3, 0]),
        ("inner", [10, 11, 12, 13, 10]),
        ("outer", [20, 21, 22, 23, 20]),
    ],
    4: [  # unclosable -> invalid relation, no areas
        ("outer", [0, 1, 2]),
        ("outer", [2, 3]),
    ],
}


def rel_base(doc_id: np.ndarray):
    """Deterministic base point per relation (SQL-mirrorable; the
    output is translation-invariant so the oracle never needs it)."""
    d = np.asarray(doc_id, dtype=np.int64)
    blat = 40.0 + (synth._h(d, synth.M3) / synth.TWO32) * 9.0
    blon = -10.0 + (synth._h(d, synth.M4) / synth.TWO32) * 19.0
    return blat, blon


def members_from_docs(batch: pa.Table, *, n_buckets: int) -> pa.Table:
    """documents batch -> flattened member-way node rows."""
    doc = batch["doc_id"].to_numpy().astype(np.int64)
    blat, blon = rel_base(doc)
    rows_doc, rows_m, rows_role, rows_nid, rows_lat, rows_lon = [], [], [], [], [], []
    for cls, members in REL_TEMPLATES.items():
        sel = np.flatnonzero(doc % 5 == cls)
        if len(sel) == 0:
            continue
        for m_idx, (role, nids) in enumerate(members):
            for nid in nids:
                dlat, dlon = _NODE_OFFSETS[nid]
                rows_doc.append(doc[sel])
                rows_m.append(np.full(len(sel), m_idx, dtype=np.int64))
                rows_role.append(np.full(len(sel), role, dtype=object))
                rows_nid.append(np.full(len(sel), nid, dtype=np.int64))
                rows_lat.append(blat[sel] + dlat)
                rows_lon.append(blon[sel] + dlon)
    rel_doc = np.concatenate(rows_doc)
    return pa.table(
        {
            "rel_doc": pa.array(rel_doc),
            "member_idx": pa.array(np.concatenate(rows_m)),
            "role": pa.array(np.concatenate(rows_role).astype(str)),
            "node_id": pa.array(np.concatenate(rows_nid)),
            "lat": pa.array(np.concatenate(rows_lat)),
            "lon": pa.array(np.concatenate(rows_lon)),
            "bucket": pa.array(bucket_of(rel_doc, n_buckets)),
        }
    )


def _try_add(ring: list, seq: list) -> bool:
    """NodeSequence.tryAdd (:695-741): attach seq to ring's end/start,
    reversing when endpoints demand it; mutates ring."""
    if ring[-1] == seq[0]:
        ring.pop()
        ring.extend(seq)
        return True
    if ring[-1] == seq[-1]:
        ring.pop()
        ring.extend(reversed(seq))
        return True
    if ring[0] == seq[-1]:
        ring.pop(0)
        ring[0:0] = seq
        return True
    if ring[0] == seq[0]:
        ring.pop(0)
        ring[0:0] = list(reversed(seq))
        return True
    return False


def _build_rings(sequences: list[list[int]]) -> list[list[int]] | None:
    """buildRings (:196-253): greedy stitch; None if any ring can't
    close."""
    closed: list[list[int]] = []
    current: list[int] | None = None
    seqs = list(sequences)
    while seqs:
        if current is None:
            current = list(seqs.pop())
        else:
            hit = None
            for i, s in enumerate(seqs):
                if _try_add(current, s):
                    hit = i
                    break
            if hit is None:
                return None
            seqs.pop(hit)
        if current is not None and current[0] == current[-1]:
            closed.append(current)
            current = None
    if current is not None:
        return None
    return closed


def _ring_area_and_poly(ring: list[int], coords: dict[int, tuple[float, float]]):
    """abs shoelace area (local-origin translated) + vertex arrays."""
    pts = np.array([coords[n] for n in ring[:-1]])  # (lat, lon)
    y = pts[:, 0] - pts[0, 0]
    x = pts[:, 1] - pts[0, 1]
    area = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
    return area, x + pts[0, 1], y + pts[0, 0]  # lon, lat arrays


def _contains(px: np.ndarray, py: np.ndarray, qx: float, qy: float) -> bool:
    """Even-odd ray cast: is point (qx,qy) inside ring (px,py)."""
    x1, y1 = px, py
    x2, y2 = np.roll(px, -1), np.roll(py, -1)
    cond = (y1 > qy) != (y2 > qy)
    with np.errstate(divide="ignore", invalid="ignore"):
        xint = x1 + (qy - y1) / (y2 - y1) * (x2 - x1)
    return bool(np.count_nonzero(cond & (qx < xint)) % 2)


def assemble_relation(doc: int, members: list[tuple[str, list[int]]],
                      coords: dict[int, tuple[float, float]]):
    """One relation -> list of (hole_count, outer_nodes, area, is_relation)."""
    outer_ways = [nids for role, nids in members if role == "outer"]
    all_closed = all(n[0] == n[-1] for _r, n in members)
    if len(outer_ways) == 1 and all_closed:
        # simple path (:85-110); tag source = relation iff >1 tags
        outer = outer_ways[0]
        holes = [n for role, n in members if role == "inner"]
        area, _, _ = _ring_area_and_poly(outer, coords)
        for h in holes:
            ha, _, _ = _ring_area_and_poly(h, coords)
            area -= ha
        is_rel = 1 if _relation_has_many_tags(doc) else 0
        return [(len(holes), len(outer) - 1, area, is_rel)]
    rings = _build_rings([list(n) for _r, n in members])
    if rings is None:
        return []
    return [(hc, nn, area, 1) for hc, nn, area in group_rings(rings, coords)]


def group_rings(rings: list[list[int]], coords: dict[int, tuple[float, float]],
                *, with_rings: bool = False):
    """buildPolygonsFromRings (:258-334): repeatedly take an outer ring
    (not contained in any other), collect its direct inners, emit
    (hole_count, outer_nodes, area). Shared with coastline assembly
    (:611 reuses the same grouping)."""
    polys = [_ring_area_and_poly(r, coords) for r in rings]
    live = list(range(len(rings)))
    out = []
    while live:
        outer_i = None
        for c in live:
            if not any(
                o != c and _contains(polys[o][1], polys[o][2], polys[c][1][0], polys[c][2][0])
                for o in live
            ):
                outer_i = c
                break
        if outer_i is None:  # mutually-containing degenerate set
            break
        inners = [
            r
            for r in live
            if r != outer_i
            and _contains(polys[outer_i][1], polys[outer_i][2], polys[r][1][0], polys[r][2][0])
            and not any(
                o not in (r, outer_i)
                and o in live
                and _contains(polys[o][1], polys[o][2], polys[r][1][0], polys[r][2][0])
                for o in live
            )
        ]
        area = polys[outer_i][0] - sum(polys[r][0] for r in inners)
        if with_rings:
            out.append((len(inners), len(rings[outer_i]) - 1, area,
                        rings[outer_i], [rings[r] for r in inners]))
        else:
            out.append((len(inners), len(rings[outer_i]) - 1, area))
        live = [r for r in live if r != outer_i and r not in inners]
    return out


def _relation_has_many_tags(doc: int) -> bool:
    return doc % 2 == 0


def assemble_group(group) -> pa.Table:
    """One bucket: assemble every relation in it (Arrow in; the ring
    assembly itself is the reference's inherently sequential
    NodeSequence walk, so per-relation Python is the algorithm, not a
    conversion tax — relation size is template-bounded)."""
    from .overlaps import col_np

    out_url, out_h, out_n, out_a, out_rel = [], [], [], [], []
    rel_doc = col_np(group, "rel_doc", np.int64)
    node_id = col_np(group, "node_id", np.int64)
    lat = col_np(group, "lat", np.float64)
    lon = col_np(group, "lon", np.float64)
    order = np.argsort(rel_doc, kind="stable")
    rel_doc, node_id = rel_doc[order], node_id[order]
    lat, lon = lat[order], lon[order]
    starts = np.concatenate(
        ([0], np.nonzero(rel_doc[1:] != rel_doc[:-1])[0] + 1, [len(rel_doc)])
    )
    for si, ei in zip(starts[:-1], starts[1:]):
        doc = rel_doc[si]
        cls = int(doc) % 5
        members = REL_TEMPLATES[cls]
        coords = {
            int(n): (float(la), float(lo))
            for n, la, lo in zip(node_id[si:ei], lat[si:ei], lon[si:ei])
        }
        for hc, nn, area, is_rel in assemble_relation(int(doc), members, coords):
            out_url.append(f"{synth.URL_PREFIX}{int(doc)}")
            out_h.append(hc)
            out_n.append(nn)
            out_a.append(int(np.floor(area * 1e8 + 0.5)))
            out_rel.append(is_rel)
    if not out_url:
        return pa.table(
            {
                "url": pa.array([], type=pa.string()),
                "hole_count": pa.array([], type=pa.int64()),
                "outer_nodes": pa.array([], type=pa.int64()),
                "area_e8": pa.array([], type=pa.int64()),
                "is_relation": pa.array([], type=pa.int64()),
            }
        )
    return pa.table(
        {
            "url": pa.array(out_url, type=pa.string()),
            "hole_count": pa.array(out_h, type=pa.int64()),
            "outer_nodes": pa.array(out_n, type=pa.int64()),
            "area_e8": pa.array(out_a, type=pa.int64()),
            "is_relation": pa.array(out_rel, type=pa.int64()),
        }
    )


def assemble_rings(sf_dir: str):
    from ..pipelines import datasets

    from .overlaps import n_shuffle_buckets

    docs = datasets.documents_ds(sf_dir, columns=["doc_id"])
    members = docs.map_batches(
        members_from_docs,
        batch_format="pyarrow",
        fn_kwargs={"n_buckets": n_shuffle_buckets()},
    )
    return bucket_groups(
        members, lambda g: assemble_group(g), batch_format="pyarrow"
    )
