"""Network junction / connector cut geometry.

Reference semantics (``world/network/NetworkCalculator.java:44-114``):
per map node, gather the connected typed network segments (angular
order, ``MapNode.sortLinesByAngle``: direction angle FROM the node,
``VectorXZ.angle()`` = atan2(x, z) in [0, 2pi)) and set each segment's
start/end cut triple (left contact, cut point, right contact):

- degree >= 3 with a junction representation
  (``calculateJunctionNodeEffects`` :225-369): intersect the LEFT edge
  line of each segment with the RIGHT edge line of its angular
  successor (null when nearly parallel, threshold pi/18); per segment,
  project {node, intersection i, intersection i-1} perpendicularly
  onto its line and cut at the candidate farthest from a reference
  point 201 units beyond the far end (:294-298); contacts at
  +-width/2 along the segment's right normal; finally snap-merge
  adjacent contacts closer than 0.01 (:330-338).
- degree == 2 of one type (``calculateConnectorNodeEffects``
  :119-220): cut along the angle bisector of the two directions
  (right-pointing, the exact-equality straight-line case falls back to
  the right normal), zero-length connector offsets.
- otherwise (:371-383): orthogonal cut at the node.

Engine shape: the synthetic network is one star node per document
(spoke count 1 + doc%4, a T-junction class with an exactly-parallel
spoke pair exercising the null-intersection branch, plus straight and
bent 2-degree connectors). Incidence rows fan out from documents,
shuffle once on a bounded bucket of the node key, and the per-bucket
kernel runs every branch VECTORIZED across all nodes of the bucket
(cyclic-neighbor indices via group offsets — no per-node Python).
Outputs are node-relative micro-degree ints, so the oracle replays the
closed-form trigonometry without the translation field.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..sources import synth
from .overlaps import bucket_groups, bucket_of

#: spoke length (degrees); the reference point then sits at
#: -(201 - L/2) = -200.5 along the spoke direction
SPOKE_LEN = 1.0
#: NetworkCalculator.PARALLEL_ROAD_THRESHOLD_ANGLE
PARALLEL_EPS = np.pi / 18
#: NetworkCalculator.JUNCTION_OUTLINE_SNAP_DISTANCE
SNAP_DIST = 0.01
#: GeometryUtil.EPSILON (a 0.0001f float literal)
LINE_EPS = float(np.float32(0.0001))

#: SQL mirror of :func:`spokes_from_docs` (CTE over ``documents``)
SPOKES_SQL = """
spk AS (
  SELECT doc_id, k,
         CASE WHEN doc_id % 11 = 0 THEN 3 ELSE 1 + doc_id % 4 END AS deg,
         0.3 * (doc_id % 7) AS base
  FROM documents, (SELECT unnest([0, 1, 2, 3]) AS k) ks
  WHERE k < CASE WHEN doc_id % 11 = 0 THEN 3 ELSE 1 + doc_id % 4 END
),
spokes AS (
  SELECT doc_id, k, deg,
         CASE
           WHEN doc_id % 11 = 0 THEN
             CASE k WHEN 0 THEN 1.0 WHEN 1 THEN 0.0 ELSE -1.0 END
           WHEN deg = 2 AND k = 1 THEN
             CASE WHEN doc_id % 8 = 5 THEN cos(base + 2.0) ELSE -cos(base) END
           ELSE cos(base + 2 * pi() * k / deg)
         END AS dx,
         CASE
           WHEN doc_id % 11 = 0 THEN
             CASE k WHEN 0 THEN 0.0 WHEN 1 THEN 1.0 ELSE 0.0 END
           WHEN deg = 2 AND k = 1 THEN
             CASE WHEN doc_id % 8 = 5 THEN sin(base + 2.0) ELSE -sin(base) END
           ELSE sin(base + 2 * pi() * k / deg)
         END AS dy,
         0.02 + 0.0037 * ((doc_id * 4 + k) % 5) AS w
  FROM spk
)
"""


def spokes_from_docs(batch: pa.Table, *, n_buckets: int) -> pa.Table:
    """documents batch -> spoke incidence rows (url, k, dx, dy, w,
    bucket). Directions are UNIT outbound vectors; the node itself is
    implicit (outputs are node-relative)."""
    doc = batch["doc_id"].to_numpy().astype(np.int64)
    t_mask = doc % 11 == 0
    deg = np.where(t_mask, 3, 1 + doc % 4)
    rep = np.repeat(np.arange(len(doc)), deg)
    ends = np.cumsum(deg)
    k = np.arange(int(ends[-1]) if len(doc) else 0, dtype=np.int64) \
        - np.repeat(ends - deg, deg)
    d = doc[rep]
    dg = deg[rep]
    base = 0.3 * (d % 7)
    dx = np.cos(base + 2 * np.pi * k / dg)
    dy = np.sin(base + 2 * np.pi * k / dg)
    # straight / bent 2-degree connectors: k=1 is the exact negation
    # (straight, triggers the reference's equals() branch) or a bent
    # +2.0 rad spoke
    two1 = (dg == 2) & (k == 1)
    straight = two1 & (d % 8 != 5)
    bent = two1 & (d % 8 == 5)
    dx[straight] = -np.cos(base[straight])
    dy[straight] = -np.sin(base[straight])
    dx[bent] = np.cos(base[bent] + 2.0)
    dy[bent] = np.sin(base[bent] + 2.0)
    # T-junction: exact-literal east/north/west spokes (the east-west
    # pair is exactly parallel -> null intersection path)
    tm = t_mask[rep]
    dx[tm] = np.choose(k[tm], [1.0, 0.0, -1.0])
    dy[tm] = np.choose(k[tm], [0.0, 1.0, 0.0])
    import pyarrow.compute as pc

    url = pc.binary_join_element_wise(
        synth.URL_PREFIX, pc.cast(pa.array(d), pa.string()), ""
    )
    return pa.table(
        {
            "url": url,
            "k": pa.array(k),
            "dx": pa.array(dx),
            "dy": pa.array(dy),
            "w": pa.array(0.02 + 0.0037 * ((d * 4 + k) % 5)),
            "bucket": pa.array(bucket_of(d, n_buckets)),
        }
    )


def _fold_angle(a1: np.ndarray, a2: np.ndarray) -> np.ndarray:
    """VectorXZ.angleBetween from two [0,2pi) angles."""
    raw = np.abs(a1 - a2)
    return np.where(raw <= np.pi, raw, 2 * np.pi - raw)


def junction_cuts(group: pd.DataFrame) -> pa.Table:
    """Bucket of spoke rows -> per-spoke cut triples, node-relative
    micro-degrees. Fully vectorized across the bucket's nodes."""
    empty = pa.table(
        {
            "url": pa.array([], type=pa.string()),
            "k": pa.array([], type=pa.int64()),
            "case_code": pa.array([], type=pa.int64()),
            "lx_udeg": pa.array([], type=pa.int64()),
            "ly_udeg": pa.array([], type=pa.int64()),
            "cx_udeg": pa.array([], type=pa.int64()),
            "cy_udeg": pa.array([], type=pa.int64()),
            "rx_udeg": pa.array([], type=pa.int64()),
            "ry_udeg": pa.array([], type=pa.int64()),
        }
    )
    if len(group) == 0:
        return empty
    from .overlaps import col_np, doc_ids_of

    if isinstance(group, pa.Table):
        url = np.asarray(group["url"].to_pylist(), dtype=object)
    else:
        url = group["url"].to_numpy()
    doc = doc_ids_of(group)
    k = col_np(group, "k", np.int64)
    dx = col_np(group, "dx", np.float64)
    dy = col_np(group, "dy", np.float64)
    w = col_np(group, "w", np.float64)
    # angular order around each node (VectorXZ.angle(): atan2(x, z))
    ang = np.arctan2(dx, dy)
    ang = np.where(ang < 0, ang + 2 * np.pi, ang)
    order = np.lexsort((k, ang, doc))
    url, doc, k, dx, dy, w, ang = (
        a[order] for a in (url, doc, k, dx, dy, w, ang)
    )
    n = len(doc)
    first = np.ones(n, dtype=bool)
    first[1:] = doc[1:] != doc[:-1]
    gid = np.cumsum(first) - 1
    starts = np.flatnonzero(first)
    counts = np.diff(np.append(starts, n))
    start_of = starts[gid]
    deg = counts[gid]
    pos = np.arange(n) - start_of
    nxt = np.where(pos == deg - 1, start_of, np.arange(n) + 1)
    prv = np.where(pos == 0, start_of + deg - 1, np.arange(n) - 1)
    # right normal of a unit direction (VectorXZ.rightNormal)
    rnx, rny = dy, -dx

    lx = np.zeros(n)
    ly = np.zeros(n)
    cx = np.zeros(n)
    cy = np.zeros(n)
    rx = np.zeros(n)
    ry = np.zeros(n)
    case_code = np.where(deg >= 3, 1, np.where(deg == 2, 2, 3))

    # --- degree 1: orthogonal cut at the node (:371-383) ---
    m1 = deg == 1
    if m1.any():
        tx = rnx[m1] * w[m1] * 0.5
        ty = rny[m1] * w[m1] * 0.5
        lx[m1], ly[m1] = -tx, -ty
        rx[m1], ry[m1] = tx, ty
        # cut point stays at the node (0, 0)

    # --- degree 2: bisector connector (:119-188), both outbound ---
    m2 = deg == 2
    if m2.any():
        i1 = np.flatnonzero(m2 & (pos == 0))
        i2 = i1 + 1
        invx, invy = -dx[i1], -dy[i1]  # inVector (outbound -> inverted)
        outx, outy = dx[i2], dy[i2]
        eqs = (invx == outx) & (invy == outy)  # exact straight line
        cvx = np.where(eqs, outy, outx - invx)  # rightNormal fallback
        cvy = np.where(eqs, -outx, outy - invy)
        ln = np.sqrt(cvx * cvx + cvy * cvy)  # VectorXZ.length() form
        cvx, cvy = cvx / ln, cvy / ln
        # right-pointing: y-cross of (inVector x cutVector) positive
        flip = invy * cvx - invx * cvy <= 0
        cvx = np.where(flip, -cvx, cvx)
        cvy = np.where(flip, -cvy, cvy)
        # connectorLength = 0 -> both cut centers at the node;
        # segment1 toRight = cut * (-w/2), segment2 toRight = cut * (+w/2)
        t1x, t1y = cvx * (-w[i1] * 0.5), cvy * (-w[i1] * 0.5)
        t2x, t2y = cvx * (w[i2] * 0.5), cvy * (w[i2] * 0.5)
        lx[i1], ly[i1], rx[i1], ry[i1] = -t1x, -t1y, t1x, t1y
        lx[i2], ly[i2], rx[i2], ry[i2] = -t2x, -t2y, t2x, t2y

    # --- degree >= 3: junction (:225-369) ---
    mj = deg >= 3
    if mj.any():
        j = np.flatnonzero(mj)
        t = nxt[j]
        # left edge of s (outbound flip), right edge of successor t
        spx = 0.5 * SPOKE_LEN * dx[j] + rnx[j] * 0.5 * w[j]
        spy = 0.5 * SPOKE_LEN * dy[j] + rny[j] * 0.5 * w[j]
        sdx, sdy = -dx[j], -dy[j]
        tpx = 0.5 * SPOKE_LEN * dx[t] - rnx[t] * 0.5 * w[t]
        tpy = 0.5 * SPOKE_LEN * dy[t] - rny[t] * 0.5 * w[t]
        tdx, tdy = -dx[t], -dy[t]
        # near-parallel exclusion: angleBetween(sEdgeDir, -tEdgeDir);
        # conditional subtract (not fmod) so the SQL mirror is bitwise
        a1 = np.where(
            ang[j] + np.pi >= 2 * np.pi,
            ang[j] + np.pi - 2 * np.pi,
            ang[j] + np.pi,
        )  # angle(-dir_s)
        parallel = _fold_angle(a1, ang[t]) < PARALLEL_EPS
        denom = sdy * tdx - sdx * tdy  # getLineIntersection denominator
        parallel |= np.abs(denom) <= LINE_EPS
        with np.errstate(divide="ignore", invalid="ignore"):
            tt = ((tpy - spy) * tdx - (tpx - spx) * tdy) / denom
            ix = np.where(parallel, np.nan, spx + tt * sdx)
            iy = np.where(parallel, np.nan, spy + tt * sdy)
        # intersections indexed by pair start row; map back to rows
        ipos = np.full(n, np.nan)
        ipos_y = np.full(n, np.nan)
        ipos[j] = ix
        ipos_y[j] = iy
        # candidate cut parameters along the spoke (node-relative
        # projection: s = p . dir); node candidate s=0; distance to the
        # reference point at -200.5*dir is monotone in s
        with np.errstate(invalid="ignore"):
            s_self = ipos[j] * dx[j] + ipos_y[j] * dy[j]
            s_prev = ipos[prv[j]] * dx[j] + ipos_y[prv[j]] * dy[j]
        smax = np.fmax(np.fmax(np.nan_to_num(s_self, nan=-np.inf),
                               np.nan_to_num(s_prev, nan=-np.inf)), 0.0)
        cx[j] = smax * dx[j]
        cy[j] = smax * dy[j]
        scx = rnx[j] * 0.5 * w[j]
        scy = rny[j] * 0.5 * w[j]
        lx[j], ly[j] = cx[j] - scx, cy[j] - scy
        rx[j], ry[j] = cx[j] + scx, cy[j] + scy
        # snap-merge: right contact of i pulls to the left contact of
        # its angular successor when closer than 0.01 (:330-338)
        dxs = lx[nxt[j]] - rx[j]
        dys = ly[nxt[j]] - ry[j]
        close = np.sqrt(dxs * dxs + dys * dys) < SNAP_DIST
        rx[j] = np.where(close, lx[nxt[j]], rx[j])
        ry[j] = np.where(close, ly[nxt[j]], ry[j])

    def snap(v):
        return pa.array(np.floor(v * 1e6 + 0.5).astype(np.int64))

    return pa.table(
        {
            "url": pa.array(url, type=pa.string()),
            "k": pa.array(k),
            "case_code": pa.array(case_code),
            "lx_udeg": snap(lx),
            "ly_udeg": snap(ly),
            "cx_udeg": snap(cx),
            "cy_udeg": snap(cy),
            "rx_udeg": snap(rx),
            "ry_udeg": snap(ry),
        }
    )


def network_junctions(docs_ds):
    """documents -> per-spoke cut geometry via one bounded-bucket
    shuffle and the vectorized per-bucket kernel."""
    from .overlaps import n_shuffle_buckets

    spokes = docs_ds.map_batches(
        spokes_from_docs,
        batch_format="pyarrow",
        fn_kwargs={"n_buckets": n_shuffle_buckets()},
    )
    return bucket_groups(
        spokes, lambda g: junction_cuts(g), batch_format="pyarrow"
    )
