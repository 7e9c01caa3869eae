"""Incremental 2d Delaunay triangulation + terrain-interpolation probes.

Reference semantics: ``DelaunayTriangulation.java:26-740`` — the
triangulation is seeded with the four corners of the padded bounding
box of the sites at elevation 0 (``DelaunayTriangulation.java:486-505``,
``LinearInterpolator.java:28-36`` pads by 100 units), sites are inserted
incrementally, and two probe modes exist:

- *linear* (``LinearInterpolator.java:40-48``): locate the enclosing
  triangle, evaluate the triangle's plane at the probe position.
- *natural neighbor* (``NaturalNeighborInterpolator.java:44-57`` +
  ``DelaunayTriangulation.probe`` :566-654): Sibson weights — the area
  each existing site's Voronoi cell loses when the probe point is
  (virtually) inserted, normalized by the total stolen area.

Implementation is Bowyer-Watson cavity insertion (equivalent output to
the reference's Flip13/Flip22 stack for sites in general position) with
numpy-array export for vectorized batch probing: triangles are bucketed
into a uniform cell grid so a batch of probes locates its enclosing
triangles with a handful of vectorized barycentric tests instead of a
per-probe walk. Pure numpy — no Ray imports (package layout rule).
"""

from __future__ import annotations

import numpy as np

_EPS = 1e-12


def _circumcenter(ax, ay, bx, by, cx, cy):
    """Circumcircle center of triangle (a,b,c); scalar floats."""
    dx1, dy1 = bx - ax, by - ay
    dx2, dy2 = cx - ax, cy - ay
    d = 2.0 * (dx1 * dy2 - dy1 * dx2)
    if abs(d) < _EPS * _EPS:
        # degenerate (collinear) — midpoint fallback keeps probes finite
        return (ax + bx + cx) / 3.0, (ay + by + cy) / 3.0
    q1 = dx1 * dx1 + dy1 * dy1
    q2 = dx2 * dx2 + dy2 * dy2
    ux = ax + (dy2 * q1 - dy1 * q2) / d
    uy = ay + (dx1 * q2 - dx2 * q1) / d
    return ux, uy


class Delaunay:
    """Build-once incremental triangulation, probe-many (actor state).

    ``pad`` is the bounding-box padding in coordinate units — the
    analogue of the reference's fixed 100 m (our site space is degrees,
    so the default is sized to the synthetic site grid instead).
    """

    def __init__(self, x: np.ndarray, y: np.ndarray, z: np.ndarray, *, pad: float = 1.0):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        z = np.asarray(z, dtype=np.float64)
        if len(x) == 0:
            raise ValueError("No sites with elevation available")  # LinearInterpolator.java:26
        minx, maxx = float(x.min()) - pad, float(x.max()) + pad
        miny, maxy = float(y.min()) - pad, float(y.max()) + pad
        # vertex arrays; first four = padded bbox corners at ele 0
        # (DelaunayTriangulation.java:486-495)
        self.vx = [minx, maxx, maxx, minx]
        self.vy = [miny, miny, maxy, maxy]
        self.vz = [0.0, 0.0, 0.0, 0.0]
        # triangles: tid -> [i, j, k] CCW; neighbor across edge e = edge
        # opposite vertex e, i.e. edge (v[(e+1)%3], v[(e+2)%3])
        self.tv: dict[int, list[int]] = {0: [0, 1, 3], 1: [1, 2, 3]}
        self.tn: dict[int, list[int]] = {0: [1, -1, -1], 1: [-1, 0, -1]}
        self._next_tid = 2
        self._last_tid = 0
        self._arrays = None
        #: sites dropped by degenerate-cavity skips (duplicates, on-edge
        #: hits); exposed so silent data loss is observable on regular
        #: lattices (e.g. raw SRTM grids)
        self.skipped_sites = 0
        for i in range(len(x)):
            self._insert(float(x[i]), float(y[i]), float(z[i]))

    # -- build ------------------------------------------------------------

    def _orient(self, ax, ay, bx, by, px, py):
        return (bx - ax) * (py - ay) - (by - ay) * (px - ax)

    def _locate(self, px: float, py: float) -> int:
        """Walk from the last-touched triangle; brute scan fallback."""
        tid = self._last_tid
        if tid not in self.tv:
            tid = next(iter(self.tv))
        seen = 0
        limit = 4 * len(self.tv) + 16
        while seen < limit:
            seen += 1
            vi, vj, vk = self.tv[tid]
            ax, ay = self.vx[vi], self.vy[vi]
            bx, by = self.vx[vj], self.vy[vj]
            cx, cy = self.vx[vk], self.vy[vk]
            # step across the first edge the point is outside of
            if self._orient(ax, ay, bx, by, px, py) < -_EPS:
                nxt = self.tn[tid][2]
            elif self._orient(bx, by, cx, cy, px, py) < -_EPS:
                nxt = self.tn[tid][0]
            elif self._orient(cx, cy, ax, ay, px, py) < -_EPS:
                nxt = self.tn[tid][1]
            else:
                self._last_tid = tid
                return tid
            if nxt == -1 or nxt not in self.tv:
                break
            tid = nxt
        # robust fallback: exhaustive scan with relaxed epsilon
        best, best_min = -1, -np.inf
        for t, (vi, vj, vk) in self.tv.items():
            ax, ay = self.vx[vi], self.vy[vi]
            bx, by = self.vx[vj], self.vy[vj]
            cx, cy = self.vx[vk], self.vy[vk]
            m = min(
                self._orient(ax, ay, bx, by, px, py),
                self._orient(bx, by, cx, cy, px, py),
                self._orient(cx, cy, ax, ay, px, py),
            )
            if m > best_min:
                best, best_min = t, m
        return best

    def _in_circumcircle(self, tid: int, px: float, py: float) -> bool:
        vi, vj, vk = self.tv[tid]
        ax = self.vx[vi] - px
        ay = self.vy[vi] - py
        bx = self.vx[vj] - px
        by = self.vy[vj] - py
        cx = self.vx[vk] - px
        cy = self.vy[vk] - py
        det = (
            (ax * ax + ay * ay) * (bx * cy - cx * by)
            - (bx * bx + by * by) * (ax * cy - cx * ay)
            + (cx * cx + cy * cy) * (ax * by - bx * ay)
        )
        return det > 0.0

    def _cavity(self, start_tid: int, px: float, py: float) -> set[int]:
        cav = {start_tid}
        stack = [start_tid]
        while stack:
            t = stack.pop()
            for nb in self.tn[t]:
                if nb != -1 and nb not in cav and self._in_circumcircle(nb, px, py):
                    cav.add(nb)
                    stack.append(nb)
        return cav

    def _boundary_ring(self, cav: set[int]):
        """Directed boundary edges of the cavity, chained into a CCW
        ring: list of (a, b, outside_tid) with b of one = a of next."""
        edges = {}
        for t in cav:
            vi, vj, vk = self.tv[t]
            tri = (vi, vj, vk)
            for e in range(3):
                nb = self.tn[t][e]
                if nb == -1 or nb not in cav:
                    a, b = tri[(e + 1) % 3], tri[(e + 2) % 3]
                    edges[a] = (b, nb)
        # chain
        a0 = next(iter(edges))
        ring = []
        a = a0
        for _ in range(len(edges)):
            b, nb = edges[a]
            ring.append((a, b, nb))
            a = b
            if a == a0:
                break
        return ring

    def _insert(self, px: float, py: float, pz: float):
        start = self._locate(px, py)
        cav = self._cavity(start, px, py)
        ring = self._boundary_ring(cav)
        if len(ring) < 3 or ring[-1][1] != ring[0][0]:
            # degenerate chain (duplicate site / exact-boundary case):
            # skip the site rather than corrupt the mesh
            self.skipped_sites += 1
            return
        pidx = len(self.vx)
        self.vx.append(px)
        self.vy.append(py)
        self.vz.append(pz)
        for t in cav:
            del self.tv[t], self.tn[t]
        new_tids = []
        for a, b, nb in ring:
            tid = self._next_tid
            self._next_tid += 1
            self.tv[tid] = [pidx, a, b]  # CCW: p sees a->b counter-clockwise
            self.tn[tid] = [nb, -1, -1]  # edge 0 = (a,b) faces old outside
            if nb != -1:
                nbs = self.tn[nb]
                for e in range(3):
                    if nbs[e] in cav or nbs[e] == -1:
                        tri = self.tv[nb]
                        ea, eb = tri[(e + 1) % 3], tri[(e + 2) % 3]
                        if {ea, eb} == {a, b}:
                            nbs[e] = tid
                            break
            new_tids.append(tid)
        k = len(new_tids)
        for idx in range(k):
            # edge 1 of tid (opposite a) = (b, p) -> next new triangle;
            # edge 2 (opposite b) = (p, a) -> previous new triangle
            self.tn[new_tids[idx]][1] = new_tids[(idx + 1) % k]
            self.tn[new_tids[idx]][2] = new_tids[(idx - 1) % k]
        self._last_tid = new_tids[0]
        self._arrays = None

    # -- export + vectorized probes --------------------------------------

    def finalize(self, *, grid_r: int = 64):
        """Freeze into numpy arrays + a triangle cell-bucket index."""
        if self._arrays is not None:
            return self._arrays
        tids = sorted(self.tv)
        tv = np.array([self.tv[t] for t in tids], dtype=np.int64)
        self._tid_pos = {t: i for i, t in enumerate(tids)}
        tn = np.array(
            [[self._tid_pos.get(n, -1) for n in self.tn[t]] for t in tids],
            dtype=np.int64,
        )
        vx = np.asarray(self.vx)
        vy = np.asarray(self.vy)
        vz = np.asarray(self.vz)
        ax, ay = vx[tv[:, 0]], vy[tv[:, 0]]
        bx, by = vx[tv[:, 1]], vy[tv[:, 1]]
        cx, cy = vx[tv[:, 2]], vy[tv[:, 2]]
        minx = np.minimum(np.minimum(ax, bx), cx)
        maxx = np.maximum(np.maximum(ax, bx), cx)
        miny = np.minimum(np.minimum(ay, by), cy)
        maxy = np.maximum(np.maximum(ay, by), cy)
        # uniform grid over the bbox: grid_r x grid_r cells; CSR buckets
        gx0, gy0 = float(vx[:4].min()), float(vy[:4].min())
        gsx = (float(vx[:4].max()) - gx0) / grid_r or 1.0
        gsy = (float(vy[:4].max()) - gy0) / grid_r or 1.0
        i0 = np.clip(((minx - gx0) / gsx).astype(np.int64), 0, grid_r - 1)
        i1 = np.clip(((maxx - gx0) / gsx).astype(np.int64), 0, grid_r - 1)
        j0 = np.clip(((miny - gy0) / gsy).astype(np.int64), 0, grid_r - 1)
        j1 = np.clip(((maxy - gy0) / gsy).astype(np.int64), 0, grid_r - 1)
        spans = (i1 - i0 + 1) * (j1 - j0 + 1)
        tri_rep = np.repeat(np.arange(len(tv)), spans)
        # enumerate covered cells per triangle (vectorized fan-out)
        offs = np.arange(spans.sum()) - np.repeat(np.cumsum(spans) - spans, spans)
        w = np.repeat(j1 - j0 + 1, spans)
        di = offs // w
        dj = offs % w
        cell = (np.repeat(i0, spans) + di) * grid_r + np.repeat(j0, spans) + dj
        order = np.argsort(cell, kind="stable")
        self._arrays = dict(
            tv=tv, tn=tn, vx=vx, vy=vy, vz=vz,
            gx0=gx0, gy0=gy0, gsx=gsx, gsy=gsy, grid_r=grid_r,
            cell_sorted=cell[order], tri_sorted=tri_rep[order],
        )
        return self._arrays

    def locate_batch(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Enclosing triangle index per probe (-1 if outside bbox)."""
        A = self.finalize()
        px = np.asarray(px, dtype=np.float64)
        py = np.asarray(py, dtype=np.float64)
        gi = np.clip(((px - A["gx0"]) / A["gsx"]).astype(np.int64), 0, A["grid_r"] - 1)
        gj = np.clip(((py - A["gy0"]) / A["gsy"]).astype(np.int64), 0, A["grid_r"] - 1)
        cell = gi * A["grid_r"] + gj
        s = np.searchsorted(A["cell_sorted"], cell, side="left")
        e = np.searchsorted(A["cell_sorted"], cell, side="right")
        counts = e - s
        src = np.repeat(np.arange(len(px)), counts)
        starts = np.repeat(s, counts) + (
            np.arange(counts.sum()) - np.repeat(np.cumsum(counts) - counts, counts)
        )
        tri = A["tri_sorted"][starts]
        tv, vx, vy = A["tv"], A["vx"], A["vy"]
        qx, qy = px[src], py[src]
        ax, ay = vx[tv[tri, 0]], vy[tv[tri, 0]]
        bx, by = vx[tv[tri, 1]], vy[tv[tri, 1]]
        cx, cy = vx[tv[tri, 2]], vy[tv[tri, 2]]
        o0 = (bx - ax) * (qy - ay) - (by - ay) * (qx - ax)
        o1 = (cx - bx) * (qy - by) - (cy - by) * (qx - bx)
        o2 = (ax - cx) * (qy - cy) - (ay - cy) * (qx - cx)
        inside = (o0 >= -_EPS) & (o1 >= -_EPS) & (o2 >= -_EPS)
        out = np.full(len(px), -1, dtype=np.int64)
        # keep the first enclosing triangle per probe (ties on shared
        # edges are equivalent for plane evaluation)
        hit = np.flatnonzero(inside)
        out[src[hit][::-1]] = tri[hit][::-1]
        return out

    def interpolate_linear(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Plane of the enclosing triangle evaluated at each probe
        (``TriangleXYZ.getYAt`` / ``LinearInterpolator.java:40-48``)."""
        A = self.finalize()
        tri = self.locate_batch(px, py)
        t = np.where(tri >= 0, tri, 0)
        tv, vx, vy, vz = A["tv"], A["vx"], A["vy"], A["vz"]
        ax, ay, az = vx[tv[t, 0]], vy[tv[t, 0]], vz[tv[t, 0]]
        bx, by, bz = vx[tv[t, 1]], vy[tv[t, 1]], vz[tv[t, 1]]
        cx, cy, cz = vx[tv[t, 2]], vy[tv[t, 2]], vz[tv[t, 2]]
        d = (by - cy) * (ax - cx) + (cx - bx) * (ay - cy)
        w0 = ((by - cy) * (px - cx) + (cx - bx) * (py - cy)) / d
        w1 = ((cy - ay) * (px - cx) + (ax - cx) * (py - cy)) / d
        w2 = 1.0 - w0 - w1
        z = w0 * az + w1 * bz + w2 * cz
        return np.where(tri >= 0, z, np.nan)

    def natural_neighbor(self, px: np.ndarray, py: np.ndarray) -> np.ndarray:
        """Sibson natural-neighbor elevation per probe
        (``DelaunayTriangulation.probe`` :566-654: stolen-Voronoi-area
        weights, normalized). Cavity search is per-probe (the geometry
        is inherently local); circumcenters are precomputed once."""
        A = self.finalize()
        tri0 = self.locate_batch(px, py)
        tv, tn, vx, vy, vz = A["tv"], A["tn"], A["vx"], A["vy"], A["vz"]
        ntri = len(tv)
        if "cc" not in A:
            cc = np.empty((ntri, 2))
            for t in range(ntri):
                i, j, k = tv[t]
                cc[t] = _circumcenter(vx[i], vy[i], vx[j], vy[j], vx[k], vy[k])
            A["cc"] = cc
            A["cc_t"] = [(float(p[0]), float(p[1])) for p in cc]
        cc = A["cc"]
        cc_t = A["cc_t"]
        out = np.full(len(px), np.nan)
        for q in range(len(px)):
            t0 = tri0[q]
            if t0 < 0:
                continue
            qx, qy = float(px[q]), float(py[q])
            # cavity via vectorizable BFS on the triangle arrays
            cav = {int(t0)}
            stack = [int(t0)]
            while stack:
                t = stack.pop()
                for nb in tn[t]:
                    nb = int(nb)
                    if nb < 0 or nb in cav:
                        continue
                    i, j, k = tv[nb]
                    ax_, ay_ = vx[i] - qx, vy[i] - qy
                    bx_, by_ = vx[j] - qx, vy[j] - qy
                    cx_, cy_ = vx[k] - qx, vy[k] - qy
                    det = (
                        (ax_ * ax_ + ay_ * ay_) * (bx_ * cy_ - cx_ * by_)
                        - (bx_ * bx_ + by_ * by_) * (ax_ * cy_ - cx_ * ay_)
                        + (cx_ * cx_ + cy_ * cy_) * (ax_ * by_ - bx_ * ay_)
                    )
                    if det > 0.0:
                        cav.add(nb)
                        stack.append(nb)
            # boundary ring a->b CCW around the probe
            edges = {}
            tris_at = {}
            for t in cav:
                i, j, k = (int(v) for v in tv[t])
                tri = (i, j, k)
                for v in tri:
                    tris_at.setdefault(v, []).append(t)
                for e in range(3):
                    nb = int(tn[t][e])
                    if nb < 0 or nb not in cav:
                        edges[tri[(e + 1) % 3]] = (tri[(e + 2) % 3], t)
            a0 = next(iter(edges))
            ring = []
            a = a0
            ok = True
            for _ in range(len(edges)):
                if a not in edges:
                    ok = False
                    break
                b, t_in = edges[a]
                ring.append((a, b, t_in))
                a = b
                if a == a0:
                    break
            if not ok or len(ring) < 3 or ring[-1][1] != ring[0][0]:
                # degenerate cavity: fall back to plane interpolation
                out[q] = self.interpolate_linear(
                    np.array([qx]), np.array([qy])
                )[0]
                continue
            k_ring = len(ring)
            # circumcenters of the virtual new triangles (p, a, b)
            ncc_t = [
                _circumcenter(qx, qy, vx[a], vy[a], vx[b], vy[b])
                for a, b, _t in ring
            ]
            ring_vert = [a for a, _b, _t in ring]
            wsum = 0.0
            zsum = 0.0
            for i_v, v in enumerate(ring_vert):
                # chain old cavity triangles incident to v from the
                # boundary edge (v_prev, v) side to the (v, v_next) side
                prev_v = ring_vert[i_v - 1]
                next_v = ring_vert[(i_v + 1) % k_ring]
                # start triangle: the cavity triangle owning edge prev_v->v
                start_t = ring[i_v - 1][2]
                chain = [start_t]
                cur = start_t
                guard = 0
                while guard < len(cav) + 2:
                    guard += 1
                    i, j, kk = (int(x) for x in tv[cur])
                    tri = (i, j, kk)
                    # neighbor across the edge NOT containing prev side:
                    # walk around v away from where we came
                    e_v = tri.index(v)
                    # two candidate edges touch v: opposite the other two
                    # vertices; pick the neighbor we haven't visited
                    moved = False
                    for e in range(3):
                        if tri[e] == v:
                            continue
                        nb = int(tn[cur][e])
                        if nb >= 0 and nb in cav and nb not in chain:
                            chain.append(nb)
                            cur = nb
                            moved = True
                            break
                    if not moved:
                        break
                # stolen polygon: n_{i-1}, old circumcenters, n_i
                # tiny (~4-7 vertex) polygon: scalar shoelace beats any
                # numpy round-trip by ~5x at this size
                poly = [ncc_t[i_v - 1]]
                poly.extend(cc_t[t] for t in chain)
                poly.append(ncc_t[i_v])
                area2 = 0.0
                x1c, y1c = poly[-1]
                for x2c, y2c in poly:
                    area2 += x1c * y2c - x2c * y1c
                    x1c, y1c = x2c, y2c
                area = 0.5 * abs(area2)
                wsum += area
                zsum += area * vz[v]
            out[q] = zsum / wsum if wsum > 0 else np.nan
        return out
