"""Property-based tests (hypothesis) for the round-2 geometry kernels."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osm2world_ray.geo.delaunay import Delaunay
from osm2world_ray.geo.faces import split_polygon_into_faces
from osm2world_ray.geo.triangulate import earcut_with_holes, triangle_areas


def rect(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_delaunay_linear_precision_random_sites(seed):
    rng = np.random.default_rng(seed)
    n = int(rng.integers(10, 60))
    x = rng.uniform(0, 10, n)
    y = rng.uniform(0, 10, n)
    a, b, c = rng.uniform(-5, 5, 3)
    z = a + b * x + c * y
    dt = Delaunay(x, y, z, pad=2.0)
    # probes strictly inside the site hull: convex combinations pulled
    # 20% toward the centroid (a raw combination can sit ON the hull
    # boundary, where the enclosing triangle may touch the padded bbox
    # corners at ele 0)
    w = rng.dirichlet(np.ones(n), size=20)
    px = 0.8 * (w @ x) + 0.2 * x.mean()
    py = 0.8 * (w @ y) + 0.2 * y.mean()
    got = dt.interpolate_linear(px, py)
    want = a + b * px + c * py
    ok = ~np.isnan(got)
    assert ok.mean() > 0.9  # hull-interior probes resolve
    # linear precision only holds where the enclosing triangle uses site
    # vertices exclusively: triangles touching the 4 padded bbox corners
    # (ele 0, vertex ids 0-3) blend in the synthetic corner elevation —
    # the reference behaves identically (DelaunayTriangulation.java:486-495)
    tri = dt.locate_batch(px, py)
    tv = dt.finalize()["tv"]
    site_only = np.full(len(px), False)
    located = tri >= 0
    site_only[located] = (tv[tri[located]] >= 4).all(axis=1)
    check = ok & site_only
    np.testing.assert_allclose(got[check], want[check], atol=1e-7)


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_cag_subtract_area_conservation(seed):
    """area(base) == area(result) + area(base ∩ subtract-union),
    checked against a Monte-Carlo estimate of the covered fraction."""
    rng = np.random.default_rng(seed)
    base = rect(0, 0, 1, 1)
    subs = []
    for _ in range(int(rng.integers(1, 4))):
        x0, y0 = rng.uniform(-0.3, 0.8, 2)
        w, h = rng.uniform(0.1, 0.5, 2)
        subs.append([rect(x0, y0, x0 + w, y0 + h)])
    faces = split_polygon_into_faces(base, [], subs)
    got = sum(f[2] for f in faces)
    # MC ground truth of base-minus-union
    qx = rng.uniform(0, 1, 20000)
    qy = rng.uniform(0, 1, 20000)
    covered = np.zeros(len(qx), dtype=bool)
    for (r,) in subs:
        covered |= (
            (qx > r[0][0]) & (qx < r[2][0]) & (qy > r[0][1]) & (qy < r[2][1])
        )
    want = 1.0 - covered.mean()
    assert abs(got - want) < 0.02
    assert -1e-9 <= got <= 1.0 + 1e-9


@settings(max_examples=25, deadline=None)
@given(st.integers(min_value=0, max_value=10_000))
def test_earcut_holes_area_and_count(seed):
    """n-2 triangles over the merged ring; total area == outer - holes
    for disjoint interior holes."""
    rng = np.random.default_rng(seed)
    outer = rect(0, 0, 1, 1)
    holes = []
    # up to 2 disjoint holes in separate quadrants
    cells = [(0.1, 0.1, 0.4, 0.4), (0.6, 0.6, 0.9, 0.9)]
    for (x0, y0, x1, y1) in cells[: int(rng.integers(0, 3))]:
        w = rng.uniform(0.05, (x1 - x0) * 0.9)
        h = rng.uniform(0.05, (y1 - y0) * 0.9)
        holes.append(rect(x0, y0, x0 + w, y0 + h))
    verts, tris = earcut_with_holes(outer, holes)
    assert len(tris) == len(verts) - 2
    want = 1.0 - sum(
        (h[2][0] - h[0][0]) * (h[2][1] - h[0][1]) for h in holes
    )
    assert abs(triangle_areas(verts, tris).sum() - want) < 1e-9
