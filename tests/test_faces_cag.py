"""Face decomposition / CAG subtract / hole-bridged earcut kernels."""

import numpy as np

from osm2world_ray.geo.faces import faces_from_edges, split_polygon_into_faces
from osm2world_ray.geo.triangulate import earcut_with_holes, triangle_areas


def rect(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])


BASE = rect(0, 0, 0.6, 0.4)


def _total(faces):
    return sum(f[2] for f in faces)


def test_subtract_interior_hole():
    f = split_polygon_into_faces(BASE, [], [[rect(0.2, 0.1, 0.4, 0.2)]])
    assert len(f) == 1 and len(f[0][1]) == 1
    assert abs(_total(f) - 0.22) < 1e-12


def test_subtract_edge_notch():
    f = split_polygon_into_faces(BASE, [], [[rect(-0.1, 0.1, 0.1, 0.3)]])
    assert len(f) == 1 and len(f[0][1]) == 0
    assert abs(_total(f) - 0.22) < 1e-12


def test_subtract_band_splits_into_two_faces():
    f = split_polygon_into_faces(BASE, [], [[rect(0.25, -0.1, 0.3, 0.5)]])
    assert len(f) == 2
    assert sorted(round(x[2], 6) for x in f) == [0.1, 0.12]


def test_subtract_disjoint_is_noop():
    f = split_polygon_into_faces(BASE, [], [[rect(0, 0.5, 0.1, 0.6)]])
    assert len(f) == 1 and abs(_total(f) - 0.24) < 1e-12


def test_subtract_overlapping_pair():
    f = split_polygon_into_faces(
        BASE, [], [[rect(0.1, 0.1, 0.3, 0.3)], [rect(0.2, 0.2, 0.4, 0.35)]]
    )
    # union area 0.04 + 0.03 - 0.01 = 0.06
    assert abs(_total(f) - 0.18) < 1e-12


def test_subtract_polygon_with_hole_leaves_island():
    f = split_polygon_into_faces(
        BASE, [], [[rect(0.1, 0.1, 0.5, 0.3), rect(0.2, 0.15, 0.4, 0.25)]]
    )
    assert len(f) == 2  # outer-with-hole + the island inside the sub's hole
    assert abs(_total(f) - 0.18) < 1e-12


def test_face_walk_orientation():
    edges = {((0.0, 0.0), (1.0, 0.0)), ((1.0, 0.0), (1.0, 1.0)),
             ((1.0, 1.0), (0.0, 1.0)), ((0.0, 1.0), (0.0, 0.0))}
    edges = {(min(a, b), max(a, b)) for a, b in edges}
    ccw, cw = faces_from_edges(edges)
    assert len(ccw) == 1 and len(cw) == 1  # interior face + infinite face


def test_earcut_with_holes_counts_and_area():
    outer = rect(0, 0, 0.6, 0.4)
    holes = [rect(0.1, 0.1, 0.3, 0.2), rect(0.4, 0.25, 0.5, 0.3)]
    verts, tris = earcut_with_holes(outer, holes)
    assert len(tris) == len(verts) - 2 == 14
    assert abs(triangle_areas(verts, tris).sum() - 0.215) < 1e-12
    # no triangle overlaps a hole (centroid test)
    cen = verts[tris].mean(axis=1)
    for h in holes:
        inside = (
            (cen[:, 0] > h[0][0]) & (cen[:, 0] < h[2][0])
            & (cen[:, 1] > h[0][1]) & (cen[:, 1] < h[2][1])
        )
        assert not inside.any()


def test_earcut_with_holes_input_winding_agnostic():
    outer = rect(0, 0, 1, 1)[::-1]  # CW outer
    hole = rect(0.4, 0.4, 0.6, 0.6)  # CCW hole
    verts, tris = earcut_with_holes(outer, [hole])
    assert abs(triangle_areas(verts, tris).sum() - 0.96) < 1e-12
