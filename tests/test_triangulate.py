"""Ear-clipping triangulation kernel tests (earcut semantics,
TriangulationUtil.java:22-91 analogue)."""

import numpy as np

from osm2world_ray.geo.triangulate import _area2, earcut, triangle_areas


def shoelace(ring):
    return abs(_area2(np.asarray(ring, dtype=float))) / 2


def check(ring):
    ring = np.asarray(ring, dtype=float)
    tris = earcut(ring)
    assert len(tris) == len(ring) - 2
    # triangles cover the polygon exactly (area preserved)
    assert abs(triangle_areas(ring, tris).sum() - shoelace(ring)) < 1e-12
    # every triangle non-degenerate
    assert (triangle_areas(ring, tris) > 0).all()
    return tris


def test_convex_square_and_diamond():
    check([[0, 0], [4, 0], [4, 4], [0, 4]])
    check([[0, -1], [1, 0], [0, 1], [-1, 0]])


def test_winding_insensitive():
    cw = [[0, 4], [4, 4], [4, 0], [0, 0]]
    check(cw)


def test_concave_L_shape():
    check([[0, 0], [4, 0], [4, 2], [2, 2], [2, 4], [0, 4]])


def test_concave_star_arm():
    check([[0, 0], [6, 0], [6, 6], [3, 1.5], [0, 6]])


def test_many_vertices_circle():
    t = np.linspace(0, 2 * np.pi, 40, endpoint=False)
    check(np.c_[np.cos(t), np.sin(t)])


def test_degenerate_inputs():
    assert len(earcut(np.array([[0.0, 0.0], [1.0, 1.0]]))) == 0
    assert len(earcut(np.array([[0.0, 0.0], [1.0, 0.0], [0.0, 1.0]]))) == 1
