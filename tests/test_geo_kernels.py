"""Kernel tests: projection (mm snap), PIP with holes, WKB, clip,
segment intersection, grid index — mirrors the reference's math-package
JUnit coverage (GeometryUtilTest, SimplePolygonXZTest, IndexGridTest,
MetricMapProjectionTest)."""

import numpy as np
import pytest

from osm2world_ray.geo import clip, pip, segments, wkb
from osm2world_ray.geo.cells import cell_of, k_ring, parent, unpack_cell
from osm2world_ray.geo.gridindex import GridIndex
from osm2world_ray.geo.projection import MetricProjection, snap_mm, snap_mm_int


# ---------------- projection ----------------
def test_projection_origin_is_zero():
    p = MetricProjection(48.56687, 13.45127)
    x, z = p.to_xz(np.array([48.56687]), np.array([13.45127]))
    assert x[0] == 0.0 and z[0] == 0.0


def test_projection_forward_inverse_roundtrip():
    p = MetricProjection(48.56687, 13.45127)
    lat = np.array([48.567, 48.58, 48.5])
    lon = np.array([13.452, 13.40, 13.50])
    x, z = p.to_xz(lat, lon)
    lat2, lon2 = p.to_lat_lon(x, z)
    assert np.allclose(lat, lat2, atol=1e-7)
    assert np.allclose(lon, lon2, atol=1e-7)


def test_projection_scale_is_metric():
    # ~1 unit per meter: 0.001 deg lat ~ 111.2 m at any mercator lat
    p = MetricProjection(48.0, 13.0)
    _, z = p.to_xz(np.array([48.001]), np.array([13.0]))
    assert 105 < z[0] < 115


def test_snap_mm():
    assert snap_mm(np.array([1.00049999]))[0] == 1.0
    assert snap_mm(np.array([1.0005]))[0] == 1.001
    assert snap_mm_int(np.array([-2.0004]))[0] == -2000
    # snapped float and mm-int agree
    v = np.array([123.4567891, -0.0009, 7.7775])
    assert np.array_equal(snap_mm_int(v), (snap_mm(v) * 1000).round().astype(np.int64))


# ---------------- PIP ----------------
SQUARE = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
HOLE = np.array([[1.0, 1.0], [2.0, 1.0], [2.0, 2.0], [1.0, 2.0]])
DIAMOND = np.array([[2.0, 0.0], [4.0, 2.0], [2.0, 4.0], [0.0, 2.0]])


def test_pip_square():
    px = np.array([2.0, 5.0, -1.0, 0.5])
    py = np.array([2.0, 2.0, 2.0, 0.5])
    got = pip.points_in_ring(px, py, SQUARE)
    assert got.tolist() == [True, False, False, True]


def test_pip_hole():
    px = np.array([1.5, 0.5, 3.0])
    py = np.array([1.5, 0.5, 3.0])
    got = pip.points_in_polygon(px, py, SQUARE, [HOLE])
    assert got.tolist() == [False, True, True]


def test_pip_diamond():
    got = pip.points_in_ring(
        np.array([2.0, 0.5, 3.9, 2.0]), np.array([2.0, 0.5, 3.9, 5.0]), DIAMOND
    )
    assert got.tolist() == [True, False, False, False]


def test_pip_closed_ring_tolerated():
    closed = pip.close_ring(SQUARE)
    assert len(closed) == 5
    got = pip.points_in_ring(np.array([2.0]), np.array([2.0]), closed)
    assert got.tolist() == [True]


def test_ring_helpers():
    assert pip.ring_area(SQUARE) == 16.0
    dup = np.array([[0, 0], [1, 0], [1, 0], [1, 1], [0, 0]], dtype=float)
    assert len(pip.drop_consecutive_duplicates(dup)) == 4
    assert pip.ring_bbox(DIAMOND) == (0.0, 0.0, 4.0, 4.0)


# ---------------- WKB ----------------
def test_wkb_polygon_roundtrip():
    buf = wkb.encode_polygon([SQUARE, HOLE])
    polys = wkb.decode(buf)
    assert len(polys) == 1
    outer, hole = polys[0]
    assert np.array_equal(outer[:-1], SQUARE)  # closing vertex appended
    assert np.array_equal(hole[:-1], HOLE)


def test_wkb_multipolygon_roundtrip():
    buf = wkb.encode_multipolygon([[SQUARE], [DIAMOND, HOLE]])
    polys = wkb.decode(buf)
    assert len(polys) == 2
    assert len(polys[1]) == 2


# ---------------- clip ----------------
def test_clip_fully_inside():
    got = clip.clip_ring_to_rect(SQUARE, -1, -1, 5, 5)
    assert pip.ring_area(got) == pytest.approx(16.0)


def test_clip_straddling():
    got = clip.clip_ring_to_rect(SQUARE, 2, 2, 10, 10)
    assert pip.ring_area(pip.close_ring(got)) == pytest.approx(4.0)
    assert got[:, 0].min() == 2.0 and got[:, 1].min() == 2.0


def test_clip_outside_empty():
    got = clip.clip_ring_to_rect(SQUARE, 10, 10, 20, 20)
    assert len(got) == 0


def test_clip_diamond_halved():
    got = clip.clip_ring_to_rect(DIAMOND, 0, 0, 2, 4)
    assert pip.ring_area(pip.close_ring(got)) == pytest.approx(4.0)


def test_centers_in_rect_half_open():
    keep = clip.centers_in_rect(np.array([0.0, 2.0, 1.0]), np.array([0.0, 1.0, 2.0]), 0, 0, 2, 2)
    assert keep.tolist() == [True, False, False]


def test_clip_segment():
    keep, x1, y1, x2, y2 = clip.clip_segment_to_rect(
        np.array([-1.0, 5.0]), np.array([1.0, 5.0]),
        np.array([3.0, 6.0]), np.array([1.0, 6.0]),
        0, 0, 2, 2,
    )
    assert keep.tolist() == [True, False]
    assert (x1[0], x2[0]) == (0.0, 2.0)


# ---------------- segment intersection ----------------
def test_segment_intersection_cross():
    m, ix, iy = segments.segment_intersection(
        [0.0], [0.0], [2.0], [2.0], [0.0], [2.0], [2.0], [0.0]
    )
    assert m.tolist() == [True]
    assert ix[0] == 1.0 and iy[0] == 1.0


def test_segment_intersection_parallel_none():
    m, _, _ = segments.segment_intersection(
        [0.0], [0.0], [2.0], [0.0], [0.0], [1.0], [2.0], [1.0]
    )
    assert m.tolist() == [False]


def test_segment_intersection_shared_endpoint_excluded():
    # true variant: meeting at an endpoint is not an intersection
    # (GeometryUtil.getTrueLineSegmentIntersection)
    m, _, _ = segments.segment_intersection(
        [0.0], [0.0], [1.0], [1.0], [1.0], [1.0], [2.0], [0.0], true_only=True
    )
    assert m.tolist() == [False]
    m2, _, _ = segments.segment_intersection(
        [0.0], [0.0], [1.0], [1.0], [1.0], [1.0], [2.0], [0.0], true_only=False
    )
    assert m2.tolist() == [True]


# ---------------- grid index ----------------
def test_grid_index_points():
    rng = np.random.default_rng(42)
    minx = rng.uniform(0, 90, 50)
    miny = rng.uniform(0, 90, 50)
    maxx = minx + rng.uniform(1, 10, 50)
    maxy = miny + rng.uniform(1, 10, 50)
    gi = GridIndex(minx, miny, maxx, maxy, n_cells_hint=16)
    px = rng.uniform(0, 100, 200)
    py = rng.uniform(0, 100, 200)
    q, e = gi.probe_points(px, py)
    # exact reference: brute force bbox containment
    inside = (
        (px[:, None] >= minx[None, :])
        & (px[:, None] <= maxx[None, :])
        & (py[:, None] >= miny[None, :])
        & (py[:, None] <= maxy[None, :])
    )
    expect = set(zip(*np.nonzero(inside)))
    assert set(zip(q.tolist(), e.tolist())) == expect


def test_grid_index_bbox_probe():
    minx = np.array([0.0, 10.0, 20.0])
    miny = np.array([0.0, 10.0, 20.0])
    maxx = minx + 5
    maxy = miny + 5
    gi = GridIndex(minx, miny, maxx, maxy, n_cells_hint=8)
    q, e = gi.probe_bbox([4.0], [4.0], [12.0], [12.0])
    assert set(e.tolist()) == {0, 1}


# ---------------- cells / k-ring ----------------
def test_cell_roundtrip():
    c = cell_of(10, np.array([48.56687]), np.array([13.45127]))
    r, ix, iy = unpack_cell(c)
    assert r[0] == 10
    assert ix[0] == int((13.45127 + 180) * 1024)
    assert iy[0] == int((48.56687 + 90) * 1024)


def test_cell_parent():
    c = cell_of(10, np.array([48.5]), np.array([13.4]))
    p = parent(c, 8)
    r, ix, iy = unpack_cell(p)
    assert r[0] == 8
    _, ix0, iy0 = unpack_cell(c)
    assert ix[0] == ix0[0] >> 2 and iy[0] == iy0[0] >> 2


def test_k_ring():
    c = cell_of(10, np.array([48.5, 0.0]), np.array([13.4, 0.0]))
    row, cells = k_ring(c, 1)
    assert len(row) == 18
    assert len(np.unique(cells[row == 0])) == 9
    # center cell is a member of its own ring
    assert c[0] in cells[row == 0]
