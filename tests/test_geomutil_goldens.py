"""Ports of GeometryUtilTest golden values
(core-jvm/src/test/java/org/osm2world/math/algorithms/GeometryUtilTest.java).
Coordinate convention: our y = the reference's z."""

import numpy as np

from osm2world_ray.geo.segments import (
    distance_from_line,
    distance_from_line_segment,
    is_between,
    is_right_of,
    project_perpendicular,
    segment_intersection,
)


def test_line_segment_intersection_golden():
    # GeometryUtilTest:23-30: (-1,-1)->(1,1) x (1,-1)->(-1,1) = (0,0)
    ok, px, py = segment_intersection(
        np.array([-1.0]), np.array([-1.0]), np.array([1.0]), np.array([1.0]),
        np.array([1.0]), np.array([-1.0]), np.array([-1.0]), np.array([1.0]),
        true_only=True,
    )
    assert ok[0] and px[0] == 0.0 and py[0] == 0.0


def test_distance_from_line_golden():
    # GeometryUtilTest:33-44
    assert abs(distance_from_line(0, 0, 1, -10, 1, 10) - 1) < 0.001
    assert abs(distance_from_line(1, 20, 1, -10, 1, 10) - 0) < 0.001
    assert abs(distance_from_line(0, 0, -1, -1, 1, 1) - 0) < 0.001
    assert abs(distance_from_line(5, 5, -1, -1, 1, 1) - 0) < 0.001
    assert abs(distance_from_line(-1, 1, -1, -1, 1, 1) - np.sqrt(2)) < 0.001


def test_distance_from_line_segment_golden():
    # GeometryUtilTest:47-51
    assert abs(distance_from_line_segment(0, 0, 1, -10, 1, 10) - 1) < 0.001
    assert abs(distance_from_line_segment(1, 20, 1, -10, 1, 10) - 10) < 0.001


def test_is_right_of_golden():
    # GeometryUtilTest:54-60 (X_UNIT=(1,0), Z_UNIT=(0,1), NULL=(0,0))
    assert is_right_of(1, 0, 0, 0, 0, 1)
    assert not is_right_of(1, 0, 0, 1, 0, 0)
    assert is_right_of(0, 0, 0, 1, 1, 0)
    assert not is_right_of(0, 0, 1, 0, 0, 1)


def test_is_right_of_property():
    # GeometryUtilTest:62-81: v1 + rightNormal(v2) is right of v1->v1+v2;
    # rightNormal((x,z)) = (z, -x) in the reference's convention
    rng_vals = [(-1.0, -1.0), (1.0, 0.0), (0.0, 1.0), (2.0, 3.0), (-3.0, 0.5)]
    for v1 in rng_vals:
        for v2 in rng_vals:
            if v2 == (0.0, 0.0) or v1 == v2:
                continue
            l1 = v1
            l2 = (v1[0] + v2[0], v1[1] + v2[1])
            rn = (v2[1], -v2[0])
            pr = (v1[0] + rn[0], v1[1] + rn[1])
            pl = (v1[0] - rn[0], v1[1] - rn[1])
            assert is_right_of(pr[0], pr[1], l1[0], l1[1], l2[0], l2[1])
            assert not is_right_of(pl[0], pl[1], l1[0], l1[1], l2[0], l2[1])


def test_is_between_golden():
    # GeometryUtilTest:84-90
    assert is_between(0, 0, 1, 0, -1, 0)
    assert is_between(0, 0, -1, 0, 1, 0)
    assert is_between(0, 1, -1, 0, 1, 0)


def test_project_perpendicular():
    fx, fy = project_perpendicular(0, 0, 1, -10, 1, 10)
    assert abs(fx - 1) < 1e-12 and abs(fy - 0) < 1e-12
    fx, fy = project_perpendicular(-1, 1, -1, -1, 1, 1)
    assert abs(fx - 0) < 1e-12 and abs(fy - 0) < 1e-12
