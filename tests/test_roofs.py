"""Roof-shape geometry kernels (geo/roofs.py) vs reference semantics
(world/modules/building/roof/: Roof.java, RoofWithRidge.java,
AbstractGabledRoof.java, AbstractHippedRoof.java, SkillionRoof.java,
PyramidalRoof.java). Pure-kernel tests, no Ray."""

import math

import numpy as np
import pytest

from osm2world_ray.geo import roofs


RECT = np.array([[0.0, 0.0], [11.11, 0.0], [11.11, 4.46], [0.0, 4.46]])
L, W = 11.11, 4.46
PROBE = (0.31 * L, 0.27 * W)


def test_simplify_drops_collinear():
    ring = np.array(
        [[0.0, 0.0], [5.0, 0.0], [10.0, 0.0], [10.0, 4.0], [0.0, 4.0]]
    )
    out = roofs.simplify_ring(ring)
    assert len(out) == 4
    assert not any((v == [5.0, 0.0]).all() for v in out)


def test_min_obb_longest_dir_rotated_rect():
    # a rectangle rotated by 30 degrees: longest box side must follow it
    ang = math.radians(30.0)
    c, s = math.cos(ang), math.sin(ang)
    base = np.array([[0.0, 0.0], [8.0, 0.0], [8.0, 3.0], [0.0, 3.0]])
    rot = base @ np.array([[c, s], [-s, c]])
    ux, uy = roofs.min_obb_longest_dir(rot)
    got = abs(ux * c + uy * s)
    assert got == pytest.approx(1.0, abs=1e-12)


def test_snap_direction_precision_classes():
    # integer tag: pi/18 tolerance -> 87 deg snaps to the 90-deg segment
    assert roofs.snap_direction("87", RECT) == pytest.approx(math.pi / 2)
    # but 70 deg is out of tolerance -> kept
    assert roofs.snap_direction("70", RECT) == pytest.approx(math.radians(70))
    # decimal tag: pi/360 tolerance -> 87.0 deg is NOT snapped
    assert roofs.snap_direction("87.0", RECT) == pytest.approx(math.radians(87))
    # cardinal tag: pi/4 tolerance -> NE (45 deg) snaps to an axis
    got = roofs.snap_direction("NE", RECT)
    assert got in (pytest.approx(0.0), pytest.approx(math.pi / 2))


def test_gabled_rect_closed_form():
    r = roofs.roof_compute(
        RECT, {"roof:shape": "gabled", "roof:angle": "26.4"}, PROBE
    )
    h = math.tan(math.radians(26.4)) * (W / 2)
    assert r["ridge_len"] == pytest.approx(L)
    assert r["max_dist"] == pytest.approx(W / 2)
    assert r["roof_h"] == pytest.approx(h)
    assert r["probe_h"] == pytest.approx(h * (1 - 0.46))
    assert r["n_inner"] == 1
    x1, y1, x2, y2 = r["ridge"]
    assert (x1, y1) == (pytest.approx(0.0, abs=1e-9), pytest.approx(W / 2))
    assert (x2, y2) == (pytest.approx(L), pytest.approx(W / 2))


def test_gabled_across_flips_ridge():
    r = roofs.roof_compute(
        RECT,
        {"roof:shape": "gabled", "roof:orientation": "across",
         "roof:height": "3.63"},
        PROBE,
    )
    assert r["ridge_len"] == pytest.approx(W)
    assert r["max_dist"] == pytest.approx(L / 2)
    assert r["probe_h"] == pytest.approx(3.63 * (1 - 0.38))


def test_hipped_offsets_and_sectors():
    r = roofs.roof_compute(
        RECT, {"roof:shape": "hipped", "roof:height": "3.00"}, PROBE
    )
    o = W / 3
    assert r["ridge_len"] == pytest.approx(L - 2 * o)
    assert r["max_dist"] == pytest.approx(math.sqrt(o * o + (W / 2) ** 2))
    assert r["n_inner"] == 5
    # probe in the main section: the plain gabled formula applies
    assert r["probe_h"] == pytest.approx(3.0 * (1 - 0.46))
    # a probe inside the triangular end sector interpolates the
    # sector triangle (AbstractHippedRoof.getRoofHeightAt)
    r2 = roofs.roof_compute(
        RECT, {"roof:shape": "hipped", "roof:height": "3.00"},
        (0.05, W / 2),
    )
    assert 0.0 < r2["probe_h"] < 3.0 * (1 - 0.46)


def test_skillion_four_directions():
    # direction 0 = north: the roof slopes DOWN toward north, top at south
    for tag, length, rel in (
        ("0", W, 0.27), ("90", L, 0.31), ("180", W, 0.73), ("270", L, 0.69)
    ):
        r = roofs.roof_compute(
            RECT,
            {"roof:shape": "skillion", "roof:direction": tag,
             "roof:height": "3.00"},
            PROBE,
        )
        assert r["max_dist"] == pytest.approx(length), tag
        assert r["probe_h"] == pytest.approx(3.0 * (1 - rel)), tag
        assert r["ridge_len"] == pytest.approx(2 * math.sqrt(L * L + W * W))


def test_skillion_without_direction_is_flat_at_height():
    r = roofs.roof_compute(
        RECT, {"roof:shape": "skillion", "roof:height": "2.50"}, PROBE
    )
    assert r["probe_h"] == pytest.approx(2.5)
    assert r["ridge_len"] == 0.0


def test_pyramidal_fan_interpolation():
    r = roofs.roof_compute(
        RECT, {"roof:shape": "pyramidal", "roof:height": "3.21"}, PROBE
    )
    # probe in the bottom fan triangle: plane height = h * y / (W/2)
    assert r["probe_h"] == pytest.approx(3.21 * 0.54)
    assert r["n_inner"] == 4
    # at the apex itself
    r2 = roofs.roof_compute(
        RECT, {"roof:shape": "pyramidal", "roof:height": "3.21"},
        (L / 2, W / 2),
    )
    assert r2["probe_h"] == pytest.approx(3.21)


def test_flat_default_and_unknown_shape():
    for tags in ({}, {"roof:shape": "zigzag"}):
        r = roofs.roof_compute(RECT, tags, PROBE)
        assert r["shape"] == "flat"
        assert r["roof_h"] == 0.0 and r["probe_h"] == 0.0


def test_ridge_on_lshape_polygon():
    # non-convex L: ridge line through the centroid still finds the two
    # outermost intersections (RoofWithRidge takes first/last hits)
    lshape = np.array(
        [[0.0, 0.0], [10.0, 0.0], [10.0, 2.0], [4.0, 2.0],
         [4.0, 5.0], [0.0, 5.0]]
    )
    r = roofs.roof_compute(
        lshape, {"roof:shape": "gabled", "roof:height": "3.00"}, (1.0, 1.0)
    )
    x1, y1, x2, y2 = r["ridge"]
    assert x2 - x1 == pytest.approx(10.0)  # spans the full x extent
    assert r["roof_h"] == 3.0


def test_direction_tag_overrides_orientation():
    # roof:direction wins over the bbox default; ridge is ORTHOGONAL to it
    r = roofs.roof_compute(
        RECT,
        {"roof:shape": "gabled", "roof:direction": "0",
         "roof:height": "3.00"},
        PROBE,
    )
    # direction north -> ridge east-west (along x): full length L
    assert r["ridge_len"] == pytest.approx(L)


def test_roof_geometry_error_propagates_as_error():
    # degenerate sliver where the ridge line cannot produce 2 hits
    with pytest.raises(roofs.RoofGeometryError):
        roofs.ridge_with_offsets(
            np.array([[0.0, 0.0], [1.0, 0.0], [2.0, 0.0]]), (0.0, 1.0), 0, 0
        )
