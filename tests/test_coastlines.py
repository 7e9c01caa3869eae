"""Coastline -> sea-area assembly (createAreasForCoastlines)."""

import numpy as np

from osm2world_ray.stages.coastlines import (
    _probably_sea,
    assemble_coastlines,
    coastline_case,
)

BBOX = (0.0, 0.0, 0.6, 0.4)  # minx(lon), miny(lat), maxx, maxy


def test_island_only_becomes_sea_tile_with_hole():
    island = [(0.2, 0.1), (0.4, 0.1), (0.4, 0.2), (0.2, 0.2), (0.2, 0.1)]
    out = assemble_coastlines([island], BBOX, [])
    assert out == [(1, out[0][1])]
    assert abs(out[0][1] - (0.24 - 0.02)) < 1e-12


def test_island_clockwise_is_lake_not_island():
    """A CW closed ring (water inside-left) is not an island: without a
    sea tag no boundary ring is added and the ring itself is the only
    water area."""
    lake = [(0.2, 0.1), (0.2, 0.2), (0.4, 0.2), (0.4, 0.1), (0.2, 0.1)]
    out = assemble_coastlines([lake], BBOX, [])
    assert len(out) == 1 and out[0][0] == 0
    assert abs(out[0][1] - 0.02) < 1e-12


def test_single_coast_water_on_the_right():
    coast = [(-0.1, 0.25), (0.7, 0.25)]  # west -> east: water south
    out = assemble_coastlines([coast], BBOX, [])
    assert len(out) == 1 and out[0][0] == 0
    assert abs(out[0][1] - 0.25 * 0.6) < 1e-9
    # reversed direction: water north
    out = assemble_coastlines([[(0.7, 0.25), (-0.1, 0.25)]], BBOX, [])
    assert abs(out[0][1] - 0.15 * 0.6) < 1e-9


def test_split_coastline_ways_stitch():
    """The coast delivered as two separate ways sharing a node."""
    a = [(-0.1, 0.25), (0.3, 0.25)]
    b = [(0.3, 0.25), (0.7, 0.25)]
    out = assemble_coastlines([a, b], BBOX, [])
    assert len(out) == 1 and abs(out[0][1] - 0.15) < 1e-9


def test_sea_tile_rules():
    assert _probably_sea([("route", "ferry")])
    assert not _probably_sea([("route", "ferry"), ("landuse", "forest")])
    assert not _probably_sea([])
    out = assemble_coastlines([], BBOX, [("maritime", "yes")])
    assert out == [(0, out[0][1])] and abs(out[0][1] - 0.24) < 1e-12
    assert assemble_coastlines([], BBOX, []) == []


def test_multiple_coasts():
    """Two parallel coasts: water band between them (multiple_coasts
    fixture shape): north coast west->east (water south), south coast
    east->west (water north) -> the middle band is the sea."""
    north = [(-0.1, 0.3), (0.7, 0.3)]
    south = [(0.7, 0.1), (-0.1, 0.1)]
    out = assemble_coastlines([north, south], BBOX, [])
    assert len(out) == 1 and out[0][0] == 0
    assert abs(out[0][1] - 0.2 * 0.6) < 1e-9


def test_case_classes_match_oracle_constants():
    from osm2world_ray.stages.rings import rel_base

    expect = {0: [(1, 0.22)], 1: [(0, 0.15)], 2: [(0, 0.24)], 3: [(1, 0.13)]}
    for d in range(4):
        blat, blon = rel_base(np.array([d]))
        lines, bbox, etags = coastline_case(d, float(blat[0]), float(blon[0]))
        out = assemble_coastlines(lines, bbox, etags)
        assert len(out) == len(expect[d])
        for (hc, a), (ehc, ea) in zip(sorted(out), sorted(expect[d])):
            assert hc == ehc and abs(a - ea) < 1e-9
