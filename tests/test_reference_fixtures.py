"""Direct parity with the reference's OWN test fixtures: the .osm
files under core-jvm/src/test/resources run through this engine's XML
reader + multipolygon/coastline assembly and must reproduce the
expectations of OSMToMapDataConverterTest.java.
"""

import os

import numpy as np
import pytest

from osm2world_ray.sources.osm_xml import parse_osm_bounds, parse_osm_xml
from osm2world_ray.stages.coastlines import assemble_coastlines
from osm2world_ray.stages.rings import assemble_relation

FIXTURES = "/root/reference/core-jvm/src/test/resources"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(FIXTURES), reason="reference fixtures not present"
)


def _load(name):
    text = open(os.path.join(FIXTURES, name)).read()
    nodes, ways, relations = parse_osm_xml(text)
    bounds = parse_osm_bounds(text)
    coords = {nid: (lat, lon) for nid, lat, lon, _t in nodes}
    way_map = {wid: nids for wid, nids, _t in ways}
    way_tags = {wid: t for wid, nids, t in ways}
    return nodes, ways, relations, coords, way_map, way_tags, bounds


def _mp_areas(name):
    nodes, ways, relations, coords, way_map, _wt, _b = _load(name)
    out = []
    for rid, members, tags in relations:
        wmembers = [
            (role, list(way_map[ref]))
            for t, ref, role in members
            if t == "way" and role in ("outer", "inner")
        ]
        out.extend(assemble_relation(rid, wmembers, coords))
    return out


@pytest.mark.parametrize(
    "fixture",
    [
        "mp_two_holes.osm",
        "mp_two_holes_outer_tagged.osm",
        "mp_two_holes_advanced.osm",
        "mp_two_holes_advanced2.osm",
    ],
)
def test_generic_multipolygon_fixture(fixture):
    """OSMToMapDataConverterTest.genericMultipolygonTest (:50-64):
    1 area with 2 holes and a 6-vertex outer ring (13 area segments =
    6 outer + 4 + 3 hole segments)."""
    areas = _mp_areas(fixture)
    assert len(areas) == 1
    hole_count, outer_nodes, area, _is_rel = areas[0]
    assert hole_count == 2
    assert outer_nodes == 6
    assert area > 0


def _water_areas(name):
    nodes, ways, relations, coords, way_map, way_tags, bounds = _load(name)
    assert bounds is not None
    minlat, minlon, maxlat, maxlon = bounds
    coastlines = []
    for wid, nids, tags in ways:
        if tags.get("natural") == "coastline":
            # (x=lon, y=lat) coordinate lists
            coastlines.append([(coords[n][1], coords[n][0]) for n in nids])
    return assemble_coastlines(
        coastlines, (minlon, minlat, maxlon, maxlat), [], with_polygons=True
    )


def _is_water(polys, lat, lon):
    from osm2world_ray.geo.faces import _point_in_loop

    for _hc, _area, outer, holes in polys:
        if _point_in_loop(lon, lat, outer) and not any(
            _point_in_loop(lon, lat, h) for h in holes
        ):
            return True
    return False


@pytest.mark.parametrize(
    "fixture,land,water",
    [
        (
            "coastline_big_island.osm",
            [(51.4946619, 2.1931507)],
            [(51.4994015, 2.183386), (51.4982682, 2.2522352),
             (51.4590992, 2.2500837), (51.4569336, 2.1838825)],
        ),
        (
            "coastline_islands.osm",
            [(51.4662933, 2.2364075), (51.4780457, 2.2009898)],
            [(51.4815502, 2.2271393), (51.4596942, 2.1930457)],
        ),
        (
            "coastline_islands_and_coast.osm",
            [(51.4957716, 2.2466687), (51.456188, 2.2522958),
             (51.4662933, 2.2364075), (51.4780457, 2.2009898)],
            [(51.4815502, 2.2271393), (51.4596942, 2.1930457)],
        ),
        (
            "coastline_multiple_coasts.osm",
            [(51.4730977, 2.2165471)],
            [(51.4654685, 2.2374005), (51.4978323, 2.1844396),
             (51.4555692, 2.2178711)],
        ),
    ],
)
def test_generic_coastline_fixture(fixture, land, water):
    """OSMToMapDataConverterTest.genericCoastlineTest (:92-190): the
    reference's land probe sites are outside every water area, the
    water sites inside one."""
    polys = _water_areas(fixture)
    assert polys, "no water areas assembled"
    for lat, lon in land:
        assert not _is_water(polys, lat, lon), (fixture, "land wet", lat, lon)
    for lat, lon in water:
        assert _is_water(polys, lat, lon), (fixture, "water dry", lat, lon)


def test_same_coord_nodes_fixture():
    """sameCoordNodes.osm: two nodes with identical coordinates stay
    two distinct entities in the reader (:196-204)."""
    nodes, _w, _r, _c, _wm, _wt, _b = _load("sameCoordNodes.osm")
    assert len(nodes) == 2
    assert nodes[0][1:3] == nodes[1][1:3]
