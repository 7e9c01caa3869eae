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


def test_huge_areas_fixture_clipping():
    """OSMToMapDataConverterTest.testHugeArea (:222-245): areas much
    larger than the file boundary are clipped to the padded boundary
    (shrinkHugeAreas, OSMToMapDataConverter.java:78-156); small areas
    stay; original nodes inside the window survive the clip."""
    from osm2world_ray.geo.clip import clip_ring_to_rect

    nodes, ways, _r, coords, way_map, _wt, bounds = _load("huge_areas.osm")
    minlat, minlon, maxlat, maxlon = bounds
    b_area = (maxlat - minlat) * (maxlon - minlon)
    pad = 1.0 / 111320.0  # the reference's 1 m pad, in degrees
    node_tags = {nid: t for nid, _la, _lo, t in nodes}

    clipped = {}
    for wid, nids, _t in ways:
        ring = np.array([(coords[n][1], coords[n][0]) for n in nids[:-1]])  # (lon, lat)
        x, y = ring[:, 0] - ring[0, 0], ring[:, 1] - ring[0, 1]
        raw = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
        if raw > 5.0 * b_area:
            out = clip_ring_to_rect(
                ring, minlon - pad, minlat - pad, maxlon + pad, maxlat + pad
            )
            x, y = out[:, 0] - out[0, 0], out[:, 1] - out[0, 1]
            area = 0.5 * abs(np.dot(x, np.roll(y, -1)) - np.dot(y, np.roll(x, -1)))
            clipped[wid] = (area, out, True)
        else:
            clipped[wid] = (raw, ring, False)

    a1, a2, a3 = clipped[-111], clipped[-222], clipped[-333]
    assert a1[2] and a2[2] and not a3[2]  # -111/-222 clipped, -333 kept
    assert a1[0] < 10 * b_area
    assert a2[0] < 10 * b_area
    assert a3[0] < b_area  # small area untouched
    # the tagged original nodes inside the window survive in -222's ring
    existing = [
        (lo, la)
        for nid, la, lo, t in nodes
        if t.get("note") in ("existing1", "existing2")
    ]
    assert len(existing) == 2
    ring_pts = {(round(p[0], 12), round(p[1], 12)) for p in a2[1]}
    for p in existing:
        assert (round(p[0], 12), round(p[1], 12)) in ring_pts


def test_self_intersection_fixture_does_not_crash():
    """OSMToMapDataConverterTest.testSelfIntersection (:209-218): a
    self-intersecting polygon must be readable and processable without
    crashing (filtering is acceptable)."""
    from osm2world_ray.geo.triangulate import earcut, triangle_areas

    nodes, ways, relations, coords, way_map, _wt, _b = _load("self_intersection.osm")
    assert ways
    for wid, nids, _t in ways:
        ring = np.array([(coords[n][1], coords[n][0]) for n in nids[:-1]])
        tris = earcut(ring)  # degenerate input: must terminate
        triangle_areas(ring, tris)


def test_srtm_fixture_get_sites():
    """SRTMDataTest.testGetSites (:24-38): both fixture bounds yield
    non-empty site sets — (4.1,33.1)-(4.2,33.2) from the raw
    N04E033.hgt, (4.1,34.1)-(4.2,34.2) from the ZIPPED
    N04E034.SRTMGL3.hgt.zip."""
    from osm2world_ray.stages.srtm import BLANK_VALUE, SrtmTileSet, sites_for_bbox

    tiles = SrtmTileSet(os.path.join(FIXTURES, "srtm"))
    for bbox in [(33.1, 4.1, 33.2, 4.2), (34.1, 4.1, 34.2, 4.2)]:
        lat, lon, ele = sites_for_bbox(tiles, *bbox)
        assert len(ele) > 0
        assert np.all(ele != BLANK_VALUE)
        assert np.all((lat >= 4.0) & (lat <= 4.3))
        assert np.all((lon >= bbox[0] - 0.1) & (lon <= bbox[2] + 0.1))
        # plausible terrain values for the Sudan/South-Sudan border area
        assert 0 < ele.mean() < 2000


def test_srtm_zip_and_raw_layout_agree():
    """The zip path decodes the same way as the raw path (first
    non-directory entry, SRTMTile.java:42-77)."""
    from osm2world_ray.stages.srtm import PIXELS, SrtmTileSet

    tiles = SrtmTileSet(os.path.join(FIXTURES, "srtm"))
    raw = tiles.tile(33, 4)
    zipped = tiles.tile(34, 4)
    assert raw is not None and raw.shape == (PIXELS, PIXELS)
    assert zipped is not None and zipped.shape == (PIXELS, PIXELS)
    assert tiles.tile(35, 4) is None  # missing tile -> None, no crash


def test_pbf_fixture_cross_format_parity():
    """simpleTest01.osm.pbf (the OSMFileReader PBF path) decodes
    entity-for-entity identically to simpleTest01.osm: same ids, tags,
    way refs and relation members; coordinates within the PBF's 1e-7
    nanodegree-x-granularity quantization."""
    from osm2world_ray.sources.osm_pbf import parse_osm_pbf

    pn, pw, pr = parse_osm_pbf(
        open(os.path.join(FIXTURES, "simpleTest01.osm.pbf"), "rb").read()
    )
    xn, xw, xr, _c, _wm, _wt, _b = (*_load("simpleTest01.osm")[:3],
                                    None, None, None, None)
    assert {n[0] for n in pn} == {n[0] for n in xn}
    xn_d = {n[0]: n for n in xn}
    for nid, lat, lon, tags in pn:
        assert abs(lat - xn_d[nid][1]) < 1e-7
        assert abs(lon - xn_d[nid][2]) < 1e-7
        assert tags == xn_d[nid][3]
    xw_d = {w[0]: w for w in xw}
    assert len(pw) == len(xw)
    for wid, refs, tags in pw:
        assert refs == xw_d[wid][1] and tags == xw_d[wid][2]
    xr_d = {r[0]: r for r in xr}
    assert len(pr) == len(xr)
    for rid, members, tags in pr:
        assert members == xr_d[rid][1] and tags == xr_d[rid][2]


def test_mbtiles_metadata_fixture():
    """MapMetadataMbtilesUtilTest (:17-24): tile (13, 4401, 2827) in
    meta.mbtiles carries MapMetadata(locale="DE", land=true); child
    tiles fall back to the parent's metadata."""
    from osm2world_ray.sources.mbtiles import MbtilesMetadata

    db = MbtilesMetadata(os.path.join(FIXTURES, "meta.mbtiles"))
    try:
        assert db.metadata_for_tile(13, 4401, 2827) == ("DE", True)
        # z14 children have no own entry -> parent fallback
        assert db.metadata_for_tile(14, 8802, 5654) == ("DE", True)
        assert db.metadata_for_tile(14, 8803, 5655) == ("DE", True)
    finally:
        db.close()


def test_metadata_only_locale_json_fixture():
    """metadata_only_locale.json: partial metadata parses with the
    missing field as None (MapMetadata.metadataFromJson)."""
    import json

    doc = json.load(open(os.path.join(FIXTURES, "metadata_only_locale.json")))
    assert doc.get("locale") is not None
    assert doc.get("land") is None


def test_valid_file_fixture():
    """OSMFileReaderTest.testValidFile (:22-41): entity counts, way
    length, tag lookups through the reader."""
    nodes, ways, relations, coords, way_map, _wt, _b = _load("validFile.osm")
    assert len(nodes) == 4 and len(ways) == 1 and len(relations) == 1
    wid, nids, _t = ways[0]
    assert len(nids) == 3
    node_tags = {nid: t for nid, _la, _lo, t in nodes}
    assert node_tags[nids[1]].get("highway") == "traffic_signals"
    assert relations[0][2].get("type") == "associatedStreet"


def test_josm_edit_file_fixture():
    """OSMFileReaderTest.testJosmFileWithEdits (:44-55): deleted
    elements and multiple bounds are handled; 5 nodes, 1 way remain."""
    nodes, ways, relations, *_ = _load("josmTest01.osm")
    assert len(nodes) == 5 and len(ways) == 1 and len(relations) == 0


def test_josm_emoji_fixture():
    """OSMFileReaderTest.testJosmFileWithEmoji (:57-65): emoji tag
    values survive the reader; node id 123123123123 present."""
    nodes, *_ = _load("josm_emoji.osm")
    assert len(nodes) == 1
    assert nodes[0][0] == 123123123123


def test_two_outer_multipolygon_fixture():
    """mp_two_outer_roof.osm (BuildingModuleTest input): a relation
    with TWO outer rings and three inners assembles into two areas
    whose hole counts sum to 3."""
    areas = _mp_areas("mp_two_outer_roof.osm")
    assert len(areas) == 2
    assert sum(a[0] for a in areas) == 3
    assert all(a[2] > 0 for a in areas)
