"""Golden tile-math tests ported from the reference's TileNumberTest
(core-jvm/src/test/java/org/osm2world/math/geo/TileNumberTest.java:14-113)."""

import numpy as np
import pytest

from osm2world_ray.geo import tiles
from osm2world_ray.geo.tiles import TileNumber


# -- parsing round trips (TileNumberTest.java:24-37) --
@pytest.mark.parametrize("s", ["13,4402,2828", "13/4402/2828", "13_4402_2828"])
def test_parse_separators(s):
    t = TileNumber.parse(s)
    assert (t.zoom, t.x, t.y) == (13, 4402, 2828)


def test_str_roundtrip():
    t = TileNumber(13, 4402, 2828)
    assert TileNumber.parse(str(t)) == t
    assert t.path() == "13/4402/2828"


# -- validation (TileNumberTest.java:44-62) --
@pytest.mark.parametrize("z,x,y", [(-1, 0, 0), (2, 4, 0), (2, 0, 4), (0, 1, 0), (3, -1, 2)])
def test_invalid_tiles_raise(z, x, y):
    with pytest.raises(ValueError):
        TileNumber(z, x, y)


# -- ancestor chains (TileNumberTest.java:65-75) --
def test_ancestor():
    t = TileNumber(15, 17608, 11312)
    assert t.ancestor(13) == TileNumber(13, 4402, 2828)
    assert t.ancestor(15) == t
    assert t.ancestor(0) == TileNumber(0, 0, 0)
    with pytest.raises(ValueError):
        t.ancestor(16)


def test_flipped_y():
    assert TileNumber(2, 1, 0).flipped_y() == 3
    assert TileNumber(0, 0, 0).flipped_y() == 0


# -- tile bounds (TileNumberTest.java:78-93) --
def test_zoom0_bounds():
    lat0, lon0, lat1, lon1 = TileNumber(0, 0, 0).bounds()
    assert lon0 == pytest.approx(-180.0)
    assert lon1 == pytest.approx(180.0)
    assert lat1 == pytest.approx(85.0511, abs=1e-3)
    assert lat0 == pytest.approx(-85.0511, abs=1e-3)


def test_z2_bounds():
    lat0, lon0, lat1, lon1 = TileNumber(2, 3, 3).bounds()
    assert lon0 == pytest.approx(90.0)
    assert lon1 == pytest.approx(180.0)
    assert lat1 == pytest.approx(-66.513, abs=1e-2)
    assert lat0 == pytest.approx(-85.0511, abs=1e-3)


# -- atLatLon anchor (TileNumberTest.java:96-99) --
def test_at_lat_lon_anchor():
    t = TileNumber.at_lat_lon(13, 48.56687, 13.45127)
    assert (t.x, t.y) == (4402, 2828)


def test_at_lat_lon_vectorized_edges():
    tx, ty = tiles.at_lat_lon(1, np.array([85.1, -85.1, 0.0]), np.array([-180.0, 180.0, 0.0]))
    assert tx.tolist() == [0, 1, 1]
    assert ty.tolist() == [0, 1, 1]


# -- tilesForBounds 2x2 (TileNumberTest.java:102-112) --
def test_tiles_for_bounds_2x2():
    got = tiles.tiles_for_bounds(13, 48.56687, 13.41368, 48.57982, 13.45127)
    assert set((t.x, t.y) for t in got) == {
        (4401, 2827),
        (4401, 2828),
        (4402, 2827),
        (4402, 2828),
    }


def test_fan_out_tile_range():
    row, tx, ty = tiles.fan_out_tile_range([0, 5], [10, 7], [1, 5], [11, 7])
    assert row.tolist() == [0, 0, 0, 0, 1]
    assert sorted(zip(tx.tolist(), ty.tolist())) == [(0, 10), (0, 11), (1, 10), (1, 11), (5, 7)]


def test_pack_unpack_key():
    key = tiles.pack_key(13, 4402, 2828)
    z, x, y = tiles.unpack_key(key)
    assert (int(z), int(x), int(y)) == (13, 4402, 2828)
    assert TileNumber(13, 4402, 2828).key() == int(key)


def test_epsilon_shrink():
    # bbox exactly on the border of tile (4402, 2828) must not spill
    lat0, lon0, lat1, lon1 = TileNumber(13, 4402, 2828).bounds()
    got = tiles.shrunk_tiles_for_bounds(13, lat0, lon0, lat1, lon1)
    assert [(t.x, t.y) for t in got] == [(4402, 2828)]
