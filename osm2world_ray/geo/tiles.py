"""Slippy-map tile math (TileNumber semantics), vectorized.

Semantics follow the reference's ``TileNumber``
(``core/src/main/java/org/osm2world/math/geo/TileNumber.java:17-155``):
XYZ convention with south-pointing Y, strict validation ``0 <= x,y <
2**zoom``, TMS ``flipped_y``, string round-trip with ``,``/``/``/``_``
separators, ``ancestor`` by right shift, geographic tile bounds,
point->tile ``at_lat_lon`` and bbox->tile-range ``tiles_for_bounds``.

Everything here is pure numpy so it can be applied to Arrow columns
inside ``map_batches`` with zero row-at-a-time Python.
"""

from __future__ import annotations

import re
from dataclasses import dataclass

import numpy as np

#: Web-Mercator latitude limit: atan(sinh(pi)) in degrees.
MAX_LAT = float(np.degrees(np.arctan(np.sinh(np.pi))))  # 85.05112877980659
MIN_LAT = -MAX_LAT

_TILE_RE = re.compile(r"^(\d+)[,/_](\d+)[,/_](\d+)$")


@dataclass(frozen=True, order=True)
class TileNumber:
    """Immutable z/x/y tile key (XYZ convention, y grows south).

    Mirrors ``TileNumber.java:17-155``; scalar convenience wrapper over
    the vectorized kernels below.
    """

    zoom: int
    x: int
    y: int

    def __post_init__(self) -> None:
        if self.zoom < 0:
            raise ValueError(f"zoom must be >= 0, was {self.zoom}")
        n = 1 << self.zoom
        if not (0 <= self.x < n):
            raise ValueError(f"x must be in [0,{n}), was {self.x}")
        if not (0 <= self.y < n):
            raise ValueError(f"y must be in [0,{n}), was {self.y}")

    # -- string round trip (TileNumber.java:26,60-70,93-101) --
    @classmethod
    def parse(cls, s: str) -> "TileNumber":
        m = _TILE_RE.match(s)
        if not m:
            raise ValueError(f"invalid tile string: {s!r}")
        return cls(int(m.group(1)), int(m.group(2)), int(m.group(3)))

    def __str__(self) -> str:
        return f"{self.zoom},{self.x},{self.y}"

    def path(self) -> str:
        return f"{self.zoom}/{self.x}/{self.y}"

    # -- TMS flip (TileNumber.java:88-90) --
    def flipped_y(self) -> int:
        return (1 << self.zoom) - 1 - self.y

    # -- ancestor by right shift (TileNumber.java:108-113) --
    def ancestor(self, zoom: int) -> "TileNumber":
        if zoom > self.zoom:
            raise ValueError(f"ancestor zoom {zoom} > tile zoom {self.zoom}")
        shift = self.zoom - zoom
        return TileNumber(zoom, self.x >> shift, self.y >> shift)

    # -- geographic bounds (TileNumber.java:115-119) --
    def bounds(self) -> tuple[float, float, float, float]:
        """(min_lat, min_lon, max_lat, max_lon) of this tile."""
        n = 1 << self.zoom
        lon0 = self.x / n * 360.0 - 180.0
        lon1 = (self.x + 1) / n * 360.0 - 180.0
        lat1 = _tile_edge_lat(self.y, self.zoom)       # north edge
        lat0 = _tile_edge_lat(self.y + 1, self.zoom)   # south edge
        return (lat0, lon0, lat1, lon1)

    @classmethod
    def at_lat_lon(cls, zoom: int, lat: float, lon: float) -> "TileNumber":
        tx, ty = at_lat_lon(zoom, np.float64(lat), np.float64(lon))
        return cls(zoom, int(tx), int(ty))

    def key(self) -> int:
        return int(pack_key(np.uint8(self.zoom), np.uint32(self.x), np.uint32(self.y)))


def _tile_edge_lat(y: int, zoom: int) -> float:
    n = 1 << zoom
    return float(np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * y / n)))))


# ---------------------------------------------------------------------------
# vectorized kernels (the map_batches hot path)
# ---------------------------------------------------------------------------

def at_lat_lon(zoom: int, lat: np.ndarray, lon: np.ndarray):
    """Vectorized point -> (tx, ty) at ``zoom`` (TileNumber.java:122-126).

    Latitudes are clamped to the Web-Mercator range; x/y are clamped to
    [0, 2**zoom - 1] so lon=180 / lat=-85.0511 land in the last tile.
    """
    lat = np.clip(np.asarray(lat, dtype=np.float64), MIN_LAT, MAX_LAT)
    lon = np.asarray(lon, dtype=np.float64)
    n = np.float64(1 << zoom)
    tx = np.floor((lon + 180.0) / 360.0 * n)
    lat_rad = np.radians(lat)
    ty = np.floor(
        (1.0 - np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad)) / np.pi) / 2.0 * n
    )
    nmax = (1 << zoom) - 1
    tx = np.clip(tx, 0, nmax).astype(np.int64)
    ty = np.clip(ty, 0, nmax).astype(np.int64)
    return tx, ty


def tile_range_for_bounds(
    zoom: int,
    min_lat: np.ndarray,
    min_lon: np.ndarray,
    max_lat: np.ndarray,
    max_lon: np.ndarray,
):
    """Vectorized bbox -> inclusive tile range (TileNumber.java:129-144).

    Returns (tx0, ty0, tx1, ty1) per row; note min_lat maps to the MAX
    tile y (y grows south).
    """
    tx0, ty1 = at_lat_lon(zoom, min_lat, min_lon)
    tx1, ty0 = at_lat_lon(zoom, max_lat, max_lon)
    return tx0, ty0, tx1, ty1


def tiles_for_bounds(
    zoom: int, min_lat: float, min_lon: float, max_lat: float, max_lon: float
) -> list[TileNumber]:
    """Scalar bbox -> list of covered tiles, x-major then y (driver-side)."""
    tx0, ty0, tx1, ty1 = (
        int(v)
        for v in tile_range_for_bounds(
            zoom,
            np.float64(min_lat),
            np.float64(min_lon),
            np.float64(max_lat),
            np.float64(max_lon),
        )
    )
    return [
        TileNumber(zoom, x, y)
        for x in range(tx0, tx1 + 1)
        for y in range(ty0, ty1 + 1)
    ]


def fan_out_tile_range(tx0, ty0, tx1, ty1):
    """Explode per-row inclusive tile ranges into (row_index, tx, ty) rows.

    The vectorized analogue of ``tiles_for_bounds`` used for straddle
    fan-out inside ``flat_map``-style batch transforms: an element whose
    footprint covers k tiles yields k output rows. Fully vectorized via
    repeat/cumsum (no Python loop over rows).
    """
    tx0 = np.asarray(tx0, dtype=np.int64)
    ty0 = np.asarray(ty0, dtype=np.int64)
    tx1 = np.asarray(tx1, dtype=np.int64)
    ty1 = np.asarray(ty1, dtype=np.int64)
    if len(tx0) == 0:
        e = np.empty(0, dtype=np.int64)
        return e, e.copy(), e.copy()
    nx = tx1 - tx0 + 1
    ny = ty1 - ty0 + 1
    counts = nx * ny
    total = int(counts.sum())
    row_idx = np.repeat(np.arange(len(counts), dtype=np.int64), counts)
    # local offset within each row's tile block: 0..counts[i]-1
    starts = np.concatenate(([0], np.cumsum(counts)[:-1]))
    local = np.arange(total, dtype=np.int64) - np.repeat(starts, counts)
    ny_r = np.repeat(ny, counts)
    tx = np.repeat(tx0, counts) + local // ny_r
    ty = np.repeat(ty0, counts) + local % ny_r
    return row_idx, tx, ty


def ancestor(zoom_from: int, zoom_to: int, tx: np.ndarray, ty: np.ndarray):
    """Vectorized z/x/y -> parent tile at lower zoom (TileNumber.java:108-113)."""
    if zoom_to > zoom_from:
        raise ValueError("ancestor zoom must be <= tile zoom")
    shift = zoom_from - zoom_to
    return np.asarray(tx, dtype=np.int64) >> shift, np.asarray(ty, dtype=np.int64) >> shift


def flipped_y(zoom: int, ty: np.ndarray):
    """Vectorized TMS y-flip (TileNumber.java:88-90)."""
    return ((1 << zoom) - 1) - np.asarray(ty, dtype=np.int64)


def pack_key(zoom, tx, ty):
    """Pack (zoom, tx, ty) into one int64 shuffle key: (z<<58)|(x<<29)|y.

    Supports zoom <= 29. Used as the hash-partition key for all
    per-tile shuffles (groupby / repartition) so a tile's rows always
    co-locate.
    """
    z = np.asarray(zoom, dtype=np.int64)
    x = np.asarray(tx, dtype=np.int64)
    y = np.asarray(ty, dtype=np.int64)
    return (z << 58) | (x << 29) | y


def unpack_key(key):
    key = np.asarray(key, dtype=np.int64)
    zoom = key >> 58
    tx = (key >> 29) & ((1 << 29) - 1)
    ty = key & ((1 << 29) - 1)
    return zoom, tx, ty


def tile_bounds_arrays(zoom: int, tx: np.ndarray, ty: np.ndarray):
    """Vectorized tile -> (min_lat, min_lon, max_lat, max_lon)."""
    tx = np.asarray(tx, dtype=np.float64)
    ty = np.asarray(ty, dtype=np.float64)
    n = np.float64(1 << zoom)
    lon0 = tx / n * 360.0 - 180.0
    lon1 = (tx + 1.0) / n * 360.0 - 180.0
    lat1 = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * ty / n))))
    lat0 = np.degrees(np.arctan(np.sinh(np.pi * (1.0 - 2.0 * (ty + 1.0) / n))))
    return lat0, lon0, lat1, lon1


#: epsilon shrink applied to bboxes before tile enumeration so a bbox
#: whose edge sits exactly on a tile border does not generate the
#: neighbor tile (TileBounds.java:64-67, TilesetCommand.java:115-117).
BBOX_EPS_DEG = 1e-5


def shrunk_tiles_for_bounds(
    zoom: int, min_lat: float, min_lon: float, max_lat: float, max_lon: float
) -> list[TileNumber]:
    """tiles_for_bounds with the reference's 1e-5 deg epsilon shrink."""
    return tiles_for_bounds(
        zoom,
        min_lat + BBOX_EPS_DEG,
        min_lon + BBOX_EPS_DEG,
        max_lat - BBOX_EPS_DEG,
        max_lon - BBOX_EPS_DEG,
    )
