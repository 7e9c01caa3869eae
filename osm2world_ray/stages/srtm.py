"""Real SRTM ``.hgt`` raster tiles as a Ray source.

Reference semantics (``SRTMTile.java:20-108``, ``SRTMData.java:38-175``):

- a tile file is a big-endian int16 grid of at least 1201x1201 values
  (SRTM3); ``-32768`` marks missing data; ``getData(x, y)`` reads
  ``data[(1200 - y) * 1201 + x]`` (row 0 of the FILE is the northern
  edge);
- tiles named ``[NS]%02d[EW]%03d(.SRTMGL3)?.hgt(.zip)?`` after their
  south-west corner; ``.zip`` archives contribute their first
  non-directory entry as the payload (:42-77);
- ``getSites(bbox)``: for every integer tile intersecting the query,
  pixels ``x in [max(0, ceil(P*(minLon-tlon))), min(P-1,
  floor(P*(maxLon-tlon))))`` (exclusive upper bound — the last
  row/column duplicates the neighbor tile), site position ``lat =
  tlat + (y+0.5)/P``, blanks skipped (:126-156);
- tiles load lazily into a per-reader cache (:82-117).

Ray shape: the tile DIRECTORY path is actor state; each actor holds
its own lazy tile cache (the ``loadTileIfNecessary`` analogue), and a
batch of bbox query rows fans out to vectorized per-tile slices.
"""

from __future__ import annotations

import os
import re
import zipfile

import numpy as np
import pyarrow as pa

BLANK_VALUE = -32768
PIXELS = 1201


def parse_hgt_bytes(buf: bytes) -> np.ndarray:
    """big-endian int16 payload -> (PIXELS, PIXELS) grid in FILE row
    order (row 0 = northern edge). Too-small payloads fail like
    SRTMTile.java:92-96."""
    data = np.frombuffer(buf, dtype=">i2")
    if len(data) < PIXELS * PIXELS:
        raise ValueError(
            f"Too few elevation values read from SRTM tile: {len(data)}"
        )
    return data[: PIXELS * PIXELS].reshape(PIXELS, PIXELS).astype(np.int16)


def tile_regex(lon: int, lat: int) -> re.Pattern:
    ns = f"N{lat:02d}" if lat >= 0 else f"S{-lat:02d}"
    ew = f"E{lon:03d}" if lon >= 0 else f"W{-lon:03d}"
    return re.compile(ns + ew + r"(?:\.SRTMGL3)?\.hgt(?:\.zip)?")


class SrtmTileSet:
    """Lazy per-degree tile cache over a directory of .hgt/.hgt.zip."""

    def __init__(self, tile_dir: str):
        self.tile_dir = tile_dir
        self._cache: dict[tuple[int, int], np.ndarray | None] = {}

    def tile(self, lon: int, lat: int) -> np.ndarray | None:
        key = (lon, lat)
        if key in self._cache:
            return self._cache[key]
        pat = tile_regex(lon, lat)
        grid = None
        for name in sorted(os.listdir(self.tile_dir)):
            if pat.fullmatch(name):
                path = os.path.join(self.tile_dir, name)
                if name.endswith(".zip"):
                    with zipfile.ZipFile(path) as z:
                        entry = next(
                            (i for i in z.infolist() if not i.is_dir()), None
                        )
                        if entry is None:
                            raise ValueError(
                                f"No hgt payload file found in zip archive {path}"
                            )
                        buf = z.read(entry)
                else:
                    buf = open(path, "rb").read()
                grid = parse_hgt_bytes(buf)
                break
        self._cache[key] = grid
        return grid

    def get_data(self, grid: np.ndarray, x, y):
        """SRTMTile.getData: (1200 - y)-th file row, x-th column."""
        return grid[(PIXELS - 1) - np.asarray(y), np.asarray(x)]


def sites_for_bbox(tiles: SrtmTileSet, min_lon: float, min_lat: float,
                   max_lon: float, max_lat: float):
    """-> (lat, lon, ele) arrays of every non-blank SRTM site in the
    bbox (SRTMData.getSites semantics, exclusive upper pixel bounds)."""
    lats, lons, eles = [], [], []
    for tlon in range(int(np.floor(min_lon)), int(np.ceil(max_lon))):
        for tlat in range(int(np.floor(min_lat)), int(np.ceil(max_lat))):
            grid = tiles.tile(tlon, tlat)
            if grid is None:
                continue
            min_x = max(0, int(np.ceil(PIXELS * (min_lon - tlon))))
            max_x = min(PIXELS - 1, int(np.floor(PIXELS * (max_lon - tlon))))
            min_y = max(0, int(np.ceil(PIXELS * (min_lat - tlat))))
            max_y = min(PIXELS - 1, int(np.floor(PIXELS * (max_lat - tlat))))
            if max_x <= min_x or max_y <= min_y:
                continue
            xs = np.arange(min_x, max_x, dtype=np.int64)
            ys = np.arange(min_y, max_y, dtype=np.int64)
            gx, gy = np.meshgrid(xs, ys, indexing="ij")
            vals = tiles.get_data(grid, gx.ravel(), gy.ravel()).astype(np.int64)
            keep = vals != BLANK_VALUE
            lats.append(tlat + (gy.ravel()[keep] + 0.5) / PIXELS)
            lons.append(tlon + (gx.ravel()[keep] + 0.5) / PIXELS)
            eles.append(vals[keep])
    if not lats:
        z = np.empty(0)
        return z, z, np.empty(0, dtype=np.int64)
    return np.concatenate(lats), np.concatenate(lons), np.concatenate(eles)


class SrtmSites:
    """Actor-pool stage: bbox query rows -> site rows
    (qid, lat_udeg, lon_udeg, ele); tile cache built lazily per actor."""

    def __init__(self, tile_dir: str):
        self.tiles = SrtmTileSet(tile_dir)

    def __call__(self, batch: pa.Table) -> pa.Table:
        out_q, out_lat, out_lon, out_ele = [], [], [], []
        for i in range(len(batch)):
            lat, lon, ele = sites_for_bbox(
                self.tiles,
                batch["min_lon"][i].as_py(), batch["min_lat"][i].as_py(),
                batch["max_lon"][i].as_py(), batch["max_lat"][i].as_py(),
            )
            out_q.append(np.full(len(ele), batch["qid"][i].as_py(), dtype=np.int64))
            out_lat.append(np.floor(lat * 1e6 + 0.5).astype(np.int64))
            out_lon.append(np.floor(lon * 1e6 + 0.5).astype(np.int64))
            out_ele.append(ele)
        def cat(parts):
            return pa.array(
                np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
            )

        return pa.table(
            {
                "qid": cat(out_q),
                "lat_udeg": cat(out_lat),
                "lon_udeg": cat(out_lon),
                "ele": cat(out_ele),
            }
        )


# -- synthetic tile writer (driver-contract test input) ----------------

def synth_pixel(x: np.ndarray, y: np.ndarray) -> np.ndarray:
    """Deterministic per-pixel elevation with interspersed BLANKs."""
    v = (np.asarray(x, dtype=np.int64) * 73856093
         + np.asarray(y, dtype=np.int64) * 19349663) % 4000
    return np.where((np.asarray(x) + np.asarray(y)) % 97 == 0,
                    BLANK_VALUE, v).astype(np.int16)


def write_synth_tiles(out_dir: str) -> str:
    """Write N40W010.hgt (raw) and N40W009.SRTMGL3.hgt.zip (zipped)
    with the synth_pixel field; idempotent."""
    os.makedirs(out_dir, exist_ok=True)
    x = np.arange(PIXELS)
    gx, gy = np.meshgrid(x, x, indexing="xy")  # [row=file row, col=x]
    # file row r holds y = 1200 - r
    vals = synth_pixel(gx, (PIXELS - 1) - gy)
    raw = vals.astype(">i2").tobytes()
    p1 = os.path.join(out_dir, "N40W010.hgt")
    if not os.path.exists(p1):
        with open(p1, "wb") as f:
            f.write(raw)
    p2 = os.path.join(out_dir, "N40W009.SRTMGL3.hgt.zip")
    if not os.path.exists(p2):
        with zipfile.ZipFile(p2, "w") as z:
            z.writestr("N40W009.SRTMGL3.hgt", raw)
    return out_dir
