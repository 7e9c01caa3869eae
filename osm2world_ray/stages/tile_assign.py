"""Tile / cell assignment stages: stateless vectorized map_batches.

The Ray Data expression of ``TileNumber.atLatLon``
(``TileNumber.java:122-126``), ``tilesForBounds`` straddle fan-out
(``:129-144``) and the metric projection
(``MetricMapProjection.java:29-63``) as zero-copy Arrow batch kernels.
No shuffle here — pure per-batch compute; the tile key produced
(``tile_key`` int64) is the partitioning key every downstream wide
stage reuses.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo import cells, tiles
from ..geo.projection import MetricProjection
from ..sources import synth


def assign_tiles(batch: pa.Table, *, zoom: int = 13,
                 lat_col: str = "lat", lon_col: str = "lon") -> pa.Table:
    """Append (zoom, tx, ty, tile_key) for the point columns."""
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    tx, ty = tiles.at_lat_lon(zoom, lat, lon)
    key = tiles.pack_key(zoom, tx, ty)
    return (
        batch.append_column("zoom", pa.array(np.full(len(tx), zoom, dtype=np.int64)))
        .append_column("tx", pa.array(tx))
        .append_column("ty", pa.array(ty))
        .append_column("tile_key", pa.array(key))
    )


def assign_cells(batch: pa.Table, *, r: int = 5,
                 lat_col: str = "lat", lon_col: str = "lon") -> pa.Table:
    """Append the geocell id (H3-analogue) at resolution r."""
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    c = cells.cell_of(r, lat, lon)
    return batch.append_column("cell", pa.array(c))


def project_mm(batch: pa.Table, *, lat0: float, lon0: float,
               lat_col: str = "lat", lon_col: str = "lon") -> pa.Table:
    """Append mm-snapped metric coordinates as exact int64 (x_mm, z_mm)."""
    proj = MetricProjection(lat0, lon0)
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    x_mm, z_mm = proj.to_xz_mm(lat, lon)
    return batch.append_column("x_mm", pa.array(x_mm)).append_column("z_mm", pa.array(z_mm))


def fan_out_footprints(batch: pa.Table, *, zoom: int = 13,
                       rlat: float = synth.RLAT, rlon: float = synth.RLON,
                       lat_col: str = "lat", lon_col: str = "lon") -> pa.Table:
    """Straddle fan-out: one output row per (input row x covered tile).

    The vectorized ``tilesForBounds`` analogue for elements with a
    footprint bbox (lat +- rlat, lon +- rlon): an element overlapping k
    tiles appears in all k partitions (``TileNumber.java:129-144``;
    clipped later inside each tile partition per
    ``MeshStore.ClipToBounds``). All carried columns are repeated via
    ``take`` — no Python row loop.
    """
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    tx0, ty0, tx1, ty1 = tiles.tile_range_for_bounds(
        zoom, lat - rlat, lon - rlon, lat + rlat, lon + rlon
    )
    row_idx, tx, ty = tiles.fan_out_tile_range(tx0, ty0, tx1, ty1)
    out = batch.take(pa.array(row_idx))
    key = tiles.pack_key(zoom, tx, ty)
    return (
        out.append_column("zoom", pa.array(np.full(len(tx), zoom, dtype=np.int64)))
        .append_column("tx", pa.array(tx))
        .append_column("ty", pa.array(ty))
        .append_column("tile_key", pa.array(key))
    )


def fan_out_bbox_cells(batch: pa.Table, *, r: int = 5,
                       minx_col: str, miny_col: str,
                       maxx_col: str, maxy_col: str) -> pa.Table:
    """Generic bbox -> covered-geocell fan-out (x=lon, y=lat columns)."""
    minx = batch[minx_col].to_numpy(zero_copy_only=False)
    miny = batch[miny_col].to_numpy(zero_copy_only=False)
    maxx = batch[maxx_col].to_numpy(zero_copy_only=False)
    maxy = batch[maxy_col].to_numpy(zero_copy_only=False)
    scale = np.float64(1 << r)
    ix0 = np.floor((minx + 180.0) * scale).astype(np.int64)
    ix1 = np.floor((maxx + 180.0) * scale).astype(np.int64)
    iy0 = np.floor((miny + 90.0) * scale).astype(np.int64)
    iy1 = np.floor((maxy + 90.0) * scale).astype(np.int64)
    row_idx, ix, iy = tiles.fan_out_tile_range(ix0, iy0, ix1, iy1)
    out = batch.take(pa.array(row_idx))
    cell = (np.int64(r) << 58) | (ix << 29) | iy
    return (
        out.append_column("cell", pa.array(cell))
        .append_column("cell_ix", pa.array(ix))
        .append_column("cell_iy", pa.array(iy))
    )


def fan_out_segment_cells(batch: pa.Table, *, r: int = 5,
                          x1_col: str = "x1", y1_col: str = "y1",
                          x2_col: str = "x2", y2_col: str = "y2") -> pa.Table:
    """Segment -> crossed-cells fan-out via line traversal (x=lon, y=lat).

    O(cells crossed) per segment, unlike a bbox fan-out which is
    quadratic in segment extent — the scale-safe assignment for the
    segment-intersection self-join (see ``geo.cells.line_cells``).
    """
    from ..geo import cells as cells_mod

    row_idx, ix, iy = cells_mod.line_cells(
        r,
        batch[x1_col].to_numpy(zero_copy_only=False),
        batch[y1_col].to_numpy(zero_copy_only=False),
        batch[x2_col].to_numpy(zero_copy_only=False),
        batch[y2_col].to_numpy(zero_copy_only=False),
    )
    out = batch.take(pa.array(row_idx))
    cell = (np.int64(r) << 58) | (ix << 29) | iy
    return (
        out.append_column("cell", pa.array(cell))
        .append_column("cell_ix", pa.array(ix))
        .append_column("cell_iy", pa.array(iy))
    )


def fan_out_cells(batch: pa.Table, *, r: int = 5,
                  rlat: float = synth.RLAT, rlon: float = synth.RLON,
                  lat_col: str = "lat", lon_col: str = "lon") -> pa.Table:
    """Cell-grid straddle fan-out (footprint bbox -> covered geocells)."""
    lat = batch[lat_col].to_numpy(zero_copy_only=False)
    lon = batch[lon_col].to_numpy(zero_copy_only=False)
    scale = np.float64(1 << r)
    ix0 = np.floor((lon - rlon + 180.0) * scale).astype(np.int64)
    ix1 = np.floor((lon + rlon + 180.0) * scale).astype(np.int64)
    iy0 = np.floor((lat - rlat + 90.0) * scale).astype(np.int64)
    iy1 = np.floor((lat + rlat + 90.0) * scale).astype(np.int64)
    row_idx, ix, iy = tiles.fan_out_tile_range(ix0, iy0, ix1, iy1)
    out = batch.take(pa.array(row_idx))
    cell = (np.int64(r) << 58) | (ix << 29) | iy
    return (
        out.append_column("cell", pa.array(cell))
        .append_column("cell_ix", pa.array(ix))
        .append_column("cell_iy", pa.array(iy))
    )
