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


def fan_out_cells_salted(batch: pa.Table, hot_cells: np.ndarray, *,
                         r: int = 5, r_hot: int = 7,
                         rlat: float = synth.RLAT,
                         rlon: float = synth.RLON) -> pa.Table:
    """Skew-aware straddle fan-out: assignments landing in a HOT cell
    (from a broadcast hot set, found by a cheap count pre-pass) are
    refined to resolution ``r_hot`` sub-cells; everything else keeps
    resolution ``r``.

    The dense-urban-tile treatment from SURVEY §4: a hot cell's O(n^2)
    pairwise work splits across its 4^(r_hot-r) children, each a
    separate shuffle key. Correctness invariant: the refined cells form
    a PARTITION of the plane (hot parents are wholly replaced by their
    children; children of non-hot parents are filtered out), and the
    pairwise kernels' corner-ownership rule evaluates at each row's own
    resolution (packed into the cell id) — so every pair is still
    emitted exactly once, by the unique partition cell containing its
    ownership point.
    """
    import pandas as pd

    base = fan_out_cells(batch, r=r, rlat=rlat, rlon=rlon)
    if len(hot_cells) == 0:
        return base
    hot_cells = np.asarray(hot_cells, dtype=np.int64)
    in_hot = np.isin(base["cell"].to_numpy(), hot_cells)
    cold = base.filter(pa.array(~in_hot))
    hot_rows_idx = np.nonzero(in_hot)[0]
    if len(hot_rows_idx) == 0:
        return cold
    # refine: re-fan the hot rows' footprints at r_hot, keeping only
    # children whose parent cell is hot. A footprint spanning k hot
    # parents appears k times in `base`; dedup source rows first so its
    # child fan-out is emitted once.
    hot_src = base.take(pa.array(hot_rows_idx)).drop(
        ["cell", "cell_ix", "cell_iy"]
    )
    # dedup on the natural row key (hashing the rows risks silent
    # collision drops)
    df = hot_src.to_pandas()
    key_col = "doc_id" if "doc_id" in df.columns else "url"
    keep_idx = (
        df.reset_index()
        .drop_duplicates([key_col, "mention_idx"])["index"]
        .to_numpy()
    )
    hot_src = hot_src.take(pa.array(np.sort(keep_idx)))
    fine = fan_out_cells(hot_src, r=r_hot, rlat=rlat, rlon=rlon)
    shift = r_hot - r
    parent = (
        (np.int64(r) << 58)
        | ((fine["cell_ix"].to_numpy() >> shift) << 29)
        | (fine["cell_iy"].to_numpy() >> shift)
    )
    fine = fine.filter(pa.array(np.isin(parent, hot_cells)))
    return pa.concat_tables([cold, fine])


def hot_cells_of(ds, *, r: int = 5, threshold: int,
                 rlat: float = synth.RLAT, rlon: float = synth.RLON
                 ) -> np.ndarray:
    """Count pre-pass: cells whose assignment count exceeds
    ``threshold``. Per-batch partial counts tree-reduce down to a
    single combine; the hot set is bounded by (total rows / threshold),
    so the driver-held result stays small no matter the data size."""
    import pyarrow.compute as pc
    import ray

    def partial(b: pa.Table) -> pa.Table:
        fanned = fan_out_cells(b, r=r, rlat=rlat, rlon=rlon)
        u, c = np.unique(fanned["cell"].to_numpy(), return_counts=True)
        return pa.table({"cell": pa.array(u), "n": pa.array(c.astype(np.int64))})

    parts = ds.map_batches(partial, batch_format="pyarrow")

    def combine(b: pa.Table) -> pa.Table:
        g = b.group_by("cell").aggregate([("n", "sum")])
        return pa.table({"cell": g["cell"], "n": g["n_sum"]})

    refs = parts.repartition(1).map_batches(
        combine, batch_format="pyarrow", batch_size=None
    ).to_arrow_refs()
    tables = list(ray.get(refs))
    if not tables:
        return np.empty(0, dtype=np.int64)
    t = pa.concat_tables(tables)
    mask = pc.greater(t["n"], threshold)
    return t.filter(mask)["cell"].to_numpy().astype(np.int64)
