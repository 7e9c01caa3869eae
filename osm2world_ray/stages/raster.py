"""Raster <-> vector stages.

Vector -> raster: per-cell page-density heatmap — the engine-side
analogue of the reference's raster export (``ImageExporter``; multi-pass
when the canvas exceeds ``canvasLimit``, ``O2WConfig.java:317-319``).
Counts aggregate per geocell, then each raster PARTITION (a bounded
pixel window, the multi-pass canvas split) densifies its cells into a
numpy grid.

Raster -> vector: a raster grid table back to point sites — the
``SRTMData.getSites`` analogue (``SRTMData.java:38-80``: per-1-degree
tiles, bbox query -> elevation sample points), with the per-worker lazy
tile cache becoming an actor-held dict (``loadTileIfNecessary``
``SRTMData.java:83+``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

#: raster partition: WINDOW x WINDOW cells (the canvasLimit analogue —
#: bounds each partition's dense-grid memory no matter the extent)
WINDOW = 256


def cell_counts(ds, *, r: int = 5):
    """mentions Dataset -> per-cell counts via partial aggregation +
    bounded-bucket shuffle (same combiner discipline as the tile
    rollup)."""
    from ..geo import cells as cells_mod
    from .overlaps import bucket_groups, bucket_of, n_shuffle_buckets

    nb = n_shuffle_buckets()  # driver-resolved, captured by the closure

    def partial(batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        c = cells_mod.cell_of(r, lat, lon)
        uniq, counts = np.unique(c, return_counts=True)
        return pa.table(
            {
                "cell": pa.array(uniq),
                "n": pa.array(counts.astype(np.int64)),
                "bucket": pa.array(bucket_of(uniq, nb)),
            }
        )

    def combine(group: pa.Table) -> pa.Table:
        g = group.select(["cell", "n"]).group_by("cell").aggregate(
            [("n", "sum")]
        )
        return pa.table(
            {"cell": g["cell"].cast(pa.int64()),
             "n": g["n_sum"].cast(pa.int64())}
        )

    ds = ds.map_batches(partial, batch_format="pyarrow")
    return bucket_groups(
        ds, combine, batch_format="pyarrow"
    )


def rasterize_window(group) -> pa.Table:
    """One raster window's cells -> dense grid stats + flattened
    nonzero pixels.

    Emits one row per nonzero pixel (wx, wy, row, col, n) plus enables
    writing the dense ``WINDOW x WINDOW`` numpy grid per partition (the
    per-partition PNG/npy artifact); outputs stay integers for oracle
    comparison.
    """
    from ..geo.cells import unpack_cell
    from .overlaps import col_np

    cell = col_np(group, "cell", np.int64)
    n = col_np(group, "n", np.int64)
    _r, ix, iy = unpack_cell(cell)
    wx = ix // WINDOW
    wy = iy // WINDOW
    grid = np.zeros((WINDOW, WINDOW), dtype=np.int64)
    rows = (iy % WINDOW).astype(np.int64)
    cols = (ix % WINDOW).astype(np.int64)
    grid[rows, cols] = n
    nz = np.nonzero(grid)
    return pa.table(
        {
            "wx": pa.array(np.full(len(nz[0]), int(wx[0]), dtype=np.int64)),
            "wy": pa.array(np.full(len(nz[0]), int(wy[0]), dtype=np.int64)),
            "row": pa.array(nz[0].astype(np.int64)),
            "col": pa.array(nz[1].astype(np.int64)),
            "n": pa.array(grid[nz]),
        }
    )


def density_raster(ds, *, r: int = 5):
    """mentions -> per-window nonzero raster pixels (vector->raster)."""
    counts = cell_counts(ds, r=r)

    def add_window(b: pa.Table) -> pa.Table:
        from ..geo.cells import unpack_cell

        _r, ix, iy = unpack_cell(b["cell"].to_numpy())
        return (
            b.append_column("wx", pa.array(ix // WINDOW))
            .append_column("wy", pa.array(iy // WINDOW))
        )

    counts = counts.map_batches(add_window, batch_format="pyarrow")
    return counts.groupby(["wx", "wy"]).map_groups(
        rasterize_window, batch_format="pyarrow"
    )


# ---------------------------------------------------------------------------
# raster -> vector (SRTM analogue)
# ---------------------------------------------------------------------------

#: SQL-expressible spatial-hash constants (overflow-free in int64 at
#: raster resolutions, so the DuckDB oracle can recompute elevations)
_EH1 = 73856093
_EH2 = 19349663


def synth_elevation(ix: np.ndarray, iy: np.ndarray, *, r: int = 7) -> np.ndarray:
    """Deterministic synthetic elevation per raster cell (the .hgt
    stand-in): integer meters in [0, 4000)."""
    return (ix.astype(np.int64) * _EH1 + iy.astype(np.int64) * _EH2) % 4000


def sql_elevation(ix_expr: str, iy_expr: str) -> str:
    return f"((({ix_expr}) * {_EH1} + ({iy_expr}) * {_EH2}) % 4000)"


class RasterSites:
    """Actor stage: query bbox rows -> elevation sample sites within
    each bbox (raster->vector; ``SRTMData.getSites`` semantics with a
    per-actor lazy tile cache)."""

    def __init__(self, *, r: int = 7, raw: bool = False):
        self.r = r
        #: raw=True emits the unsnapped float elevation as ``ele`` —
        #: the connector-elevation input of the constraint enforcer
        self.raw = raw
        self.cache: dict[tuple[int, int], np.ndarray] = {}

    def _tile(self, tx: int, ty: int) -> np.ndarray:
        """1-degree raster tile of synthetic elevations, cached."""
        key = (tx, ty)
        if key not in self.cache:
            scale = 1 << self.r
            ix0, iy0 = tx * scale, ty * scale
            ix = np.arange(ix0, ix0 + scale, dtype=np.int64)
            iy = np.arange(iy0, iy0 + scale, dtype=np.int64)
            IX, IY = np.meshgrid(ix, iy, indexing="ij")
            self.cache[key] = synth_elevation(IX, IY, r=self.r)
        return self.cache[key]

    def __call__(self, batch: pa.Table) -> pa.Table:
        from ..geo.tiles import fan_out_tile_range

        r = self.r
        scale = 1 << r
        minlon = batch["minlon"].to_numpy(zero_copy_only=False)
        minlat = batch["minlat"].to_numpy(zero_copy_only=False)
        maxlon = batch["maxlon"].to_numpy(zero_copy_only=False)
        maxlat = batch["maxlat"].to_numpy(zero_copy_only=False)
        ix0 = np.floor((minlon + 180.0) * scale).astype(np.int64)
        ix1 = np.floor((maxlon + 180.0) * scale).astype(np.int64)
        iy0 = np.floor((minlat + 90.0) * scale).astype(np.int64)
        iy1 = np.floor((maxlat + 90.0) * scale).astype(np.int64)
        row_idx, ix, iy = fan_out_tile_range(ix0, iy0, ix1, iy1)
        # touch the per-degree tile cache like loadTileIfNecessary
        for tx, ty in set(zip((ix >> r).tolist(), (iy >> r).tolist())):
            self._tile(int(tx), int(ty))
        out = batch.select(["url", "mention_idx"]).take(pa.array(row_idx))
        return (
            out.append_column("cell_ix", pa.array(ix))
            .append_column("cell_iy", pa.array(iy))
            .append_column("ele_m", pa.array(synth_elevation(ix, iy, r=r)))
        )


class IDWInterpolate:
    """Inverse-distance-weighted elevation per mention — the
    ``InverseDistanceWeightingInterpolator`` analogue
    (``InverseDistanceWeightingInterpolator.java:14-90``: exponent -2,
    3x3 grid-cell probe). Sites are the synthetic raster cells around
    the query's cell; weights 1/d^2 over the 3x3 cell-center
    neighborhood, integer milli-meter output."""

    def __init__(self, *, r: int = 7, raw: bool = False):
        self.r = r
        #: raw=True emits the unsnapped float elevation as ``ele`` —
        #: the connector-elevation input of the constraint enforcer
        self.raw = raw

    def __call__(self, batch: pa.Table) -> pa.Table:
        r = self.r
        scale = np.float64(1 << r)
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        qx = (lon + 180.0) * scale
        qy = (lat + 90.0) * scale
        cx = np.floor(qx).astype(np.int64)
        cy = np.floor(qy).astype(np.int64)
        num = np.zeros(len(lat), dtype=np.float64)
        den = np.zeros(len(lat), dtype=np.float64)
        for dx in (-1, 0, 1):
            for dy in (-1, 0, 1):
                sx = cx + dx
                sy = cy + dy
                ele = synth_elevation(sx, sy, r=r).astype(np.float64)
                d2 = (qx - (sx + 0.5)) ** 2 + (qy - (sy + 0.5)) ** 2
                w = 1.0 / d2  # queries never sit exactly on a center
                num += w * ele
                den += w
        if self.raw:
            return pa.table(
                {
                    "url": batch["url"],
                    "mention_idx": batch["mention_idx"],
                    "ele": pa.array(num / den),
                }
            )
        ele_mm = np.floor(num / den * 1000.0 + 0.5).astype(np.int64)
        return pa.table(
            {
                "url": batch["url"],
                "mention_idx": batch["mention_idx"],
                "ele_mm": pa.array(ele_mm),
            }
        )
