"""Per-tile clipping stage: footprints clipped to their owning cell.

The axis-aligned fast path of the reference's ``ClipToBounds``
(``MeshStore.java:577-768``): after straddle fan-out, each partition
clips its geometry exactly to its cell/tile rectangle
(``GltfOutput.java:439``, ``FrontendPbfOutput.java:716-725``). For
rectangular footprints the Sutherland–Hodgman result reduces to exact
max/min against the cell bounds, which vectorizes; the general
polygon path lives in :mod:`osm2world_ray.geo.clip` and is used for
non-rectangular geometry.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..sources import synth


def clip_footprints_to_cells(batch: pa.Table, *, r: int = 5,
                             rlat: float = synth.RLAT,
                             rlon: float = synth.RLON) -> pa.Table:
    """Rows already fanned to cells (cell_ix, cell_iy, lat, lon) ->
    clipped footprint corners in exact micro-degrees."""
    lat = batch["lat"].to_numpy(zero_copy_only=False)
    lon = batch["lon"].to_numpy(zero_copy_only=False)
    ix = batch["cell_ix"].to_numpy(zero_copy_only=False).astype(np.float64)
    iy = batch["cell_iy"].to_numpy(zero_copy_only=False).astype(np.float64)
    scale = np.float64(1 << r)
    cell_minlon = ix / scale - 180.0
    cell_maxlon = (ix + 1.0) / scale - 180.0
    cell_minlat = iy / scale - 90.0
    cell_maxlat = (iy + 1.0) / scale - 90.0
    minlon = np.maximum(lon - rlon, cell_minlon)
    maxlon = np.minimum(lon + rlon, cell_maxlon)
    minlat = np.maximum(lat - rlat, cell_minlat)
    maxlat = np.minimum(lat + rlat, cell_maxlat)

    def udeg(v):
        return pa.array(np.floor(v * 1e6 + 0.5).astype(np.int64))

    return pa.table(
        {
            "url": batch["url"],
            "mention_idx": batch["mention_idx"],
            "cell_ix": batch["cell_ix"],
            "cell_iy": batch["cell_iy"],
            "minlon_udeg": udeg(minlon),
            "minlat_udeg": udeg(minlat),
            "maxlon_udeg": udeg(maxlon),
            "maxlat_udeg": udeg(maxlat),
        }
    )
