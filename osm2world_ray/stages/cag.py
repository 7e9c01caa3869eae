"""CAG subtract + hole-aware triangulation as batch stages.

Per-element geometry work (one base polygon and its subtract set, one
holed polygon) is bounded, so the distributed axis is elements: a plain
``map_batches`` with a python-kernel loop per element inside — the same
shape the reference has (``CAGUtil.subtractPolygons`` is called once
per area, ``O2WConverterImpl``/terrain building), with no shuffle at
all. Geometry classes are deterministic per doc so the DuckDB oracle is
closed-form (see ``pipelines/queries.py``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo.faces import split_polygon_into_faces
from ..geo.triangulate import earcut_with_holes, triangle_areas
from ..sources import synth
from .rings import rel_base


def _rect(x0, y0, x1, y1):
    return np.array([[x0, y0], [x1, y0], [x1, y1], [x0, y1]])


def base_rect(bx: float, by: float) -> np.ndarray:
    """Base polygon: 0.6 x 0.4 rect at the doc's base point (x=lon)."""
    return _rect(bx, by, bx + 0.6, by + 0.4)


#: subtract-set builders per class c = doc_id % 5 (each mirrors a
#: closed-form oracle row set):
#: 0 hole inside | 1 notch over the left edge | 2 full vertical band
#: (splits into two faces) | 3 disjoint | 4 two mutually-overlapping
def subtract_polys(cls: int, bx: float, by: float):
    if cls == 0:
        return [[_rect(bx + 0.2, by + 0.1, bx + 0.4, by + 0.2)]]
    if cls == 1:
        return [[_rect(bx - 0.1, by + 0.1, bx + 0.1, by + 0.3)]]
    if cls == 2:
        return [[_rect(bx + 0.25, by - 0.1, bx + 0.3, by + 0.5)]]
    if cls == 3:
        return [[_rect(bx, by + 0.5, bx + 0.1, by + 0.6)]]
    return [
        [_rect(bx + 0.1, by + 0.1, bx + 0.3, by + 0.3)],
        [_rect(bx + 0.2, by + 0.2, bx + 0.4, by + 0.35)],
    ]


def cag_subtract_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> one row per result face
    (url, n_holes, area_e8)."""
    doc = batch["doc_id"].to_numpy().astype(np.int64)
    blat, blon = rel_base(doc)
    urls, holes_out, areas = [], [], []
    for d, by, bx in zip(doc, blat, blon):
        faces = split_polygon_into_faces(
            base_rect(bx, by), [], subtract_polys(int(d) % 5, bx, by)
        )
        for _outer, f_holes, area in faces:
            urls.append(f"{synth.URL_PREFIX}{int(d)}")
            holes_out.append(len(f_holes))
            areas.append(int(np.floor(area * 1e8 + 0.5)))
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "n_holes": pa.array(holes_out, type=pa.int64()),
            "area_e8": pa.array(areas, type=pa.int64()),
        }
    )


def triangulate_holes_batch(batch: pa.Table) -> pa.Table:
    """documents batch -> hole-bridged earcut of the doc's holed
    polygon: (url, n_triangles, area_e8). Docs alternate one/two-hole
    polygons (doc % 2)."""
    doc = batch["doc_id"].to_numpy().astype(np.int64)
    blat, blon = rel_base(doc)
    urls, ntris, areas = [], [], []
    for d, by, bx in zip(doc, blat, blon):
        outer = base_rect(bx, by)
        holes = [_rect(bx + 0.1, by + 0.1, bx + 0.3, by + 0.2)]
        if int(d) % 2 == 0:
            holes.append(_rect(bx + 0.4, by + 0.25, bx + 0.5, by + 0.3))
        verts, tris = earcut_with_holes(outer, holes)
        urls.append(f"{synth.URL_PREFIX}{int(d)}")
        ntris.append(len(tris))
        # translate to local origin before the area sum (float hygiene)
        local = verts - verts[0]
        areas.append(int(np.floor(triangle_areas(local, tris).sum() * 1e8 + 0.5)))
    return pa.table(
        {
            "url": pa.array(urls, type=pa.string()),
            "n_triangles": pa.array(ntris, type=pa.int64()),
            "area_e8": pa.array(areas, type=pa.int64()),
        }
    )
