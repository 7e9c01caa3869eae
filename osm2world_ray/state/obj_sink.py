"""OBJ text sink: triangulated geometry -> partitioned .obj artifacts.

Reference semantics (``FaceOutput``/``ObjOutput``: vertices written as
``v x y z`` ground-plane coordinates, faces as 1-indexed ``f i j k``
lines; ``ObjMultiFileOutput`` splits on a primitive threshold — the
split rule itself lives in :mod:`osm2world_ray.state.checkpoint`).
This is the geometry half of the renderer output chain: real vertex /
face bookkeeping with per-doc index offsets, materials and normals
scoped out with the renderer.

Ray shape: documents triangulate batch-side (hole-bridged earcut),
flatten to per-triangle rows, shuffle once on a bounded partition key
and each partition writes ONE deterministic .obj atomically + returns
its metrics row (the same manifest discipline as the parquet sink).
"""

from __future__ import annotations

import os
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa

from ..geo.triangulate import earcut_with_holes
from ..sources import synth
from ..stages.cag import _rect, base_rect
from ..stages.rings import rel_base

N_OBJ_PARTS = 16


def doc_mesh(doc: int, blat: float, blon: float):
    """-> (verts (n,2), tris (m,3)): the triangulate_holes geometry."""
    outer = base_rect(blon, blat)
    holes = [_rect(blon + 0.1, blat + 0.1, blon + 0.3, blat + 0.2)]
    if doc % 2 == 0:
        holes.append(_rect(blon + 0.4, blat + 0.25, blon + 0.5, blat + 0.3))
    return earcut_with_holes(outer, holes)


def mesh_rows(batch: pa.Table) -> pa.Table:
    """documents -> per-triangle rows carrying their vertex coords."""
    doc = batch["doc_id"].to_numpy().astype(np.int64)
    blat, blon = rel_base(doc)
    d_out, t_idx, coords = [], [], []
    nv_out = []
    for d, by, bx in zip(doc, blat, blon):
        verts, tris = doc_mesh(int(d), float(by), float(bx))
        for t in tris:
            d_out.append(int(d))
            t_idx.append(t.tolist())
            coords.append(verts[t].ravel().tolist())
            nv_out.append(len(verts))
    return pa.table(
        {
            "doc_id": pa.array(d_out, type=pa.int64()),
            "part": pa.array([d % N_OBJ_PARTS for d in d_out], type=pa.int64()),
            "v_idx": pa.array(t_idx, type=pa.list_(pa.int64())),
            "v_xy": pa.array(coords, type=pa.list_(pa.float64())),
            "n_verts": pa.array(nv_out, type=pa.int64()),
        }
    )


class ObjPartitionWriter:
    """map_groups callable: one partition's triangles -> atomic .obj."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        part = int(group["part"].iloc[0])
        g = group.sort_values(["doc_id"], kind="mergesort")
        lines = [f"# osm2world_ray obj partition {part}", "o tiles"]
        v_count = 0
        f_count = 0
        n_docs = 0
        for doc, sub in g.groupby("doc_id", sort=True):
            n_docs += 1
            nv = int(sub["n_verts"].iloc[0])
            # vertex block once per doc (vertices shared across its
            # triangles); coords recovered from the first rows covering
            # all indices
            verts = {}
            for vi, xy in zip(sub["v_idx"], sub["v_xy"]):
                for k in range(3):
                    verts[int(vi[k])] = (xy[2 * k], xy[2 * k + 1])
            base = v_count
            for i in range(nv):
                x, z = verts.get(i, (0.0, 0.0))
                lines.append(f"v {x:.9f} 0.0 {z:.9f}")
            v_count += nv
            for vi in sub["v_idx"]:
                lines.append(
                    f"f {base + int(vi[0]) + 1} {base + int(vi[1]) + 1} "
                    f"{base + int(vi[2]) + 1}"
                )
                f_count += 1
        os.makedirs(self.out_dir, exist_ok=True)
        tmp = os.path.join(self.out_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write("\n".join(lines) + "\n")
        os.replace(tmp, os.path.join(self.out_dir, f"part-{part}.obj"))
        return pd.DataFrame(
            {
                "part": [np.int64(part)],
                "n_docs": [np.int64(n_docs)],
                "n_vertices": [np.int64(v_count)],
                "n_faces": [np.int64(f_count)],
            }
        )


def export_obj(sf_dir: str, out_dir: str):
    from ..pipelines import datasets

    ds = datasets.documents_ds(sf_dir, columns=["doc_id"])
    rows = ds.map_batches(mesh_rows, batch_format="pyarrow")
    writer = ObjPartitionWriter(out_dir)
    return rows.groupby("part").map_groups(
        lambda g: writer(g), batch_format="pandas"
    )
