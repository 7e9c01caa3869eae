"""POV-Ray scene-description sink: triangles -> partitioned .pov text.

Reference semantics (``output/povray/POVRayOutput.java:290-375``): each
drawn object becomes a ``mesh { ... }`` block of
``triangle { <x, y, z>, <x, y, z>, <x, y, z> }`` entries; triangles
are NaN-checked before emission (:299-301) and empty meshes are
skipped (``checkMeshValidity`` :296). Camera/lights/materials are
scoped out with the renderer — this is the scene-geometry text layout.

Same Ray shape as the OBJ/glTF sinks: batch-side triangulation, one
bounded partition shuffle, atomic per-partition file + metrics row.
"""

from __future__ import annotations

import math
import os
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa

from .obj_sink import N_OBJ_PARTS, mesh_rows


class PovPartitionWriter:
    """map_groups callable: one partition's triangles -> atomic .pov."""

    def __init__(self, out_dir: str):
        self.out_dir = out_dir

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        part = int(group["part"].iloc[0])
        g = group.sort_values(["doc_id"], kind="mergesort")
        lines = [f"// osm2world_ray pov partition {part}"]
        n_docs = 0
        n_meshes = 0
        n_tris = 0
        for doc, sub in g.groupby("doc_id", sort=True):
            n_docs += 1
            verts = {}
            tris = []
            for vi, xy in zip(sub["v_idx"], sub["v_xy"]):
                tris.append([int(vi[0]), int(vi[1]), int(vi[2])])
                for k in range(3):
                    verts[int(vi[k])] = (xy[2 * k], xy[2 * k + 1])
            emit = []
            for t in tris:
                coords = [verts[i] for i in t]
                # performNaNCheck (:299-301): skip NaN triangles, the
                # per-row fault-tolerance convention
                if any(math.isnan(x) or math.isnan(z) for x, z in coords):
                    continue
                v = ", ".join(f"<{x:.9f}, 0.0, {z:.9f}>" for x, z in coords)
                emit.append(f"  triangle {{ {v} }}")
            if not emit:
                continue  # checkMeshValidity: no empty mesh blocks
            n_meshes += 1
            n_tris += len(emit)
            lines.append(f"// doc {int(doc)}")
            lines.append("mesh {")
            lines.extend(emit)
            lines.append("}")
        os.makedirs(self.out_dir, exist_ok=True)
        tmp = os.path.join(self.out_dir, f".tmp-{uuid.uuid4().hex}")
        with open(tmp, "w") as f:
            f.write("\n".join(lines) + "\n")
        os.replace(tmp, os.path.join(self.out_dir, f"part-{part}.pov"))
        return pd.DataFrame(
            {
                "part": [np.int64(part)],
                "n_docs": [np.int64(n_docs)],
                "n_meshes": [np.int64(n_meshes)],
                "n_triangles": [np.int64(n_tris)],
            }
        )


def export_pov(sf_dir: str, out_dir: str):
    from ..pipelines import datasets

    ds = datasets.documents_ds(sf_dir, columns=["doc_id"])
    rows = ds.map_batches(mesh_rows, batch_format="pyarrow")
    writer = PovPartitionWriter(out_dir)
    return rows.groupby("part").map_groups(
        lambda g: writer(g), batch_format="pandas"
    )
