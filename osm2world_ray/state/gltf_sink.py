"""glTF 2.0 sink: triangulated geometry -> partitioned .gltf artifacts.

Reference semantics (``output/gltf/GltfOutput.java``): one scene whose
nodes reference one mesh per world object; mesh primitives carry a
POSITION accessor (float32 VEC3, with min/max bounds as the spec
requires) and an index accessor (uint32 SCALAR) into bufferViews of a
single binary buffer; the non-GLB variant embeds the buffer as a
base64 data URI. Materials/textures/normals are scoped out with the
renderer — this is the geometry+layout half (the same scope split as
:mod:`osm2world_ray.state.obj_sink`).

Ray shape identical to the OBJ sink: per-doc triangulation batch-side,
one bounded shuffle on the partition key, each partition writes ONE
deterministic .gltf atomically and returns its metrics row.
"""

from __future__ import annotations

import base64
import json
import os
import struct
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa

from .obj_sink import N_OBJ_PARTS, mesh_rows


class GltfPartitionWriter:
    """map_groups callable: one partition's triangles -> atomic .gltf
    (or .gltf.gz / .gltf.zip — ``GltfOutput.java:430-442`` writes the
    same three variants by filename extension; the tile farm's
    ``TilesetCommand.java:205-246`` emits ``.glb.gz`` artifacts).
    Compressed bytes are deterministic: gzip with mtime=0, zip with a
    fixed entry timestamp."""

    def __init__(self, out_dir: str, compression: str | None = None):
        if compression not in (None, "gz", "zip"):
            raise ValueError("compression must be None, 'gz' or 'zip'")
        self.out_dir = out_dir
        self.compression = compression

    def __call__(self, group: pd.DataFrame) -> pd.DataFrame:
        part = int(group["part"].iloc[0])
        g = group.sort_values(["doc_id"], kind="mergesort")
        buf = bytearray()
        buffer_views = []
        accessors = []
        meshes = []
        nodes = []
        n_docs = 0
        v_total = 0
        f_total = 0
        for doc, sub in g.groupby("doc_id", sort=True):
            n_docs += 1
            nv = int(sub["n_verts"].iloc[0])
            verts = {}
            tris = []
            for vi, xy in zip(sub["v_idx"], sub["v_xy"]):
                tris.append([int(vi[0]), int(vi[1]), int(vi[2])])
                for k in range(3):
                    verts[int(vi[k])] = (xy[2 * k], xy[2 * k + 1])
            pos = np.zeros((nv, 3), dtype="<f4")
            for i in range(nv):
                x, z = verts.get(i, (0.0, 0.0))
                pos[i] = (x, 0.0, z)
            idx = np.asarray(tris, dtype="<u4").ravel()
            # POSITION bufferView + accessor (min/max required by spec)
            pv_off = len(buf)
            buf += pos.tobytes()
            buffer_views.append(
                {"buffer": 0, "byteOffset": pv_off, "byteLength": pos.nbytes}
            )
            accessors.append(
                {
                    "bufferView": len(buffer_views) - 1,
                    "componentType": 5126,  # FLOAT
                    "count": nv,
                    "type": "VEC3",
                    "min": [float(x) for x in pos.min(axis=0)],
                    "max": [float(x) for x in pos.max(axis=0)],
                }
            )
            p_acc = len(accessors) - 1
            iv_off = len(buf)
            buf += idx.tobytes()
            buffer_views.append(
                {"buffer": 0, "byteOffset": iv_off, "byteLength": idx.nbytes}
            )
            accessors.append(
                {
                    "bufferView": len(buffer_views) - 1,
                    "componentType": 5125,  # UNSIGNED_INT
                    "count": int(len(idx)),
                    "type": "SCALAR",
                }
            )
            meshes.append(
                {
                    "primitives": [
                        {
                            "attributes": {"POSITION": p_acc},
                            "indices": len(accessors) - 1,
                            "mode": 4,  # TRIANGLES
                        }
                    ],
                    "name": f"doc-{int(doc)}",
                }
            )
            nodes.append({"mesh": len(meshes) - 1, "name": f"doc-{int(doc)}"})
            v_total += nv
            f_total += len(tris)
        doc_json = {
            "asset": {"version": "2.0", "generator": "osm2world_ray"},
            "scene": 0,
            "scenes": [{"nodes": list(range(len(nodes)))}],
            "nodes": nodes,
            "meshes": meshes,
            "accessors": accessors,
            "bufferViews": buffer_views,
            "buffers": [
                {
                    "byteLength": len(buf),
                    "uri": "data:application/octet-stream;base64,"
                    + base64.b64encode(bytes(buf)).decode("ascii"),
                }
            ],
        }
        os.makedirs(self.out_dir, exist_ok=True)
        tmp = os.path.join(self.out_dir, f".tmp-{uuid.uuid4().hex}")
        payload = json.dumps(
            doc_json, sort_keys=True, separators=(",", ":")
        ).encode()
        name = f"part-{part}.gltf"
        if self.compression == "gz":
            import gzip

            payload = gzip.compress(payload, mtime=0)
            name += ".gz"
        elif self.compression == "zip":
            import io
            import zipfile

            bio = io.BytesIO()
            with zipfile.ZipFile(bio, "w", zipfile.ZIP_DEFLATED) as z:
                info = zipfile.ZipInfo(f"part-{part}.gltf",
                                       date_time=(1980, 1, 1, 0, 0, 0))
                z.writestr(info, payload)
            payload = bio.getvalue()
            name += ".zip"
        with open(tmp, "wb") as f:
            f.write(payload)
        os.replace(tmp, os.path.join(self.out_dir, name))
        return pd.DataFrame(
            {
                "part": [np.int64(part)],
                "n_docs": [np.int64(n_docs)],
                "n_vertices": [np.int64(v_total)],
                "n_faces": [np.int64(f_total)],
                "buffer_bytes": [np.int64(len(buf))],
            }
        )


def export_gltf(sf_dir: str, out_dir: str, *, compression: str | None = None):
    from ..pipelines import datasets

    ds = datasets.documents_ds(sf_dir, columns=["doc_id"])
    rows = ds.map_batches(mesh_rows, batch_format="pyarrow")
    writer = GltfPartitionWriter(out_dir, compression=compression)
    return rows.groupby("part").map_groups(
        lambda g: writer(g), batch_format="pandas"
    )
