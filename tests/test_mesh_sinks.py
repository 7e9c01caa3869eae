"""glTF / POV partition writers: file structure, buffer round-trip,
NaN/empty-mesh suppression (no Ray; writers called directly)."""

import base64
import json
import math
import os

import numpy as np
import pandas as pd

from osm2world_ray.state.gltf_sink import GltfPartitionWriter
from osm2world_ray.state.pov_sink import PovPartitionWriter


def _rows(doc_ids):
    import pyarrow as pa

    from osm2world_ray.state.obj_sink import mesh_rows

    return mesh_rows(
        pa.table({"doc_id": pa.array(np.asarray(doc_ids, dtype=np.int64))})
    ).to_pandas()


def test_gltf_file_valid_and_buffer_roundtrip(tmp_path):
    g = _rows([0, 16])  # both in part 0
    out = GltfPartitionWriter(str(tmp_path))(g)
    assert out.n_docs[0] == 2
    d = json.load(open(tmp_path / "part-0.gltf"))
    assert d["asset"]["version"] == "2.0"
    assert len(d["meshes"]) == 2 and len(d["nodes"]) == 2
    raw = base64.b64decode(d["buffers"][0]["uri"].split(",", 1)[1])
    assert len(raw) == d["buffers"][0]["byteLength"] == out.buffer_bytes[0]
    # every accessor window fits the buffer; POSITION carries min/max
    for acc in d["accessors"]:
        bv = d["bufferViews"][acc["bufferView"]]
        assert bv["byteOffset"] + bv["byteLength"] <= len(raw)
        assert bv["byteOffset"] % 4 == 0
        if acc["type"] == "VEC3":
            assert len(acc["min"]) == 3 and len(acc["max"]) == 3
    # indices stay inside their mesh's vertex count
    for mesh in d["meshes"]:
        prim = mesh["primitives"][0]
        pos = d["accessors"][prim["attributes"]["POSITION"]]
        iacc = d["accessors"][prim["indices"]]
        bv = d["bufferViews"][iacc["bufferView"]]
        idx = np.frombuffer(
            raw[bv["byteOffset"]:bv["byteOffset"] + bv["byteLength"]], "<u4"
        )
        assert idx.max() < pos["count"]


def test_pov_file_structure_and_counts(tmp_path):
    g = _rows([0, 16])
    out = PovPartitionWriter(str(tmp_path))(g)
    text = open(tmp_path / "part-0.pov").read()
    assert text.count("mesh {") == out.n_meshes[0] == 2
    assert text.count("triangle {") == out.n_triangles[0]


def test_pov_nan_triangles_skipped_and_empty_mesh_suppressed(tmp_path):
    g = _rows([0])
    # poison every vertex of doc 0 -> all its triangles NaN-skip ->
    # the mesh block itself is suppressed (checkMeshValidity)
    g = g.copy()
    g["v_xy"] = g["v_xy"].map(lambda xs: [math.nan] * len(xs))
    out = PovPartitionWriter(str(tmp_path))(g)
    assert out.n_docs[0] == 1 and out.n_meshes[0] == 0
    assert "mesh {" not in open(tmp_path / "part-0.pov").read()


def test_writers_atomic_no_tmp_left(tmp_path):
    GltfPartitionWriter(str(tmp_path))(_rows([3]))
    PovPartitionWriter(str(tmp_path))(_rows([3]))
    assert not [f for f in os.listdir(tmp_path) if f.startswith(".tmp-")]


def test_gltf_gz_and_zip_variants_roundtrip(tmp_path):
    """GltfOutput.java:430-442 extension-switched compression: the
    compressed artifacts must decompress to the byte-identical plain
    .gltf, deterministically (fixed gzip mtime / zip timestamp)."""
    import gzip
    import zipfile

    g = _rows([0, 16])
    plain_dir = tmp_path / "plain"
    gz_dir = tmp_path / "gz"
    zip_dir = tmp_path / "zip"
    GltfPartitionWriter(str(plain_dir))(g)
    GltfPartitionWriter(str(gz_dir), compression="gz")(g)
    GltfPartitionWriter(str(zip_dir), compression="zip")(g)
    plain = open(plain_dir / "part-0.gltf", "rb").read()
    assert gzip.decompress(open(gz_dir / "part-0.gltf.gz", "rb").read()) == plain
    with zipfile.ZipFile(zip_dir / "part-0.gltf.zip") as z:
        assert z.read("part-0.gltf") == plain
    # deterministic compressed bytes (re-run -> identical file)
    gz2 = tmp_path / "gz2"
    GltfPartitionWriter(str(gz2), compression="gz")(g)
    assert open(gz2 / "part-0.gltf.gz", "rb").read() == open(
        gz_dir / "part-0.gltf.gz", "rb"
    ).read()
    import pytest

    with pytest.raises(ValueError):
        GltfPartitionWriter(str(tmp_path), compression="lz4")
