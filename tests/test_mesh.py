"""Mesh-chain kernels: merge key/first-material rules, LOD filter,
atlas slot assignment (MeshStore.java semantics)."""

import numpy as np
import pandas as pd
import pyarrow as pa

from osm2world_ray.stages import mesh


def _rows(doc_ids):
    return mesh.mesh_rows(
        pa.table({"doc_id": pa.array(np.asarray(doc_ids, dtype=np.int64))})
    )


def test_mesh_rows_slots():
    t = _rows([0, 1, 2, 5])
    by_doc = {}
    for d, s in zip(
        t["element"].to_numpy(), t["mesh_id"].to_numpy() % 4
    ):
        by_doc.setdefault(int(d), []).append(int(s))
    # doc 0: %3=0 -> slot 0; %2=0 -> twin slot 3
    assert sorted(by_doc[0]) == [0, 3]
    # doc 1: %3=1 -> slots 0,1; odd -> no twin
    assert sorted(by_doc[1]) == [0, 1]
    # doc 2: %3=2 -> slots 0,1,2; even -> twin
    assert sorted(by_doc[2]) == [0, 1, 2, 3]
    assert sorted(by_doc[5]) == [0, 1, 2]


def test_merge_twin_shares_key_and_first_attrs_win():
    t = _rows([6])  # even and %3=0 -> slots 0 and 3 merge
    df = t.to_pandas()
    part = mesh._partial_merge(t, mesh._MERGE_KEY)
    out = mesh._combine_merge(part.to_pandas(), mesh._MERGE_KEY).to_pandas()
    assert len(out) == 1
    row = out.iloc[0]
    m0 = df[df.mesh_id == 24].iloc[0]  # slot 0 = first member
    assert row.n_meshes == 2
    assert row.sum_tris == df.n_tris.sum()
    assert row.first_color == m0.color
    assert row.first_normal_mode == m0.normal_mode


def test_merge_split_across_batches_combines():
    t = _rows([6])
    b1, b2 = t.slice(0, 1), t.slice(1, 1)
    parts = pa.concat_tables(
        [mesh._partial_merge(b, mesh._MERGE_KEY) for b in (b1, b2)]
    )
    out = mesh._combine_merge(parts.to_pandas(), mesh._MERGE_KEY).to_pandas()
    assert len(out) == 1 and out.iloc[0].n_meshes == 2


def test_merge_elements_mixed_metadata_nulls():
    # two docs sharing (tex, lod) merge across elements -> element = -1
    t = _rows(list(range(50)))
    key = [k for k in mesh._MERGE_KEY if k != "element"]
    part = mesh._partial_merge(t, key)
    out = mesh._combine_merge(part.to_pandas(), key).to_pandas()
    multi = out[out.n_meshes > 1]
    assert (multi.element == -1).any()
    # a group is never smaller than its per-element merge
    assert out.n_meshes.sum() == len(t)


def test_atlas_excludes_oob_textures():
    df = _rows(list(range(200))).to_pandas()
    oob_tex = set(df[df.oob == 1].tex)
    eligible = sorted(set(df.tex) - oob_tex)
    slots = {t: i for i, t in enumerate(eligible)}
    # mirror of _tex_exclusions without Ray
    g = df.groupby("tex")["oob"].max()
    assert {t: i for i, t in enumerate(sorted(g[g == 0].index))} == slots
