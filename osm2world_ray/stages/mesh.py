"""Mesh-chain data analogues: merge, LOD filter, texture atlas.

Reference semantics (``scene/mesh/MeshStore.java``):

- ``MergeMeshes`` (:178-277): meshes merge iff their LOD ranges are
  identical, their metadata (map element) matches (unless the
  ``MERGE_ELEMENTS`` option drops it from the key, in which case mixed
  metadata collapses to null, ``MeshWithMetadata.merge`` :65-78), and
  their materials are equal under the configured laxness — by default
  normal-interpolation mode and color are IGNORED
  (``Material.equals(other, ignoreNormalMode, ignoreColor)`` via
  :228-230), so the merged mesh takes the FIRST member's material.
  Geometry is concatenated (``Geometry.combine``).
- ``FilterLod`` (:124-141): keep meshes whose ``lodRange`` contains the
  target LOD.
- ``ReplaceTexturesWithAtlas`` (:400-575): pass 1 gathers the distinct
  texture layers eligible for the atlas — a texture accessed anywhere
  at a coordinate outside [0,1] is excluded globally (:504-514); pass 2
  remaps every mesh whose layer made it into the atlas
  (``canReplaceLayer`` / ``TextureAtlas.mapTexCoords``), others pass
  through unchanged.

Ray shape: the mesh table is synthesized deterministically from
``documents`` (SQL mirror in :data:`MESHES_SQL`). ``mesh_merge`` is the
partial/combiner discipline of :mod:`osm2world_ray.stages.rollup` —
pyarrow C++ ``group_by`` partials per batch (a doc's meshes are
batch-local, so most groups finalize before any data moves), one
bounded-bucket shuffle keyed on a hash of the element, vectorized
within-bucket combine. The first-member material survives the shuffle
as a packed ``min(mesh_id*8 + color*2 + normal_mode)``. The atlas is
the aggregate-distinct -> broadcast-remap two-pass: pass 1 collapses to
<= ``N_TEX`` rows (driver-side materialization of a bounded table),
pass 2 is a stateless map with the tiny slot dict in its closure.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .overlaps import bucket_groups, bucket_of

#: distinct synthetic texture-layer ids
N_TEX = 7
#: FilterLod target (LOD2 of the reference's 0..4 scale)
TARGET_LOD = 2
N_MESH_BUCKETS = 64

#: SQL mirror of :func:`mesh_rows` (CTE over ``documents``); slots:
#: 0 always, 1/2 per doc_id%3, 3 = the merge twin sharing slot 0's
#: key-attributes (same element/tex/lod) with its own per-mesh attrs
MESHES_SQL = """
meshes AS (
  SELECT doc_id*4 + slot AS mesh_id,
         doc_id AS element,
         (doc_id + 2*(slot % 3)) % 7 AS tex,
         (doc_id*4 + (slot % 3)) % 3 AS lod_min,
         (doc_id*4 + (slot % 3)) % 3 + 1 + (doc_id*4 + (slot % 3)) % 2 AS lod_max,
         (doc_id*4 + slot) % 3 AS color,
         (doc_id*4 + slot) % 2 AS normal_mode,
         1 + (doc_id*4 + slot) % 5 AS n_tris,
         3 + (doc_id*4 + slot) % 5 AS n_verts,
         CASE WHEN (doc_id*4 + slot) % 13 = 0 THEN 1 ELSE 0 END AS oob
  FROM documents, (SELECT unnest([0, 1, 2, 3]) AS slot) s
  WHERE slot = 0
     OR (slot <= 2 AND doc_id % 3 >= slot)
     OR (slot = 3 AND doc_id % 2 = 0)
)
"""


def mesh_rows(batch: pa.Table) -> pa.Table:
    """documents batch -> synthetic mesh rows (vectorized; one doc
    emits 1 + doc%3 meshes plus a merge twin on even docs)."""
    doc = batch["doc_id"].to_numpy().astype(np.int64)
    docs, slots = [], []
    for slot in range(4):
        if slot == 0:
            m = np.ones(len(doc), dtype=bool)
        elif slot <= 2:
            m = (doc % 3) >= slot
        else:
            m = (doc % 2) == 0
        docs.append(doc[m])
        slots.append(np.full(int(m.sum()), slot, dtype=np.int64))
    d = np.concatenate(docs)
    s = np.concatenate(slots)
    mesh_id = d * 4 + s
    kmesh = d * 4 + (s % 3)
    lod_min = kmesh % 3
    return pa.table(
        {
            "mesh_id": pa.array(mesh_id),
            "element": pa.array(d),
            "tex": pa.array((d + 2 * (s % 3)) % 7),
            "lod_min": pa.array(lod_min),
            "lod_max": pa.array(lod_min + 1 + kmesh % 2),
            "color": pa.array(mesh_id % 3),
            "normal_mode": pa.array(mesh_id % 2),
            "n_tris": pa.array(1 + mesh_id % 5),
            "n_verts": pa.array(3 + mesh_id % 5),
            "oob": pa.array((mesh_id % 13 == 0).astype(np.int64)),
        }
    )


_MERGE_KEY = ["element", "tex", "lod_min", "lod_max"]


def _partial_merge(batch: pa.Table, key: list[str]) -> pa.Table:
    """mesh rows -> per-batch merged partials + shuffle bucket."""
    packed = pa.array(
        batch["mesh_id"].to_numpy() * 8
        + batch["color"].to_numpy() * 2
        + batch["normal_mode"].to_numpy()
    )
    t = batch.append_column("first_packed", packed)
    g = (
        t.select(key + ["n_tris", "n_verts", "first_packed", "element"])
        if "element" not in key
        else t.select(key + ["n_tris", "n_verts", "first_packed"])
    )
    agg = [
        ("n_tris", "sum"),
        ("n_verts", "sum"),
        ("first_packed", "min"),
        ([], "count_all"),
    ]
    if "element" not in key:
        agg += [("element", "min"), ("element", "max")]
    part = g.group_by(key).aggregate(agg)
    cols = {k: part[k] for k in key}
    cols["sum_tris"] = part["n_tris_sum"].cast(pa.int64())
    cols["sum_verts"] = part["n_verts_sum"].cast(pa.int64())
    cols["first_packed"] = part["first_packed_min"]
    cols["n_meshes"] = part["count_all"].cast(pa.int64())
    if "element" not in key:
        cols["element_min"] = part["element_min"]
        cols["element_max"] = part["element_max"]
    out = pa.table(cols)
    return out.append_column(
        "bucket", pa.array(bucket_of(out[key[0]].to_numpy(), N_MESH_BUCKETS))
    )


def _combine_merge(group, key: list[str]) -> pa.Table:
    """bucket of partials -> final merged-mesh rows (Arrow in/out)."""
    t = (
        group
        if isinstance(group, pa.Table)
        else pa.Table.from_pandas(group, preserve_index=False)
    )
    agg = [
        ("sum_tris", "sum"),
        ("sum_verts", "sum"),
        ("first_packed", "min"),
        ("n_meshes", "sum"),
    ]
    if "element" not in key:
        agg += [("element_min", "min"), ("element_max", "max")]
    g = t.group_by(key).aggregate(agg)
    packed = g["first_packed_min"].to_numpy()
    cols = {k: g[k].cast(pa.int64()) for k in key}
    if "element" not in key:
        # MeshWithMetadata.merge: mixed metadata collapses to null (-1)
        emin = g["element_min_min"].to_numpy()
        emax = g["element_max_max"].to_numpy()
        cols["element"] = pa.array(np.where(emin == emax, emin, -1))
    cols["n_meshes"] = g["n_meshes_sum"].cast(pa.int64())
    cols["sum_tris"] = g["sum_tris_sum"].cast(pa.int64())
    cols["sum_verts"] = g["sum_verts_sum"].cast(pa.int64())
    cols["first_color"] = pa.array((packed % 8) // 2)
    cols["first_normal_mode"] = pa.array(packed % 2)
    return pa.table(cols)


def merge_meshes(docs_ds, *, merge_elements: bool = False):
    """MergeMeshes as partial-agg -> bounded-bucket shuffle -> combine.

    Default options keep the map element in the merge key; with
    ``merge_elements`` the key drops it and mixed-element groups get
    the null (-1) metadata of ``MeshWithMetadata.merge``.
    """
    key = [k for k in _MERGE_KEY if merge_elements is False or k != "element"]
    rows = docs_ds.map_batches(mesh_rows, batch_format="pyarrow")
    parts = rows.map_batches(
        lambda b, key=key: _partial_merge(b, key), batch_format="pyarrow"
    )
    return bucket_groups(
        parts, lambda g, key=key: _combine_merge(g, key), batch_format="pyarrow"
    )


def filter_lod(docs_ds, *, target: int = TARGET_LOD):
    """FilterLod: lodRange.contains(target), a pure vectorized filter."""
    import pyarrow.compute as pc

    def flt(batch: pa.Table) -> pa.Table:
        keep = pc.and_(
            pc.less_equal(batch["lod_min"], target),
            pc.greater_equal(batch["lod_max"], target),
        )
        return batch.filter(keep).select(
            ["mesh_id", "element", "tex", "lod_min", "lod_max", "n_tris"]
        )

    return docs_ds.map_batches(mesh_rows, batch_format="pyarrow").map_batches(
        flt, batch_format="pyarrow"
    )


def _tex_exclusions(rows_ds) -> dict[int, int]:
    """Pass 1: distinct (tex, any-out-of-range) — a bounded (<= N_TEX
    row) aggregate, then the deterministic slot assignment (sorted
    eligible tex ids). Driver materializes only this tiny table."""

    def partial(batch: pa.Table) -> pa.Table:
        g = batch.select(["tex", "oob"]).group_by(["tex"]).aggregate(
            [("oob", "max")]
        )
        return pa.table(
            {"tex": g["tex"], "oob": g["oob_max"].cast(pa.int64())}
        )

    def combine(batch: pa.Table) -> pa.Table:
        g = batch.group_by(["tex"]).aggregate([("oob", "max")])
        return pa.table(
            {"tex": g["tex"], "oob": g["oob_max"].cast(pa.int64())}
        )

    t = (
        rows_ds.map_batches(partial, batch_format="pyarrow")
        .repartition(1)
        .map_batches(combine, batch_format="pyarrow", batch_size=None)
        .take_all()
    )
    eligible = sorted(r["tex"] for r in t if r["oob"] == 0)
    return {tex: slot for slot, tex in enumerate(eligible)}


def texture_atlas(docs_ds):
    """ReplaceTexturesWithAtlas two-pass: aggregate-distinct eligible
    textures -> broadcast slot map -> remap tex coords (row-layout
    atlas: u' = (slot + u) / n, micro-snapped)."""
    rows = docs_ds.map_batches(mesh_rows, batch_format="pyarrow")
    slots = _tex_exclusions(rows)
    n_atlas = len(slots)

    def remap(batch: pa.Table, slots=slots, n=n_atlas) -> pa.Table:
        tex = batch["tex"].to_numpy()
        slot = np.full(len(tex), -1, dtype=np.int64)
        for t_, s_ in slots.items():
            slot[tex == t_] = s_
        hit = slot >= 0
        u0 = np.full(len(tex), -1, dtype=np.int64)
        u1 = np.full(len(tex), -1, dtype=np.int64)
        u0[hit] = np.floor(slot[hit] * 1.0 / n * 1e6 + 0.5).astype(np.int64)
        u1[hit] = np.floor((slot[hit] + 1.0) / n * 1e6 + 0.5).astype(np.int64)
        return pa.table(
            {
                "mesh_id": batch["mesh_id"],
                "tex": batch["tex"],
                "atlas_slot": pa.array(slot),
                "new_u0_micro": pa.array(u0),
                "new_u1_micro": pa.array(u1),
            }
        )

    return rows.map_batches(remap, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# remaining MeshStore processing steps (pure per-mesh maps, no shuffle)
# ---------------------------------------------------------------------------

#: EmulateTextureLayers offset between faked layers (MeshStore.java:280)
OFFSET_PER_LAYER = 5e-2
#: layer cap exercised by the registered query (maxLayers ctor arg)
MAX_LAYERS = 2
#: ConvertToTriangles(LOD2) desired max error (MeshStore.java:150-158)
LOD2_MAX_ERROR = 0.20


def emulate_texture_layers(batch: pa.Table, *, max_layers: int = MAX_LAYERS) -> pa.Table:
    """EmulateTextureLayers (MeshStore.java:278-339): multi-layer
    meshes split into one single-layer mesh per texture layer, each
    shifted ``layer * OFFSET_PER_LAYER`` along the normal; layers past
    ``max_layers`` are omitted; layers > 0 get BINARY transparency;
    single-layer meshes pass through unchanged."""
    rows = mesh_rows(batch)
    mesh_id = rows["mesh_id"].to_numpy()
    n_layers = 1 + mesh_id % 3
    emit = np.where(n_layers <= 1, 1, np.minimum(max_layers, n_layers))
    rep = np.repeat(np.arange(len(mesh_id)), emit)
    ends = np.cumsum(emit)
    layer = np.arange(int(ends[-1]) if len(mesh_id) else 0, dtype=np.int64) \
        - np.repeat(ends - emit, emit)
    m = mesh_id[rep]
    rebuilt = (n_layers[rep] > 1).astype(np.int64)
    return pa.table(
        {
            "mesh_id": pa.array(m),
            "layer": pa.array(layer),
            "rebuilt": pa.array(rebuilt),
            "offset_micro": pa.array(
                np.floor(layer * OFFSET_PER_LAYER * 1e6 + 0.5).astype(np.int64)
                * rebuilt
            ),
            "binary_transparency": pa.array(
                ((layer > 0) & (rebuilt == 1)).astype(np.int64)
            ),
            "n_tris": rows["n_tris"].to_numpy()[rep],
        }
    )


def move_colors_to_vertices(batch: pa.Table) -> pa.Table:
    """MoveColorsToVertices (MeshStore.java:342-398): meshes whose
    texture layers are all non-colorable pass through; otherwise the
    material color moves into per-vertex colors (existing vertex colors
    kept, else nCopies(vertices, material.color)) and the material goes
    WHITE (color code 3)."""
    rows = mesh_rows(batch)
    mesh_id = rows["mesh_id"].to_numpy()
    color = rows["color"].to_numpy()
    n_tris = rows["n_tris"].to_numpy()
    colorable = mesh_id % 4 != 0
    has_vcolors = mesh_id % 5 == 0
    moved = colorable  # every synth mesh has >= 1 texture layer
    n_vc = np.where(moved | has_vcolors, 3 * n_tris, 0)
    return pa.table(
        {
            "mesh_id": pa.array(mesh_id),
            "moved": pa.array(moved.astype(np.int64)),
            "new_color": pa.array(np.where(moved, 3, color)),
            "n_vertex_colors": pa.array(n_vc),
        }
    )


def emulate_double_sided(batch: pa.Table) -> pa.Table:
    """EmulateDoubleSidedMaterials (MeshStore.java:813-870):
    double-sided meshes duplicate into a front copy and a
    winding-flipped back copy, both single-sided."""
    rows = mesh_rows(batch)
    mesh_id = rows["mesh_id"].to_numpy()
    n_tris = rows["n_tris"].to_numpy()
    ds = mesh_id % 6 == 0
    copies = np.where(ds, 2, 1)
    rep = np.repeat(np.arange(len(mesh_id)), copies)
    ends = np.cumsum(copies)
    side = np.arange(int(ends[-1]) if len(mesh_id) else 0, dtype=np.int64) \
        - np.repeat(ends - copies, copies)
    return pa.table(
        {
            "mesh_id": pa.array(mesh_id[rep]),
            "side": pa.array(side),
            "flipped": pa.array((side == 1).astype(np.int64)),
            "n_tris": pa.array(n_tris[rep]),
        }
    )


def convert_to_triangles(batch: pa.Table) -> pa.Table:
    """ConvertToTriangles(LOD2) tessellation decisions
    (MeshStore.java:142-176 + ExtrusionGeometry.java:185-199): triangle
    geometry passes through (n_out = n_tris), shape geometry fans
    (n_verts - 2), circle extrusions discretize the ring with
    numPoints = max(4, ceil(pi / sqrt(2*err/maxRadius))), halved (min
    4) when neither end cap is visible."""
    rows = mesh_rows(batch)
    mesh_id = rows["mesh_id"].to_numpy()
    n_tris = rows["n_tris"].to_numpy()
    n_verts = rows["n_verts"].to_numpy()
    gcls = mesh_id % 3
    radius = (1 + mesh_id % 4).astype(np.float64)
    pts = np.maximum(
        4,
        np.ceil(np.pi / np.sqrt(2 * LOD2_MAX_ERROR / radius)).astype(np.int64),
    )
    capless = mesh_id % 2 == 0
    pts = np.where(capless, np.maximum(4, pts // 2), pts)
    n_out = np.where(gcls == 0, n_tris, np.where(gcls == 1, n_verts - 2, pts))
    return pa.table(
        {
            "mesh_id": pa.array(mesh_id),
            "geom_cls": pa.array(gcls),
            "n_out": pa.array(n_out),
        }
    )
