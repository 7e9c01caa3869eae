"""Tile-farm capstone: the FrontendPbfOutput/TilesetOutput pipeline as
ONE Ray Data run.

Reference semantics composed here:

- bbox model filter + per-tile clip (``FrontendPbfOutput.java:274``
  bbox filter, ``:716-725`` ClipToBounds before serialization);
- LOD filtering of the mesh chain (``FilterLod`` in the glTF chain);
- one artifact per tile partition, written atomically with a
  lineage+metrics manifest (``TilesetCommand.java:140-156,248-259``
  deterministic ``{z}/{x}/{y}`` paths + overwrite-mode skip);
- a ROOT ``tileset.json`` aggregating every partition
  (``TilesetOutput.java:209``, ``TilesetCommand.java:205-246``).

Scale shape: the straddle fan-out, LOD gate and clip are fused into
one ``map_batches`` pass (no intermediate shuffle); the only exchange
is the bounded ``(pz, px, py)`` partition groupby, whose key count is
the z``parent_zoom`` tile grid — fixed regardless of corpus size. The
root manifest is built from the per-partition metrics rows (bounded by
the partition count), the ONLY thing the driver ever holds.

Clip coordinates are emitted in Web-Mercator tile units snapped to
1/4096 of a tile (ints, per the no-floats output convention). The
snap grid is coarse enough that numpy-vs-DuckDB 1-ulp transcendental
differences in the Mercator ``ln(tan(...))`` cannot flip a unit (abs
error ~1e-13 against a 2.4e-4 grid).
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ..sources import synth
from .checkpoint import input_fingerprint, scan_done_partitions

#: sub-tile snap: 4096 units per tile edge
CLIP_SCALE = 4096
#: the glTF chain's LOD gate
TARGET_LOD = 2

_ARTIFACT_COLS = [
    "url", "mention_idx", "kind", "tx", "ty", "cx0", "cy0", "cx1", "cy1",
]


def _mercator_xy(lat: np.ndarray, lon: np.ndarray, zoom: int):
    """Web-Mercator tile-unit coordinates — the SAME formula shape as
    ``geo/tiles.at_lat_lon`` minus the floor, mirrored in SQL by
    :func:`tileset_oracle_sql` (TileNumber.java:122-126)."""
    n = np.float64(1 << zoom)
    mx = (lon + 180.0) / 360.0 * n
    r = np.radians(lat)
    my = (1.0 - np.log(np.tan(r) + 1.0 / np.cos(r)) / np.pi) / 2.0 * n
    return mx, my


def fan_lod_clip(batch: pa.Table, *, zoom: int = 13,
                 exclude_kinds: tuple[int, ...] = ()) -> pa.Table:
    """mentions batch -> per-(mention x covered tile) rows with the
    footprint bbox clipped to the tile rect, LOD-gated. One fused pass:
    tilesForBounds fan-out (TileNumber.java:129-144) + FilterLod +
    ClipToBounds (MeshStore.java:577-768). ``exclude_kinds`` drops the
    mention kinds whose WorldModule was excluded by config
    (O2WConverterImpl.java:209-241 excludeWorldModule) BEFORE the
    fan-out."""
    from ..stages.overlaps import doc_ids_of
    from ..stages.tile_assign import fan_out_footprints

    if exclude_kinds:
        k = batch["kind"].to_numpy(zero_copy_only=False)
        batch = batch.filter(
            pa.array(~np.isin(k, np.asarray(exclude_kinds, dtype=k.dtype)))
        )

    # LOD gate first: fewer rows fan out. Per-mention LOD range uses
    # the mesh-chain formula family over the mention key.
    doc = doc_ids_of(batch)
    mkey = doc * 4 + batch["mention_idx"].to_numpy()
    lod_min = mkey % 3
    lod_max = lod_min + 1 + mkey % 2
    keep = (lod_min <= TARGET_LOD) & (TARGET_LOD <= lod_max)
    batch = batch.filter(pa.array(keep))

    out = fan_out_footprints(batch, zoom=zoom)
    lat = out["lat"].to_numpy(zero_copy_only=False)
    lon = out["lon"].to_numpy(zero_copy_only=False)
    tx = out["tx"].to_numpy()
    ty = out["ty"].to_numpy()
    mx0, _ = _mercator_xy(lat, lon - synth.RLON, zoom)
    mx1, _ = _mercator_xy(lat, lon + synth.RLON, zoom)
    _, my0 = _mercator_xy(lat + synth.RLAT, lon, zoom)  # north edge: smaller y
    _, my1 = _mercator_xy(lat - synth.RLAT, lon, zoom)

    def snap(v):
        return np.floor(v * CLIP_SCALE + 0.5).astype(np.int64)

    return pa.table(
        {
            "url": out["url"],
            "mention_idx": out["mention_idx"],
            "kind": out["kind"],
            "tx": pa.array(tx),
            "ty": pa.array(ty),
            "cx0": pa.array(snap(np.maximum(mx0, tx))),
            "cy0": pa.array(snap(np.maximum(my0, ty))),
            "cx1": pa.array(snap(np.minimum(mx1, tx + 1))),
            "cy1": pa.array(snap(np.minimum(my1, ty + 1))),
        }
    )


_METRIC_FIELDS = [
    ("pz", pa.int64()), ("px", pa.int64()), ("py", pa.int64()),
    ("n_rows", pa.int64()), ("n_urls", pa.int64()),
    ("n_meshes", pa.int64()), ("n_tris", pa.int64()),
    ("clip_sum", pa.int64()),
]


class TilePartitionWriter:
    """``map_groups`` kernel: one (pz, px, py) partition's clipped rows
    -> atomic artifact parquet + manifest; returns the metrics row.
    Arrow in/out, deterministic row order inside the artifact."""

    def __init__(self, out_dir: str, fingerprint: str):
        self.out_dir = out_dir
        self.fingerprint = fingerprint

    def __call__(self, group: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t0 = time.perf_counter()
        pz = int(group["pz"][0].as_py())
        px = int(group["px"][0].as_py())
        py = int(group["py"][0].as_py())
        pdir = os.path.join(self.out_dir, str(pz), str(px), str(py))
        os.makedirs(pdir, exist_ok=True)
        data = group.select(_ARTIFACT_COLS)
        data = data.sort_by([(c, "ascending") for c in _ARTIFACT_COLS])
        tmp = os.path.join(pdir, f".tmp-{uuid.uuid4().hex}")
        pq.write_table(data, tmp)
        os.replace(tmp, os.path.join(pdir, "tile.parquet"))
        n_urls = pc.count_distinct(data["url"]).as_py()
        n_meshes = pc.count_distinct(data["kind"]).as_py()
        clip_sum = sum(
            int(pc.sum(data[c]).as_py()) for c in ("cx0", "cy0", "cx1", "cy1")
        )
        manifest = {
            "partition": [pz, px, py],
            "n_rows": len(data),
            "n_urls": n_urls,
            "n_meshes": n_meshes,
            "n_tris": 2 * len(data),
            "clip_sum": clip_sum,
            "input_fingerprint": self.fingerprint,
            "wall_ms": round((time.perf_counter() - t0) * 1000, 2),
        }
        mtmp = os.path.join(pdir, f".tmp-{uuid.uuid4().hex}")
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, os.path.join(pdir, "manifest.json"))
        return pa.table(
            {
                name: pa.array([v], type=typ)
                for (name, typ), v in zip(
                    _METRIC_FIELDS,
                    [pz, px, py, len(data), n_urls, n_meshes,
                     2 * len(data), clip_sum],
                )
            }
        )


def write_root_tileset(out_dir: str, fingerprint: str) -> dict:
    """Aggregate every partition manifest into the root
    ``tileset.json`` (TilesetOutput.java:209 analogue): one child per
    complete partition with its tile-grid bounding volume and metrics.
    Pure manifest scan — bounded by the partition count."""
    children = []
    for root, _dirs, files in sorted(os.walk(out_dir)):
        if "manifest.json" not in files:
            continue
        with open(os.path.join(root, "manifest.json")) as f:
            m = json.load(f)
        if m.get("input_fingerprint") != fingerprint:
            # stale partition from an older input: never let its
            # metrics (or an orphan tile the new input no longer
            # covers) into the root manifest
            continue
        pz, px, py = m["partition"]
        children.append(
            {
                "uri": f"{pz}/{px}/{py}/tile.parquet",
                "boundingVolume": {"tile": [pz, px, py]},
                "geometricError": 2.0 ** (20 - pz),
                "metrics": {
                    k: m[k]
                    for k in ("n_rows", "n_urls", "n_meshes", "n_tris")
                },
            }
        )
    tileset = {
        "asset": {"version": "1.1", "inputFingerprint": fingerprint},
        "geometricError": 2.0 ** 20,
        "root": {"children": children},
    }
    tmp = os.path.join(out_dir, f".tmp-{uuid.uuid4().hex}")
    with open(tmp, "w") as f:
        json.dump(tileset, f, indent=1)
    os.replace(tmp, os.path.join(out_dir, "tileset.json"))
    return tileset


def tileset_export(sf_dir: str, out_dir: str, *, zoom: int = 13,
                   parent_zoom: int = 6, overwrite: str = "older",
                   config=None):
    """The full tile farm: mentions -> fused fan-out/LOD/clip ->
    bounded partition shuffle -> atomic per-tile artifacts + manifests
    -> root tileset.json. Returns the per-partition metrics TABLE for
    ALL complete partitions (freshly written and resumed alike), after
    writing the root manifest — the one driver-side table, bounded by
    the z``parent_zoom`` grid.

    Resume: with the default ``overwrite="older"``, partitions whose
    manifest matches the input fingerprint are filtered out BEFORE the
    shuffle (driver-side manifest scan + row-level anti-join,
    ``TilesetCommand.java:140-156`` skip rule); a killed run leaves tmp
    files and no manifest, so only its partitions recompute, and a
    CHANGED input recomputes everything. ``overwrite="never"`` trusts
    any manifest regardless of fingerprint (cheapest resume; only safe
    when the input is known unchanged) — the root tileset.json still
    excludes stale-fingerprint children in that mode.
    """
    from ..functions.modules import excluded_kinds
    from ..pipelines import datasets

    # WorldModule list/exclusion resolved from config ONCE, driver-side
    excl = tuple(excluded_kinds(config).tolist()) if config is not None else ()
    fp = input_fingerprint(sf_dir)
    if excl:
        # excluded modules change every partition's content: keep their
        # artifacts separate from full-module runs
        fp = f"{fp}-excl{''.join(map(str, excl))}"
    done = scan_done_partitions(out_dir, fingerprint=fp, overwrite=overwrite)
    done_packed = np.array(
        sorted((x << 32) | y for (_z, x, y) in done), dtype=np.int64
    )
    shift = zoom - parent_zoom

    def add_parent(b: pa.Table) -> pa.Table:
        px = b["tx"].to_numpy() >> shift
        py = b["ty"].to_numpy() >> shift
        out = (
            b.append_column(
                "pz", pa.array(np.full(len(b), parent_zoom, dtype=np.int64))
            )
            .append_column("px", pa.array(px))
            .append_column("py", pa.array(py))
        )
        if len(done_packed):
            keep = ~np.isin((px << 32) | py, done_packed)
            if not keep.all():
                out = out.filter(pa.array(keep))
        return out

    ds = datasets.mentions_ds(sf_dir)
    ds = ds.map_batches(
        lambda b: fan_lod_clip(b, zoom=zoom, exclude_kinds=excl),
        batch_format="pyarrow",
    ).map_batches(add_parent, batch_format="pyarrow")
    writer = TilePartitionWriter(out_dir, fp)
    metrics = ds.groupby(["pz", "px", "py"]).map_groups(
        lambda g: writer(g), batch_format="pyarrow"
    )
    # consume the bounded metrics stream, then seal the root manifest
    fresh = metrics.take_all()
    write_root_tileset(out_dir, fp)
    # resumed partitions re-enter the result from their manifests so a
    # resumed run and a fresh run return the same table
    rows = {(r["pz"], r["px"], r["py"]): r for r in fresh}
    for (z, x, y) in done:
        mpath = os.path.join(out_dir, str(z), str(x), str(y), "manifest.json")
        with open(mpath) as f:
            m = json.load(f)
        rows[(z, x, y)] = {
            "pz": z, "px": x, "py": y, "n_rows": m["n_rows"],
            "n_urls": m["n_urls"], "n_meshes": m["n_meshes"],
            "n_tris": m["n_tris"], "clip_sum": m["clip_sum"],
        }
    ordered = [rows[k] for k in sorted(rows)]
    return pa.table(
        {
            name: pa.array([r[name] for r in ordered], type=typ)
            for name, typ in _METRIC_FIELDS
        }
    )
