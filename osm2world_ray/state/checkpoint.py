"""Resumable partitioned output with per-partition lineage + metrics.

The reference's resume model (``TilesetCommand.java:140-156,248-259``):
deterministic per-tile output paths ``lod{n}/{z}/{x}/{y}``, an
``OverwriteMode NEVER/OLDER/ALWAYS`` skip rule, per-tile perf JSON
(``O2WConverterImpl.writeLogs:421-494``: ``osm2world_log_<tile>.json``
with ``{startTime, totalTime, timePerPhase}``), and per-tile failures
that do not abort the farm.

Ray-native shape:

- **partition = parent tile** at a coarse zoom (``parent_zoom``): the
  z13 rows of one z6 ancestor land in one partition directory
  ``{out_dir}/{pz}/{px}/{py}/`` — bounded partition count, key reused
  from the tile shuffle.
- **write inside the shuffle**: ``groupby(partition key).map_groups``
  writes each partition's parquet ATOMICALLY (tmp file + ``os.replace``)
  and then its ``manifest.json`` (manifest presence == success marker,
  the ``_SUCCESS`` analogue). The pipeline's output is the tiny metrics
  dataset, one row per partition.
- **manifest = lineage + metrics**: input fingerprint (source file
  sizes/mtimes), row counts, distinct-url count, wall-clock ms,
  engine code version — the per-tile perf JSON analogue.
- **resume = driver-side manifest scan + broadcast skip-set**: before
  the shuffle, list existing manifests (cheap glob over the bounded
  partition tree), keep those whose fingerprint matches per the
  overwrite mode, and filter their rows out of the input — the
  anti-join version of "skip tiles whose outputs exist". A killed run
  leaves tmp files and no manifest, so its partitions are recomputed.
"""

from __future__ import annotations

import json
import os
import time
import uuid

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq

OVERWRITE_MODES = ("never", "older", "always")


def input_fingerprint(sf_dir: str) -> str:
    """Lineage fingerprint of the input: name/size/mtime of the source
    parquet files (the reference compares output vs input timestamps,
    ``InputOptions.java:72-90``)."""
    parts = []
    for name in sorted(os.listdir(sf_dir)):
        if name.endswith(".parquet"):
            st = os.stat(os.path.join(sf_dir, name))
            parts.append(f"{name}:{st.st_size}:{int(st.st_mtime)}")
    import hashlib

    return hashlib.md5("|".join(parts).encode()).hexdigest()


def partition_path(out_dir: str, pz: int, px: int, py: int) -> str:
    return os.path.join(out_dir, str(pz), str(px), str(py))


def scan_done_partitions(out_dir: str, *, fingerprint: str,
                         overwrite: str = "never") -> set[tuple[int, int, int]]:
    """Driver-side manifest scan -> set of partitions to SKIP."""
    if overwrite not in OVERWRITE_MODES:
        raise ValueError(f"overwrite must be one of {OVERWRITE_MODES}")
    done: set[tuple[int, int, int]] = set()
    if overwrite == "always" or not os.path.isdir(out_dir):
        return done
    for pz in os.listdir(out_dir):
        d1 = os.path.join(out_dir, pz)
        if not (pz.isdigit() and os.path.isdir(d1)):
            continue
        for px in os.listdir(d1):
            d2 = os.path.join(d1, px)
            if not os.path.isdir(d2):
                continue
            for py in os.listdir(d2):
                mpath = os.path.join(d2, py, "manifest.json")
                if not os.path.exists(mpath):
                    continue  # no manifest -> partial write -> redo
                if overwrite == "older":
                    try:
                        with open(mpath) as f:
                            m = json.load(f)
                    except (OSError, json.JSONDecodeError):
                        continue
                    if m.get("input_fingerprint") != fingerprint:
                        continue  # input changed -> redo
                done.add((int(pz), int(px), int(py)))
    return done


class PartitionWriter:
    """``map_groups`` callable: one partition's rows -> atomic parquet +
    manifest, returning the partition's metrics row."""

    def __init__(self, out_dir: str, fingerprint: str,
                 data_cols: list[str] | None = None,
                 rows_per_file: int | None = None):
        self.out_dir = out_dir
        self.fingerprint = fingerprint
        self.data_cols = data_cols
        #: start a new file whenever the threshold is reached — the
        #: ObjMultiFileOutput split rule (ObjMultiFileOutput.java:92-130:
        #: primitiveThresholdPerFile); None = single file per partition
        self.rows_per_file = rows_per_file

    def __call__(self, group) -> pa.Table:
        if isinstance(group, pa.Table):
            group = group.to_pandas()
        t0 = time.perf_counter()
        pz = int(group["pz"].iloc[0])
        px = int(group["px"].iloc[0])
        py = int(group["py"].iloc[0])
        pdir = partition_path(self.out_dir, pz, px, py)
        os.makedirs(pdir, exist_ok=True)
        data = group[self.data_cols] if self.data_cols else group
        # deterministic row order inside the artifact
        data = data.sort_values(list(data.columns), kind="mergesort")
        tbl = pa.Table.from_pandas(data, preserve_index=False)
        step = self.rows_per_file or len(tbl) or 1
        n_files = 0
        for start in range(0, max(len(tbl), 1), step):
            tmp = os.path.join(pdir, f".tmp-{uuid.uuid4().hex}")
            pq.write_table(tbl.slice(start, step), tmp)
            os.replace(tmp, os.path.join(pdir, f"part-{n_files}.parquet"))
            n_files += 1
        # drop stale higher-numbered parts from a previous run with a
        # different threshold (manifest write below re-seals the dir)
        for f in os.listdir(pdir):
            if f.startswith("part-") and f.endswith(".parquet"):
                if int(f[5:-8]) >= n_files:
                    os.remove(os.path.join(pdir, f))
            elif f.startswith(".tmp-"):
                # orphan from a killed previous run (ours from this run were
                # already renamed away by os.replace)
                os.remove(os.path.join(pdir, f))
        n_urls = int(group["url"].nunique()) if "url" in group else 0
        manifest = {
            "partition": [pz, px, py],
            "rows": int(len(data)),
            "n_files": n_files,
            "n_urls": n_urls,
            "input_fingerprint": self.fingerprint,
            "wall_ms": round((time.perf_counter() - t0) * 1000, 2),
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        mtmp = os.path.join(pdir, f".tmp-{uuid.uuid4().hex}")
        with open(mtmp, "w") as f:
            json.dump(manifest, f)
        os.replace(mtmp, os.path.join(pdir, "manifest.json"))
        return pa.table(
            {
                "pz": pa.array([pz], type=pa.int64()),
                "px": pa.array([px], type=pa.int64()),
                "py": pa.array([py], type=pa.int64()),
                "rows": pa.array([len(data)], type=pa.int64()),
                "n_urls": pa.array([n_urls], type=pa.int64()),
            }
        )


def checkpointed_tile_export(sf_dir: str, out_dir: str, *, zoom: int = 13,
                             parent_zoom: int = 6,
                             overwrite: str = "never",
                             only_partitions=None):
    """mentions -> z``zoom`` tile rows, written as resumable
    ``{pz}/{px}/{py}`` parquet partitions with manifests; returns the
    lazy metrics Dataset (one row per partition written this run).

    ``only_partitions``: optional list of (pz, px, py) — restrict the
    run to those partitions (the per-work-item form used by the
    params-dir queue runner)."""
    from ..pipelines import datasets
    from ..stages import tile_assign

    fp = input_fingerprint(sf_dir)
    done = scan_done_partitions(out_dir, fingerprint=fp, overwrite=overwrite)

    ds = datasets.mentions_ds(sf_dir)
    ds = ds.map_batches(
        lambda b: tile_assign.assign_tiles(b, zoom=zoom), batch_format="pyarrow"
    ).select_columns(["url", "mention_idx", "tx", "ty"])

    shift = zoom - parent_zoom
    done_packed = np.array(
        sorted((x << 32) | y for (_z, x, y) in done), dtype=np.int64
    )
    only_packed = (
        None
        if only_partitions is None
        else np.array(
            sorted((x << 32) | y for (_z, x, y) in only_partitions),
            dtype=np.int64,
        )
    )

    def add_parent(b: pa.Table) -> pa.Table:
        tx = b["tx"].to_numpy()
        ty = b["ty"].to_numpy()
        px = tx >> shift
        py = ty >> shift
        out = (
            b.append_column("pz", pa.array(np.full(len(b), parent_zoom, dtype=np.int64)))
            .append_column("px", pa.array(px))
            .append_column("py", pa.array(py))
        )
        packed = (px << 32) | py
        keep = np.ones(len(b), dtype=bool)
        if only_packed is not None:
            keep &= np.isin(packed, only_packed)
        if len(done_packed):
            keep &= ~np.isin(packed, done_packed)
        return out if keep.all() else out.filter(pa.array(keep))

    ds = ds.map_batches(add_parent, batch_format="pyarrow")
    writer = PartitionWriter(
        out_dir, fp, data_cols=["url", "mention_idx", "tx", "ty"]
    )
    # map_groups wants a plain function (it reads fn.__name__)
    return ds.groupby(["pz", "px", "py"]).map_groups(
        lambda g: writer(g), batch_format="pyarrow"
    )


def read_export(out_dir: str):
    """Read a checkpointed export back as one lazy Dataset (only
    partitions with a manifest, i.e. complete ones)."""
    import ray.data as rd

    paths = []
    for root, _dirs, files in os.walk(out_dir):
        if "manifest.json" in files and "part-0.parquet" in files:
            paths.extend(
                os.path.join(root, f)
                for f in files
                if f.startswith("part-") and f.endswith(".parquet")
            )
    return rd.read_parquet(sorted(paths))
