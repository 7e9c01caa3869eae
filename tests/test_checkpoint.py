"""Checkpoint/resume semantics: atomic partitions, manifest lineage,
skip-existing resume, partial-write recovery (TilesetCommand
OverwriteMode analogue)."""

import json
import os
import shutil

import pandas as pd

from osm2world_ray.state import checkpoint as ck

SF = "/root/testdata/sf0.001"


COLS = ["pz", "px", "py", "rows", "n_urls"]


def _run(out_dir, overwrite="never"):
    ds = ck.checkpointed_tile_export(SF, out_dir, zoom=13, parent_zoom=6,
                                     overwrite=overwrite)
    df = ds.to_pandas()
    if df.empty:
        return pd.DataFrame({c: pd.Series(dtype="int64") for c in COLS})
    return df.sort_values(["pz", "px", "py"]).reset_index(drop=True)


def _manifests(out_dir):
    out = {}
    for root, _d, files in os.walk(out_dir):
        if "manifest.json" in files:
            with open(os.path.join(root, "manifest.json")) as f:
                m = json.load(f)
            out[tuple(m["partition"])] = m
    return out


def test_export_writes_partitions_and_manifests(ray_session, tmp_path):
    out = str(tmp_path / "exp")
    metrics = _run(out)
    assert len(metrics) > 1
    mans = _manifests(out)
    assert set(mans) == set(
        zip(metrics["pz"], metrics["px"], metrics["py"])
    )
    fp = ck.input_fingerprint(SF)
    for key, m in mans.items():
        assert m["input_fingerprint"] == fp
        assert m["rows"] > 0 and m["wall_ms"] >= 0
        part = os.path.join(out, *map(str, key), "part-0.parquet")
        assert os.path.exists(part)
    # read-back equals the sum of manifest rows
    total = ck.read_export(out).count()
    assert total == sum(m["rows"] for m in mans.values())


def test_resume_skips_done_and_recomputes_missing(ray_session, tmp_path):
    out = str(tmp_path / "exp")
    first = _run(out)
    mans_before = _manifests(out)

    # second run: everything done -> zero partitions rewritten
    second = _run(out)
    assert len(second) == 0
    assert _manifests(out).keys() == mans_before.keys()

    # delete one partition's manifest (simulates a killed run: data may
    # exist but no success marker) -> only that partition recomputed
    victim = sorted(mans_before)[0]
    os.remove(os.path.join(out, *map(str, victim), "manifest.json"))
    third = _run(out)
    assert len(third) == 1
    assert (int(third["pz"][0]), int(third["px"][0]), int(third["py"][0])) == victim
    # recomputed partition matches its original metrics
    row0 = first[(first.px == victim[1]) & (first.py == victim[2])].iloc[0]
    assert int(third["rows"][0]) == int(row0["rows"])

    # overwrite="always" recomputes everything
    fourth = _run(out, overwrite="always")
    pd.testing.assert_frame_equal(fourth, first)


def test_older_mode_redoes_on_fingerprint_change(ray_session, tmp_path):
    out = str(tmp_path / "exp")
    _run(out)
    victim = sorted(_manifests(out))[0]
    mpath = os.path.join(out, *map(str, victim), "manifest.json")
    with open(mpath) as f:
        m = json.load(f)
    m["input_fingerprint"] = "stale"
    with open(mpath, "w") as f:
        json.dump(m, f)
    redo = _run(out, overwrite="older")
    assert len(redo) == 1
    # never-mode trusts the manifest regardless of fingerprint
    again = _run(out, overwrite="never")
    assert len(again) == 0


def test_partial_tmp_files_are_ignored(ray_session, tmp_path):
    out = str(tmp_path / "exp")
    _run(out)
    victim = sorted(_manifests(out))[0]
    pdir = os.path.join(out, *map(str, victim))
    shutil.copy(
        os.path.join(pdir, "part-0.parquet"), os.path.join(pdir, ".tmp-dead")
    )
    total_before = ck.read_export(out).count()
    os.remove(os.path.join(pdir, "manifest.json"))
    # incomplete partition excluded from read-back
    total_after = ck.read_export(out).count()
    assert total_after < total_before


def test_multi_file_split_threshold(tmp_path):
    """ObjMultiFileOutput split rule: a new file per rows_per_file rows
    (ObjMultiFileOutput.java:92-130); read_export reads every part."""
    import pandas as pd
    import numpy as np
    from osm2world_ray.state.checkpoint import PartitionWriter

    w = PartitionWriter(str(tmp_path), "fp", rows_per_file=10)
    g = pd.DataFrame(
        {
            "pz": np.full(25, 6, dtype=np.int64),
            "px": np.full(25, 1, dtype=np.int64),
            "py": np.full(25, 2, dtype=np.int64),
            "url": [f"u{i}" for i in range(25)],
        }
    )
    w(g)
    pdir = tmp_path / "6" / "1" / "2"
    parts = sorted(p.name for p in pdir.glob("part-*.parquet"))
    assert parts == ["part-0.parquet", "part-1.parquet", "part-2.parquet"]
    import pyarrow.parquet as pq
    import json

    sizes = [pq.read_metadata(pdir / p).num_rows for p in parts]
    assert sizes == [10, 10, 5]
    assert json.load(open(pdir / "manifest.json"))["n_files"] == 3
    # rewriting with a bigger threshold drops stale part files
    w2 = PartitionWriter(str(tmp_path), "fp", rows_per_file=30)
    w2(g)
    parts = sorted(p.name for p in pdir.glob("part-*.parquet"))
    assert parts == ["part-0.parquet"]
