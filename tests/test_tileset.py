"""Tile-farm capstone: artifacts, root manifest, resume semantics."""

import json
import os
import shutil

import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def _mtimes(out_dir):
    out = {}
    for root, _dirs, files in os.walk(out_dir):
        if "manifest.json" in files:
            p = os.path.join(root, "manifest.json")
            out[os.path.relpath(p, out_dir)] = os.stat(p).st_mtime_ns
    return out


def test_tileset_export_resume(ray_session, tmp_path):
    from osm2world_ray.state.tileset import tileset_export

    out = str(tmp_path / "farm")
    t1 = tileset_export(SF, out)
    assert len(t1) > 1
    # root manifest covers every partition
    with open(os.path.join(out, "tileset.json")) as f:
        root = json.load(f)
    assert len(root["root"]["children"]) == len(t1)
    # artifact sanity: clip stays inside the tile rect (4096 units)
    child = root["root"]["children"][0]
    tile = pq.read_table(os.path.join(out, child["uri"]))
    cx0 = tile["cx0"].to_numpy(); cx1 = tile["cx1"].to_numpy()
    tx = tile["tx"].to_numpy()
    assert (cx0 >= tx * 4096).all() and (cx1 <= (tx + 1) * 4096).all()
    assert (cx0 <= cx1).all()
    assert child["metrics"]["n_tris"] == 2 * child["metrics"]["n_rows"]

    # kill one partition, resume: ONLY it recomputes
    victim = t1.to_pylist()[0]
    vdir = os.path.join(out, str(victim["pz"]), str(victim["px"]),
                        str(victim["py"]))
    before = _mtimes(out)
    shutil.rmtree(vdir)
    t2 = tileset_export(SF, out)
    after = _mtimes(out)
    vkey = os.path.relpath(os.path.join(vdir, "manifest.json"), out)
    assert vkey in after
    for k, m in before.items():
        if k != vkey:
            assert after[k] == m, f"untouched partition {k} was rewritten"
    # resumed run returns the identical full metrics table
    assert t2.sort_by("px").equals(t1.sort_by("px")) or (
        sorted(t2.to_pylist(), key=lambda r: (r["px"], r["py"]))
        == sorted(t1.to_pylist(), key=lambda r: (r["px"], r["py"]))
    )


def test_tileset_partial_write_recomputed(ray_session, tmp_path):
    """A partition with data but no manifest (killed mid-write) is
    recomputed; stale tmp files don't block."""
    from osm2world_ray.state.tileset import tileset_export

    out = str(tmp_path / "farm")
    t1 = tileset_export(SF, out)
    victim = t1.to_pylist()[0]
    vdir = os.path.join(out, str(victim["pz"]), str(victim["px"]),
                        str(victim["py"]))
    os.remove(os.path.join(vdir, "manifest.json"))
    with open(os.path.join(vdir, ".tmp-dead"), "w") as f:
        f.write("partial")
    t2 = tileset_export(SF, out)
    assert os.path.exists(os.path.join(vdir, "manifest.json"))
    assert len(t2) == len(t1)
