"""Params-directory work-queue semantics (ParamsCommand.java:95-175
analogue): sorted order, claim-by-rename, delete vs keep modes,
partition-restricted processing."""

import json
import os

from osm2world_ray.pipelines import queue_runner as qr
from osm2world_ray.state import checkpoint as ck

SF = "/root/testdata/sf0.001"


def _partitions():
    """Three real partitions of the sf0.001 export."""
    import ray

    ds = ck.checkpointed_tile_export(SF, "/tmp/_probe_parts_unused",
                                     overwrite="always")
    df = ds.to_pandas()
    parts = sorted(zip(df["pz"], df["px"], df["py"]))[:3]
    return [(int(a), int(b), int(c)) for a, b, c in parts]


def _write_params(watch, out, parts):
    for i, p in enumerate(parts):
        with open(os.path.join(watch, f"work_{i:03d}.json"), "w") as f:
            json.dump({"sf_dir": SF, "out_dir": out, "partition": list(p)}, f)


def test_queue_processes_in_order_and_deletes(ray_session, tmp_path):
    watch = str(tmp_path / "queue")
    out = str(tmp_path / "out")
    os.makedirs(watch)
    parts = _partitions()
    _write_params(watch, out, parts)

    handled = qr.run_queue(watch, idle_polls=1, poll_interval=0.01)
    assert [h["param_file"] for h in handled] == [
        "work_000.json", "work_001.json", "work_002.json"
    ]
    assert all(h["partitions_written"] == 1 for h in handled)
    assert os.listdir(watch) == []  # at-most-once: files deleted
    # each partition's manifest exists and only those partitions
    for p in parts:
        assert os.path.exists(
            os.path.join(out, *map(str, p), "manifest.json")
        )
    total = ck.read_export(out).count()
    assert total == sum(h["rows"] for h in handled)


def test_queue_keep_mode_and_resume(ray_session, tmp_path):
    watch = str(tmp_path / "queue")
    out = str(tmp_path / "out")
    os.makedirs(watch)
    parts = _partitions()[:1]
    _write_params(watch, out, parts)

    handled = qr.run_queue(watch, delete_processed=False,
                           idle_polls=1, poll_interval=0.01)
    assert len(handled) == 1
    assert os.listdir(watch) == ["work_000.json.done"]  # handled ledger

    # resubmitting the same work item: export resumes -> 0 written
    _write_params(watch, out, parts)
    handled2 = qr.run_queue(watch, idle_polls=1, poll_interval=0.01)
    assert len(handled2) == 1
    assert handled2[0]["partitions_written"] == 0


def test_claim_is_exclusive(tmp_path):
    p = tmp_path / "w.json"
    p.write_text("{}")
    first = qr.claim(str(p), "a")
    second = qr.claim(str(p), "b")
    assert first is not None and second is None


def test_bad_work_item_parked_and_rest_processed(ray_session, tmp_path):
    watch = str(tmp_path / "queue")
    out = str(tmp_path / "out")
    os.makedirs(watch)
    parts = _partitions()[:1]
    with open(os.path.join(watch, "work_000.json"), "w") as f:
        f.write("{not json")
    _write_params(watch, out, parts)  # writes work_000 again? no: same name
    # ensure the good file has a different name ordering after the bad one
    os.replace(
        os.path.join(watch, "work_000.json"),
        os.path.join(watch, "work_001.json"),
    )
    with open(os.path.join(watch, "work_000.json"), "w") as f:
        f.write("{not json")
    handled = qr.run_queue(watch, idle_polls=1, poll_interval=0.01)
    names = {h["param_file"]: h for h in handled}
    assert "error" in names["work_000.json"]
    assert names["work_001.json"]["partitions_written"] == 1
    # the bad item is parked visibly, not lost or retried forever
    assert "work_000.json.failed" in os.listdir(watch)
