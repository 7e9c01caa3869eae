"""Params-directory work-queue runner — the streaming surface.

The reference's only streaming mode (``ParamsCommand.handleParamFileDir``,
``desktop/.../commands/ParamsCommand.java:95-175``): poll a directory
for parameter files, claim each by ATOMIC MOVE to a temp name
(``:127-137``), process claimed files on a bounded worker pool with
sleep-wait backpressure (``:37-38,119-123``), pick up files that appear
while running, sorted filename order = priority (``:113-116``),
``--deleteProcessedFiles`` gives at-most-once while keep-mode tracks
``handledFiles`` (``:103,131-136``).

Ray-native shape: each work item is a partition-restricted resumable
export (state/checkpoint.py) — work items are independent tiles, as in
the reference; intra-item parallelism belongs to Ray Data, so the
driver loop itself is sequential with claim-by-rename giving safe
multi-runner operation (several runner processes can share one
directory). No watermarks/event time — work items are files.

Param file format: JSON ``{"sf_dir": ..., "out_dir": ...,
"partition": [pz, px, py]}``.
"""

from __future__ import annotations

import json
import os
import time


def claim(path: str, runner_id: str) -> str | None:
    """Claim a param file by atomic rename; None if someone else won."""
    claimed = f"{path}.claimed-{runner_id}"
    try:
        os.rename(path, claimed)
        return claimed
    except OSError:
        return None


def process_param_file(claimed_path: str) -> dict:
    from ..state.checkpoint import checkpointed_tile_export

    with open(claimed_path) as f:
        params = json.load(f)
    pz, px, py = params["partition"]
    metrics = checkpointed_tile_export(
        params["sf_dir"], params["out_dir"],
        zoom=params.get("zoom", 13),
        parent_zoom=params.get("parent_zoom", 6),
        overwrite=params.get("overwrite", "never"),
        only_partitions=[(pz, px, py)],
    ).to_pandas()
    return {
        "partition": [pz, px, py],
        "partitions_written": int(len(metrics)),
        "rows": int(metrics["rows"].sum()) if len(metrics) else 0,
    }


def run_queue(watch_dir: str, *, runner_id: str | None = None,
              delete_processed: bool = True,
              idle_polls: int = 3, poll_interval: float = 0.2) -> list[dict]:
    """Drain the queue: poll ``watch_dir`` for ``*.json`` param files in
    sorted order, claim + process each; stop after ``idle_polls``
    consecutive empty polls (the sandbox stand-in for run-forever).
    Keep-mode (``delete_processed=False``) renames processed files to
    ``*.done`` — the ``handledFiles`` ledger."""
    runner_id = runner_id or str(os.getpid())
    handled: list[dict] = []
    idle = 0
    while idle < idle_polls:
        pending = sorted(
            f for f in os.listdir(watch_dir) if f.endswith(".json")
        )
        if not pending:
            idle += 1
            time.sleep(poll_interval)
            continue
        idle = 0
        # claim only the FIRST pending file, then re-list: a
        # higher-priority file that appears mid-run must win the next
        # pick (ParamsCommand.java:113-116 re-sorts per item)
        claimed = None
        name = None
        for name in pending:
            claimed = claim(os.path.join(watch_dir, name), runner_id)
            if claimed is not None:
                break
        if claimed is None:
            continue  # lost every race; re-poll
        try:
            result = process_param_file(claimed)
        except Exception as ex:  # noqa: BLE001
            # one bad work item never kills the farm
            # (FaultTolerantIterationUtil discipline); park it visibly
            os.replace(claimed, os.path.join(watch_dir, name + ".failed"))
            handled.append(
                {"param_file": name, "error": f"{type(ex).__name__}: {ex}"}
            )
            continue
        result["param_file"] = name
        handled.append(result)
        if delete_processed:
            os.remove(claimed)
        else:
            os.replace(claimed, os.path.join(watch_dir, name + ".done"))
    return handled
