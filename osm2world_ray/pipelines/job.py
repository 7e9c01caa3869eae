"""``ray job submit`` entrypoint: the tile-farm batch job.

Usage (cluster):

    ray job submit --working-dir . -- \\
        python -m osm2world_ray.pipelines.job \\
        --input /data/sf0.1 --output /out/tiles \\
        --zoom 13 --parent-zoom 6 --overwrite never

Runs the resumable partitioned tile export (state/checkpoint.py) under
streaming execution and writes a run-level metrics JSON next to the
output (the ``osm2world_log_*.json`` analogue,
``O2WConverterImpl.java:421-494``). Rerunning after a failure skips
partitions whose manifests exist — the TilesetCommand OverwriteMode
resume loop.

Owns its Ray session (CLI entrypoint), unlike the library code.
"""

from __future__ import annotations

import argparse
import json
import os
import time


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--zoom", type=int, default=13)
    ap.add_argument("--parent-zoom", type=int, default=6)
    ap.add_argument("--overwrite", choices=("never", "older", "always"),
                    default="never")
    args = ap.parse_args()

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False)

    from ..state.checkpoint import checkpointed_tile_export, input_fingerprint

    t0 = time.perf_counter()
    metrics_ds = checkpointed_tile_export(
        args.input, args.output, zoom=args.zoom,
        parent_zoom=args.parent_zoom, overwrite=args.overwrite,
    )
    parts = metrics_ds.to_pandas()
    wall = time.perf_counter() - t0

    run_log = {
        "input": args.input,
        "output": args.output,
        "input_fingerprint": input_fingerprint(args.input),
        "partitions_written": int(len(parts)),
        "rows_written": int(parts["rows"].sum()) if len(parts) else 0,
        "totalTime_s": round(wall, 3),
        "finished_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
    }
    os.makedirs(args.output, exist_ok=True)
    log_path = os.path.join(
        args.output, f"run_log_{time.strftime('%Y%m%dT%H%M%SZ', time.gmtime())}.json"
    )
    with open(log_path, "w") as f:
        json.dump(run_log, f, indent=2)
    print(json.dumps(run_log))
    ray.shutdown()


if __name__ == "__main__":
    main()
