#!/usr/bin/env python
"""Benchmark harness: headline pipelines over $GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "docs": N, "docs_per_sec": N}

Modes:
  python bench.py                 # full suite at $RAY_GRAFT_CPUS (default 32)
  python bench.py --scaling       # flagship at 8 and 32 cpus in fresh
                                  # processes; reports scaling efficiency
  python bench.py --stress        # 20M-doc sustained-throughput run
  python bench.py --single flagship --cpus 8   # internal (scaling child)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")
NUM_CPUS = int(os.environ.get("RAY_GRAFT_CPUS", "32"))

#: representative per-stage pipelines timed in the full suite
BENCH_QUERIES = [
    "extract_text",          # actor-pool HTML extraction
    "tile_rollup_z13",       # tile-keyed groupby-aggregate rollup
    "pip_join_contain",      # broadcast STRtree point-in-polygon join
    "knn_nearest",           # k-ring kNN landmark join
    "overlap_pairs",         # bucketed pairwise footprint self-join
    "segment_intersections", # segment x segment intersection self-join
    "clip_to_cell",          # straddle fan-out + exact clip
    "interp_linear",         # Delaunay build-once/probe-many actor pool
    "overlap_aa",            # typed area x area pairwise join (salted, mixed outlines)
    "assemble_rings",        # relation co-group ring stitching
    # round-3 additions (outside core8; grand total not comparable to r1/r2)
    "network_junctions",     # per-node cut geometry, vectorized buckets
    "mesh_merge",            # MergeMeshes partial-agg combiner
    "dedup_minhash_lsh",     # banded near-dup with shuffle-joined verify
    # round-4 additions
    "road_lanes",            # RoadModule lane/width derivation
    "tileset_export",        # tile-farm capstone: fan-out+LOD+clip+atomic sink
    # round-5 additions
    "roof_shapes",           # per-shape roof geometry (ridge/height fields)
    "corpus_filter",         # fused Arrow curation chain (pool removed in r5)
]


def _consume(res) -> int:
    """Execute a query result without pulling rows to the driver."""
    import ray.data

    if isinstance(res, ray.data.Dataset):
        return res.count()
    return len(res)


def _doc_count(sf_dir: str) -> int:
    import pyarrow.parquet as pq

    return pq.read_metadata(os.path.join(sf_dir, "documents.parquet")).num_rows


def run_suite(sf_dir: str, num_cpus: int) -> dict:
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    from osm2world_ray.pipelines.flagship import flagship_pipeline
    from osm2world_ray.pipelines.queries import all_queries

    qs = all_queries()
    timings: dict[str, float] = {}

    # warm the worker pool + imports so the first timed pipeline does
    # not absorb cluster spin-up
    flagship_pipeline("/root/testdata/sf0.001").count()

    t0 = time.perf_counter()
    _consume(flagship_pipeline(sf_dir))
    timings["flagship"] = round(time.perf_counter() - t0, 3)

    for name in BENCH_QUERIES:
        t0 = time.perf_counter()
        _consume(qs[name](sf_dir))
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    # round-1-comparable subtotal: the original 8-pipeline suite
    # (BENCH_r01 measured exactly these; round 2 added 3 more queries
    # including the heaviest new operator, so the grand total is not
    # comparable across rounds but core8_sec is)
    core8 = [
        "flagship", "extract_text", "tile_rollup_z13", "pip_join_contain",
        "knn_nearest", "overlap_pairs", "segment_intersections", "clip_to_cell",
    ]
    core8_sec = round(sum(timings[q] for q in core8 if q in timings), 3)
    docs = _doc_count(sf_dir)
    n_queries = len(timings)
    out = {
        "metric": "spatial-join + tile-assignment pipeline suite wall-time",
        "value": total,
        "unit": "sec",
        "core8_sec": core8_sec,
        "queries": timings,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "docs": docs,
        # round-1-comparable headline: BENCH_r01 measured exactly the
        # core8 queries, so docs * 8 / core8_sec reproduces its
        # definition; the grown-suite per-pass rate is reported separately
        "docs_per_sec": round(docs * 8 / core8_sec, 1),
        "docs_per_sec_suite": round(docs * n_queries / total, 1),
    }
    ray.shutdown()
    return out


def run_single(sf_dir: str, num_cpus: int) -> dict:
    """One flagship run in this process (scaling child)."""
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    from osm2world_ray.pipelines.flagship import flagship_pipeline

    # warm-up pass so actor/worker startup is excluded from the measured run
    _consume(flagship_pipeline(sf_dir, repeat=1))
    reps = int(os.environ.get("GRAFT_BENCH_REPS", "512"))
    t0 = time.perf_counter()
    _consume(flagship_pipeline(sf_dir, repeat=reps))
    dt = time.perf_counter() - t0
    docs = _doc_count(sf_dir) * reps
    ray.shutdown()
    return {"seconds": round(dt, 3), "docs": docs,
            "docs_per_sec": round(docs / dt, 1), "num_cpus": num_cpus}


_SHUFFLE_DIR = "/tmp/o2w_shuffle_assigned"


def _prepare_shuffle_input(sf_dir: str, reps: int) -> str:
    """Materialize the tile-ASSIGNED mention rows (tx, ty, url) ONCE to
    Parquet so --scaling-shuffle times the shuffle PATH (read -> partial
    aggregate -> bounded-bucket exchange -> rollup) and not the HTML
    extraction upstream of it. Extraction has its own scaling evidence
    (--scaling, --stress); measured 2026-08-18: extraction ALONE scales
    at ~0.36 on this host (10 s at p8 vs 7 s at p32 for 2.56M docs —
    8 active cores get the socket's full memory bandwidth, 32 share
    it), so any composite that includes it measures the host's
    bandwidth asymmetry, not the exchange. Same precedent as
    _prepare_exchange_input below."""
    import shutil

    import ray

    out = f"{_SHUFFLE_DIR}_{reps}"
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
    from osm2world_ray.pipelines import datasets
    from osm2world_ray.stages import tile_assign

    ds = datasets.mentions_ds(sf_dir, repeat=reps)
    ds = ds.map_batches(
        lambda b: tile_assign.assign_tiles(b, zoom=13), batch_format="pyarrow"
    ).select_columns(["tx", "ty", "url"])
    ds.write_parquet(out)
    with open(os.path.join(out, "_DONE"), "w") as f:
        f.write("ok")
    ray.shutdown()
    return out


def run_single_shuffle(path: str, num_cpus: int) -> dict:
    """One run of the SORT-SHUFFLE rollup path (scaling child):
    pre-materialized assigned rows -> per-batch partial aggregation ->
    bounded-bucket discrete-key exchange -> per-tile rollup. (Looping a
    whole small QUERY per rep is NOT a valid steady-state: every rep
    re-spawns its actor pools, and pool size scales with the cpu
    budget, so the fixed cost grows with parallelism and masks the
    pipeline — measured eff ~0.2 from spin-up alone.)"""
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    import pyarrow.parquet as pq
    import ray.data as rd

    from osm2world_ray.stages.rollup import tile_rollup

    def job():
        return tile_rollup(rd.read_parquet(path)).count()

    job()  # warm-up
    t0 = time.perf_counter()
    job()
    dt = time.perf_counter() - t0
    rows = sum(
        pq.read_metadata(os.path.join(path, f)).num_rows
        for f in os.listdir(path) if f.endswith(".parquet")
    )
    ray.shutdown()
    return {"seconds": round(dt, 3), "rows": rows,
            "rows_per_sec": round(rows / dt, 1), "num_cpus": num_cpus}


def _child_json(mode: str, cpus: int) -> dict:
    """Run a bench child process and parse its single JSON line,
    surfacing stderr when the child fails instead of a bare
    IndexError from an empty stdout."""
    proc = subprocess.run(
        [sys.executable, __file__, mode, "--cpus", str(cpus)],
        capture_output=True, text=True,
        cwd=os.path.dirname(os.path.abspath(__file__)),
    )
    lines = proc.stdout.strip().splitlines()
    if proc.returncode != 0 or not lines:
        raise RuntimeError(
            f"bench child {mode} --cpus {cpus} failed "
            f"(rc={proc.returncode}):\n{proc.stderr[-4000:]}"
        )
    return json.loads(lines[-1])


def run_scaling_shuffle(sf_dir: str) -> dict:
    """--scaling on the sort-shuffle rollup path (pre-materialized
    assigned rows; see _prepare_shuffle_input)."""
    reps = int(os.environ.get("GRAFT_SHUFFLE_REPS", "8192"))
    path = _prepare_shuffle_input(sf_dir, reps)
    results = {}
    for cpus in (8, 32):
        proc = subprocess.run(
            [sys.executable, __file__, "--single-shuffle", "--cpus",
             str(cpus), "--path", path],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        lines = proc.stdout.strip().splitlines()
        if proc.returncode != 0 or not lines:
            raise RuntimeError(
                f"shuffle child --cpus {cpus} failed "
                f"(rc={proc.returncode}):\n{proc.stderr[-4000:]}"
            )
        results[cpus] = json.loads(lines[-1])
    tp8 = results[8]["rows_per_sec"]
    tp32 = results[32]["rows_per_sec"]
    eff = (tp32 / tp8) / (32 / 8)
    return {
        "metric": "shuffle-rollup scaling efficiency (8 -> 32 cpus, fresh processes)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "queries": {
            "shuffle_p8_sec": results[8]["seconds"],
            "shuffle_p32_sec": results[32]["seconds"],
        },
        "sf": sf_dir,
        "num_cpus": 32,
        "rows": results[32]["rows"],
        "rows_per_sec_p8": tp8,
        "rows_per_sec_p32": tp32,
        "scaling_efficiency": round(eff, 3),
    }


_EXCHANGE_DIR = "/tmp/o2w_exchange_partials"


def _prepare_exchange_input(sf_dir: str, reps: int) -> str:
    """Materialize the shuffle-rollup's partial rows ONCE to Parquet so
    the exchange can be timed in isolation from HTML extraction (which
    otherwise dominates both walls and injects the host's per-core
    bandwidth asymmetry into the ratio)."""
    import shutil

    import ray

    out = f"{_EXCHANGE_DIR}_{reps}"
    if os.path.exists(os.path.join(out, "_DONE")):
        return out
    shutil.rmtree(out, ignore_errors=True)
    ray.init(address="local", num_cpus=NUM_CPUS, include_dashboard=False)
    from osm2world_ray.pipelines import datasets
    from osm2world_ray.stages import tile_assign
    from osm2world_ray.stages.rollup import (
        exchange_bucket_count,
        partial_tile_url_counts,
    )

    ds = datasets.mentions_ds(sf_dir, repeat=reps)
    ds = ds.map_batches(
        lambda b: tile_assign.assign_tiles(b, zoom=13), batch_format="pyarrow"
    ).select_columns(["tx", "ty", "url"])
    ds = ds.map_batches(
        partial_tile_url_counts,
        batch_format="pyarrow",
        fn_kwargs={"n_buckets": exchange_bucket_count()},
    )
    ds.write_parquet(out)
    with open(os.path.join(out, "_DONE"), "w") as f:
        f.write("ok")
    ray.shutdown()
    return out


def run_single_exchange(path: str, num_cpus: int) -> dict:
    """Time ONLY the unbounded-key exchange: read the pre-materialized
    partial rows -> bounded-bucket sort shuffle -> within-bucket
    rollup (scaling child)."""
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    import pyarrow.parquet as pq
    import ray.data as rd

    from osm2world_ray.stages.rollup import rollup_exchange

    def job():
        return rollup_exchange(rd.read_parquet(path)).count()

    job()  # warm-up
    t0 = time.perf_counter()
    job()
    dt = time.perf_counter() - t0
    rows = sum(
        pq.read_metadata(os.path.join(path, f)).num_rows
        for f in os.listdir(path) if f.endswith(".parquet")
    )
    ray.shutdown()
    return {"seconds": round(dt, 3), "rows": rows,
            "rows_per_sec": round(rows / dt, 1), "num_cpus": num_cpus}


def run_scaling_exchange(sf_dir: str) -> dict:
    """The exchange-isolated scaling measurement: same partial-row
    input (pre-materialized once), sort-shuffle + rollup at 8 and 32
    cpus in fresh processes."""
    # default sized so per-core work dominates fixed session/scheduling
    # overheads at p32 (~80M partial rows): at 2048 reps (~20M rows) the
    # p32 leg finishes in ~2s and the measurement is constant-bound —
    # it measures Ray's session floor, not the exchange algorithm
    reps = int(os.environ.get("GRAFT_EXCHANGE_REPS", "8192"))
    path = _prepare_exchange_input(sf_dir, reps)
    results = {}
    for cpus in (8, 32):
        proc = subprocess.run(
            [sys.executable, __file__, "--single-exchange", "--cpus",
             str(cpus), "--path", path],
            capture_output=True, text=True,
            cwd=os.path.dirname(os.path.abspath(__file__)),
        )
        lines = proc.stdout.strip().splitlines()
        if proc.returncode != 0 or not lines:
            raise RuntimeError(
                f"exchange child --cpus {cpus} failed "
                f"(rc={proc.returncode}):\n{proc.stderr[-4000:]}"
            )
        results[cpus] = json.loads(lines[-1])
    tp8 = results[8]["rows_per_sec"]
    tp32 = results[32]["rows_per_sec"]
    eff = (tp32 / tp8) / (32 / 8)
    return {
        "metric": "exchange-only scaling efficiency (8 -> 32 cpus, fresh processes)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "queries": {
            "exchange_p8_sec": results[8]["seconds"],
            "exchange_p32_sec": results[32]["seconds"],
        },
        "sf": sf_dir,
        "num_cpus": 32,
        "rows": results[32]["rows"],
        "rows_per_sec_p8": tp8,
        "rows_per_sec_p32": tp32,
        "scaling_efficiency": round(eff, 3),
    }


def run_scaling(sf_dir: str) -> dict:
    """Same flagship job at two parallelism levels in FRESH processes
    (the sandbox stand-in for N vs 4N nodes; see BASELINE.md)."""
    results = {}
    for cpus in (8, 32):
        results[cpus] = _child_json("--single", cpus)
    tp8 = results[8]["docs_per_sec"]
    tp32 = results[32]["docs_per_sec"]
    eff = (tp32 / tp8) / (32 / 8)
    return {
        "metric": "flagship scaling efficiency (8 -> 32 cpus, fresh processes)",
        "value": round(eff, 3),
        "unit": "efficiency",
        "queries": {
            "flagship_p8_sec": results[8]["seconds"],
            "flagship_p32_sec": results[32]["seconds"],
        },
        "sf": sf_dir,
        "num_cpus": 32,
        "docs_per_sec_p8": tp8,
        "docs_per_sec_p32": tp32,
        "scaling_efficiency": round(eff, 3),
    }


def run_replicated(sf_dir: str, num_cpus: int) -> dict:
    """Replicated-scale audit of the heavy pairwise joins: sf0.1 x
    GRAFT_REPLICA_REPS (default 16) replicas with distinct doc_ids —
    ~16x the density the per-round bench sees — to exercise salting
    depth, bucket sizing and (for minhash) hot exact-dup LSH buckets.
    Reports rows/s and the object-store spill count for BASELINE.md §4.
    Row-count invariants vs the 1x run: overlap_aa/segments scale
    ~linearly (replica coordinates are distinct — doc_id + r*1e7 shifts
    every synth formula); minhash pairs grow ~quadratically in repeat
    because replica texts are IDENTICAL (every replica group is an
    exact-dup cluster — the worst-case near-dup density by design)."""
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    from osm2world_ray.pipelines.queries import all_queries

    qs = all_queries()
    reps = int(os.environ.get("GRAFT_REPLICA_REPS", "16"))
    jobs = ["overlap_aa", "segment_intersections", "dedup_minhash_lsh"]
    timings: dict[str, float] = {}
    rows: dict[str, int] = {}
    for name in jobs:
        t0 = time.perf_counter()
        rows[name] = _consume(qs[name](sf_dir, repeat=reps))
        timings[name] = round(time.perf_counter() - t0, 3)

    # ray._private.internal_api.memory_summary needs the grpc module,
    # absent in this container — the raylet logs every spill batch to
    # raylet.err, so grep the live session's log instead
    spilled = False
    try:
        log = os.path.join(
            ray._private.worker._global_node.get_session_dir_path(),
            "logs", "raylet.err",
        )
        with open(log) as f:
            spilled = "Spilled" in f.read()
    except Exception:
        pass
    docs = _doc_count(sf_dir) * reps
    total = round(sum(timings.values()), 3)
    out = {
        "metric": "replicated-scale heavy-join audit wall-time",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "rows": rows,
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "replicas": reps,
        "docs": docs,
        "docs_per_sec": round(docs * len(jobs) / total, 1),
        "spilled": spilled,
    }
    ray.shutdown()
    return out


def run_stress(sf_dir: str, num_cpus: int) -> dict:
    """20M-doc flagship stress (sf0.1 x 4096 replicas): sustained
    throughput + spill check for BASELINE.md §4."""
    import ray

    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False)
    from osm2world_ray.pipelines.flagship import flagship_pipeline

    _consume(flagship_pipeline(sf_dir, repeat=1))
    reps = int(os.environ.get("GRAFT_STRESS_REPS", "4096"))
    t0 = time.perf_counter()
    _consume(flagship_pipeline(sf_dir, repeat=reps))
    dt = time.perf_counter() - t0
    docs = _doc_count(sf_dir) * reps
    ray.shutdown()
    return {
        "metric": "flagship stress throughput",
        "value": round(docs / dt, 1),
        "unit": "docs_per_sec",
        "queries": {"stress_sec": round(dt, 3)},
        "sf": sf_dir,
        "num_cpus": num_cpus,
        "docs": docs,
        "docs_per_sec": round(docs / dt, 1),
    }


def main() -> None:
    args = sys.argv[1:]
    if "--stress" in args:
        print(json.dumps(run_stress(SF_DIR, NUM_CPUS)))
        return
    if "--replicated" in args:
        print(json.dumps(run_replicated(SF_DIR, NUM_CPUS)))
        return
    if "--single-exchange" in args:
        cpus = int(args[args.index("--cpus") + 1]) if "--cpus" in args else NUM_CPUS
        path = args[args.index("--path") + 1]
        print(json.dumps(run_single_exchange(path, cpus)))
    elif "--scaling-exchange" in args:
        print(json.dumps(run_scaling_exchange(SF_DIR)))
    elif "--single-shuffle" in args:
        cpus = int(args[args.index("--cpus") + 1]) if "--cpus" in args else NUM_CPUS
        path = args[args.index("--path") + 1]
        print(json.dumps(run_single_shuffle(path, cpus)))
    elif "--single" in args:
        cpus = int(args[args.index("--cpus") + 1]) if "--cpus" in args else NUM_CPUS
        print(json.dumps(run_single(SF_DIR, cpus)))
    elif "--scaling-shuffle" in args:
        print(json.dumps(run_scaling_shuffle(SF_DIR)))
    elif "--scaling" in args:
        print(json.dumps(run_scaling(SF_DIR)))
    else:
        print(json.dumps(run_suite(SF_DIR, NUM_CPUS)))


if __name__ == "__main__":
    main()
