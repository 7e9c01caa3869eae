"""Per-tile rollup: the ``StatisticsOutput`` analogue, shuffle-minimized.

Reference semantics (``StatisticsOutput.java:22-217``): counts per
key x {global, material, class}. Here: per-tile mention and distinct
page counts.

A naive expression is two chained ``groupby().aggregate()`` calls
(tile+url, then tile) — two full sort shuffles, and the second one
carries one row per (tile, url). Instead:

1. **partial aggregate inside map_batches** (combiner): each batch is
   collapsed to (tx, ty, url, n) via pyarrow's C++ ``Table.group_by``
   — the shuffle then moves near-aggregated rows, not raw mentions;
2. **one bounded-bucket shuffle** keyed on a hash of the tile id
   (``groupby("bucket")``), so group count is fixed regardless of how
   many tiles exist;
3. **vectorized within-bucket rollup**: pandas hash groupby combines
   partials (correct even when one url's mentions were split across
   batches) and computes distinct-page counts.

This is the partial/combiner discipline every 100 TB aggregation here
follows: shuffle volume is O(distinct keys per batch), and the
groupby fan-in is O(buckets), never O(tiles).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .overlaps import bucket_groups, bucket_of, exchange_block_count
from ..geo import tiles

#: single-node floor; the live count is cluster-sized
#: (overlaps.n_shuffle_buckets: max(64, 4 x total CPUs))
N_ROLLUP_BUCKETS = 64


def exchange_bucket_count() -> int:
    """Bucket-space size for the rollup's sort exchange: ~32 buckets
    per cluster core (floor 1024).

    Finer than the pairwise joins' ``n_shuffle_buckets`` on purpose:
    Ray's sort partitions the DISCRETE bucket values into range blocks
    by sampling, so rows-per-reduce-block is quantized to whole
    buckets.  With only 4 buckets/core the measured reduce blocks
    ranged 0..5.5M rows (mean 1.3M) and one straggler group task held
    the whole stage; at ~32 buckets/core the quantization error is
    ~3% of a block.  The group kernel is vectorized Arrow, so more,
    smaller groups cost only the ~ms per-call dispatch."""
    count = 1024
    try:
        import ray

        if ray.is_initialized():
            count = max(count, 32 * int(ray.cluster_resources().get("CPU", 0)))
    except Exception:
        pass
    return count


def partial_tile_url_counts(batch: pa.Table, *, n_buckets: int) -> pa.Table:
    """(tx, ty, url, ...) batch -> partial (bucket, tile_key,
    page_key, n). ``n_buckets`` is the driver-resolved exchange bucket
    count (:func:`exchange_bucket_count`), passed via ``fn_kwargs`` so
    every map task hashes with the same value.

    Two byte-diet rules for the exchange (each byte through the sort
    costs ~3 passes on the materialize+sample+merge path): the url
    string is stripped to its int doc id (Arrow slice+cast; strings
    were the majority of the shuffled bytes — cut the p32 wall
    17.0 -> 14.5 s at sf0.1x512), and (tx, ty) are packed into the
    single int64 tile key (5 -> 4 columns) and unpacked after the
    shuffle."""
    import pyarrow.compute as pc

    from ..sources import synth

    page_key = pc.cast(
        pc.utf8_slice_codeunits(
            batch["url"].combine_chunks()
            if isinstance(batch["url"], pa.ChunkedArray) else batch["url"],
            len(synth.URL_PREFIX), 99,
        ),
        pa.int64(),
    )
    tile_key = tiles.pack_key(
        13,
        batch["tx"].to_numpy(zero_copy_only=False),
        batch["ty"].to_numpy(zero_copy_only=False),
    )
    t = pa.table({"tile_key": pa.array(tile_key), "page_key": page_key})
    part = t.group_by(["tile_key", "page_key"]).aggregate(
        [([], "count_all")]
    )
    part = part.rename_columns(["tile_key", "page_key", "n"])
    return part.append_column(
        "bucket",
        pa.array(bucket_of(part["tile_key"].to_numpy(), n_buckets)),
    )


def tile_rollup_group(group) -> pa.Table:
    """Bucket of partial rows -> (tx, ty, n_mentions, n_pages), Arrow
    in/out (pyarrow C++ group_by; no pandas object round-trip)."""
    t = (
        group
        if isinstance(group, pa.Table)
        else pa.Table.from_pandas(group, preserve_index=False)
    )
    per_url = (
        t.select(["tile_key", "page_key", "n"])
        .group_by(["tile_key", "page_key"])
        .aggregate([("n", "sum")])
    )
    tiles_t = per_url.group_by(["tile_key"]).aggregate(
        [("n_sum", "sum"), ([], "count_all")]
    )
    _z, tx, ty = tiles.unpack_key(tiles_t["tile_key"].to_numpy())
    return pa.table(
        {
            "tx": pa.array(tx.astype(np.int64)),
            "ty": pa.array(ty.astype(np.int64)),
            "n_mentions": tiles_t["n_sum_sum"].cast(pa.int64()),
            "n_pages": tiles_t["count_all"].cast(pa.int64()),
        }
    )


def rollup_exchange(partials_ds):
    """Partial-rows Dataset -> per-tile rollup via the bounded-bucket
    sort exchange (the unbounded-key-safe path).  Coalesced first
    (``overlaps.bucket_groups``): the partials are near-aggregated
    (tiny rows), so the sort's cost is per-block overhead, not bytes."""
    return bucket_groups(partials_ds, tile_rollup_group)


def tile_rollup(assigned_ds):
    """Dataset with (tx, ty, url) -> per-tile rollup Dataset."""
    ds = assigned_ds.map_batches(
        partial_tile_url_counts,
        batch_format="pyarrow",
        fn_kwargs={"n_buckets": exchange_bucket_count()},
    )
    return rollup_exchange(ds)


# ---------------------------------------------------------------------------
# shuffle-free tree rollup
# ---------------------------------------------------------------------------
# When the key cardinality is bounded (tiles at a fixed zoom: <= 4^13
# globally, ~10^5 here), a keyed sort-shuffle is overkill: the rollup
# is algebraic, so per-batch partials can be tree-merged like any
# global aggregate — Ray Data's ``Dataset.aggregate`` path, zero
# all-to-all. Distinct-page counting survives batch splits via
# boundary-page handling: a page whose rows straddle a block boundary
# sits at the first/last row of its batches (mention rows are emitted
# contiguously per page), so batches aggregate interior urls fully and
# keep (tile, boundary-url) rows un-aggregated; merges dedup those by
# key, and finalize counts each surviving row as one page.
# The sort-shuffle variant above remains the path for unbounded key
# spaces (e.g. per-url rollups at 10^12 docs).

_ROLLUP_SCHEMA = pa.schema(
    [
        ("tx", pa.int64()),
        ("ty", pa.int64()),
        ("page_key", pa.int64()),
        ("n_mentions", pa.int64()),
        ("n_pages", pa.int64()),
    ]
)

def partial_tile_rollup(batch: pa.Table) -> pa.Table:
    """(tx, ty, url) batch -> mixed partial: fully-aggregated tile rows
    (page_key null) for interior pages + per-(tile, page) rows for the
    batch's first/last page.

    The url is stripped to its int doc id up front (Arrow slice+cast):
    the int group_by keys more than halved the p8 flagship wall
    (43.7 -> ~27 s at sf0.1x512) — string hash keys were the single
    biggest cost of the whole pipeline."""
    import pyarrow.compute as pc

    from ..sources import synth

    if len(batch) == 0:
        return _ROLLUP_SCHEMA.empty_table()
    urls = batch["url"]
    if isinstance(urls, pa.ChunkedArray):
        urls = urls.combine_chunks()
    pk = pc.cast(
        pc.utf8_slice_codeunits(urls, len(synth.URL_PREFIX), 99), pa.int64()
    )
    t = pa.table({"tx": batch["tx"], "ty": batch["ty"], "page_key": pk})
    first = pk[0].as_py()
    last = pk[len(pk) - 1].as_py()
    is_bnd = pc.or_(pc.equal(pk, first), pc.equal(pk, last))
    interior = t.filter(pc.invert(is_bnd))
    boundary = t.filter(is_bnd)

    parts = []
    if len(interior):
        per_url = interior.group_by(
            ["tx", "ty", "page_key"]
        ).aggregate([([], "count_all")])
        tiles_t = per_url.group_by(["tx", "ty"]).aggregate(
            [("count_all", "sum"), ([], "count_all")]
        )
        # columns: tx, ty, count_all_sum (mentions), count_all (pages)
        parts.append(
            pa.table(
                {
                    "tx": tiles_t["tx"],
                    "ty": tiles_t["ty"],
                    "page_key": pa.nulls(len(tiles_t), pa.int64()),
                    "n_mentions": tiles_t["count_all_sum"].cast(pa.int64()),
                    "n_pages": tiles_t["count_all"].cast(pa.int64()),
                }
            )
        )
    if len(boundary):
        bnd = boundary.group_by(
            ["tx", "ty", "page_key"]
        ).aggregate([([], "count_all")])
        parts.append(
            pa.table(
                {
                    "tx": bnd["tx"],
                    "ty": bnd["ty"],
                    "page_key": bnd["page_key"],
                    "n_mentions": bnd["count_all"].cast(pa.int64()),
                    "n_pages": pa.array(np.zeros(len(bnd), dtype=np.int64)),
                }
            )
        )
    return pa.concat_tables(parts)


def _compact(t: pa.Table) -> pa.Table:
    """Merge-combine a mixed partial table (associative)."""
    import pyarrow.compute as pc

    null_url = pc.is_null(t["page_key"])
    tiles_t = t.filter(null_url)
    bnd = t.filter(pc.invert(null_url))
    parts = []
    if len(tiles_t):
        g = tiles_t.group_by(["tx", "ty"]).aggregate(
            [("n_mentions", "sum"), ("n_pages", "sum")]
        )
        parts.append(
            pa.table(
                {
                    "tx": g["tx"],
                    "ty": g["ty"],
                    "page_key": pa.nulls(len(g), pa.int64()),
                    "n_mentions": g["n_mentions_sum"],
                    "n_pages": g["n_pages_sum"],
                }
            )
        )
    if len(bnd):
        g = bnd.group_by(["tx", "ty", "page_key"]).aggregate([("n_mentions", "sum")])
        parts.append(
            pa.table(
                {
                    "tx": g["tx"],
                    "ty": g["ty"],
                    "page_key": g["page_key"],
                    "n_mentions": g["n_mentions_sum"],
                    "n_pages": pa.array(np.zeros(len(g), dtype=np.int64)),
                }
            )
        )
    if not parts:
        return _ROLLUP_SCHEMA.empty_table()
    return pa.concat_tables(parts)


def _finalize_rollup(acc: pa.Table) -> pa.Table:
    import pyarrow.compute as pc

    acc = _compact(acc)
    # each surviving (tile, boundary-page) row is one page
    null_url = pc.is_null(acc["page_key"])
    pages = pc.if_else(null_url, acc["n_pages"], pa.scalar(1, pa.int64()))
    t = pa.table(
        {
            "tx": acc["tx"],
            "ty": acc["ty"],
            "n_mentions": acc["n_mentions"],
            "n_pages": pages,
        }
    )
    g = t.group_by(["tx", "ty"]).aggregate(
        [("n_mentions", "sum"), ("n_pages", "sum")]
    )
    return pa.table(
        {
            "tx": g["tx"].cast(pa.int64()),
            "ty": g["ty"].cast(pa.int64()),
            "n_mentions": g["n_mentions_sum"].cast(pa.int64()),
            "n_pages": g["n_pages_sum"].cast(pa.int64()),
        }
    )


def tile_rollup_tree(assigned_ds, *, fanin: int = 8):
    """Dataset with (tx, ty, url) -> per-tile rollup Dataset via
    shuffle-free tree aggregation.

    Tree shape: per-batch partials (map, embarrassingly parallel) ->
    coalesce to ``fanin`` partitions and compact each -> coalesce to 1
    and finalize. The repartitions move only near-aggregated tables
    (O(tiles) rows, no url strings for interior pages), so both
    barriers are trivial; at cluster scale set ``fanin`` ~ number of
    nodes.
    """
    ds = assigned_ds.map_batches(partial_tile_rollup, batch_format="pyarrow")
    ds = ds.repartition(fanin).map_batches(
        _compact, batch_format="pyarrow", batch_size=None
    )
    return ds.repartition(1).map_batches(
        _finalize_rollup, batch_format="pyarrow", batch_size=None
    )
