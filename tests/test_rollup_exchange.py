"""The rollup's sort exchange: cluster-sized coalesce + fine bucket
space (the unbounded-key scaling path), vs the shuffle-free tree.

Both paths must agree row-exactly on the same assigned-mentions input;
the exchange's bucket count and coalesce width are sized from the live
cluster with single-node floors.
"""

import numpy as np
import pyarrow as pa
import pytest
import ray

from osm2world_ray.sources import synth
from osm2world_ray.stages.rollup import (
    exchange_block_count,
    exchange_bucket_count,
    partial_tile_url_counts,
    rollup_exchange,
    tile_rollup,
    tile_rollup_tree,
)


def _assigned_table(n_pages: int = 40, mentions_per_page: int = 7) -> pa.Table:
    """Deterministic (tx, ty, url) rows: pages spread over a few tiles,
    urls contiguous per page (the tree path's boundary-page invariant)."""
    rng = np.random.RandomState(7)
    page = np.repeat(np.arange(n_pages, dtype=np.int64), mentions_per_page)
    tx = (4196 + (page % 5) + rng.randint(0, 2, len(page))).astype(np.int64)
    ty = (2859 + (page % 3)).astype(np.int64)
    urls = pa.array([f"{synth.URL_PREFIX}{p}" for p in page])
    return pa.table({"tx": pa.array(tx), "ty": pa.array(ty), "url": urls})


def _canon(df):
    df = df.sort_values(["tx", "ty"]).reset_index(drop=True)
    return df[["tx", "ty", "n_mentions", "n_pages"]]


def test_exchange_and_tree_agree():
    t = _assigned_table()
    ds = ray.data.from_arrow(t).repartition(6)
    a = _canon(tile_rollup(ds).to_pandas())
    b = _canon(tile_rollup_tree(ds).to_pandas())
    assert a.equals(b)


def test_partials_bucket_space_is_fine():
    t = _assigned_table()
    part = partial_tile_url_counts(t, n_buckets=1024)
    assert part.column_names == ["tile_key", "page_key", "n", "bucket"]
    b = part["bucket"].to_numpy()
    assert b.min() >= 0 and b.max() < exchange_bucket_count()
    # partials are already aggregated: (tile_key, page_key) unique
    import pandas as pd

    df = part.to_pandas()
    assert not df.duplicated(["tile_key", "page_key"]).any()
    assert df["n"].sum() == len(t)


def test_counts_have_single_node_floors():
    # session fixture runs at num_cpus=4: the floors dominate
    assert exchange_block_count() >= 16
    assert exchange_bucket_count() >= 1024
    # and the bucket space is strictly finer than the coalesce width
    assert exchange_bucket_count() > exchange_block_count()


def test_rollup_exchange_handles_split_pages():
    """A page's partial rows split across input blocks must still merge
    to one distinct-page count (the combine inside the group kernel)."""
    t = _assigned_table(n_pages=10, mentions_per_page=4)
    ds = ray.data.from_arrow(t).repartition(8)  # pages straddle blocks
    parts = ds.map_batches(
        partial_tile_url_counts,
        batch_format="pyarrow",
        fn_kwargs={"n_buckets": 1024},
    )
    df = _canon(rollup_exchange(parts).to_pandas())
    # oracle in pandas
    import pandas as pd

    ref = t.to_pandas()
    ref["page"] = ref["url"].str[len(synth.URL_PREFIX):].astype(np.int64)
    g = ref.groupby(["tx", "ty"]).agg(
        n_mentions=("page", "size"), n_pages=("page", "nunique")
    ).reset_index()
    g = g.sort_values(["tx", "ty"]).reset_index(drop=True)
    pd.testing.assert_frame_equal(
        df.astype(np.int64), g.astype(np.int64), check_dtype=False
    )
