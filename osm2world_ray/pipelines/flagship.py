"""Flagship end-to-end pipeline: the ``tileset``-farm analogue.

Reference lifecycle (``TilesetCommand.java:101-233`` +
``O2WConverterImpl.convert``): read -> extract -> tile-assign ->
spatial joins -> per-tile rollup -> partitioned write. Here the whole
thing is ONE lazy Ray Dataset pipeline; the streaming executor
pipelines the stages with backpressure.
"""

from __future__ import annotations

from . import datasets
from ..stages import tile_assign


def flagship_pipeline(sf_dir: str, *, repeat: int = 1, zoom: int = 13):
    """pages -> mentions -> z13 tiles -> per-tile rollup Dataset."""
    from ray.data.aggregate import Count, Sum

    ds = datasets.mentions_ds(sf_dir, repeat=repeat)
    ds = ds.map_batches(
        lambda b: tile_assign.assign_tiles(b, zoom=zoom), batch_format="pyarrow"
    )
    ds = ds.select_columns(["tx", "ty", "url"])
    per_url = ds.groupby(["tx", "ty", "url"]).aggregate(Count(alias_name="n"))
    return per_url.groupby(["tx", "ty"]).aggregate(
        Sum("n", alias_name="n_mentions"), Count(alias_name="n_pages")
    )
