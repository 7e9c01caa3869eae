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


def flagship_pipeline(sf_dir: str, *, repeat: int = 1, zoom: int = 13,
                      rollup: str = "tree"):
    """pages -> mentions -> z13 tiles -> per-tile rollup.

    ``rollup="tree"`` (default): shuffle-free tree aggregation
    (tile key cardinality is bounded at a fixed zoom).
    ``rollup="shuffle"``: partial-aggregate + bounded-bucket shuffle,
    the path for unbounded key spaces. Both in stages/rollup.py;
    both return a lazy Dataset.
    """
    from ..stages.rollup import tile_rollup, tile_rollup_tree

    ds = datasets.mentions_ds(sf_dir, repeat=repeat)
    ds = ds.map_batches(
        lambda b: tile_assign.assign_tiles(b, zoom=zoom), batch_format="pyarrow"
    )
    ds = ds.select_columns(["tx", "ty", "url"])
    if rollup == "tree":
        return tile_rollup_tree(ds)
    return tile_rollup(ds)
