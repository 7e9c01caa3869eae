"""osm2world_ray — a Ray-Data-native spatial-join + tiling engine.

A from-scratch re-expression of the query/data-processing semantics of
tordanik/OSM2World (reference at /root/reference, Java) over Parquet
tables of Common-Crawl-style web pages, built on ``ray.data.Dataset``
pipelines: ``map_batches`` over zero-copy Arrow batches, actor pools for
stateful stages, explicit hash shuffles for the wide steps.

Layout:
    geo/        pure-numpy kernels (tile math, projection, PIP, clip, ...)
    sources/    deterministic synthetic geo tables + parquet readers
    stages/     Ray Data batch transforms / actor-pool stages
    pipelines/  end-to-end pipeline assembly, checkpoint/resume
    oracle/     single-process pure-Python reference implementation
"""

__version__ = "0.1.0"
