"""Deterministic synthetic geo tables + parquet readers.

The driver's testdata has no geo tables, so the geo side-inputs
(pages with embedded geo mentions, boundary polygons, landmarks,
raster grid) are derived *deterministically* from the existing tables
(``documents``, ``part``) by integer-hash formulas that are expressible
both in numpy (engine) and ANSI SQL (DuckDB oracle). See
:mod:`osm2world_ray.sources.synth` for the shared formulas.
"""
