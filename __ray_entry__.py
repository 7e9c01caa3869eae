"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB. Never calls ``ray.init``/``ray.shutdown`` (driver owns the
session).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001."""
    from osm2world_ray.pipelines.flagship import flagship_pipeline

    return flagship_pipeline("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from osm2world_ray.pipelines.queries import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from osm2world_ray.pipelines.queries import all_oracles

    return all_oracles()
