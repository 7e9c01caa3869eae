"""Query registry: every implemented operator as a (Ray callable, oracle SQL) pair.

The driver calls ``queries()[name](sf_dir)`` and compares the result
against ``oracle_sql()[name]`` run by DuckDB over the same parquet
tables (order-insensitive value hash, columns sorted by name). Design
rules enforced here:

- every computed column is named identically in the Ray pipeline and
  the SQL (driver hashes by sorted column name);
- outputs carry only strings and integers — floats are snapped to
  integer micro-units first — so hashes never touch float formatting;
- all synthetic geo inputs come from the shared deterministic formulas
  in :mod:`osm2world_ray.sources.synth`, recomputable in SQL.

Non-SQL-expressible ops (MinHash/SimHash dedup, language id, IVF ANN)
register a query without SQL -> the driver records a rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

import numpy as np
import pyarrow as pa

from ..geo import tiles
from ..sources import synth
from ..stages import tile_assign
from . import datasets

QUERIES: dict[str, Callable[[str], Any]] = {}
ORACLES: dict[str, str] = {}


def register(name: str, sql: str | None = None):
    def deco(fn):
        QUERIES[name] = fn
        if sql is not None:
            ORACLES[name] = sql
        return fn

    return deco


# ---------------------------------------------------------------------------
# extraction (byte-identity invariant)
# ---------------------------------------------------------------------------

@register(
    "extract_text",
    f"""
    SELECT '{synth.URL_PREFIX}' || doc_id AS url, text, lang
    FROM documents
    """,
)
def q_extract_text(sf_dir: str):
    """HTML -> text re-extraction; must be byte-identical to documents.text
    (per-row invariant, BASELINE.json input_hint)."""
    return datasets.texts_ds(sf_dir).select_columns(["url", "text", "lang"])


@register(
    "extract_mentions",
    f"""
    WITH {synth.MENTIONS_SQL}
    SELECT url, mention_idx, kind,
           CAST(floor(lat * 1000000 + 0.5) AS BIGINT) AS lat_udeg,
           CAST(floor(lon * 1000000 + 0.5) AS BIGINT) AS lon_udeg
    FROM mentions
    """,
)
def q_extract_mentions(sf_dir: str):
    """Geo mentions parsed out of the HTML (micro-degree ints)."""
    def to_udeg(b: pa.Table) -> pa.Table:
        lat = b["lat"].to_numpy()
        lon = b["lon"].to_numpy()
        return pa.table(
            {
                "url": b["url"],
                "mention_idx": b["mention_idx"],
                "kind": b["kind"],
                "lat_udeg": pa.array(np.floor(lat * 1e6 + 0.5).astype(np.int64)),
                "lon_udeg": pa.array(np.floor(lon * 1e6 + 0.5).astype(np.int64)),
            }
        )

    return datasets.mentions_ds(sf_dir).map_batches(to_udeg, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# tile / cell assignment (TileNumber.atLatLon, cell_of)
# ---------------------------------------------------------------------------

def _tile_assign_sql(zoom: int) -> str:
    return f"""
    WITH {synth.MENTIONS_SQL}
    SELECT url, mention_idx,
           CAST({zoom} AS BIGINT) AS zoom,
           {synth.sql_tx('lon', zoom)} AS tx,
           {synth.sql_ty('lat', zoom)} AS ty
    FROM mentions
    """


def _q_tile_assign(sf_dir: str, zoom: int):
    ds = datasets.mentions_ds(sf_dir)
    ds = ds.map_batches(
        lambda b, z=zoom: tile_assign.assign_tiles(b, zoom=z), batch_format="pyarrow"
    )
    return ds.select_columns(["url", "mention_idx", "zoom", "tx", "ty"])


@register("tile_assign_z13", _tile_assign_sql(13))
def q_tile_assign_z13(sf_dir: str):
    """Point -> slippy tile at zoom 13 (TileNumber.java:122-126)."""
    return _q_tile_assign(sf_dir, 13)


@register("tile_assign_z15", _tile_assign_sql(15))
def q_tile_assign_z15(sf_dir: str):
    """Point -> slippy tile at zoom 15 (the reference tile farm's zoom,
    TilesetCommand.java:99)."""
    return _q_tile_assign(sf_dir, 15)


@register(
    "cell_assign_r5",
    f"""
    WITH {synth.MENTIONS_SQL}
    SELECT url, mention_idx,
           (CAST(5 AS BIGINT) << 58) | ({synth.sql_cell_ix('lon', 5)} << 29)
             | {synth.sql_cell_iy('lat', 5)} AS cell
    FROM mentions
    """,
)
def q_cell_assign_r5(sf_dir: str):
    """Point -> geocell id at resolution 5 (H3-analogue encode)."""
    ds = datasets.mentions_ds(sf_dir)
    ds = ds.map_batches(lambda b: tile_assign.assign_cells(b, r=5), batch_format="pyarrow")
    return ds.select_columns(["url", "mention_idx", "cell"])


@register(
    "tile_ancestor_rollup",
    f"""
    WITH {synth.MENTIONS_SQL}
    SELECT url, mention_idx,
           {synth.sql_tx('lon', 15)} // 4 AS tx13,
           {synth.sql_ty('lat', 15)} // 4 AS ty13
    FROM mentions
    """,
)
def q_tile_ancestor(sf_dir: str):
    """z15 tile -> z13 ancestor by right shift (TileNumber.java:108-113)."""
    def fn(b: pa.Table) -> pa.Table:
        b = tile_assign.assign_tiles(b, zoom=15)
        tx13, ty13 = tiles.ancestor(15, 13, b["tx"].to_numpy(), b["ty"].to_numpy())
        return pa.table(
            {
                "url": b["url"],
                "mention_idx": b["mention_idx"],
                "tx13": pa.array(tx13),
                "ty13": pa.array(ty13),
            }
        )

    return datasets.mentions_ds(sf_dir).map_batches(fn, batch_format="pyarrow")


# ---------------------------------------------------------------------------
# metric projection (MetricMapProjection mm-snap)
# ---------------------------------------------------------------------------

ANCHOR_LAT = 48.56687
ANCHOR_LON = 13.45127
_SCALE_SQL = f"(6371000.0 * cos(radians({ANCHOR_LAT})))"
_MERC_Y = "ln(tan(radians({v})) + 1.0/cos(radians({v})))"

@register(
    "mercator_mm",
    f"""
    WITH {synth.MENTIONS_SQL}
    SELECT url, mention_idx,
           CAST(floor({_SCALE_SQL} * radians(lon - {ANCHOR_LON}) * 1000.0 + 0.5) AS BIGINT) AS x_mm,
           CAST(floor({_SCALE_SQL} * ({_MERC_Y.format(v='lat')} - {_MERC_Y.format(v=str(ANCHOR_LAT))})
                * 1000.0 + 0.5) AS BIGINT) AS z_mm
    FROM mentions
    """,
)
def q_mercator_mm(sf_dir: str):
    """Scaled-Mercator metric projection, snapped to exact millimeter
    int64 (MetricMapProjection.java:29-63, snap :37-40)."""
    ds = datasets.mentions_ds(sf_dir)
    ds = ds.map_batches(
        lambda b: tile_assign.project_mm(b, lat0=ANCHOR_LAT, lon0=ANCHOR_LON),
        batch_format="pyarrow",
    )
    return ds.select_columns(["url", "mention_idx", "x_mm", "z_mm"])


# ---------------------------------------------------------------------------
# straddle fan-out (tilesForBounds)
# ---------------------------------------------------------------------------

@register(
    "straddle_fanout_z13",
    f"""
    WITH {synth.MENTIONS_SQL}
    SELECT url, mention_idx, tx, ty
    FROM (
      SELECT url, mention_idx, tx,
             unnest(range(ty0, ty1 + 1)) AS ty
      FROM (
        SELECT url, mention_idx,
               unnest(range({synth.sql_tx(f'lon - {synth.RLON}', 13)},
                            {synth.sql_tx(f'lon + {synth.RLON}', 13)} + 1)) AS tx,
               {synth.sql_ty(f'lat + {synth.RLAT}', 13)} AS ty0,
               {synth.sql_ty(f'lat - {synth.RLAT}', 13)} AS ty1
        FROM mentions
      )
    )
    """,
)
def q_straddle_fanout(sf_dir: str):
    """Footprint bbox -> one row per covered z13 tile
    (TileNumber.tilesForBounds fan-out, TileNumber.java:129-144)."""
    ds = datasets.mentions_ds(sf_dir)
    ds = ds.map_batches(
        lambda b: tile_assign.fan_out_footprints(b, zoom=13), batch_format="pyarrow"
    )
    return ds.select_columns(["url", "mention_idx", "tx", "ty"])


# ---------------------------------------------------------------------------
# per-tile rollups (StatisticsOutput analogue)
# ---------------------------------------------------------------------------

@register(
    "tile_rollup_z13",
    f"""
    WITH {synth.MENTIONS_SQL}, assigned AS (
      SELECT url, {synth.sql_tx('lon', 13)} AS tx, {synth.sql_ty('lat', 13)} AS ty
      FROM mentions
    )
    SELECT tx, ty,
           count(*) AS n_mentions,
           count(DISTINCT url) AS n_pages
    FROM assigned GROUP BY tx, ty
    """,
)
def q_tile_rollup(sf_dir: str):
    """Per-tile mention/page counts — the StatisticsOutput per-tile
    rollup (StatisticsOutput.java:22-217) as groupby-aggregate.

    Pattern: vectorized per-batch partial dedup is skipped (urls repeat
    at most 3x); distinct-url is a two-level groupby so the shuffle
    carries only (tile, url) pairs, not payloads."""
    from ray.data.aggregate import Count, Sum

    ds = datasets.mentions_ds(sf_dir)
    ds = ds.map_batches(lambda b: tile_assign.assign_tiles(b, zoom=13), batch_format="pyarrow")
    ds = ds.select_columns(["tx", "ty", "url"])
    per_url = ds.groupby(["tx", "ty", "url"]).aggregate(Count(alias_name="n"))
    out = per_url.groupby(["tx", "ty"]).aggregate(
        Sum("n", alias_name="n_mentions"), Count(alias_name="n_pages")
    )
    return out.select_columns(["tx", "ty", "n_mentions", "n_pages"])


def all_queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    return dict(ORACLES)
