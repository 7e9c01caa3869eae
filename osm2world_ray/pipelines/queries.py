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


# ---------------------------------------------------------------------------
# point-in-polygon join (node-in-area overlaps)
# ---------------------------------------------------------------------------

def _pip_sql() -> str:
    from ..sources.boundaries import BOUNDARY_SPECS

    selects = [
        f"SELECT url, mention_idx, CAST({bid} AS BIGINT) AS boundary_id "
        f"FROM mentions WHERE {shape.sql('lat', 'lon')}"
        for bid, _, _, shape in BOUNDARY_SPECS
    ]
    return f"WITH {synth.MENTIONS_SQL} " + " UNION ALL ".join(selects)


@register("pip_join_contain", _pip_sql())
def q_pip_join(sf_dir: str):
    """Mentions x boundary polygons: exact ray-cast containment with
    holes honored — the node-in-area overlap join
    (OSMToMapDataConverter.java:720-733). Boundaries are broadcast via
    ray.put; each actor builds the decoded-WKB GridIndex once."""
    import ray

    from ..sources.boundaries import boundaries_table
    from ..stages.pip_join import PIPJoin

    ref = ray.put(boundaries_table())
    ds = datasets.mentions_ds(sf_dir)
    return ds.map_batches(
        PIPJoin,
        fn_constructor_kwargs={"boundaries_ref": ref},
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
        num_cpus=1,
    )


def _typed_overlap_sql() -> str:
    from ..sources.boundaries import BOUNDARY_SPECS, Diamond

    parts = []
    for bid, _, _, shape in BOUNDARY_SPECS:
        if isinstance(shape, Diamond):
            bb = (shape.clat - shape.r, shape.clon - shape.r,
                  shape.clat + shape.r, shape.clon + shape.r)
        else:
            bb = (shape.minlat, shape.minlon, shape.maxlat, shape.maxlon)
        bbox_pred = (
            f"(lon - {synth.RLON} <= {bb[3]!r} AND lon + {synth.RLON} >= {bb[1]!r} "
            f"AND lat - {synth.RLAT} <= {bb[2]!r} AND lat + {synth.RLAT} >= {bb[0]!r})"
        )
        parts.append(
            f"SELECT url, mention_idx, CAST({bid} AS BIGINT) AS boundary_id, "
            f"CASE WHEN {shape.sql('lat', 'lon')} THEN 'CONTAIN' ELSE 'INTERSECT' END "
            f"AS overlap_type FROM mentions WHERE {bbox_pred}"
        )
    return f"WITH {synth.MENTIONS_SQL} " + " UNION ALL ".join(parts)


@register("overlap_typed", _typed_overlap_sql())
def q_overlap_typed(sf_dir: str):
    """Typed overlap join (CONTAIN / INTERSECT) of mention footprints vs
    boundaries — the MapOverlapWA type classification
    (OSMToMapDataConverter.java:515-620) for point footprints."""
    import ray

    from ..sources.boundaries import boundaries_table
    from ..stages.pip_join import TypedOverlapJoin

    ref = ray.put(boundaries_table())
    ds = datasets.mentions_ds(sf_dir)
    return ds.map_batches(
        TypedOverlapJoin,
        fn_constructor_kwargs={
            "boundaries_ref": ref,
            "rlat": synth.RLAT,
            "rlon": synth.RLON,
        },
        batch_format="pyarrow",
        batch_size=4096,
        concurrency=(1, 4),
        num_cpus=1,
    )


# ---------------------------------------------------------------------------
# kNN landmark joins
# ---------------------------------------------------------------------------

_KNN_RANKED = f"""
WITH {synth.MENTIONS_SQL}, {synth.LANDMARKS_SQL},
ranked AS (
  SELECT m.url, m.mention_idx, l.landmark_id,
         row_number() OVER (
           PARTITION BY m.url, m.mention_idx
           ORDER BY (l.lat - m.lat) * (l.lat - m.lat)
                  + (l.lon - m.lon) * (l.lon - m.lon), l.landmark_id
         ) AS rank
  FROM mentions m CROSS JOIN landmarks l {{pred}}
)
"""


@register(
    "knn_nearest",
    _KNN_RANKED.format(pred="")
    + "SELECT url, mention_idx, landmark_id FROM ranked WHERE rank = 1",
)
def q_knn_nearest(sf_dir: str):
    """Nearest landmark per mention via geocell ring expansion — the
    attachment nearest-surface join (O2WConverterImpl.java:243-299)
    expressed as broadcast index + per-batch k-ring probe."""
    import ray

    from ..sources.landmarks import landmarks_table
    from ..stages.knn import NearestLandmark

    ref = ray.put(landmarks_table(sf_dir))
    ds = datasets.mentions_ds(sf_dir)
    return ds.map_batches(
        NearestLandmark,
        fn_constructor_kwargs={"landmarks_ref": ref},
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=(1, 4),
        num_cpus=1,
    )


@register(
    "knn_nearest_kind",
    _KNN_RANKED.format(pred="WHERE l.kind = m.kind")
    + "SELECT url, mention_idx, landmark_id FROM ranked WHERE rank = 1",
)
def q_knn_nearest_kind(sf_dir: str):
    """Predicate-filtered nearest landmark (compatible-type matching,
    O2WConverterImpl.java:262-272): candidates restricted to the
    mention's kind before the distance argmin."""
    import ray

    from ..sources.landmarks import landmarks_table
    from ..stages.knn import NearestLandmark

    ref = ray.put(landmarks_table(sf_dir))
    ds = datasets.mentions_ds(sf_dir)
    return ds.map_batches(
        NearestLandmark,
        fn_constructor_kwargs={"landmarks_ref": ref, "kind_filter": True},
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=(1, 4),
        num_cpus=1,
    )


@register(
    "knn_top3",
    _KNN_RANKED.format(pred="")
    + "SELECT url, mention_idx, landmark_id, rank FROM ranked WHERE rank <= 3",
)
def q_knn_top3(sf_dir: str):
    """Top-3 nearest landmarks (brute-force vectorized baseline over the
    broadcast landmark matrix; ties broken by landmark_id)."""
    import ray

    from ..sources.landmarks import landmarks_table
    from ..stages.knn import BruteForceTopK

    ref = ray.put(landmarks_table(sf_dir))
    ds = datasets.mentions_ds(sf_dir)
    return ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"landmarks_ref": ref, "k": 3},
        batch_format="pyarrow",
        batch_size=8192,
        concurrency=(1, 4),
        num_cpus=1,
    )


def all_queries() -> dict[str, Callable[[str], Any]]:
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    return dict(ORACLES)
