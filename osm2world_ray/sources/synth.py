"""Shared deterministic formulas for the synthetic geo tables.

Every geo input (mention coordinates, landmarks, boundary shapes) is a
pure integer-hash function of keys in the driver's testdata tables, so
the DuckDB oracle can recompute it in SQL and the Ray engine in numpy
with bit-identical float results (verified: ``a*b % 2**32`` is exact in
int64; ``h / 2**32`` is an exact power-of-two division; the remaining
``+``/``*`` are single correctly-rounded IEEE ops evaluated in the same
order on both sides).

Coordinate model (FIXTURES.md §1): 70%% of mentions uniform over a
10x20-degree region (lat 40-50, lon -10..10), 30%% clustered in a
~0.12-degree "dense urban cell" around the reference's test anchor
``LatLon(48.56687, 13.45127)`` / zoom-13 tile (4402, 2828)
(``TileNumberTest.java:97-99``) — the skew driver for salting tests.
"""

from __future__ import annotations

import numpy as np

# Knuth/xxhash-style odd multipliers
M1 = 2654435761
M2 = 2246822519
M3 = 3266489917
M4 = 668265263
TWO32 = 4294967296

URL_PREFIX = "https://example.org/p/"

# cluster box (inside zoom-13 tiles around (4402, 2828))
CLUSTER_LAT0 = 48.5
CLUSTER_LON0 = 13.4
CLUSTER_SPAN = 0.12
# uniform background region
UNI_LAT0 = 40.0
UNI_LAT_SPAN = 10.0
UNI_LON0 = -10.0
UNI_LON_SPAN = 20.0

#: mention footprint half-extent (deg): bbox = lat +- RLAT, lon +- RLON
RLAT = 0.01
RLON = 0.02


def _h(k: np.ndarray, mult: int) -> np.ndarray:
    """(k * mult) mod 2**32, exact in int64 for k < ~3.4e9."""
    return (np.asarray(k, dtype=np.int64) * mult) % TWO32


def n_mentions(doc_id: np.ndarray) -> np.ndarray:
    """1..3 mentions per page."""
    return (np.asarray(doc_id, dtype=np.int64) % 3) + 1


def mention_latlon(doc_id: np.ndarray, j: np.ndarray):
    """Coordinates of mention j of page doc_id (both int64 arrays)."""
    doc_id = np.asarray(doc_id, dtype=np.int64)
    k = doc_id * 3 + np.asarray(j, dtype=np.int64)
    u1 = _h(k, M1) / TWO32
    u2 = _h(k, M2) / TWO32
    cluster = (doc_id % 10) < 3
    lat = np.where(cluster, CLUSTER_LAT0 + u1 * CLUSTER_SPAN, UNI_LAT0 + u1 * UNI_LAT_SPAN)
    lon = np.where(cluster, CLUSTER_LON0 + u2 * CLUSTER_SPAN, UNI_LON0 + u2 * UNI_LON_SPAN)
    return lat, lon


def landmark_latlon(partkey: np.ndarray):
    """Landmark point derived from part.p_partkey (uniform region)."""
    pk = np.asarray(partkey, dtype=np.int64)
    u1 = _h(pk, M3) / TWO32
    u2 = _h(pk, M4) / TWO32
    lat = UNI_LAT0 + u1 * UNI_LAT_SPAN
    lon = UNI_LON0 + u2 * UNI_LON_SPAN
    return lat, lon


#: extra fixed landmarks inside the cluster (tie-window / dense-cell
#: coverage); (landmark_id, lat, lon, kind)
FIXED_LANDMARKS: list[tuple[int, float, float, int]] = [
    (10_000_001, 48.552, 13.442, 0),
    (10_000_002, 48.561, 13.455, 1),
    (10_000_003, 48.575, 13.489, 2),
    (10_000_004, 48.598, 13.503, 3),
]


def landmark_kind(partkey: np.ndarray) -> np.ndarray:
    return np.asarray(partkey, dtype=np.int64) % 4


def mention_kind(doc_id: np.ndarray, j: np.ndarray) -> np.ndarray:
    """Predicate key for kind-filtered kNN (compatible-type matching,
    ``O2WConverterImpl.java:262-272`` analogue)."""
    return (np.asarray(doc_id, dtype=np.int64) * 3 + np.asarray(j, dtype=np.int64)) % 4


#: OSM-style tag strings per mention (HardcodedRuleset / TagSet
#: exercise); variant index = (doc_id*7 + j*5) % 8. Variant 7 carries a
#: duplicate key (TagSet.java:30-36 rejection path).
TAG_VARIANTS: list[str] = [
    "natural=water;name=lake",
    "building=yes;height=2 m",
    "highway=residential;maxspeed=50",
    "landuse=forest",
    "area=no;leisure=pitch",
    "route=ferry;maritime=yes",
    "type=multipolygon;natural=water",
    "surface=paved;surface=asphalt",
]


def mention_tag_variant(doc_id: np.ndarray, j: np.ndarray) -> np.ndarray:
    return (
        np.asarray(doc_id, dtype=np.int64) * 7 + np.asarray(j, dtype=np.int64) * 5
    ) % len(TAG_VARIANTS)


#: road-way tag variants exercising the RoadModule lane/width chain
#: (lanes resolution, dividers, unmarked surfaces, sidewalks/cycleways,
#: explicit width, per-class estimates)
ROAD_TAG_VARIANTS: list[str] = [
    "highway=residential",
    "highway=motorway",
    "highway=primary;lanes=4",
    "highway=primary;lanes:forward=2;lanes:backward=1",
    "highway=secondary;lanes=2;oneway=yes",
    "highway=path",
    "highway=track;surface=gravel",
    "highway=service;service=parking_aisle",
    "highway=tertiary;sidewalk=both",
    "highway=residential;cycleway=lane;width=6.5",
    "highway=unclassified;divider=solid_line",
    "highway=residential;lanes=3;lane_markings=no",
    "highway=motorway_link;oneway=yes",
    "highway=cycleway;surface=sand",
]


def road_tag_variant(doc_id: np.ndarray, j: np.ndarray) -> np.ndarray:
    return (
        np.asarray(doc_id, dtype=np.int64) * 5 + np.asarray(j, dtype=np.int64) * 7
    ) % len(ROAD_TAG_VARIANTS)


def sql_road_variant(doc_expr: str = "doc_id", j_expr: str = "mention_idx") -> str:
    return f"(({doc_expr}) * 5 + ({j_expr}) * 7) % {len(ROAD_TAG_VARIANTS)}"


def sql_tag_variant(doc_expr: str = "doc_id", j_expr: str = "mention_idx") -> str:
    return f"(({doc_expr}) * 7 + ({j_expr}) * 5) % {len(TAG_VARIANTS)}"


# ---------------------------------------------------------------------------
# SQL fragments (DuckDB oracle side of the same formulas)
# ---------------------------------------------------------------------------

#: CTE producing one row per mention with exact doc_id/j/lat/lon/url.
#: Columns: doc_id, mention_idx, url, lat, lon, kind, lang
MENTIONS_SQL = f"""
mentions AS (
  SELECT doc_id,
         j AS mention_idx,
         '{URL_PREFIX}' || doc_id AS url,
         CASE WHEN (doc_id % 10) < 3
              THEN {CLUSTER_LAT0} + ((((doc_id*3 + j) * {M1}) % {TWO32}) / {TWO32}.0) * {CLUSTER_SPAN}
              ELSE {UNI_LAT0} + ((((doc_id*3 + j) * {M1}) % {TWO32}) / {TWO32}.0) * {UNI_LAT_SPAN}
         END AS lat,
         CASE WHEN (doc_id % 10) < 3
              THEN {CLUSTER_LON0} + ((((doc_id*3 + j) * {M2}) % {TWO32}) / {TWO32}.0) * {CLUSTER_SPAN}
              ELSE {UNI_LON0} + ((((doc_id*3 + j) * {M2}) % {TWO32}) / {TWO32}.0) * {UNI_LON_SPAN}
         END AS lon,
         (doc_id*3 + j) % 4 AS kind,
         lang
  FROM (SELECT doc_id, lang, unnest(range(0, (doc_id % 3) + 1)) AS j FROM documents)
)
"""

#: CTE producing the landmark table (part-derived + fixed cluster rows).
#: Columns: landmark_id, lat, lon, kind
_fixed_values = ",\n         ".join(
    f"({lid}, {lat!r}, {lon!r}, {kind})" for lid, lat, lon, kind in FIXED_LANDMARKS
)
LANDMARKS_SQL = f"""
landmarks AS (
  SELECT p_partkey AS landmark_id,
         {UNI_LAT0} + (((p_partkey * {M3}) % {TWO32}) / {TWO32}.0) * {UNI_LAT_SPAN} AS lat,
         {UNI_LON0} + (((p_partkey * {M4}) % {TWO32}) / {TWO32}.0) * {UNI_LON_SPAN} AS lon,
         p_partkey % 4 AS kind
  FROM part
  UNION ALL
  SELECT * FROM (VALUES {_fixed_values}) AS f(landmark_id, lat, lon, kind)
)
"""

def sql_mention_lat(k_expr: str) -> str:
    """Mention latitude as SQL, for mention hash key expression k
    (= doc_id*3 + j). Expects a ``doc_id`` column in scope."""
    return (
        f"CASE WHEN (doc_id % 10) < 3 "
        f"THEN {CLUSTER_LAT0} + (((({k_expr}) * {M1}) % {TWO32}) / {TWO32}.0) * {CLUSTER_SPAN} "
        f"ELSE {UNI_LAT0} + (((({k_expr}) * {M1}) % {TWO32}) / {TWO32}.0) * {UNI_LAT_SPAN} END"
    )


def sql_mention_lon(k_expr: str) -> str:
    return (
        f"CASE WHEN (doc_id % 10) < 3 "
        f"THEN {CLUSTER_LON0} + (((({k_expr}) * {M2}) % {TWO32}) / {TWO32}.0) * {CLUSTER_SPAN} "
        f"ELSE {UNI_LON0} + (((({k_expr}) * {M2}) % {TWO32}) / {TWO32}.0) * {UNI_LON_SPAN} END"
    )


#: CTE producing one row per consecutive-mention segment with direct
#: endpoint formulas. No self-join and no unnest (DuckDB 1.0 hits an
#: internal "flat vector" error when an unnest CTE feeds an inequality
#: join); since n_segments = doc_id %% 3 is 0..2, j is expanded by
#: UNION ALL. Columns: doc_id, url, seg_idx, x1, y1, x2, y2 (x=lon).
def _seg_select(j: int) -> str:
    return f"""
  SELECT doc_id,
         '{URL_PREFIX}' || doc_id AS url,
         CAST({j} AS BIGINT) AS seg_idx,
         {sql_mention_lon(f'doc_id*3 + {j}')} AS x1,
         {sql_mention_lat(f'doc_id*3 + {j}')} AS y1,
         {sql_mention_lon(f'doc_id*3 + {j} + 1')} AS x2,
         {sql_mention_lat(f'doc_id*3 + {j} + 1')} AS y2
  FROM documents WHERE (doc_id % 3) >= {j + 1}"""


SEGMENTS_SQL = f"""
segs AS MATERIALIZED ({_seg_select(0)} UNION ALL {_seg_select(1)})
"""


#: SQL expression templates for slippy tile assignment at zoom {z}
#: (floor-identical to the numpy kernels — verified against libm).
def sql_tx(lon_expr: str, zoom: int) -> str:
    n = 1 << zoom
    return f"CAST(floor(({lon_expr} + 180.0) / 360.0 * {n}) AS BIGINT)"


def sql_ty(lat_expr: str, zoom: int) -> str:
    n = 1 << zoom
    return (
        f"CAST(floor((1.0 - ln(tan(radians({lat_expr})) + 1.0/cos(radians({lat_expr})))"
        f"/pi()) / 2.0 * {n}) AS BIGINT)"
    )


def sql_cell_ix(lon_expr: str, r: int) -> str:
    return f"CAST(floor(({lon_expr} + 180.0) * {1 << r}) AS BIGINT)"


def sql_cell_iy(lat_expr: str, r: int) -> str:
    return f"CAST(floor(({lat_expr} + 90.0) * {1 << r}) AS BIGINT)"


# ---------------------------------------------------------------------------
# terrain-interpolator site grid + elevation fields
# ---------------------------------------------------------------------------
# Sites are a jittered grid over the uniform mention region; elevations
# are closed-form fields chosen so that interpolators with linear
# (Linear/NaturalNeighbor) resp. quadratic (LeastSquares' 6-coeff fit,
# ``LeastSquaresInterpolator.java:220-248``) precision reproduce the
# field EXACTLY at probes inside the site hull — which makes the DuckDB
# oracle the closed-form field itself, fully independent of the
# triangulation/fit code under test. Probes are restricted one grid
# spacing inside the hull so no probe's triangle/cavity touches the
# padded-bbox corner vertices (z=0, ``DelaunayTriangulation.java:486``).

INTERP_SPACING = 0.5
INTERP_JITTER = 0.1  # fraction of spacing
#: probe margin (degrees) keeping cavities clear of bbox corners
INTERP_MARGIN = 1.0


def interp_sites():
    """-> (x=lon, y=lat, id) jittered grid over the uniform region."""
    ni = int(round(UNI_LON_SPAN / INTERP_SPACING)) + 1  # 41
    nj = int(round(UNI_LAT_SPAN / INTERP_SPACING)) + 1  # 21
    i, j = np.meshgrid(np.arange(ni, dtype=np.int64), np.arange(nj, dtype=np.int64), indexing="ij")
    i, j = i.ravel(), j.ravel()
    k = i * 1000 + j
    jx = (_h(k, M1) / TWO32 - 0.5) * (INTERP_SPACING * INTERP_JITTER)
    jy = (_h(k, M2) / TWO32 - 0.5) * (INTERP_SPACING * INTERP_JITTER)
    lon = UNI_LON0 + i * INTERP_SPACING + jx
    lat = UNI_LAT0 + j * INTERP_SPACING + jy
    return lon, lat, k


def field_linear(lat, lon):
    """Linear elevation field (m): exact target for barycentric/Sibson."""
    return 100.0 + 7.0 * (lon + 10.0) + 13.0 * (lat - 40.0)


SQL_FIELD_LINEAR = "(100.0 + 7.0 * (lon + 10.0) + 13.0 * (lat - 40.0))"


def field_quad(lat, lon):
    """Quadratic elevation field (m): exact target for the 6-coeff
    least-squares fit (quadratic precision)."""
    u = lon + 10.0
    v = lat - 40.0
    return 50.0 + 2.0 * u + 3.0 * v + 0.5 * u * u + 0.25 * u * v + 0.3 * v * v


SQL_FIELD_QUAD = (
    "(50.0 + 2.0*(lon+10.0) + 3.0*(lat-40.0) + 0.5*(lon+10.0)*(lon+10.0)"
    " + 0.25*(lon+10.0)*(lat-40.0) + 0.3*(lat-40.0)*(lat-40.0))"
)

#: SQL predicate for the probe window (one spacing + margin inside hull)
SQL_INTERP_PROBE = (
    f"(lat >= {UNI_LAT0 + INTERP_MARGIN} AND lat <= {UNI_LAT0 + UNI_LAT_SPAN - INTERP_MARGIN}"
    f" AND lon >= {UNI_LON0 + INTERP_MARGIN} AND lon <= {UNI_LON0 + UNI_LON_SPAN - INTERP_MARGIN})"
)


# ---------------------------------------------------------------------------
# traffic-sign tag values (deterministic per doc; numpy + SQL mirrors)
# ---------------------------------------------------------------------------
# Nine templates by doc_id % 9 exercising every TrafficSignIdentifier
# branch: human-readable, country+subtype+bracket, multi-sign lists with
# stray spaces, letter-suffixed non-subtypes, a type whose digits START
# with the sub-type (the String.replace double-removal case), and empty.

def traffic_sign_values(doc_ids) -> "np.ndarray":
    import numpy as np

    d = np.asarray(doc_ids, dtype=np.int64)
    s = lambda x: np.char.mod("%d", x)  # noqa: E731
    t = d % 9
    cat = np.char.add
    return np.select(
        [t == 0, t == 1, t == 2, t == 3, t == 4, t == 5, t == 6, t == 7],
        [
            np.full(len(d), "city_limit", dtype=object).astype(str),
            cat(cat(cat(cat(cat("DE:", s(200 + d % 300)), "-"),
                        s(10 + d % 90)), cat("[", s(d % 1000))), "]"),
            cat(cat(cat(cat(cat("DE:", s(260 + d % 30)), ",1020-"),
                        s(30 + d % 60)), cat("; 265[3.", s(d % 10))), "] "),
            np.full(len(d), "stop;give_way", dtype=object).astype(str),
            cat("GB:", s(900 + d % 100)),
            cat(cat("US:R1-", s(1 + d % 9)), "a"),
            cat(cat(cat("FI:", s(300 + d % 100)), cat("[", s(d % 50))), "]"),
            cat(cat("DE:", s((10 + d % 90) * 10 + d % 10)), cat("-", s(10 + d % 90))),
        ],
        default="",
    ).astype(str)


#: the identical templates as a SQL CASE over doc_id
TRAFFIC_SIGN_VALUE_SQL = """CASE doc_id % 9
  WHEN 0 THEN 'city_limit'
  WHEN 1 THEN 'DE:' || CAST(200 + doc_id % 300 AS VARCHAR) || '-'
           || CAST(10 + doc_id % 90 AS VARCHAR)
           || '[' || CAST(doc_id % 1000 AS VARCHAR) || ']'
  WHEN 2 THEN 'DE:' || CAST(260 + doc_id % 30 AS VARCHAR) || ',1020-'
           || CAST(30 + doc_id % 60 AS VARCHAR)
           || '; 265[3.' || CAST(doc_id % 10 AS VARCHAR) || '] '
  WHEN 3 THEN 'stop;give_way'
  WHEN 4 THEN 'GB:' || CAST(900 + doc_id % 100 AS VARCHAR)
  WHEN 5 THEN 'US:R1-' || CAST(1 + doc_id % 9 AS VARCHAR) || 'a'
  WHEN 6 THEN 'FI:' || CAST(300 + doc_id % 100 AS VARCHAR)
           || '[' || CAST(doc_id % 50 AS VARCHAR) || ']'
  WHEN 7 THEN 'DE:' || CAST((10 + doc_id % 90) * 10 + doc_id % 10 AS VARCHAR)
           || '-' || CAST(10 + doc_id % 90 AS VARCHAR)
  ELSE '' END"""
