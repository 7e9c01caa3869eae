"""Boundary polygons side table (PIP join right side).

Fixture shapes per FIXTURES.md §2: rectangles with rectangular holes
(the square-with-two-holes multipolygon analogue,
``OSMToMapDataConverterTest:52-63``), diamonds (non-axis-aligned rings
exercising the ray cast), a dense-cluster boundary, and a huge polygon
(clipping-guard analogue, ``OSMToMapDataConverter.java:78-156``).

Every shape is also expressible as a closed-form SQL predicate so the
DuckDB oracle can recompute the join:
  rect:    minlat <= lat < maxlat AND minlon <= lon < maxlon
           (exactly the half-open result of our even-odd ray cast on an
           axis-aligned CCW ring)
  diamond: abs(lon-clon) + abs(lat-clat) < r

Geometry travels as WKB binary (lon=x, lat=y) — the engine decodes WKB
and runs the general ray-cast; it never sees these formulas.
"""

from __future__ import annotations

from dataclasses import dataclass, field

import numpy as np

from ..geo import wkb


@dataclass(frozen=True)
class Rect:
    minlat: float
    minlon: float
    maxlat: float
    maxlon: float
    holes: tuple = field(default_factory=tuple)  # of Rect

    def rings(self) -> list[np.ndarray]:
        def ring(r: "Rect") -> np.ndarray:
            return np.array(
                [
                    [r.minlon, r.minlat],
                    [r.maxlon, r.minlat],
                    [r.maxlon, r.maxlat],
                    [r.minlon, r.maxlat],
                ]
            )

        return [ring(self)] + [ring(h) for h in self.holes]

    def sql(self, lat: str = "lat", lon: str = "lon") -> str:
        s = (
            f"({lat} >= {self.minlat} AND {lat} < {self.maxlat} "
            f"AND {lon} >= {self.minlon} AND {lon} < {self.maxlon})"
        )
        for h in self.holes:
            s += f" AND NOT {h.sql(lat, lon)}"
        return s


@dataclass(frozen=True)
class Diamond:
    clat: float
    clon: float
    r: float

    def rings(self) -> list[np.ndarray]:
        return [
            np.array(
                [
                    [self.clon, self.clat - self.r],
                    [self.clon + self.r, self.clat],
                    [self.clon, self.clat + self.r],
                    [self.clon - self.r, self.clat],
                ]
            )
        ]

    def sql(self, lat: str = "lat", lon: str = "lon") -> str:
        return f"(abs({lon} - {self.clon}) + abs({lat} - {self.clat}) < {self.r})"


#: (boundary_id, name, kind, shape)
BOUNDARY_SPECS: list[tuple[int, str, str, object]] = [
    (1, "west-admin", "admin", Rect(41.0, -8.0, 44.0, -4.0, (Rect(42.0, -7.0, 43.0, -6.0),))),
    (2, "central-park", "park", Rect(45.0, 0.0, 49.0, 5.0)),
    (3, "east-water", "water", Diamond(47.0, 7.0, 1.5)),
    (4, "cluster-admin", "admin", Rect(48.5, 13.4, 48.62, 13.52)),
    (5, "cluster-park", "park", Diamond(48.56, 13.46, 0.03)),
    (6, "south-east-admin", "admin", Rect(40.0, 10.0, 44.0, 14.0, (Rect(41.0, 11.0, 42.0, 12.0),))),
    (7, "west-water", "water", Diamond(43.0, -2.0, 2.0)),
    (8, "huge", "admin", Rect(30.0, -30.0, 60.0, 30.0)),
]


def boundaries_table():
    """-> pyarrow Table (boundary_id, name, kind, wkb)."""
    import pyarrow as pa

    ids, names, kinds, wkbs = [], [], [], []
    for bid, name, kind, shape in BOUNDARY_SPECS:
        ids.append(bid)
        names.append(name)
        kinds.append(kind)
        wkbs.append(wkb.encode_polygon(shape.rings()))
    return pa.table(
        {
            "boundary_id": pa.array(ids, type=pa.int64()),
            "name": pa.array(names, type=pa.string()),
            "kind": pa.array(kinds, type=pa.string()),
            "wkb": pa.array(wkbs, type=pa.binary()),
        }
    )


def contains_sql_case(lat: str = "lat", lon: str = "lon") -> str:
    """UNION-ALL SQL producing (boundary_id) rows a point falls in —
    used inside the oracle's PIP join."""
    parts = [
        f"SELECT {bid} AS boundary_id, {shape.sql(lat, lon)} AS inside"
        for bid, _, _, shape in BOUNDARY_SPECS
    ]
    return " UNION ALL ".join(parts)


def bbox_sql_values() -> str:
    """VALUES list of (boundary_id, minlat, minlon, maxlat, maxlon)."""
    rows = []
    for bid, _, _, shape in BOUNDARY_SPECS:
        if isinstance(shape, Rect):
            rows.append(f"({bid}, {shape.minlat}, {shape.minlon}, {shape.maxlat}, {shape.maxlon})")
        else:
            rows.append(
                f"({bid}, {shape.clat - shape.r}, {shape.clon - shape.r}, "
                f"{shape.clat + shape.r}, {shape.clon + shape.r})"
            )
    return ", ".join(rows)


def edges_sql_values() -> str:
    """VALUES list of every ring edge (boundary_id, ex1, ey1, ex2, ey2)
    with x=lon, y=lat — the area-segment side of the WA overlap oracle
    (floats repr-round-trip so they equal the WKB-decoded engine
    values bit-exactly)."""
    rows = []
    for bid, _, _, shape in BOUNDARY_SPECS:
        for ring in shape.rings():
            n = len(ring)
            for i in range(n):
                x1, y1 = ring[i]
                x2, y2 = ring[(i + 1) % n]
                rows.append(f"({bid}, {x1!r}, {y1!r}, {x2!r}, {y2!r})")
    return ", ".join(rows)


def corners_sql_values() -> str:
    """VALUES list of every ring vertex (boundary_id, cx, cy)."""
    rows = []
    for bid, _, _, shape in BOUNDARY_SPECS:
        for ring in shape.rings():
            for x, y in ring:
                rows.append(f"({bid}, {x!r}, {y!r})")
    return ", ".join(rows)


def contains_sql_selects(source: str, lat_expr: str, lon_expr: str,
                         extra_cols: str = "url, seg_idx") -> str:
    """UNION-ALL of per-boundary selects keeping rows of ``source``
    whose (lat_expr, lon_expr) point lies inside the boundary."""
    parts = [
        f"SELECT {extra_cols}, {bid} AS boundary_id FROM {source} "
        f"WHERE {shape.sql(lat_expr, lon_expr)}"
        for bid, _, _, shape in BOUNDARY_SPECS
    ]
    return " UNION ALL ".join(parts)
