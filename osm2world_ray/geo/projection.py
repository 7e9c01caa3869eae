"""Scaled-Mercator metric projection with millimeter snapping.

Semantics follow the reference's ``MetricMapProjection``
(``core/src/main/java/org/osm2world/math/geo/MetricMapProjection.java:29-63``
over ``MercatorProjection.java:25-50``): lat/lon -> local planar meters
with X=east, Z=north, ~1 unit = 1 m near the origin, origin-relative so
doubles stay dense, and **snap-to-millimeter rounding** — the
reference's determinism device that we keep so distributed and
single-process runs produce bit-identical coordinates.

Implementation is our own: spherical Mercator scaled by cos(lat0) at
the origin; not a translation of the Java code.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np

#: mean Earth radius in meters (spherical model).
EARTH_RADIUS_M = 6_371_000.0

#: snap quantum: 1 mm (MetricMapProjection.java:37-40).
SNAP_M = 0.001


def snap_mm(v: np.ndarray) -> np.ndarray:
    """Round to the nearest millimeter (ties-to-even like Math.round? No:
    we use round-half-away-from-zero via floor(x+0.5) on the scaled value,
    which matches ``Math.round`` for positive and is fully deterministic)."""
    v = np.asarray(v, dtype=np.float64)
    return np.floor(v * 1000.0 + 0.5) / 1000.0


def snap_mm_int(v: np.ndarray) -> np.ndarray:
    """Millimeter-integer form (exact int64) — preferred in outputs so
    oracle comparisons never touch float equality."""
    v = np.asarray(v, dtype=np.float64)
    return np.floor(v * 1000.0 + 0.5).astype(np.int64)


def _merc_y(lat_rad: np.ndarray) -> np.ndarray:
    return np.log(np.tan(lat_rad) + 1.0 / np.cos(lat_rad))


@dataclass(frozen=True)
class MetricProjection:
    """lat/lon <-> local planar meters around (lat0, lon0)."""

    lat0: float
    lon0: float

    def _scale(self) -> float:
        return EARTH_RADIUS_M * float(np.cos(np.radians(self.lat0)))

    def to_xz(self, lat: np.ndarray, lon: np.ndarray):
        """Forward projection -> (x_east_m, z_north_m), mm-snapped."""
        lat = np.asarray(lat, dtype=np.float64)
        lon = np.asarray(lon, dtype=np.float64)
        s = self._scale()
        x = s * np.radians(lon - self.lon0)
        z = s * (_merc_y(np.radians(lat)) - _merc_y(np.float64(np.radians(self.lat0))))
        return snap_mm(x), snap_mm(z)

    def to_xz_mm(self, lat: np.ndarray, lon: np.ndarray):
        """Forward projection as exact millimeter int64 (x_mm, z_mm)."""
        lat = np.asarray(lat, dtype=np.float64)
        lon = np.asarray(lon, dtype=np.float64)
        s = self._scale()
        x = s * np.radians(lon - self.lon0)
        z = s * (_merc_y(np.radians(lat)) - _merc_y(np.float64(np.radians(self.lat0))))
        return snap_mm_int(x), snap_mm_int(z)

    def to_lat_lon(self, x: np.ndarray, z: np.ndarray):
        """Inverse projection (from snapped meters back to lat/lon)."""
        x = np.asarray(x, dtype=np.float64)
        z = np.asarray(z, dtype=np.float64)
        s = self._scale()
        lon = self.lon0 + np.degrees(x / s)
        y0 = _merc_y(np.float64(np.radians(self.lat0)))
        lat = np.degrees(np.arctan(np.sinh(z / s + y0)))
        return lat, lon
