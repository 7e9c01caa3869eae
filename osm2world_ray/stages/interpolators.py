"""Terrain interpolator family as build-once/probe-many actor stages.

Reference semantics: ``TerrainInterpolator`` implementations selected by
the ``terrainInterpolator`` config key (``O2WConfig.java:510-518``;
default ``ZeroInterpolator``):

- ``LinearInterpolator.java:18-50`` — Delaunay triangulation of the
  sites, plane of the enclosing triangle per probe.
- ``NaturalNeighborInterpolator.java:16-58`` — Sibson natural-neighbor
  weights from the same triangulation.
- ``LeastSquaresInterpolator.java`` — per-site 6-coefficient quadratic
  fit over the 9 nearest sites (QR least squares; any |coeff| > 10e3
  discards the site's polynomial, :94-100), probe = average of the 29
  nearest fitted polynomials weighted by ``max(1 - d/r_w, 0)``
  (:117-135; reference r_w = 120 m — here a constructor parameter
  because our site space is degrees, not meters).
- ``ZeroInterpolator.java`` — constant 0.
- ``InverseDistanceWeightingInterpolator`` lives in
  :mod:`osm2world_ray.stages.raster` (3x3 grid-cell probe shape).

Ray shape: the sites table is broadcast once (``ray.put``); each actor
builds its triangulation / fitted polynomials in ``__init__`` (once per
actor, the ``setKnownSites`` analogue) and probes each batch vectorized
in ``__call__``. At cluster scale the site side is a bounded raster
region per probe partition (SRTM-tile-sized), so the broadcast stays
small no matter how large the probe stream is.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from ..geo.delaunay import Delaunay
from ._util import resolve_ref as _resolve

#: |coeff| guard from LeastSquaresInterpolator.java:94-100
_COEFF_LIMIT = 10e3
_SITES_FOR_APPROX = 9
_SITES_FOR_INTERPOL = 29


def _snap(v: np.ndarray, unit: float) -> np.ndarray:
    return np.floor(v * unit + 0.5).astype(np.int64)


class _ProbeStage:
    """Common batch plumbing: (url, mention_idx, lat, lon) -> ele col."""

    out_col = "ele_mm"
    unit = 1000.0

    def __call__(self, batch: pa.Table) -> pa.Table:
        lat = batch["lat"].to_numpy(zero_copy_only=False)
        lon = batch["lon"].to_numpy(zero_copy_only=False)
        ele = self.probe(lon, lat)
        return pa.table(
            {
                "url": batch["url"],
                "mention_idx": batch["mention_idx"],
                self.out_col: pa.array(_snap(ele, self.unit)),
            }
        )


class LinearInterpolate(_ProbeStage):
    """Delaunay + enclosing-triangle plane (LinearInterpolator.java)."""

    def __init__(self, sites_ref, *, pad: float = 1.0):
        t = _resolve(sites_ref)
        x = t["x"].to_numpy()
        y = t["y"].to_numpy()
        z = t["z"].to_numpy()
        self.dt = Delaunay(x, y, z, pad=pad)
        self.dt.finalize()

    def probe(self, x, y):
        return self.dt.interpolate_linear(x, y)


class NaturalNeighborInterpolate(_ProbeStage):
    """Sibson weights from the shared Delaunay kernel
    (NaturalNeighborInterpolator.java:44-57)."""

    def __init__(self, sites_ref, *, pad: float = 1.0):
        t = _resolve(sites_ref)
        self.dt = Delaunay(t["x"].to_numpy(), t["y"].to_numpy(), t["z"].to_numpy(), pad=pad)
        self.dt.finalize()

    def probe(self, x, y):
        return self.dt.natural_neighbor(x, y)


class LeastSquaresInterpolate(_ProbeStage):
    """Per-site quadratic fit + distance-weighted polynomial average.

    Build (once per actor): 9-NN per site via a full vectorized distance
    computation (the site side is bounded — see module docstring), then
    a batched ``lstsq`` per site. Probe: 29-NN among sites that kept a
    polynomial, weights ``max(1 - d/r_w, 0)``, weighted mean of the
    polynomial evaluations at the probe position.
    """

    out_col = "ele_cm"
    unit = 100.0

    def __init__(self, sites_ref, *, r_w: float = 3.0):
        t = _resolve(sites_ref)
        self.sx = t["x"].to_numpy().astype(np.float64)
        self.sy = t["y"].to_numpy().astype(np.float64)
        sz = t["z"].to_numpy().astype(np.float64)
        self.r_w = float(r_w)
        n = len(self.sx)
        k = min(_SITES_FOR_APPROX, n)
        d2 = (self.sx[:, None] - self.sx[None, :]) ** 2 + (
            self.sy[:, None] - self.sy[None, :]
        ) ** 2
        nn = np.argpartition(d2, k - 1, axis=1)[:, :k]
        self.coeffs = np.full((n, 6), np.nan)
        ok = np.zeros(n, dtype=bool)
        for i in range(n):
            xs, ys = self.sx[nn[i]], self.sy[nn[i]]
            a = np.stack(
                [np.ones(k), xs, ys, xs * xs, xs * ys, ys * ys], axis=1
            )  # populateMatrix basis, LeastSquaresInterpolator.java:234-244
            # QR solve (QRDecomposition, :91-93): unlike SVD lstsq, a
            # near-singular neighborhood yields huge coefficients here,
            # which is exactly what the |coeff| guard screens out
            q, r = np.linalg.qr(a)
            try:
                c = np.linalg.solve(r, q.T @ sz[nn[i]])
            except np.linalg.LinAlgError:
                continue
            if np.all(np.isfinite(c)) and np.all(np.abs(c) <= _COEFF_LIMIT):
                self.coeffs[i] = c
                ok[i] = True
        self.ok = ok

    def probe(self, x, y):
        x = np.asarray(x, dtype=np.float64)
        y = np.asarray(y, dtype=np.float64)
        okx, oky = self.sx[self.ok], self.sy[self.ok]
        okc = self.coeffs[self.ok]
        k = min(_SITES_FOR_INTERPOL, len(okx))
        d2 = (x[:, None] - okx[None, :]) ** 2 + (y[:, None] - oky[None, :]) ** 2
        nn = np.argpartition(d2, k - 1, axis=1)[:, :k]
        d = np.sqrt(np.take_along_axis(d2, nn, axis=1))
        w = np.maximum(1.0 - d / self.r_w, 0.0)
        c = okc[nn]  # (batch, k, 6)
        basis = np.stack(
            [np.ones_like(x), x, y, x * x, x * y, y * y], axis=1
        )  # (batch, 6)
        vals = np.einsum("bkc,bc->bk", c, basis)
        wsum = w.sum(axis=1)
        # all fitted sites >= r_w away -> zero weight mass; fall back to the
        # nearest fitted site's polynomial instead of NaN->int64 garbage
        # (per-row fault-tolerance convention)
        dead = wsum == 0.0
        if dead.any():
            nearest = vals[dead, np.argmin(d[dead], axis=1)]
            wsum = np.where(dead, 1.0, wsum)
            out = (w * vals).sum(axis=1) / wsum
            out[dead] = nearest
            return out
        return (w * vals).sum(axis=1) / wsum


class ZeroInterpolate(_ProbeStage):
    """ZeroInterpolator.java — constant 0 (config default)."""

    def __init__(self, sites_ref=None):
        pass

    def probe(self, x, y):
        return np.zeros(len(x))


#: terrainInterpolator config registry (O2WConfig.java:510-518).
#: "InverseDistanceWeightingInterpolator" maps to the raster-stage IDW.
def interpolator_for(name: str):
    from .raster import IDWInterpolate

    return {
        "LinearInterpolator": LinearInterpolate,
        "LeastSquaresInterpolator": LeastSquaresInterpolate,
        "NaturalNeighborInterpolator": NaturalNeighborInterpolate,
        "InverseDistanceWeightingInterpolator": IDWInterpolate,
    }.get(name, ZeroInterpolate)
