"""Terrain interpolator family kernels (no Ray needed).

Reference semantics: LinearInterpolator.java:18-50,
NaturalNeighborInterpolator.java:16-58, LeastSquaresInterpolator.java,
ZeroInterpolator.java, selection per O2WConfig.java:510-518.
"""

import numpy as np
import pyarrow as pa
import pytest

from osm2world_ray.geo.delaunay import Delaunay
from osm2world_ray.sources import synth
from osm2world_ray.stages.interpolators import (
    LeastSquaresInterpolate,
    LinearInterpolate,
    NaturalNeighborInterpolate,
    ZeroInterpolate,
    interpolator_for,
)


def _random_dt(n=80, seed=11):
    rng = np.random.default_rng(seed)
    x = rng.uniform(0, 10, n)
    y = rng.uniform(0, 10, n)
    z = 2.0 + 0.5 * x - 1.5 * y
    return x, y, z, Delaunay(x, y, z, pad=1.0)


def test_delaunay_empty_circle_property():
    x, y, z, dt = _random_dt()
    A = dt.finalize()
    tv, vx, vy = A["tv"], A["vx"], A["vy"]
    for t in range(len(tv)):
        i, j, k = tv[t]
        ax, ay = vx[i], vy[i]
        bx, by = vx[j], vy[j]
        cx, cy = vx[k], vy[k]
        assert (bx - ax) * (cy - ay) - (by - ay) * (cx - ax) > 0  # CCW
        for s in range(len(vx)):
            if s in (i, j, k):
                continue
            px, py = vx[s], vy[s]
            det = (
                ((ax - px) ** 2 + (ay - py) ** 2) * ((bx - px) * (cy - py) - (cx - px) * (by - py))
                - ((bx - px) ** 2 + (by - py) ** 2) * ((ax - px) * (cy - py) - (cx - px) * (ay - py))
                + ((cx - px) ** 2 + (cy - py) ** 2) * ((ax - px) * (by - py) - (bx - px) * (ay - py))
            )
            assert det <= 1e-9


def test_linear_and_sibson_reproduce_linear_field():
    x, y, z, dt = _random_dt()
    rng = np.random.default_rng(5)
    px = rng.uniform(2, 8, 200)
    py = rng.uniform(2, 8, 200)
    expected = 2.0 + 0.5 * px - 1.5 * py
    np.testing.assert_allclose(dt.interpolate_linear(px, py), expected, atol=1e-9)
    np.testing.assert_allclose(dt.natural_neighbor(px, py), expected, atol=1e-9)


def test_sibson_weights_are_local_and_convex():
    """On a nonlinear field, interior Sibson values stay within the
    min/max z of the sites (convex combination)."""
    rng = np.random.default_rng(4)
    x = rng.uniform(0, 10, 60)
    y = rng.uniform(0, 10, 60)
    z = np.sin(x) * np.cos(y) * 10.0
    dt = Delaunay(x, y, z, pad=1.0)
    px = rng.uniform(3, 7, 100)
    py = rng.uniform(3, 7, 100)
    v = dt.natural_neighbor(px, py)
    assert np.all(v >= z.min() - 1e-9) and np.all(v <= z.max() + 1e-9)


def test_sibson_continuity_at_site():
    x, y, _, _ = _random_dt()
    z = np.cos(x * y)
    dt = Delaunay(x, y, z, pad=1.0)
    v = dt.natural_neighbor(np.array([x[10] + 1e-9]), np.array([y[10] + 1e-9]))
    assert abs(v[0] - z[10]) < 1e-5


def test_outside_hull_pulls_toward_padded_corner_zero():
    """Probes between the site hull and the padded bbox interpolate
    against the bbox corner vertices at elevation 0
    (DelaunayTriangulation.java:486-495)."""
    x = np.array([4.0, 6.0, 5.0])
    y = np.array([4.0, 4.0, 6.0])
    z = np.array([100.0, 100.0, 100.0])
    dt = Delaunay(x, y, z, pad=10.0)
    inside = dt.interpolate_linear(np.array([5.0]), np.array([4.5]))[0]
    far_out = dt.interpolate_linear(np.array([5.0]), np.array([14.0]))[0]
    assert abs(inside - 100.0) < 1e-9
    assert far_out < 30.0


def test_outside_bbox_is_nan():
    x, y, z, dt = _random_dt()
    v = dt.interpolate_linear(np.array([100.0]), np.array([100.0]))
    assert np.isnan(v[0])


def _sites_table(field):
    lon, lat, _ = synth.interp_sites()
    return pa.table({"x": lon, "y": lat, "z": field(lat, lon)})


def test_lsq_quadratic_precision():
    st = LeastSquaresInterpolate(_sites_table(synth.field_quad))
    assert st.ok.all()
    rng = np.random.default_rng(9)
    qlon = rng.uniform(-9, 9, 300)
    qlat = rng.uniform(41, 49, 300)
    np.testing.assert_allclose(
        st.probe(qlon, qlat), synth.field_quad(qlat, qlon), atol=1e-8
    )


def test_lsq_coeff_guard_discards_degenerate_sites():
    """Nearly-collinear neighborhoods blow up the fitted coefficients;
    those sites must lose their polynomial
    (LeastSquaresInterpolator.java:94-100)."""
    n = 12
    x = np.linspace(0, 1, n)
    y = x * 1e-9  # nearly collinear
    z = np.ones(n)
    t = pa.table({"x": x, "y": y, "z": z})
    st = LeastSquaresInterpolate(t)
    assert not st.ok.all()


def test_registry_matches_o2wconfig():
    from osm2world_ray.stages.raster import IDWInterpolate

    assert interpolator_for("LinearInterpolator") is LinearInterpolate
    assert interpolator_for("LeastSquaresInterpolator") is LeastSquaresInterpolate
    assert interpolator_for("NaturalNeighborInterpolator") is NaturalNeighborInterpolate
    assert interpolator_for("InverseDistanceWeightingInterpolator") is IDWInterpolate
    assert interpolator_for("") is ZeroInterpolate  # default
    assert interpolator_for("unknown") is ZeroInterpolate


def test_zero_interpolator_stage():
    st = ZeroInterpolate()
    batch = pa.table(
        {
            "url": ["a", "b"],
            "mention_idx": [0, 1],
            "lat": [45.0, 46.0],
            "lon": [1.0, 2.0],
        }
    )
    out = st(batch)
    assert out["ele_mm"].to_pylist() == [0, 0]


def test_empty_sites_raises():
    with pytest.raises(ValueError):
        Delaunay(np.array([]), np.array([]), np.array([]))


def test_duplicate_sites_are_skipped_not_corrupting():
    """Duplicate site coordinates hit the degenerate-cavity guard and
    are skipped; the mesh stays valid and probes still work."""
    x = np.array([0.0, 1.0, 0.0, 1.0, 0.5, 0.5])  # one duplicate point
    y = np.array([0.0, 0.0, 1.0, 1.0, 0.5, 0.5])
    z = 1.0 + x + y
    dt = Delaunay(x, y, z, pad=1.0)
    v = dt.interpolate_linear(np.array([0.25]), np.array([0.25]))
    assert abs(v[0] - 1.5) < 1e-9
