"""O2WConfig strategy registry + typed getters."""

from osm2world_ray.functions.config import O2WConfig
from osm2world_ray.geo.projection import MetricProjection
from osm2world_ray.stages.interpolators import (
    LeastSquaresInterpolate,
    LinearInterpolate,
    NaturalNeighborInterpolate,
    ZeroInterpolate,
)


def test_terrain_interpolator_selection():
    assert O2WConfig().terrain_interpolator() is ZeroInterpolate  # default
    assert (
        O2WConfig({"terrainInterpolator": "LinearInterpolator"}).terrain_interpolator()
        is LinearInterpolate
    )
    assert (
        O2WConfig({"terrainInterpolator": "NaturalNeighborInterpolator"})
        .terrain_interpolator()
        is NaturalNeighborInterpolate
    )
    assert (
        O2WConfig({"terrainInterpolator": "LeastSquaresInterpolator"})
        .terrain_interpolator()
        is LeastSquaresInterpolate
    )
    # unknown names fall back to the default, never fail
    assert O2WConfig({"terrainInterpolator": "???"}).terrain_interpolator() is ZeroInterpolate


def test_ele_calculator_default_and_names():
    assert O2WConfig().ele_calculator() == "BridgeTunnelEleCalculator"
    assert (
        O2WConfig({"eleCalculator": "NoOpEleCalculator"}).ele_calculator()
        == "NoOpEleCalculator"
    )
    assert O2WConfig({"eleCalculator": "bogus"}).ele_calculator() == "BridgeTunnelEleCalculator"


def test_map_projection_factory():
    assert O2WConfig().map_projection() is MetricProjection


def test_typed_getters_and_overrides():
    c = O2WConfig({"maxLogEntries": "7", "flag": "TRUE", "ratio": "1.5"})
    assert c.max_log_entries() == 7
    assert c.get_bool("flag") is True
    assert c.get_float("ratio", 0.0) == 1.5
    assert c.get_int("maxLogEntries", 0) == 7
    assert c.canvas_limit() == 1024  # default (O2WConfig.java:317-319)
    c2 = c.with_overrides(canvasLimit=256)
    assert c2.canvas_limit() == 256 and c.canvas_limit() == 1024
    assert O2WConfig({"maxLogEntries": "x"}).max_log_entries() == 100
