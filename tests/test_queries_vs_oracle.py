"""Engine-vs-DuckDB oracle equality for every registered query with SQL
(the local mirror of the driver's CORRECTNESS gate, at sf0.001)."""

import pytest

from osm2world_ray.pipelines import queries as Q

from .util_compare import assert_query_matches


def _names():
    return sorted(Q.ORACLES.keys())


@pytest.mark.parametrize("name", _names())
def test_query_matches_oracle(name, ray_session, sf_smoke):
    assert_query_matches(name, sf_smoke)
