"""The x-interval sweep must generate exactly the x-overlapping pairs
the blocked all-pairs path would (each unordered pair once), across
chunk boundaries."""

import numpy as np
from hypothesis import given, settings
from hypothesis import strategies as st

from osm2world_ray.stages.overlaps import _sweep_pair_chunks


def _reference_pairs(minx, maxx, s, e):
    out = set()
    for i in range(s, e):
        for j in range(s, e):
            if i < j and minx[i] <= maxx[j] and minx[j] <= maxx[i]:
                out.add((i, j))
    return out


@settings(max_examples=50, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.floats(-10, 10, allow_nan=False),
            st.floats(0, 3, allow_nan=False),
        ),
        min_size=2,
        max_size=60,
    ),
    st.integers(1, 64),
)
def test_sweep_equals_all_pairs(spans, cap):
    minx = np.array([a for a, _ in spans])
    maxx = minx + np.array([w for _, w in spans])
    got = set()
    for I, J in _sweep_pair_chunks(minx, maxx, 0, len(spans), cap=cap):
        for i, j in zip(I, J):
            got.add((min(i, j), max(i, j)))
    assert got == _reference_pairs(minx, maxx, 0, len(spans))


def test_sweep_subrange_and_duplicates():
    minx = np.array([0.0, 0.0, 0.0, 5.0, 5.0, 0.5])
    maxx = np.array([1.0, 1.0, 1.0, 6.0, 6.0, 0.6])
    got = set()
    for I, J in _sweep_pair_chunks(minx, maxx, 1, 5, cap=2):
        for i, j in zip(I, J):
            got.add((min(i, j), max(i, j)))
    assert got == _reference_pairs(minx, maxx, 1, 5)
