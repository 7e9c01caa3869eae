"""Ring assembly kernels (MultipolygonAreaBuilder semantics)."""

import numpy as np

from osm2world_ray.stages.rings import (
    REL_TEMPLATES,
    _NODE_OFFSETS,
    _build_rings,
    _try_add,
    assemble_relation,
)

COORDS = {n: (la, lo) for n, (la, lo) in _NODE_OFFSETS.items()}


def test_try_add_all_four_attachment_cases():
    r = [1, 2, 3]
    assert _try_add(r, [3, 4]) and r == [1, 2, 3, 4]          # end, forward
    r = [1, 2, 3]
    assert _try_add(r, [4, 3]) and r == [1, 2, 3, 4]          # end, reversed
    r = [1, 2, 3]
    assert _try_add(r, [0, 1]) and r == [0, 1, 2, 3]          # start, forward
    r = [1, 2, 3]
    assert _try_add(r, [1, 0]) and r == [0, 1, 2, 3]          # start, reversed
    r = [1, 2, 3]
    assert not _try_add(r, [7, 8]) and r == [1, 2, 3]


def test_build_rings_closes_split_ways():
    rings = _build_rings([[0, 1, 2], [10, 11, 12, 13, 10], [0, 3, 2]])
    assert rings is not None and len(rings) == 2
    closed = [r for r in rings if len(r) == 5 and set(r) == {10, 11, 12, 13}]
    assert len(closed) == 1
    outer = [r for r in rings if set(r) == {0, 1, 2, 3}][0]
    assert outer[0] == outer[-1]


def test_build_rings_unclosable_returns_none():
    assert _build_rings([[0, 1, 2], [2, 3]]) is None


def test_assemble_simple_two_holes():
    # mp_two_holes analogue: outer minus both holes, relation tag source
    out = assemble_relation(10, REL_TEMPLATES[0], COORDS)
    assert len(out) == 1
    hc, nn, area, is_rel = out[0]
    assert (hc, nn, is_rel) == (2, 4, 1)
    assert abs(area - 0.215) < 1e-12
    # odd doc -> outer way is the tag source (is_relation = 0)
    assert assemble_relation(11, REL_TEMPLATES[0], COORDS)[0][3] == 0


def test_assemble_island_in_hole_two_areas():
    out = sorted(assemble_relation(3, REL_TEMPLATES[3], COORDS))
    assert len(out) == 2
    assert out[0][:2] == (0, 4) and abs(out[0][2] - 0.005) < 1e-12  # island
    assert out[1][:2] == (1, 4) and abs(out[1][2] - 0.22) < 1e-12  # outer-hole


def test_assemble_two_outers():
    out = sorted(assemble_relation(2, REL_TEMPLATES[2], COORDS))
    assert len(out) == 2
    assert abs(out[0][2] - 0.06) < 1e-12
    assert abs(out[1][2] - 0.22) < 1e-12


def test_assemble_invalid_is_empty():
    assert assemble_relation(4, REL_TEMPLATES[4], COORDS) == []


def test_assembly_translation_invariant():
    far = {n: (la + 49.123456, lo - 7.654321) for n, (la, lo) in COORDS.items()}
    a = assemble_relation(10, REL_TEMPLATES[0], COORDS)[0][2]
    b = assemble_relation(10, REL_TEMPLATES[0], far)[0][2]
    assert abs(a - b) < 1e-10
