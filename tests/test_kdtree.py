"""Map2dTree k-d index: parity with GridIndex candidates."""

import numpy as np

from osm2world_ray.geo.gridindex import GridIndex
from osm2world_ray.geo.kdtree import KdTreeIndex


def _entries(n=200, seed=3):
    rng = np.random.default_rng(seed)
    cx = rng.uniform(0, 100, n)
    cy = rng.uniform(0, 100, n)
    w = rng.uniform(0.1, 5, n)
    h = rng.uniform(0.1, 5, n)
    return cx - w, cy - h, cx + w, cy + h


def _pairs_set(q, e):
    return set(zip(q.tolist(), e.tolist()))


def test_point_probe_parity_with_grid():
    minx, miny, maxx, maxy = _entries()
    kd = KdTreeIndex(minx, miny, maxx, maxy)
    gr = GridIndex(minx, miny, maxx, maxy, n_cells_hint=16)
    rng = np.random.default_rng(7)
    px = rng.uniform(-5, 105, 500)
    py = rng.uniform(-5, 105, 500)
    kq, ke = kd.probe_points(px, py)
    gq, ge = gr.probe_points(px, py)
    # both must produce exactly the bbox-containing pairs
    truth = set()
    for i in range(500):
        hits = np.flatnonzero(
            (minx <= px[i]) & (px[i] <= maxx) & (miny <= py[i]) & (py[i] <= maxy)
        )
        truth.update((i, int(h)) for h in hits)
    assert _pairs_set(kq, ke) == truth == _pairs_set(gq, ge)


def test_bbox_probe_complete_and_deduped():
    minx, miny, maxx, maxy = _entries(80)
    kd = KdTreeIndex(minx, miny, maxx, maxy)
    rng = np.random.default_rng(5)
    qx = rng.uniform(0, 100, 60)
    qy = rng.uniform(0, 100, 60)
    q, e = kd.probe_bbox(qx - 3, qy - 3, qx + 3, qy + 3)
    assert len(set(zip(q.tolist(), e.tolist()))) == len(q)  # deduped
    truth = set()
    for i in range(60):
        hits = np.flatnonzero(
            (minx <= qx[i] + 3) & (maxx >= qx[i] - 3)
            & (miny <= qy[i] + 3) & (maxy >= qy[i] - 3)
        )
        truth.update((i, int(h)) for h in hits)
    assert set(zip(q.tolist(), e.tolist())) == truth


def test_degenerate_stack_stays_leaf():
    """Identical entries can never shrink by 5 on a split — the tree
    must not recurse forever (Map2dTree.java improvement check)."""
    n = 50
    minx = np.zeros(n)
    miny = np.zeros(n)
    maxx = np.ones(n)
    maxy = np.ones(n)
    kd = KdTreeIndex(minx, miny, maxx, maxy)
    q, e = kd.probe_points(np.array([0.5]), np.array([0.5]))
    assert len(e) == n
