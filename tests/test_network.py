"""NetworkCalculator cut-geometry kernel (junction / connector /
orthogonal branches, parallel exclusion, snap-merge)."""

import numpy as np
import pyarrow as pa

from osm2world_ray.stages import network


def _cuts(doc_ids):
    batch = pa.table({"doc_id": pa.array(np.asarray(doc_ids, dtype=np.int64))})
    df = network.spokes_from_docs(batch, n_buckets=64).to_pandas()
    return network.junction_cuts(df).to_pandas()


def test_orthogonal_dead_end():
    # doc 4: deg = 1 + 4%4 = 1
    out = _cuts([4])
    assert list(out.case_code) == [3]
    r = out.iloc[0]
    assert (r.cx_udeg, r.cy_udeg) == (0, 0)
    # contacts symmetric about the node
    assert r.lx_udeg == -r.rx_udeg and r.ly_udeg == -r.ry_udeg


def test_straight_connector_right_normal():
    # doc 1: deg 2, 1%8 != 5 -> exactly opposite spokes
    out = _cuts([1])
    assert list(out.case_code) == [2, 2]
    # both cut points at the node, contacts symmetric
    assert (out.cx_udeg == 0).all() and (out.cy_udeg == 0).all()
    assert (out.lx_udeg == -out.rx_udeg).all()


def test_bent_connector_bisector():
    # doc 5: deg 2, 5%8 == 5 -> bent pair
    out = _cuts([5])
    assert list(out.case_code) == [2, 2]
    r0 = out[out.k == 0].iloc[0]
    # the cut direction must bisect: contact offset perpendicular-ish
    # to neither spoke alone; just assert determinism + symmetry
    assert r0.lx_udeg == -r0.rx_udeg and r0.ly_udeg == -r0.ry_udeg


def test_t_junction_parallel_pair_survives():
    # doc 0: 0%11 == 0 -> T junction with an exactly parallel east-west
    # pair; the kernel must not emit NaN-poisoned coordinates
    out = _cuts([0])
    assert list(sorted(out.k)) == [0, 1, 2]
    assert (out.case_code == 1).all()
    assert np.isfinite(out[["lx_udeg", "cx_udeg", "rx_udeg"]].to_numpy()).all()


def test_junction_contacts_meet_at_mitre():
    # doc 3: deg 4; adjacent interfaces that picked the same edge-line
    # intersection share a contact exactly (pre-snap distance 0)
    out = _cuts([3])
    assert len(out) == 4 and (out.case_code == 1).all()
    pts = set(zip(out.lx_udeg, out.ly_udeg)) | set(zip(out.rx_udeg, out.ry_udeg))
    # 4 interfaces x 2 contacts with at least one shared corner
    assert len(pts) < 8


def test_batch_split_invariance():
    # the bucket kernel sees all spokes of a node together; two docs in
    # one batch must produce the same rows as separate batches
    both = _cuts([3, 7]).sort_values(["url", "k"]).reset_index(drop=True)
    import pandas as pd

    sep = (
        pd.concat([_cuts([3]), _cuts([7])])
        .sort_values(["url", "k"])
        .reset_index(drop=True)
    )
    assert both.equals(sep)
