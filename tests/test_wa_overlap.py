"""Way-segment x area overlap kernels (addOverlapBetween(MapWaySegment, MapArea))."""

import numpy as np
import pyarrow as pa

from osm2world_ray.geo import wkb
from osm2world_ray.stages.wa_overlap import WAOverlapJoin


def _boundaries():
    """One square boundary with a hole, id 1."""
    outer = np.array([[0.0, 0.0], [4.0, 0.0], [4.0, 4.0], [0.0, 4.0]])
    hole = np.array([[1.5, 1.5], [2.5, 1.5], [2.5, 2.5], [1.5, 2.5]])
    return pa.table(
        {
            "boundary_id": pa.array([1], type=pa.int64()),
            "name": pa.array(["sq"]),
            "kind": pa.array(["admin"]),
            "wkb": pa.array([wkb.encode_polygon([outer, hole])], type=pa.binary()),
        }
    )


def _run(segs):
    join = WAOverlapJoin(_boundaries())
    batch = pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(len(segs))]),
            "seg_idx": pa.array(np.arange(len(segs), dtype=np.int64)),
            "x1": pa.array([s[0] for s in segs]),
            "y1": pa.array([s[1] for s in segs]),
            "x2": pa.array([s[2] for s in segs]),
            "y2": pa.array([s[3] for s in segs]),
        }
    )
    out = join(batch)
    return [
        (out["url"][i].as_py(), out["ov_type"][i].as_py(),
         out["ix_udeg"][i].as_py(), out["iy_udeg"][i].as_py())
        for i in range(len(out))
    ]


def test_share_segment_short_circuit():
    rows = _run([(0.0, 0.0, 4.0, 0.0)])  # exactly the bottom edge
    assert rows == [("u0", "SHARE_SEGMENT", -1, -1)]
    # reversed direction still shares both nodes
    rows = _run([(4.0, 0.0, 0.0, 0.0)])
    assert rows[0][1] == "SHARE_SEGMENT"


def test_unconnected_contain_and_hole_exclusion():
    rows = _run([(0.5, 0.5, 1.2, 0.8)])  # fully inside, outside hole
    assert rows == [("u0", "CONTAIN", -1, -1)]
    # fully inside the HOLE -> no overlap at all
    assert _run([(1.7, 1.7, 2.3, 2.3)]) == []


def test_unconnected_intersect_positions():
    rows = _run([(-1.0, 1.0, 1.0, 1.0)])  # crosses the left edge at (0,1)
    assert len(rows) == 1
    assert rows[0][1] == "INTERSECT"
    assert (rows[0][2], rows[0][3]) == (0, 1_000_000)
    # crossing INTO the hole: two positions (outer edge + hole edge)
    rows = _run([(-1.0, 2.0, 2.0, 2.0)])
    kinds = sorted((r[2], r[3]) for r in rows)
    assert [r[1] for r in rows] == ["INTERSECT", "INTERSECT"]
    assert kinds == [(0, 2_000_000), (1_500_000, 2_000_000)]


def test_connected_corner_touch_is_contain_by_center():
    """Segment starting AT the boundary corner pointing inward: the
    touch position is within segLength/100 of the endpoint, so it is
    not a true intersection; the CENTER is probed -> CONTAIN."""
    rows = _run([(0.0, 0.0, 1.0, 1.0)])
    assert rows == [("u0", "CONTAIN", -1, -1)]
    # pointing OUTWARD from the corner: center outside -> nothing
    assert _run([(0.0, 0.0, -1.0, -1.0)]) == []


def test_disjoint_is_nothing():
    assert _run([(10.0, 10.0, 11.0, 11.0)]) == []
