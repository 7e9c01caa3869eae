"""RoadModule lane/width derivation (RoadModuleTest is the reference
model; these cover the tag-driven rules, not the 3D scene)."""

import numpy as np

from osm2world_ray.functions import roads


def T(s):
    from osm2world_ray.functions.tags import parse_tags

    return dict(parse_tags(s))


def test_default_lanes():
    assert roads.default_lanes(T("highway=residential")) == 1
    assert roads.default_lanes(T("highway=motorway")) == 2
    assert roads.default_lanes(T("highway=primary")) == 2
    assert roads.default_lanes(T("highway=primary;oneway=yes")) == 1
    assert roads.default_lanes(T("highway=motorway_link")) == 1
    assert roads.default_lanes(T("highway=footway")) == 1


def test_lane_count_reconciliation():
    # both sides explicit: sum wins over lanes (RoadModule.java:889-896)
    assert roads.resolve_lane_counts(
        T("highway=primary;lanes=9;lanes:forward=2;lanes:backward=1")
    ) == (3, 2, 1)
    # one side explicit: max(total, side), remainder to the other
    assert roads.resolve_lane_counts(
        T("highway=primary;lanes=3;lanes:forward=2")) == (3, 2, 1)
    assert roads.resolve_lane_counts(
        T("highway=primary;lanes:forward=4")) == (4, 4, 0)
    # left-hand traffic swaps forward/backward keys
    assert roads.resolve_lane_counts(
        T("highway=primary;lanes:forward=2;lanes:backward=1"),
        right_hand=False) == (3, 1, 2)


def test_oneway():
    assert roads.is_oneway(T("highway=motorway"))
    assert not roads.is_oneway(T("highway=motorway;oneway=no"))
    assert roads.is_oneway(T("highway=residential;oneway=yes"))


def test_width_chain():
    # explicit width beats lane defaults (but not explicit lane sums)
    assert roads.road_width(T("highway=residential;width=6.5")) == 6.5
    # lanes tag -> default lane widths + dividers
    w = roads.road_width(T("highway=primary;lanes=4"))
    assert np.floor(w * 1e6 + 0.5) == 14300000
    # unmarked surface kills dividers
    assert roads.road_width(
        T("highway=residential;lanes=3;lane_markings=no")) == 10.5
    # class estimates
    assert roads.road_width(T("highway=path")) == 1.0
    assert roads.road_width(T("highway=track;surface=gravel")) == 2.5
    assert np.floor(
        roads.road_width(T("highway=motorway")) * 1e6 + 0.5) == 8850000


def test_sidewalk_and_cycleway_lanes():
    lanes = roads.lane_layout(T("highway=tertiary;sidewalk=both"))
    assert lanes.count(roads.KERB) == 2 and lanes.count(roads.SIDE) == 2
    # kerb suppressed by sidewalk:<side>:kerb=no (RoadModule.java:1045)
    lanes = roads.lane_layout(
        T("highway=tertiary;sidewalk=left;sidewalk:left:kerb=no"))
    assert lanes.count(roads.KERB) == 0 and lanes.count(roads.SIDE) == 1
    lanes = roads.lane_layout(T("highway=residential;cycleway=lane"))
    assert lanes.count(roads.CYCLE) == 2
