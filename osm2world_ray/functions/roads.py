"""RoadModule lane/width derivation as a data operator.

Reference semantics: ``core/.../world/modules/RoadModule.java`` —
the Road world-module's tag-driven lane layout and width computation,
re-expressed over plain tag dicts (no 3D scene):

- ``is_path`` (:149-157), ``is_oneway`` (:159-165),
  ``default_lanes`` (:166-181);
- vehicle lane-count resolution from ``lanes`` /
  ``lanes:forward`` / ``lanes:backward`` with the max/subtraction
  reconciliation (:856-925);
- basic lane layout: central divider rules incl. ``divider`` tag,
  unmarked-surface and overtaking inference (:823-969), intra-part
  dashed dividers (:983-1007), cycleway lanes (:1013-1024),
  kerb+sidewalk lanes (:1039-1065);
- width: lane-sum > explicit ``width`` tag > lane-based default sum
  when lane tagging exists > non-vehicle sum + per-class estimate
  (``calculateWidth`` :1190-1218, ``calculateLaneBasedWidth``
  :1232-1254, ``estimateVehicleLanesWidth`` :1260-1295).

Lane default widths keep the reference's float32 literal artifacts
(``parseWidth(laneTags, 0.1f)`` etc.) so micro-unit snaps agree with a
hand-derived oracle bit for bit.
"""

from __future__ import annotations

import numpy as np

from . import parsers

#: RoadModule.java:772 (3.5f is exact in binary)
DEFAULT_LANE_WIDTH = 3.5
#: float32 literal defaults of the lane types (RoadModule.java:2123-2268)
W_LINE = float(np.float32(0.1))      # SOLID_LINE / DASHED_LINE
W_KERB = float(np.float32(0.15))     # KERB
W_CYCLEWAY = 1.5                     # CYCLEWAY (1.5f exact)
W_SIDEWALK = 1.0                     # SIDEWALK (1.0f exact)

_PATH_VALUES = {"path", "footway", "cycleway", "bridleway", "steps"}
_DEFAULT_ONE_LANE = {"service", "track", "residential", "living_street",
                     "pedestrian", "platform"}
_UNMARKED_SURFACES = {"earth", "gravel", "ice", "pebblestone", "rock",
                      "sand", "snow"}

# lane kinds (width bookkeeping only; rendering is out of scope)
VEHICLE, LINE, CYCLE, KERB, SIDE = range(5)
_LANE_WIDTH = {VEHICLE: None, LINE: W_LINE, CYCLE: W_CYCLEWAY,
               KERB: W_KERB, SIDE: W_SIDEWALK}


def is_path(tags: dict) -> bool:
    return tags.get("highway") in _PATH_VALUES


def is_oneway(tags: dict) -> bool:
    return tags.get("oneway") == "yes" or (
        tags.get("oneway") != "no"
        and tags.get("highway") in ("motorway", "motorway_link")
    )


def default_lanes(tags: dict) -> int:
    hv = tags.get("highway")
    if (hv is None or is_path(tags) or hv.endswith("_link")
            or hv in _DEFAULT_ONE_LANE):
        return 1
    if hv == "motorway":
        return 2
    return 1 if is_oneway(tags) else 2


def resolve_lane_counts(tags: dict, *, right_hand: bool = True):
    """-> (vehicle_total, right, left) per RoadModule.java:856-925."""
    lanes = parsers.parse_osm_decimal(tags.get("lanes"), parsers.POSITIVE)
    right_key = "lanes:forward" if right_hand else "lanes:backward"
    left_key = "lanes:backward" if right_hand else "lanes:forward"
    lanes_right = parsers.parse_osm_decimal(tags.get(right_key),
                                            parsers.POSITIVE)
    lanes_left = parsers.parse_osm_decimal(tags.get(left_key),
                                           parsers.POSITIVE)
    if lanes_right is not None and lanes_left is not None:
        r, l = int(lanes_right), int(lanes_left)
        return r + l, r, l
    total = default_lanes(tags) if lanes is None else int(lanes)
    if lanes_right is not None:
        r = int(lanes_right)
        total = max(total, r)
        return total, r, total - r
    if lanes_left is not None:
        l = int(lanes_left)
        total = max(total, l)
        return total, total - l, l
    l = total // 2
    return total, total - l, l


def _unmarked(tags: dict) -> bool:
    lm = tags.get("lane_markings")
    if lm == "yes":
        return False
    if lm == "no":
        return True
    return tags.get("surface") in _UNMARKED_SURFACES


def lane_layout(tags: dict, *, right_hand: bool = True) -> list[int]:
    """Flat lane-kind list (left to right makes no width difference):
    the basic layout of RoadModule.buildBasicLaneLayout minus bus bays
    (not modeled — none of the width chain's defaults differ).

    Supported input scope: the unmarked-lanes rule reads the raw
    ``surface`` tag only — the reference's getSurfaceForRoad would also
    derive a surface from ``tracktype`` and consult
    ``sidewalk:both:kerb``; neither occurs in the synth tag space."""
    total, r, l = resolve_lane_counts(tags, right_hand=right_hand)
    unmarked = _unmarked(tags)
    lanes: list[int] = []
    # central divider (:933-969)
    if r > 0 and l > 0:
        divider = tags.get("divider")
        if divider in ("dashed_line", "solid_line"):
            lanes.append(LINE)
        elif divider == "no" or unmarked:
            pass
        else:
            ov_fwd = tags.get("overtaking:forward") == "yes" or (
                tags.get("overtaking:forward") != "no"
                and tags.get("overtaking") not in ("backward", "no"))
            ov_bwd = tags.get("overtaking:backward") == "yes" or (
                tags.get("overtaking:backward") != "no"
                and tags.get("overtaking") not in ("forward", "no"))
            lanes.append(LINE)  # solid or dashed: same default width
            del ov_fwd, ov_bwd  # type is width-equivalent either way
    # vehicle lanes + intra-part dividers (:973-1007)
    for part in (r, l):
        for i in range(part):
            if i > 0 and not unmarked:
                lanes.append(LINE)
            lanes.append(VEHICLE)
    # cycleway lanes (:1013-1024)
    cyc = tags.get("cycleway") == "lane"
    if cyc or tags.get("cycleway:left") == "lane":
        lanes += [LINE, CYCLE]
    if cyc or tags.get("cycleway:right") == "lane":
        lanes += [LINE, CYCLE]
    # kerb + sidewalk (:1039-1065)
    for side in ("left", "right"):
        if tags.get("sidewalk") in (side, "both"):
            if tags.get(f"sidewalk:{side}:kerb") != "no":
                lanes.append(KERB)
            lanes.append(SIDE)
    return lanes


def _lane_based_width(lanes: list[int], *, use_defaults: bool,
                      ignore_vehicle: bool) -> float | None:
    width = 0.0
    for kind in lanes:
        if kind == VEHICLE and ignore_vehicle:
            continue
        w = _LANE_WIDTH[kind]
        if w is None:
            if not use_defaults:
                return None
            w = DEFAULT_LANE_WIDTH
        width += w
    return width


def _estimate_vehicle_lanes_width(tags: dict) -> float:
    """RoadModule.java:1260-1295."""
    hv = tags.get("highway")
    if "lanes" in tags or "divider" in tags:
        return 0.0
    if is_path(tags):
        return 1.0
    if hv == "track":
        return min(2.5, DEFAULT_LANE_WIDTH)
    if hv == "service":
        return (DEFAULT_LANE_WIDTH * 0.8
                if tags.get("service") == "parking_aisle"
                else DEFAULT_LANE_WIDTH)
    if hv in ("primary", "secondary"):
        return 2 * DEFAULT_LANE_WIDTH
    if hv == "motorway":
        return float(np.float32(2.5)) * DEFAULT_LANE_WIDTH
    if "oneway" in tags and tags["oneway"] != "no":
        return DEFAULT_LANE_WIDTH
    return 4.0


def road_width(tags: dict, *, right_hand: bool = True) -> float:
    """calculateWidth chain (RoadModule.java:1190-1218)."""
    lanes = lane_layout(tags, right_hand=right_hand)
    sum_width = _lane_based_width(lanes, use_defaults=False,
                                  ignore_vehicle=False)
    if sum_width is not None:
        return sum_width
    explicit = parsers.parse_measure(tags.get("width"))
    if explicit is not None:
        return explicit
    if any(k in tags for k in ("lanes", "lanes:forward", "lanes:backward",
                               "divider")):
        return _lane_based_width(lanes, use_defaults=True,
                                 ignore_vehicle=False)
    return (_lane_based_width(lanes, use_defaults=True, ignore_vehicle=True)
            + _estimate_vehicle_lanes_width(tags))


def derive_road(tag_str: str) -> tuple[str, int, int, int, int, int]:
    """tag string -> (highway, lane_count, lanes_right, lanes_left,
    oneway, width_um). The per-variant unit the vectorized stage
    precomputes once (style_materials precedent)."""
    from . import tags as T

    tags = dict(T.parse_tags(tag_str))
    total, r, l = resolve_lane_counts(tags)
    width = road_width(tags)
    return (
        tags.get("highway", ""),
        total, r, l,
        int(is_oneway(tags)),
        int(np.floor(width * 1e6 + 0.5)),
    )
