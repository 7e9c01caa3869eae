"""TagSet + HardcodedRuleset semantics.

References:
- ``TagSet`` (``map_data/data/TagSet.java:18-237``): string->string map
  with UNIQUE keys (duplicate-key rejection ``:30-36``), stored sorted
  by key (``:28``), predicate accessors (``getValue``, ``contains``,
  ``containsKey``, ``containsAny``).
- ``HardcodedRuleset`` (``osm/ruleset/HardcodedRuleset.java:15-134``):
  constant lookup sets — ``isAreaTag`` = key in areaKeys OR (key,value)
  in areaTags (which includes ``SurfaceAreaModule.defaultSurfaceMap``
  keys, ``SurfaceAreaModule.java:44-60``); land/sea tag sets; the
  relation-type whitelist + multipolygon main-tag check
  (``isRelevantRelation`` ``:113-133``).
- area-vs-way classification (``OSMToMapDataConverter.java:240-261``):
  closed AND not ``area=no`` AND any tag is an area tag -> area.

All sets are frozen module constants (compiled once per worker); batch
predicates evaluate over parsed tag lists without re-building sets.
"""

from __future__ import annotations

AREA_TAGS: frozenset[tuple[str, str]] = frozenset(
    [
        ("area", "yes"),
        ("aeroway", "apron"),
        ("aeroway", "helipad"),
        ("amenity", "bicycle_parking"),
        ("amenity", "fountain"),
        ("amenity", "parking"),
        ("amenity", "parking_space"),
        ("indoor", "area"),
        ("indoor", "corridor"),
        ("indoor", "room"),
        ("leisure", "pitch"),
        ("leisure", "swimming_pool"),
        ("natural", "beach"),
        ("natural", "sand"),
        ("natural", "water"),
        ("natural", "wood"),
        ("natural", "scrub"),
        ("natural", "shrubbery"),
        ("power", "generator"),
        ("tourism", "artwork"),
        ("waterway", "riverbank"),
        # SurfaceAreaModule.defaultSurfaceMap keys
        ("landcover", "grass"),
        ("landcover", "gravel"),
        ("landcover", "ground"),
        ("landuse", "construction"),
        ("landuse", "grass"),
        ("landuse", "meadow"),
        ("natural", "bare_rock"),
        ("natural", "fell"),
        ("natural", "glacier"),
        ("natural", "grassland"),
        ("natural", "mud"),
        ("natural", "shingle"),
        ("natural", "scree"),
    ]
)

AREA_KEYS: frozenset[str] = frozenset(
    [
        "area:highway",
        "bridge:support",
        "building",
        "building:part",
        "golf",
        "landuse",
        "landcover",
        "leisure",
    ]
)

LAND_TAGS: frozenset[tuple[str, str]] = frozenset(
    [
        ("landuse", "forest"),
        ("natural", "water"),
        ("natural", "wood"),
        ("waterway", "river"),
        ("waterway", "stream"),
    ]
)

SEA_TAGS: frozenset[tuple[str, str]] = frozenset(
    [
        ("maritime", "yes"),
        ("route", "ferry"),
        ("seamark", "buoy"),
        ("seamark:type", "buoy_cardinal"),
        ("seamark:type", "buoy_isolated_danger"),
        ("seamark:type", "buoy_lateral"),
        ("seamark:type", "buoy_safe_water"),
        ("seamark:type", "buoy_special_purpose"),
        ("seamark:type", "cable_submarine"),
        ("submarine", "yes"),
        ("wetland", "tidalflat"),
    ]
)

RELATION_TYPE_WHITELIST: frozenset[str] = frozenset(
    [
        "multipolygon",
        "destination_sign",
        "building",
        "enforcement",
        "bridge",
        "connectivity",
        "tunnel",
    ]
)


class DuplicateKeyError(ValueError):
    """TagSet duplicate-key rejection (TagSet.java:30-36)."""


def parse_tags(s: str) -> list[tuple[str, str]]:
    """"k1=v1;k2=v2" -> key-sorted tag list; DuplicateKeyError on a
    repeated key (TagSet key uniqueness)."""
    if not s:
        return []
    tags = []
    seen = set()
    for part in s.split(";"):
        k, _, v = part.partition("=")
        if k in seen:
            raise DuplicateKeyError(f"duplicate key: {k}")
        seen.add(k)
        tags.append((k, v))
    tags.sort(key=lambda t: t[0])
    return tags


def is_area_tag(tag: tuple[str, str]) -> bool:
    return tag[0] in AREA_KEYS or tag in AREA_TAGS


def is_land_tag(tag: tuple[str, str]) -> bool:
    return tag in LAND_TAGS


def is_sea_tag(tag: tuple[str, str]) -> bool:
    return tag in SEA_TAGS


def classify_area(tags: list[tuple[str, str]], *, closed: bool = True) -> bool:
    """Area-vs-way rule (OSMToMapDataConverter.java:240-261): closed
    AND not area=no AND any tag is an area tag."""
    if not closed:
        return False
    if ("area", "no") in tags:
        return False
    return any(is_area_tag(t) for t in tags)


def is_relevant_relation(tags: list[tuple[str, str]]) -> bool:
    """HardcodedRuleset.isRelevantRelation (HardcodedRuleset.java:113-133)."""
    d = dict(tags)
    if d.get("type") == "multipolygon":
        return (
            "building" in d
            or "building:part" in d
            or "landcover" in d
            or "highway" in d
            or "barrier" in d
            or "golf" in d
            or d.get("man_made") in ("bridge", "tunnel")
            or d.get("natural") in ("shrubbery", "wood", "mud", "water")
            or d.get("landuse") in ("forest", "orchard")
            or d.get("aeroway") in ("apron", "helipad")
            or d.get("amenity") in (
                "parking", "parking_space", "bicycle_parking", "fountain"
            )
            or d.get("leisure") in ("swimming_pool", "pitch")
            or d.get("power") == "generator"
        )
    return d.get("type") in RELATION_TYPE_WHITELIST


def is_bridge(tags: dict[str, str]) -> bool:
    """BridgeModule.isBridge (BridgeModule.java:53-56): bridge key
    present with any value other than "no"."""
    return "bridge" in tags and tags["bridge"] != "no"


def is_tunnel(tags: dict[str, str]) -> bool:
    """TunnelModule.isTunnel (TunnelModule.java:45-49): tunnel key
    present, value neither "no" nor "building_passage"."""
    return (
        "tunnel" in tags
        and tags["tunnel"] != "no"
        and tags["tunnel"] != "building_passage"
    )
