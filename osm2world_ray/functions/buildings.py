"""BuildingDefaults cascade: per-type default levels/materials/roof.

Java-exact mirror of ``BuildingDefaults.getDefaultsFor``
(``core/src/main/java/org/osm2world/world/modules/building/BuildingDefaults.java:30-128``):

1. type = ``building:part`` unless absent or ``"yes"``, else ``building``;
2. per-type switch (greenhouse/garage/garages/carport/hut/shed/cabin/
   roof/church/hangar/industrial) over levels, materials, windows, walls;
3. ``parking=multi-storey`` -> 5 levels, no windows;
4. ``man_made=chimney`` or type ``chimney`` -> chimney roof, 1 level,
   10 m per level, brick, no windows;
5. ``roof:shape=flat`` upgrades a still-default roof material to concrete.

Heights are deci-unit ints (2.5 m -> 25) so outputs stay integer-exact.
Absent tags are empty strings (the engine's null convention for tag
columns). Fully vectorized: one boolean mask per branch, no per-row
Python.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: switch-case payload: type -> (levels, wall, roof, windows, walls)
_TYPE_CASES = {
    "greenhouse": (1, "GLASS_WALL", "GLASS_ROOF", 0, 1),
    "garage": (1, "CONCRETE", "CONCRETE", 0, 1),
    "garages": (1, "CONCRETE", "CONCRETE", 0, 1),
    "carport": (1, "CONCRETE", "CONCRETE", 0, 0),
    "hut": (1, None, None, 1, 1),
    "shed": (1, None, None, 1, 1),
    "cabin": (1, "WOOD_WALL", "WOOD", 1, 1),
    "roof": (1, None, None, 0, 0),
    "church": (3, None, None, 0, 1),
    "hangar": (3, None, None, 0, 1),
    "industrial": (3, None, None, 0, 1),
}


def building_defaults_batch(batch: pa.Table) -> pa.Table:
    """(doc_id, building, building_part, parking, man_made, roof_shape)
    -> resolved defaults row per building."""
    n = len(batch)
    bld = np.asarray(batch["building"].to_numpy(zero_copy_only=False))
    part = np.asarray(batch["building_part"].to_numpy(zero_copy_only=False))
    parking = np.asarray(batch["parking"].to_numpy(zero_copy_only=False))
    man_made = np.asarray(batch["man_made"].to_numpy(zero_copy_only=False))
    rs_tag = np.asarray(batch["roof_shape"].to_numpy(zero_copy_only=False))

    typ = np.where((part != "") & (part != "yes"), part, bld)

    levels = np.full(n, 3, dtype=np.int64)
    hpl_du = np.full(n, 25, dtype=np.int64)
    wall = np.full(n, "BUILDING_DEFAULT", dtype=object)
    roof = np.full(n, "ROOF_DEFAULT", dtype=object)
    windows = np.ones(n, dtype=np.int64)
    walls = np.ones(n, dtype=np.int64)
    rshape = np.full(n, "flat", dtype=object)

    for t, (lv, w, r, win, wl) in _TYPE_CASES.items():
        m = typ == t
        if not m.any():
            continue
        levels[m] = lv
        if w is not None:
            wall[m] = w
            roof[m] = r
        windows[m] = win
        walls[m] = wl

    m = parking == "multi-storey"
    levels[m] = 5
    windows[m] = 0

    m = (man_made == "chimney") | (typ == "chimney")
    rshape[m] = "chimney"
    levels[m] = 1
    hpl_du[m] = 100
    windows[m] = 0
    wall[m] = "BRICK"
    roof[m] = "BRICK"

    m = (rs_tag == "flat") & (roof == "ROOF_DEFAULT")
    roof[m] = "CONCRETE"

    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "building_type": pa.array(typ.astype(object), type=pa.string()),
            "levels": pa.array(levels),
            "height_per_level_du": pa.array(hpl_du),
            "roof_shape_def": pa.array(rshape, type=pa.string()),
            "material_wall": pa.array(wall, type=pa.string()),
            "material_roof": pa.array(roof, type=pa.string()),
            "has_windows": pa.array(windows),
            "has_walls": pa.array(walls),
            "default_height_du": pa.array(levels * hpl_du),
        }
    )
