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


def _parse_f(col: np.ndarray) -> np.ndarray:
    """'' -> NaN, else float (synth tag values are plain decimals)."""
    out = np.full(len(col), np.nan)
    m = col != ""
    if m.any():
        out[m] = col[m].astype(np.float64)
    return out


def _parse_i(col: np.ndarray, default: int) -> np.ndarray:
    out = np.full(len(col), default, dtype=np.int64)
    m = col != ""
    if m.any():
        out[m] = col[m].astype(np.int64)
    return out


#: per-type (default levels, hasWalls) — heightPerLevel is 2.5 for all
#: three types used here (BuildingDefaults.java)
_LEVELS_DEFAULTS = {"house": (3, 1), "garage": (1, 1), "roof": (1, 0)}


def building_levels_batch(batch: pa.Table) -> pa.Table:
    """Simple-3D-Buildings level/height cascade — Java-exact mirror of
    ``LevelAndHeightData.java:114-223`` (the S3DB half; the Simple
    Indoor Tagging level-number resolution at 225+ is out of scope):

    - building:min_level / building:levels:underground ->
      minLevelWithUnderground;
    - building:levels parse (integer, or warn+ceil for decimals), else
      derived from height minus roof:height over heightPerLevel, else
      min-level floor, else type defaults;
    - roof height resolution order: preliminary (roof:height) -> flat
      override -> roof-only-building -> roof:levels * heightPerLevel ->
      dome diameter/2 -> 1.0 for single-level -> DEFAULT_RIDGE_HEIGHT 5
      (BuildingPart.java:55); zero roof height clears roof levels;
    - min-level clamp, height = parseHeight(tags, levels*hpl + roofH)
      floored at 0.01, heightWithoutRoof rounded at 1e-4
      (Math.round == floor(x*1e4 + 0.5) for nonnegative), min_height
      cascade (tag -> per-level estimate -> walls-less 0.3 recess -> 0)
      with the above-walls clamp;
    - totalLevels == 0 (Java: IllegalArgumentException) becomes an
      error row per the engine's per-row fault-tolerance rule.

    Heights are emitted micro-snapped; every float expression keeps the
    exact Java shape so the SQL oracle is bit-identical.
    """
    n = len(batch)
    col = {
        name: np.asarray(batch[name].to_numpy(zero_copy_only=False))
        for name in ("btype", "shape", "levels_tag", "min_level_tag",
                     "underground_tag", "height_tag", "roof_height_tag",
                     "roof_levels_tag", "min_height_tag")
    }
    length = batch["length"].to_numpy()
    width = batch["width"].to_numpy()

    def_levels = np.full(n, 3, dtype=np.int64)
    walls = np.ones(n, dtype=np.int64)
    for t, (lv, wl) in _LEVELS_DEFAULTS.items():
        m = col["btype"] == t
        def_levels[m] = lv
        walls[m] = wl
    hpl = np.full(n, 2.5)

    minlev = _parse_i(col["min_level_tag"], 0)
    ug = _parse_i(col["underground_tag"], 0)
    minlwu = np.where(minlev > 0, minlev, np.minimum(minlev, -ug))

    parsed = _parse_f(col["levels_tag"])
    has_parsed = ~np.isnan(parsed)
    p0 = np.nan_to_num(parsed)
    lv_parsed = np.where(
        p0 == np.floor(p0),
        np.maximum(0, p0),
        np.maximum(0, np.ceil(p0)),
    ).astype(np.int64)

    th = _parse_f(col["height_tag"])
    trh = _parse_f(col["roof_height_tag"])
    thw = np.nan_to_num(th) - np.nan_to_num(trh)
    zero_case = ~np.isnan(th) & ~np.isnan(trh) & (th <= trh)
    rh_case = ~np.isnan(trh) & (thw > 0)
    lv_rh = np.maximum(
        minlwu + 1, np.maximum(1, np.floor(thw / hpl).astype(np.int64))
    )
    levels = np.where(
        has_parsed, lv_parsed,
        np.where(zero_case, 0,
                 np.where(rh_case, lv_rh,
                          np.where(minlwu > 0, minlwu + 1, def_levels))),
    ).astype(np.int64)

    rl = _parse_i(col["roof_levels_tag"], 1)
    rl = np.maximum(rl, 0)  # parseUInt: negatives -> default path unused here
    rh = trh.copy()  # preliminary height: roof:height if tagged
    rh[col["shape"] == "flat"] = 0.0
    m = np.isnan(rh) & (levels == 0) & (np.nan_to_num(th) > 0)
    rh[m] = th[m]
    m = np.isnan(rh) & (col["roof_levels_tag"] != "")
    rh[m] = (hpl * rl)[m]
    m = np.isnan(rh) & (col["shape"] == "dome")
    rh[m] = (np.sqrt(length * length + width * width) / 2)[m]
    m = np.isnan(rh) & (levels == 1)
    rh[m] = 1.0
    rh[np.isnan(rh)] = 5.0
    rl = np.where(rh == 0, 0, rl)

    viol = levels + rl < minlwu + 1
    minlwu = np.where(viol, levels + rl - 1, minlwu)

    height = np.where(~np.isnan(th), th, levels * hpl + rh)
    height = np.maximum(height, 0.01)
    hwr = height - rh
    hwr = np.floor(hwr * 1e4 + 0.5) / 1e4

    mh_t = _parse_f(col["min_height_tag"])
    minh = np.where(
        ~np.isnan(mh_t), np.nan_to_num(mh_t),
        np.where(minlev > 0, (hwr / np.maximum(levels, 1)) * minlev,
                 np.where(walls == 0, hwr - 0.3, 0.0)),
    )
    minh = np.where(minh > hwr, hwr - 0.1, minh)

    total = levels + rl - minlwu
    err = total == 0

    def u(x: np.ndarray) -> pa.Array:
        v = np.floor(x * 1e6 + 0.5).astype(np.int64)
        return pa.array(np.where(err, 0, v))

    def i(x: np.ndarray) -> pa.Array:
        return pa.array(np.where(err, 0, x).astype(np.int64))

    return pa.table(
        {
            "doc_id": batch["doc_id"],
            "levels": i(levels),
            "roof_levels": i(rl),
            "min_lwu": i(minlwu),
            "total_levels": i(total),
            "roof_h_u": u(rh),
            "height_u": u(height),
            "hwr_u": u(hwr),
            "min_height_u": u(minh),
            "error": pa.array(err.astype(np.int64)),
        }
    )
