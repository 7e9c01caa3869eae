"""PropertyStyle: properties-file map style -> material table.

Reference semantics (``style/PropertyStyle.java:32-236``):

- config keys matching ``material_(NAME)_(attribute)`` are grouped by
  material name (the greedy name group means names may contain
  underscores; ``matches()`` = full-key match);
- each configured material starts from ``new Material(FLAT, WHITE)``
  (doubleSided false, transparency FALSE, shadow TRUE, AO TRUE,
  ``Material.java:68-93``) and applies its attributes: ``doubleSided``
  via boolean parse, the four enums via case-insensitive ``valueOf``
  (invalid values are silently ignored, ``O2WConfig.getEnum``
  :199-207), ``color`` via the hsv-tuple parser then ``Color.decode``
  (invalid -> logged, color stays);
- texture layers are counted from ``texture0`` upward, STOPPING at the
  first index with no attributes (:213-224) — layer i with attributes
  but unreadable content contributes nothing but does NOT stop the
  scan of... (the reference breaks only on the attribute gap);
  actual texture CONTENT loading needs image files (absent in this
  container) and stays with the renderer — the countable semantics is
  the contiguous group scan;
- defaults seed the table first and config entries override;
  ``resolveMaterial`` is case-insensitive (uppercase keys, :67-70).
"""

from __future__ import annotations

import re

from .parsers import parse_color, parse_color_tuple

CONF_KEY_PATTERN = re.compile(
    r"material_(.+)_(interpolation|color|doubleSided|shadow|ssao"
    r"|transparency|texture\d*_.+)"
)

_ENUMS = {
    "interpolation": {"FLAT", "SMOOTH"},
    "shadow": {"TRUE", "FALSE"},
    "ssao": {"TRUE", "FALSE"},
    "transparency": {"TRUE", "BINARY", "FALSE"},
}

#: stand-ins for DefaultMaterials.getDefaultMaterials(): seeded first,
#: overridable by config (PropertyStyle.java:133-137)
DEFAULT_MATERIALS: dict[str, dict] = {
    "GRASS": {
        "interpolation": "FLAT", "color": (0, 0xAA, 0), "double_sided": 0,
        "transparency": "FALSE", "shadow": "TRUE", "ssao": "TRUE",
        "n_tex_groups": 0,
    },
    "TERRAIN_DEFAULT": {
        "interpolation": "SMOOTH", "color": (0x88, 0x88, 0x88),
        "double_sided": 0, "transparency": "FALSE", "shadow": "TRUE",
        "ssao": "TRUE", "n_tex_groups": 0,
    },
}

MAX_TEXTURE_LAYERS = 32


def _get_boolean(value: str) -> bool:
    """O2WConfig.getBoolean trim/lowercase truthiness."""
    return value.strip().lower() in ("true", "yes", "1", "on")


def _style_color(value: str):
    """O2WConfig.parseColor: hsv tuple first, then Color.decode."""
    c = parse_color_tuple(value)
    if c is not None:
        return c
    return parse_color(value)


def load_materials(config: dict[str, str]) -> dict[str, dict]:
    """config -> material table keyed by UPPERCASE name."""
    out = {k: dict(v) for k, v in DEFAULT_MATERIALS.items()}
    attrs: dict[str, set[str]] = {}
    for key in config:
        m = CONF_KEY_PATTERN.fullmatch(key)
        if m:
            attrs.setdefault(m.group(1), set()).add(m.group(2))
    for name, attributes in attrs.items():
        mat = {
            "interpolation": "FLAT", "color": (0xFF, 0xFF, 0xFF),
            "double_sided": 0, "transparency": "FALSE", "shadow": "TRUE",
            "ssao": "TRUE", "n_tex_groups": 0,
        }
        prefix = f"material_{name}_"
        for attribute in sorted(attributes):
            value = config[prefix + attribute]
            if attribute == "doubleSided":
                mat["double_sided"] = int(_get_boolean(value))
            elif attribute in _ENUMS:
                v = value.upper()
                if v in _ENUMS[attribute]:
                    key = "ssao" if attribute == "ssao" else attribute
                    mat[key] = v
                # invalid enum: silently ignored (getEnum returns null)
            elif attribute == "color":
                c = _style_color(value)
                if c is not None:
                    mat["color"] = c
                # invalid color: logged by the reference, value kept
        n = 0
        for i in range(MAX_TEXTURE_LAYERS):
            if any(a.startswith(f"texture{i}_") for a in attributes):
                n += 1
            else:
                break  # contiguity rule (:213-224)
        mat["n_tex_groups"] = n
        out[name.upper()] = mat
    return out


def resolve_material(table: dict[str, dict], name: str | None):
    """case-insensitive lookup (PropertyStyle.java:67-70)."""
    if name is None:
        return None
    return table.get(name.upper())
