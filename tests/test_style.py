"""PropertyStyle material-table parsing (style/PropertyStyle.java)."""

from osm2world_ray.functions.style import load_materials, resolve_material


def test_greedy_names_and_attribute_application():
    t = load_materials(
        {
            "material_Mossy_Stone_color": "hsv(120, 50%, 60%)",
            "material_Mossy_Stone_interpolation": "smooth",
            "material_Mossy_Stone_ssao": "nope",
        }
    )
    m = t["MOSSY_STONE"]
    assert m["color"] == (77, 153, 77)
    assert m["interpolation"] == "SMOOTH"  # case-insensitive valueOf
    assert m["ssao"] == "TRUE"  # invalid enum silently ignored


def test_invalid_color_keeps_white_and_texture_contiguity():
    t = load_materials(
        {
            "material_X_color": "oops",
            "material_X_texture0_file": "a",
            "material_X_texture1_file": "b",
            "material_X_texture3_file": "d",  # gap at 2 stops the scan
        }
    )
    m = t["X"]
    assert m["color"] == (255, 255, 255)
    assert m["n_tex_groups"] == 2


def test_config_replaces_default_from_scratch():
    # a configured material REPLACES the seeded default entirely (fresh
    # FLAT/WHITE base, PropertyStyle.java:160-162), it does not patch it
    t = load_materials({"material_terrain_default_color": "#010203"})
    m = t["TERRAIN_DEFAULT"]
    assert m["color"] == (1, 2, 3)
    assert m["interpolation"] == "FLAT"  # default was SMOOTH


def test_resolve_case_insensitive_and_unknown():
    t = load_materials({})
    assert resolve_material(t, "gRaSs") is t["GRASS"]
    assert resolve_material(t, "nope") is None
    assert resolve_material(t, None) is None


def test_non_matching_keys_ignored():
    t = load_materials(
        {"unrelated": "1", "material_trailing_underscore_": "x"}
    )
    assert set(t) == {"GRASS", "TERRAIN_DEFAULT"}
