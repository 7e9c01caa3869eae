"""BuildingDefaults cascade + repetition-stats kernels."""
import numpy as np
import pyarrow as pa

from osm2world_ray.functions.buildings import building_defaults_batch
from osm2world_ray.stages.textstats import repetition_stats_batch


def _tags(**cols):
    n = max(len(v) for v in cols.values())
    base = {
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "building": pa.array(["house"] * n),
        "building_part": pa.array([""] * n),
        "parking": pa.array([""] * n),
        "man_made": pa.array([""] * n),
        "roof_shape": pa.array([""] * n),
    }
    for k, v in cols.items():
        base[k] = pa.array(v)
    return pa.table(base)


def test_building_part_overrides_type():
    out = building_defaults_batch(_tags(
        building=["house", "house", "house"],
        building_part=["", "yes", "garage"],
    )).to_pandas()
    assert list(out["building_type"]) == ["house", "house", "garage"]
    assert list(out["levels"]) == [3, 3, 1]
    assert list(out["material_wall"]) == [
        "BUILDING_DEFAULT", "BUILDING_DEFAULT", "CONCRETE"]


def test_building_switch_cases():
    types = ["greenhouse", "carport", "roof", "church", "cabin", "hut"]
    out = building_defaults_batch(_tags(building=types)).to_pandas()
    assert list(out["levels"]) == [1, 1, 1, 3, 1, 1]
    assert list(out["has_windows"]) == [0, 0, 0, 0, 1, 1]
    assert list(out["has_walls"]) == [1, 0, 0, 1, 1, 1]
    assert out.loc[4, "material_wall"] == "WOOD_WALL"
    assert out.loc[4, "material_roof"] == "WOOD"


def test_building_overrides_order():
    # chimney beats parking; flat-roof upgrade only on still-default roof
    out = building_defaults_batch(_tags(
        building=["house", "house", "cabin", "chimney"],
        parking=["multi-storey", "multi-storey", "", ""],
        man_made=["", "chimney", "", ""],
        roof_shape=["flat", "flat", "flat", "flat"],
    )).to_pandas()
    assert list(out["levels"]) == [5, 1, 1, 1]
    assert list(out["height_per_level_du"]) == [25, 100, 25, 100]
    assert list(out["material_roof"]) == ["CONCRETE", "BRICK", "WOOD", "BRICK"]
    assert list(out["roof_shape_def"]) == ["flat", "chimney", "flat", "chimney"]
    assert list(out["default_height_du"]) == [125, 100, 25, 100]


def test_repetition_stats_hand_cases():
    batch = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], type=pa.int64()),
        "text": pa.array([
            "a b a b a b",   # 5 bigrams, 2 distinct (a-b, b-a) -> dup 3
            "x y z",          # all distinct
            "w",              # too short for any n-gram
            "",               # single empty token (split semantics)
        ]),
    })
    out = repetition_stats_batch(batch).to_pandas().set_index("doc_id")
    assert out.loc[0, "n_2grams"] == 5 and out.loc[0, "dup_2grams"] == 3
    assert out.loc[0, "dup_2gram_permille"] == 600
    # trigrams of doc 0: aba bab aba bab -> 4 total, 2 distinct
    assert out.loc[0, "n_3grams"] == 4 and out.loc[0, "dup_3grams"] == 2
    assert out.loc[1, "dup_2grams"] == 0 and out.loc[1, "dup_3grams"] == 0
    assert out.loc[2, "n_tokens"] == 1
    assert out.loc[2, "n_2grams"] == 0 and out.loc[2, "n_3grams"] == 0
    assert out.loc[3, "n_tokens"] == 1  # '' splits to one empty token


def test_repetition_batch_split_invariance():
    texts = ["the cat sat on the cat mat " * 3, "a a a a", "b c b c b"]
    batch = pa.table({
        "doc_id": pa.array(np.arange(3, dtype=np.int64)),
        "text": pa.array(texts),
    })
    whole = repetition_stats_batch(batch).to_pandas()
    parts = pa.concat_tables([
        repetition_stats_batch(batch.slice(i, 1)) for i in range(3)
    ]).to_pandas()
    assert whole.equals(parts)


def _levels_batch(**cols):
    n = max(len(v) for v in cols.values())
    base = {
        "doc_id": pa.array(np.arange(n, dtype=np.int64)),
        "btype": pa.array(["house"] * n),
        "shape": pa.array(["gabled"] * n),
        "levels_tag": pa.array([""] * n),
        "min_level_tag": pa.array([""] * n),
        "underground_tag": pa.array([""] * n),
        "height_tag": pa.array([""] * n),
        "roof_height_tag": pa.array([""] * n),
        "roof_levels_tag": pa.array([""] * n),
        "min_height_tag": pa.array([""] * n),
        "length": pa.array([10.0] * n),
        "width": pa.array([4.0] * n),
    }
    base.update({k: pa.array(v) for k, v in cols.items()})
    from osm2world_ray.functions.buildings import building_levels_batch
    return building_levels_batch(pa.table(base)).to_pandas()


def test_levels_parse_paths():
    out = _levels_batch(levels_tag=["2", "2.5", "", ""],
                        btype=["house", "house", "house", "garage"])
    # tagged integer, warn+ceil decimal, house default 3, garage default 1
    assert list(out["levels"]) == [2, 3, 3, 1]


def test_levels_from_height_minus_roof():
    # height 10.5, roof:height 0.5 -> (10.0 / 2.5) = 4 levels
    out = _levels_batch(height_tag=["10.5"], roof_height_tag=["0.5"])
    assert out.loc[0, "levels"] == 4
    assert out.loc[0, "roof_h_u"] == 500_000
    # height <= roof height -> zero non-roof levels, roof-only building
    out = _levels_batch(height_tag=["3.0"], roof_height_tag=["4.0"])
    assert out.loc[0, "levels"] == 0


def test_roof_height_resolution_order():
    # flat forces 0 (and clears roof levels); single level -> 1.0;
    # default ridge 5.0; dome -> diameter/2; roof:levels * 2.5
    out = _levels_batch(
        shape=["flat", "gabled", "gabled", "dome", "gabled"],
        btype=["house", "garage", "house", "house", "house"],
        roof_levels_tag=["", "", "", "", "2"],
        length=[10.0, 10.0, 10.0, 3.0, 10.0],
        width=[4.0, 4.0, 4.0, 4.0, 4.0],
    )
    assert list(out["roof_h_u"]) == [
        0, 1_000_000, 5_000_000, 2_500_000, 5_000_000]
    assert out.loc[0, "roof_levels"] == 0
    assert out.loc[4, "roof_levels"] == 2


def test_min_height_cascade_and_clamp():
    # walls-less type recesses 0.3 below the eaves; explicit min_height
    # above the walls clamps to hwr - 0.1
    out = _levels_batch(btype=["roof", "house"],
                        min_height_tag=["", "99.0"],
                        height_tag=["", "4.0"],
                        shape=["gabled", "flat"])
    hwr0 = out.loc[0, "hwr_u"]
    assert out.loc[0, "min_height_u"] == hwr0 - 300_000
    assert out.loc[1, "min_height_u"] == out.loc[1, "hwr_u"] - 100_000


def test_min_level_and_underground():
    out = _levels_batch(min_level_tag=["2", ""],
                        underground_tag=["", "2"],
                        levels_tag=["4", "4"])
    assert out.loc[0, "min_lwu"] == 2
    assert out.loc[1, "min_lwu"] == -2
    assert out.loc[1, "total_levels"] == 4 + 1 + 2  # levels + roof + ug
