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
