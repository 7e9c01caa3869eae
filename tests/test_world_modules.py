"""WorldModule plugin surface: config-driven list + exclusion
(O2WConverterImpl.java:209-241) and the vectorized per-module element
mapping (WorldModule.java:8-24). No Ray."""

import numpy as np
import pyarrow as pa

from osm2world_ray.functions.config import O2WConfig
from osm2world_ray.functions.modules import (
    DEFAULT_MODULES,
    excluded_kinds,
    module_rows,
    resolve_modules,
)


def test_default_list_and_exclusion():
    assert O2WConfig().world_modules() == list(DEFAULT_MODULES)
    cfg = O2WConfig({"excludeWorldModule": "TreeModule"})
    assert "TreeModule" not in cfg.world_modules()
    assert len(cfg.world_modules()) == len(DEFAULT_MODULES) - 1
    # multiple exclusions, whitespace tolerated
    cfg = O2WConfig({"excludeWorldModule": "TreeModule, RoadModule"})
    assert cfg.world_modules() == ["BuildingModule", "WaterModule"]


def test_explicit_modules_list_unknown_ignored():
    cfg = O2WConfig({"modules": "RoadModule,NoSuchModule,TreeModule"})
    assert cfg.world_modules() == ["RoadModule", "TreeModule"]
    # exclusion applies after the explicit list
    cfg = O2WConfig(
        {"modules": "RoadModule,TreeModule", "excludeWorldModule": "TreeModule"}
    )
    assert cfg.world_modules() == ["RoadModule"]


def test_excluded_kinds_mapping():
    assert excluded_kinds(O2WConfig()).tolist() == []
    ek = excluded_kinds(O2WConfig({"excludeWorldModule": "TreeModule"}))
    assert ek.tolist() == [2]


def test_module_rows_masks_and_payload():
    batch = pa.table(
        {
            "url": pa.array([f"u{i}" for i in range(8)]),
            "mention_idx": pa.array(np.arange(8, dtype=np.int64)),
            "kind": pa.array(np.array([0, 1, 2, 3, 0, 1, 2, 3], dtype=np.int64)),
        }
    )
    full = module_rows(batch, list(DEFAULT_MODULES))
    assert len(full) == 8  # every kind covered by exactly one module
    # BuildingModule contributes 3 meshes per element, TreeModule 1
    df = full.to_pandas()
    assert set(df.loc[df["module"] == "BuildingModule", "n_meshes"]) == {3}
    assert set(df.loc[df["module"] == "TreeModule", "n_meshes"]) == {1}
    # exclusion drops exactly that module's elements
    part = module_rows(batch, ["RoadModule", "WaterModule"])
    assert len(part) == 4
    assert set(part["module"].to_pylist()) == {"RoadModule", "WaterModule"}
    # empty module list -> schema-stable empty
    empty = module_rows(batch, [])
    assert len(empty) == 0 and empty.schema.names == [
        "url", "mention_idx", "module", "n_meshes",
    ]
