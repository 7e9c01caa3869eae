"""WorldModule plugin surface: config-driven module list + exclusion.

Reference semantics (``O2WConverterImpl.java:209-241``): the converter
builds its WorldModule list from config — an explicit ``modules``
list when given, else the built-in default set — then drops every
name listed by ``excludeWorldModule``; each surviving module maps the
elements it recognizes to world objects
(``world/creation/WorldModule.java:8-24``).

Ray-native shape: a module is a named VECTORIZED predicate+payload
over mention batches (the AbstractModule per-element contract as one
Arrow mask per module, never a per-row dispatch); the enabled list is
resolved from ``O2WConfig`` ONCE on the driver and captured in the
map_batches closure.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: module name -> the mention kind it recognizes (synth kinds 0..3)
#: and the meshes each recognized element contributes (the
#: module-specific world-object complexity; SQL-expressible).
WORLD_MODULES: dict[str, tuple[int, int]] = {
    "BuildingModule": (0, 3),
    "RoadModule": (1, 2),
    "TreeModule": (2, 1),
    "WaterModule": (3, 1),
}

DEFAULT_MODULES = tuple(WORLD_MODULES)


def resolve_modules(config) -> list[str]:
    """O2WConverterImpl.java:209-241: explicit ``modules`` list when
    configured (unknown names ignored, like the reference's
    name->class lookup misses), else the default set; then
    ``excludeWorldModule`` names are removed."""
    raw = config.get_string("modules")
    names = [n.strip() for n in raw.split(",") if n.strip()] if raw else list(
        DEFAULT_MODULES
    )
    names = [n for n in names if n in WORLD_MODULES]
    excluded = {
        n.strip()
        for n in config.get_string("excludeWorldModule").split(",")
        if n.strip()
    }
    return [n for n in names if n not in excluded]


def excluded_kinds(config) -> np.ndarray:
    """The mention kinds NOT covered by the enabled module list."""
    enabled = {WORLD_MODULES[n][0] for n in resolve_modules(config)}
    return np.array(
        sorted(k for k, _m in WORLD_MODULES.values() if k not in enabled),
        dtype=np.int64,
    )


def module_rows(batch: pa.Table, enabled: list[str]) -> pa.Table:
    """mentions batch -> world-object rows (url, mention_idx, module,
    n_meshes) for the enabled modules: one vectorized kind-mask per
    module (bounded module loop over Arrow kernels, no per-row
    dispatch)."""
    kind = batch["kind"].to_numpy(zero_copy_only=False).astype(np.int64)
    parts = []
    for name in enabled:
        k, meshes = WORLD_MODULES[name]
        idx = np.nonzero(kind == k)[0]
        if len(idx) == 0:
            continue
        sub = batch.select(["url", "mention_idx"]).take(pa.array(idx))
        parts.append(
            sub.append_column(
                "module", pa.array(np.full(len(idx), name, dtype=object),
                                   type=pa.string())
            ).append_column(
                "n_meshes",
                pa.array(np.full(len(idx), meshes, dtype=np.int64)),
            )
        )
    if not parts:
        return pa.schema(
            [("url", pa.string()), ("mention_idx", pa.int64()),
             ("module", pa.string()), ("n_meshes", pa.int64())]
        ).empty_table()
    return pa.concat_tables(parts)
