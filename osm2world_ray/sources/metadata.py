"""Per-tile metadata dim table (MapMetadataMbtilesUtil analogue).

The reference looks up per-tile metadata (locale, land/water flag) from
an MBTiles sqlite side-table (``core-jvm/.../map_data/creation/
MapMetadataMbtilesUtil.java``). Here the dim table is a deterministic
synthetic table over the z13 tiles of the dense cluster region
(FIXTURES.md anchor tiles around (4402, 2828)) — small enough to
broadcast (``ray.put`` once, shared by every map task), exactly the
"small dim table, broadcast join" mapping from SURVEY §2.1.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: z13 tile window covered by the dim table (cluster region + margin)
TX0, TX1 = 4399, 4406
TY0, TY1 = 2824, 2831


def _rows() -> list[tuple[int, int, str, int]]:
    rows = []
    for tx in range(TX0, TX1 + 1):
        for ty in range(TY0, TY1 + 1):
            locale = "de" if (tx + ty) % 2 == 0 else "at"
            water = 1 if (tx * 31 + ty) % 5 == 0 else 0
            rows.append((tx, ty, locale, water))
    return rows


def tile_metadata_table() -> pa.Table:
    rows = _rows()
    return pa.table(
        {
            "tx": pa.array([r[0] for r in rows], type=pa.int64()),
            "ty": pa.array([r[1] for r in rows], type=pa.int64()),
            "locale": pa.array([r[2] for r in rows], type=pa.string()),
            "water": pa.array([r[3] for r in rows], type=pa.int64()),
        }
    )


def metadata_sql_values() -> str:
    return ", ".join(
        f"({tx}, {ty}, '{loc}', {water})" for tx, ty, loc, water in _rows()
    )


class TileMetadataJoin:
    """Broadcast dim-table lookup: batch rows carrying (tx, ty) gain
    (locale, water); missing tiles get defaults ('default', 0) — the
    reference returns empty metadata when the tile is absent.

    State (packed key array + value arrays) is built once per actor in
    ``__init__`` from the broadcast ref; per batch it is one
    searchsorted — no shuffle, no per-row Python.
    """

    def __init__(self, dim_ref):
        from ..stages._util import resolve_ref

        t = resolve_ref(dim_ref)
        key = t["tx"].to_numpy() * (1 << 32) + t["ty"].to_numpy()
        order = np.argsort(key)
        self.keys = key[order]
        self.locale = t["locale"].to_numpy(zero_copy_only=False)[order]
        self.water = t["water"].to_numpy()[order]

    def __call__(self, batch: pa.Table) -> pa.Table:
        tx = batch["tx"].to_numpy()
        ty = batch["ty"].to_numpy()
        key = tx * (1 << 32) + ty
        pos = np.searchsorted(self.keys, key)
        pos_c = np.clip(pos, 0, max(len(self.keys) - 1, 0))
        hit = (
            (self.keys[pos_c] == key)
            if len(self.keys)
            else np.zeros(len(key), dtype=bool)
        )
        locale = np.where(hit, self.locale[pos_c], "default")
        water = np.where(hit, self.water[pos_c], 0).astype(np.int64)
        return batch.append_column(
            "locale", pa.array(locale, type=pa.string())
        ).append_column("water", pa.array(water))
