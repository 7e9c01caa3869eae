"""Per-tile metadata from MBTiles (MapMetadataMbtilesUtil analogue).

Reference semantics (``MapMetadataMbtilesUtil.java:17-60``,
``MapMetadata.java:33-41``): an MBTiles file is a SQLite database whose
``tiles`` table is keyed (zoom_level, tile_column, tile_row) with the
TMS-flipped y (``TileNumber.flippedY``); the payload is a JSON document
``{"locale": ..., "land": ...}``. A missing tile falls back to its
PARENT tile's metadata recursively (errors only surface at the
original zoom). SQLite access via the stdlib ``sqlite3`` — each actor
opens its own read-only connection (the build-once probe-many dim-side
of the per-tile metadata join; the broadcast variant is
``tile_metadata_join``)."""

from __future__ import annotations

import gzip
import json
import sqlite3


class MbtilesMetadata:
    def __init__(self, path: str):
        self._con = sqlite3.connect(f"file:{path}?mode=ro", uri=True)

    def close(self):
        self._con.close()

    def _payload(self, zoom: int, x: int, y: int) -> bytes | None:
        flipped = (1 << zoom) - 1 - y  # TileNumber.flippedY
        row = self._con.execute(
            "SELECT tile_data FROM tiles WHERE zoom_level = ? "
            "AND tile_column = ? AND tile_row = ?",
            (zoom, x, flipped),
        ).fetchone()
        return None if row is None else row[0]

    def metadata_for_tile(self, zoom: int, x: int, y: int):
        """-> (locale, land) or None; parent fallback on missing."""
        while zoom >= 0:
            payload = self._payload(zoom, x, y)
            if payload is not None:
                if payload[:2] == b"\x1f\x8b":  # optionally gzipped
                    payload = gzip.decompress(payload)
                doc = json.loads(payload.decode("utf-8"))
                return doc.get("locale"), doc.get("land")
            zoom -= 1
            x >>= 1
            y >>= 1
        return None
