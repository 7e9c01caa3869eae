"""Landmark point side table (kNN right side), derived from ``part``."""

from __future__ import annotations

import numpy as np

from . import synth


def landmarks_table(sf_dir: str):
    """-> pyarrow Table (landmark_id, lat, lon, kind): part-derived
    points plus the fixed cluster landmarks (synth.FIXED_LANDMARKS)."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    part = pq.read_table(f"{sf_dir}/part.parquet", columns=["p_partkey"])
    pk = part["p_partkey"].to_numpy().astype(np.int64)
    lat, lon = synth.landmark_latlon(pk)
    kind = synth.landmark_kind(pk)
    fixed = np.array(
        [(lid, la, lo, k) for lid, la, lo, k in synth.FIXED_LANDMARKS], dtype=object
    )
    return pa.table(
        {
            "landmark_id": pa.array(
                np.concatenate([pk, fixed[:, 0].astype(np.int64)])
            ),
            "lat": pa.array(np.concatenate([lat, fixed[:, 1].astype(np.float64)])),
            "lon": pa.array(np.concatenate([lon, fixed[:, 2].astype(np.float64)])),
            "kind": pa.array(
                np.concatenate([kind, fixed[:, 3].astype(np.int64)])
            ),
        }
    )
