"""Error-log compaction: consecutive-duplicate suppression + head/tail
truncation.

Reference semantics:
- ``ConversionLog`` suppresses a new entry that ``isAlmostIdenticalTo``
  the previous one — same level, message and element
  (``ConversionLog.java:43-48,54``) — counting suppressed copies;
- the log writer prints all entries when there are at most
  ``maxLogEntries`` (default 100, ``O2WConfig.java:475-477``), else the
  first ``maxLogEntries/2`` and the last ``ceil(maxLogEntries/2)``
  (``O2WConverterImpl.java:478-489``).

These run per PARTITION over that partition's ordered error rows (logs
are thread-local per conversion in the reference — per-partition here),
so they never shuffle.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd


def suppress_consecutive(df: pd.DataFrame,
                         cols: tuple[str, ...] = ("level", "message", "element")
                         ) -> pd.DataFrame:
    """Drop rows almost-identical to their predecessor; adds
    ``n_suppressed`` (copies folded into the surviving row)."""
    if len(df) == 0:
        out = df.copy()
        out["n_suppressed"] = pd.Series(dtype=np.int64)
        return out
    present = [c for c in cols if c in df.columns]
    if not present:
        raise ValueError(
            f"none of the compare columns {cols} present — refusing to "
            "suppress on a vacuous match"
        )
    same = np.ones(len(df), dtype=bool)
    same[0] = False
    for c in present:
        v = df[c].to_numpy()
        same[1:] &= v[1:] == v[:-1]
    keep_idx = np.nonzero(~same)[0]
    runs = np.diff(np.concatenate((keep_idx, [len(df)]))) - 1
    out = df.iloc[keep_idx].copy()
    out["n_suppressed"] = runs.astype(np.int64)
    return out.reset_index(drop=True)


def head_tail_truncate(df: pd.DataFrame, max_entries: int = 100) -> pd.DataFrame:
    """Keep all when <= max_entries, else first half + last ceil-half
    (the reference's print-window rule)."""
    if len(df) <= max_entries:
        return df.reset_index(drop=True)
    head = df.iloc[: max_entries // 2]
    tail = df.iloc[len(df) - math.ceil(max_entries / 2):]
    return pd.concat([head, tail]).reset_index(drop=True)
