"""Distributed exact quantiles over a bounded-resolution value domain.

The scale-safe shape for percentile queries over 100 TB of events:
values are snapped to a fixed grid (centi-units here — the synth event
values are cent-like to begin with), so the full distribution is a
histogram over a BOUNDED key space (event_type x v100). Per-batch
pyarrow C++ ``group_by`` partials tree-merge exactly like the tile
rollup (``stages/rollup.py``): nothing resembling the raw event volume
ever crosses the wire — only near-aggregated histograms, O(types x
distinct values) rows. No sort, no sample-based sketch error: the
quantiles are EXACT by construction.

Quantile definition (mirrored verbatim in the SQL oracle): the p-th
percentile is the smallest grid value whose cumulative count reaches
``ceil(p/100 * n)``.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

PCTS = (50, 90, 99)


def partial_value_hist(batch: pa.Table) -> pa.Table:
    """events batch -> per-(event_type, v100) partial counts.

    The snap MUST keep the exact expression shape ``floor(v*100 + 0.5)``
    — the SQL oracle computes the identical IEEE sequence (CLAUDE.md
    bitwise-mirror rule)."""
    v100 = np.floor(batch["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    t = pa.table(
        {
            "event_type": batch["event_type"],
            "v100": pa.array(v100),
            "cnt": pa.array(np.ones(len(batch), dtype=np.int64)),
        }
    )
    return _compact_hist(t)


def _compact_hist(t: pa.Table) -> pa.Table:
    if len(t) == 0:
        return pa.table(
            {
                "event_type": pa.array([], type=pa.string()),
                "v100": pa.array([], type=pa.int64()),
                "cnt": pa.array([], type=pa.int64()),
            }
        )
    agg = t.group_by(["event_type", "v100"]).aggregate([("cnt", "sum")])
    return agg.rename_columns(["event_type", "v100", "cnt"])


def _finalize_quantiles(acc: pa.Table, *, pcts=PCTS) -> pa.Table:
    acc = _compact_hist(acc)
    et = np.asarray(acc["event_type"].to_numpy(zero_copy_only=False))
    v = acc["v100"].to_numpy()
    c = acc["cnt"].to_numpy()
    order = np.lexsort((v, et))
    et, v, c = et[order], v[order], c[order]
    # group boundaries per event_type (sorted, so groups are runs)
    types, starts = np.unique(et, return_index=True)
    ends = np.append(starts[1:], len(et))
    out = {
        "event_type": [],
        **{f"p{p}_c": [] for p in pcts},
        "n_events": [],
    }
    for t_name, s, e in zip(types, starts, ends):
        cc = np.cumsum(c[s:e])
        n = int(cc[-1])
        out["event_type"].append(t_name)
        for p in pcts:
            target = (p * n + 99) // 100  # ceil(p/100 * n) for int n
            out[f"p{p}_c"].append(int(v[s:e][np.searchsorted(cc, target)]))
        out["n_events"].append(n)
    return pa.table(
        {
            "event_type": pa.array(out["event_type"], type=pa.string()),
            **{f"p{p}_c": pa.array(out[f"p{p}_c"], type=pa.int64())
               for p in pcts},
            "n_events": pa.array(out["n_events"], type=pa.int64()),
        }
    )


def event_percentiles(events_ds, *, fanin: int = 8):
    """Dataset with (event_type, value) -> exact per-type percentiles
    via the shuffle-free histogram tree (partials -> fanin compact ->
    single finalize; the finalize input is O(types x grid) rows)."""
    ds = events_ds.map_batches(partial_value_hist, batch_format="pyarrow")
    ds = ds.repartition(fanin).map_batches(
        _compact_hist, batch_format="pyarrow", batch_size=None
    )
    return ds.repartition(1).map_batches(
        _finalize_quantiles, batch_format="pyarrow", batch_size=None
    )
