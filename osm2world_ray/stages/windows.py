"""Time-window operators over the events stream: tumbling aggregates,
gap sessionization, as-of join.

The reference's only streaming surface is the param-file work queue
(``ParamsCommand.java:95-175``) — independent work items, no event
time. These operators add the event-time family a training-data
pipeline needs, built on the same two disciplines as every wide step
here: per-batch partial aggregation before the shuffle, and bounded
bucket keys (hash of the entity) so group count never tracks key
cardinality. Within a bucket everything is a vectorized sort +
segmented scan; the per-user ordering assumption is the partitioning
contract (same-user rows co-locate via the bucket key).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .overlaps import bucket_of

WINDOW_US = 5 * 60 * 1_000_000  # tumbling window: 5 minutes
SESSION_GAP_US = 30 * 60 * 1_000_000  # session break gap: 30 minutes


def _ts_us(batch: pa.Table, col: str = "ts") -> np.ndarray:
    return batch[col].cast(pa.int64()).to_numpy()


def tumbling_partial(batch: pa.Table, *, n_buckets: int) -> pa.Table:
    """events batch -> partial per (window, event_type):
    n, sum_value_cents (integer cents keep the oracle float-free).
    ``n_buckets`` is the driver-resolved shuffle bucket count."""
    win = _ts_us(batch) // WINDOW_US
    etype = batch["event_type"]
    cents = np.floor(batch["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    t = pa.table({"win": pa.array(win), "event_type": etype,
                  "cents": pa.array(cents)})
    g = t.group_by(["win", "event_type"]).aggregate(
        [("cents", "sum"), ([], "count_all")]
    )
    return pa.table(
        {
            "win": g["win"],
            "event_type": g["event_type"],
            "sum_cents": g["cents_sum"].cast(pa.int64()),
            "n": g["count_all"].cast(pa.int64()),
            "bucket": pa.array(bucket_of(g["win"].to_numpy(), n_buckets)),
        }
    )


def tumbling_combine(group) -> pa.Table:
    """Merge window partials (Arrow in/out, pyarrow C++ group_by)."""
    t = (
        group
        if isinstance(group, pa.Table)
        else pa.Table.from_pandas(group, preserve_index=False)
    )
    g = t.select(["win", "event_type", "sum_cents", "n"]).group_by(
        ["win", "event_type"]
    ).aggregate([("sum_cents", "sum"), ("n", "sum")])
    return pa.table(
        {
            "win": g["win"].cast(pa.int64()),
            "event_type": g["event_type"],
            "sum_cents": g["sum_cents_sum"].cast(pa.int64()),
            "n": g["n_sum"].cast(pa.int64()),
        }
    )


def topk_partial(batch: pa.Table, *, n_buckets: int) -> pa.Table:
    """events batch -> partial per-(window, event_type) counts with the
    window-keyed bucket (all of a window's rows co-locate);
    ``n_buckets`` driver-resolved."""
    win = _ts_us(batch) // WINDOW_US
    t = pa.table({"win": pa.array(win), "event_type": batch["event_type"]})
    g = t.group_by(["win", "event_type"]).aggregate([([], "count_all")])
    return pa.table(
        {
            "win": g["win"],
            "event_type": g["event_type"],
            "n": g["count_all"].cast(pa.int64()),
            "bucket": pa.array(bucket_of(g["win"].to_numpy(), n_buckets)),
        }
    )


def topk_by_window(group, *, k: int = 3) -> pa.Table:
    """Bucket of window partials -> the top-``k`` event types per
    window by count (ties: event_type ascending — row_number()
    semantics). Vectorized: one combine group_by, one lexsort, one
    segmented rank scan; Arrow in/out."""
    empty = pa.table(
        {
            "win": pa.array([], type=pa.int64()),
            "rank": pa.array([], type=pa.int64()),
            "event_type": pa.array([], type=pa.string()),
            "n": pa.array([], type=pa.int64()),
        }
    )
    t = (
        group
        if isinstance(group, pa.Table)
        else pa.Table.from_pandas(group, preserve_index=False)
    )
    if len(t) == 0:
        return empty
    g = t.select(["win", "event_type", "n"]).group_by(
        ["win", "event_type"]
    ).aggregate([("n", "sum")])
    win = g["win"].to_numpy()
    n = g["n_sum"].to_numpy()
    et = np.asarray(g["event_type"].to_pylist(), dtype=object)
    order = np.lexsort((et, -n, win))
    win, n, et = win[order], n[order], et[order]
    first = np.ones(len(win), dtype=bool)
    first[1:] = win[1:] != win[:-1]
    starts = np.nonzero(first)[0]
    sizes = np.diff(np.concatenate((starts, [len(win)])))
    rank = np.arange(len(win), dtype=np.int64) - np.repeat(starts, sizes) + 1
    keep = rank <= k
    return pa.table(
        {
            "win": pa.array(win[keep]),
            "rank": pa.array(rank[keep]),
            "event_type": pa.array(et[keep].tolist(), type=pa.string()),
            "n": pa.array(n[keep]),
        }
    )


def sessionize(group) -> pa.Table:
    """Bucket of users -> per-event session ids: a session breaks when
    the gap to the user's previous event exceeds SESSION_GAP_US;
    session_id = the session's first event_id. Vectorized segmented
    scan over (user, ts)-sorted rows; Arrow in/out."""
    from .overlaps import col_np

    if len(group) == 0:
        return pa.table(
            {
                "event_id": pa.array([], type=pa.int64()),
                "user_id": pa.array([], type=pa.int64()),
                "session_id": pa.array([], type=pa.int64()),
            }
        )
    user = col_np(group, "user_id", np.int64)
    ts = col_np(group, "ts_us", np.int64)
    eid = col_np(group, "event_id", np.int64)
    order = np.lexsort((eid, ts, user))
    user, ts, eid = user[order], ts[order], eid[order]
    new_session = np.ones(len(user), dtype=bool)
    new_session[1:] = (user[1:] != user[:-1]) | (
        ts[1:] - ts[:-1] > SESSION_GAP_US
    )
    starts = np.nonzero(new_session)[0]
    lens = np.diff(np.concatenate((starts, [len(user)])))
    session_id = np.repeat(eid[starts], lens)
    return pa.table(
        {
            "event_id": pa.array(eid),
            "user_id": pa.array(user),
            "session_id": pa.array(session_id),
        }
    )


def asof_join(group, *, left_type: str = "click",
              right_type: str = "error") -> pa.Table:
    """Bucket of users -> for each ``left_type`` event, the most recent
    strictly-earlier ``right_type`` event of the SAME user (as-of
    backward join; ties on ts broken by max event_id). Vectorized via
    per-user searchsorted on a combined (ts, event_id) rank; Arrow
    in/out."""
    from .overlaps import col_np

    empty = pa.table(
        {
            "event_id": pa.array([], type=pa.int64()),
            "user_id": pa.array([], type=pa.int64()),
            "asof_event_id": pa.array([], type=pa.int64()),
        }
    )
    if len(group) == 0:
        return empty
    if isinstance(group, pa.Table):
        etype = np.asarray(group["event_type"].to_pylist(), dtype=object)
    else:
        etype = group["event_type"].to_numpy()
    user = col_np(group, "user_id", np.int64)
    ts = col_np(group, "ts_us", np.int64)
    eid = col_np(group, "event_id", np.int64)
    li = np.nonzero(etype == left_type)[0]
    ri = np.nonzero(etype == right_type)[0]
    if len(li) == 0 or len(ri) == 0:
        return empty
    lu, lt, le = user[li], ts[li], eid[li]
    ru, rt, re_ = user[ri], ts[ri], eid[ri]
    r_order = np.lexsort((re_, rt, ru))
    ru, rt, re_ = ru[r_order], rt[r_order], re_[r_order]
    # strictly-earlier probe, vectorized: one searchsorted over a
    # (user, ts-RANK) composite key. Ranks (dense indexes into the
    # union of observed timestamps) keep the composite far inside
    # int64 for any realistic user-id/timestamp magnitudes, unlike a
    # raw user*ts_span product.
    all_ts = np.unique(np.concatenate([rt, lt]))
    span = len(all_ts) + 1
    r_rank = np.searchsorted(all_ts, rt)
    l_rank = np.searchsorted(all_ts, lt)
    c_right = ru * span + r_rank
    c_left = lu * span + l_rank
    idx = np.searchsorted(c_right, c_left, side="left") - 1
    found = (idx >= 0) & (ru[np.maximum(idx, 0)] == lu)
    idx = idx[found]
    return pa.table(
        {
            "event_id": pa.array(le[found]),
            "user_id": pa.array(lu[found]),
            "asof_event_id": pa.array(re_[idx]),
        }
    )


#: hopping window: 10-minute windows advancing every 5 minutes — each
#: event lands in WINDOW/HOP = 2 windows (the sliding-aggregate form of
#: the tumbling rollup; fan-out + identical partial/combine discipline)
HOP_US = 300_000_000
HOP_WINDOW_US = 600_000_000


def hopping_partial(batch: pa.Table, *, n_buckets: int) -> pa.Table:
    """events batch -> partial per (hop-window start, event_type):
    the event at t belongs to windows starting at
    (t//HOP - k)*HOP for k in 0..WINDOW/HOP-1 with start > t - WINDOW."""
    t = _ts_us(batch)
    etype_all = batch["event_type"]
    cents_all = np.floor(batch["value"].to_numpy() * 100 + 0.5).astype(np.int64)
    k = HOP_WINDOW_US // HOP_US
    parts = []
    for i in range(k):
        win = (t // HOP_US - i) * HOP_US
        keep = win > t - HOP_WINDOW_US
        parts.append(
            pa.table(
                {
                    "win": pa.array(win[keep] // HOP_US),
                    "event_type": etype_all.filter(pa.array(keep)),
                    "cents": pa.array(cents_all[keep]),
                }
            )
        )
    t2 = pa.concat_tables(parts)
    g = t2.group_by(["win", "event_type"]).aggregate(
        [("cents", "sum"), ([], "count_all")]
    )
    return pa.table(
        {
            "win": g["win"],
            "event_type": g["event_type"],
            "sum_cents": g["cents_sum"].cast(pa.int64()),
            "n": g["count_all"].cast(pa.int64()),
            "bucket": pa.array(bucket_of(g["win"].to_numpy(), n_buckets)),
        }
    )
