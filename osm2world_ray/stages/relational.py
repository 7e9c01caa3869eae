"""Relational operators over the TPC-H-shaped fact tables.

Three canonical shapes a data-engine user expects, expressed
Ray-Data-first over the `orders` / `lineitem` / `customer` tables:

- :func:`pricing_partials` + :func:`pricing_finalize` — the scan-filter
  + bounded-key group rollup (TPC-H Q1 shape): per-batch pyarrow C++
  group_by partials over a 6-key space, single tiny finalize, no
  shuffle.
- :func:`order_join_partials` / :func:`order_rows` /
  :func:`order_join_group` — the LARGE x LARGE equi-join: lineitem is
  pre-aggregated per batch by orderkey (unbounded key), then both
  sides co-route through ONE bounded-bucket discrete-key exchange on
  ``bucket_of(orderkey)``; the in-bucket kernel is a sorted
  searchsorted probe, never a pandas merge. Nothing resembling the raw
  lineitem volume crosses the wire — only per-batch per-order partial
  sums.
- :func:`segment_revenue_batch` — the broadcast-dim join: the small
  customer dimension is captured once into the task closure (at real
  scale: ``ray.put`` once, read per task) and probed per batch; the
  rollup key space (market segments) is bounded, so the aggregation is
  a shuffle-free tree.

Money discipline: price expressions are snapped PER ROW to fixed
decimal units (floor(x*scale + 0.5)) and summed as int64 — float sums
are order-dependent across a distributed reduction, integer sums are
not. The SQL oracles compute the identical per-row expression shape,
so the snap is bit-identical (CLAUDE.md bitwise-mirror rule).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

#: TPC-H Q1-style shipdate cutoff (mid-range of the synth dates)
PRICING_CUTOFF = np.datetime64("1998-12-01")


def _snap(x: np.ndarray, scale: float) -> np.ndarray:
    return np.floor(x * scale + 0.5).astype(np.int64)


def pricing_partials(batch: pa.Table) -> pa.Table:
    """lineitem batch -> per-(returnflag, linestatus) partial sums
    (filter + snap + pyarrow C++ group_by)."""
    import pyarrow.compute as pc

    keep = pc.less_equal(
        batch["l_shipdate"], pa.scalar(PRICING_CUTOFF.item())
    )
    b = batch.filter(keep)
    qty = b["l_quantity"].to_numpy()
    ep = b["l_extendedprice"].to_numpy()
    disc = b["l_discount"].to_numpy()
    tax = b["l_tax"].to_numpy()
    t = pa.table(
        {
            "l_returnflag": b["l_returnflag"],
            "l_linestatus": b["l_linestatus"],
            "sum_qty": pa.array(_snap(qty, 1e2)),
            "sum_base_price_c": pa.array(_snap(ep, 1e2)),
            "sum_disc_price_u": pa.array(_snap(ep * (1 - disc), 1e4)),
            "sum_charge_u": pa.array(_snap(ep * (1 - disc) * (1 + tax), 1e6)),
            "count_order": pa.array(np.ones(len(b), dtype=np.int64)),
        }
    )
    agg = t.group_by(["l_returnflag", "l_linestatus"]).aggregate(
        [("sum_qty", "sum"), ("sum_base_price_c", "sum"),
         ("sum_disc_price_u", "sum"), ("sum_charge_u", "sum"),
         ("count_order", "sum")]
    )
    return agg.rename_columns(
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price_c",
         "sum_disc_price_u", "sum_charge_u", "count_order"]
    )


def pricing_combine(acc: pa.Table) -> pa.Table:
    if len(acc) == 0:
        return acc
    agg = acc.group_by(["l_returnflag", "l_linestatus"]).aggregate(
        [("sum_qty", "sum"), ("sum_base_price_c", "sum"),
         ("sum_disc_price_u", "sum"), ("sum_charge_u", "sum"),
         ("count_order", "sum")]
    )
    return agg.rename_columns(
        ["l_returnflag", "l_linestatus", "sum_qty", "sum_base_price_c",
         "sum_disc_price_u", "sum_charge_u", "count_order"]
    )


def order_join_partials(batch: pa.Table, *, n_buckets: int) -> pa.Table:
    """lineitem batch -> per-orderkey partial (kind=0) rows for the
    co-shuffled join: n_items, revenue (1e-4 units, per-row snapped)."""
    from .overlaps import bucket_of

    ep = batch["l_extendedprice"].to_numpy()
    disc = batch["l_discount"].to_numpy()
    t = pa.table(
        {
            "okey": batch["l_orderkey"],
            "n_items": pa.array(np.ones(len(batch), dtype=np.int64)),
            "revenue_u": pa.array(_snap(ep * (1 - disc), 1e4)),
        }
    )
    agg = t.group_by(["okey"]).aggregate(
        [("n_items", "sum"), ("revenue_u", "sum")]
    ).rename_columns(["okey", "n_items", "revenue_u"])
    n = len(agg)
    okey = agg["okey"].to_numpy()
    return pa.table(
        {
            "kind": pa.array(np.zeros(n, dtype=np.int64)),
            "okey": agg["okey"],
            "n_items": agg["n_items"],
            "revenue_u": agg["revenue_u"],
            "custkey": pa.array(np.zeros(n, dtype=np.int64)),
            "prio": pa.array([""] * n, type=pa.string()),
            "bucket": pa.array(bucket_of(okey, n_buckets)),
        }
    )


def order_rows(batch: pa.Table, *, n_buckets: int) -> pa.Table:
    """orders batch -> kind=1 rows with the same exchange schema."""
    from .overlaps import bucket_of

    n = len(batch)
    okey = batch["o_orderkey"].to_numpy()
    return pa.table(
        {
            "kind": pa.array(np.ones(n, dtype=np.int64)),
            "okey": batch["o_orderkey"],
            "n_items": pa.array(np.zeros(n, dtype=np.int64)),
            "revenue_u": pa.array(np.zeros(n, dtype=np.int64)),
            "custkey": batch["o_custkey"],
            "prio": batch["o_orderpriority"],
            "bucket": pa.array(bucket_of(okey, n_buckets)),
        }
    )


_JOIN_EMPTY = pa.schema(
    [
        ("o_orderkey", pa.int64()),
        ("o_custkey", pa.int64()),
        ("o_orderpriority", pa.string()),
        ("n_items", pa.int64()),
        ("revenue_u", pa.int64()),
    ]
).empty_table()


def order_join_group(group) -> pa.Table:
    """One bucket of co-routed rows -> inner-joined per-order totals.
    Sorted searchsorted probe from orders into the combined lineitem
    partials (never pandas merge)."""
    t = group if isinstance(group, pa.Table) else pa.Table.from_pandas(
        group, preserve_index=False
    )
    kind = t["kind"].to_numpy()
    li = t.filter(pa.array(kind == 0))
    od = t.filter(pa.array(kind == 1))
    if len(li) == 0 or len(od) == 0:
        return _JOIN_EMPTY
    agg = li.select(["okey", "n_items", "revenue_u"]).group_by(
        ["okey"]
    ).aggregate([("n_items", "sum"), ("revenue_u", "sum")])
    lkey = agg["okey"].to_numpy()
    order = np.argsort(lkey, kind="stable")
    lkey = lkey[order]
    n_items = agg["n_items_sum"].to_numpy()[order]
    revenue = agg["revenue_u_sum"].to_numpy()[order]
    okey = od["okey"].to_numpy()
    pos = np.searchsorted(lkey, okey)
    pos_c = np.minimum(pos, len(lkey) - 1)
    hit = lkey[pos_c] == okey
    od = od.filter(pa.array(hit))
    pos = pos_c[hit]
    return pa.table(
        {
            "o_orderkey": od["okey"],
            "o_custkey": od["custkey"],
            "o_orderpriority": od["prio"],
            "n_items": pa.array(n_items[pos]),
            "revenue_u": pa.array(revenue[pos]),
        }
    )


def segment_revenue_batch(batch: pa.Table, *, seg_of: dict) -> pa.Table:
    """orders batch + broadcast custkey->mktsegment dict -> partial
    per-segment totals (o_totalprice snapped to cents per row)."""
    ck = batch["o_custkey"].to_numpy()
    # vectorized dict probe: the dim is small and sorted once per task
    keys = np.fromiter(seg_of.keys(), dtype=np.int64, count=len(seg_of))
    vals = np.array(list(seg_of.values()), dtype=object)
    order = np.argsort(keys)
    keys = keys[order]
    vals = vals[order]
    pos = np.searchsorted(keys, ck)
    pos_c = np.minimum(pos, len(keys) - 1)
    hit = keys[pos_c] == ck
    seg = np.where(hit, vals[pos_c], "UNKNOWN")
    t = pa.table(
        {
            "mktsegment": pa.array(seg.astype(object), type=pa.string()),
            "revenue_c": pa.array(_snap(batch["o_totalprice"].to_numpy(), 1e2)),
            "n_orders": pa.array(np.ones(len(batch), dtype=np.int64)),
        }
    )
    agg = t.group_by(["mktsegment"]).aggregate(
        [("revenue_c", "sum"), ("n_orders", "sum")]
    )
    return agg.rename_columns(["mktsegment", "revenue_c", "n_orders"])
