"""Relational kernels: pricing rollup, co-shuffled equi-join, dim probe."""
import numpy as np
import pyarrow as pa

from osm2world_ray.stages.relational import (
    order_join_group,
    order_join_partials,
    order_rows,
    pricing_combine,
    pricing_partials,
    segment_revenue_batch,
)


def _lineitems():
    return pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3], type=pa.int64()),
        "l_extendedprice": pa.array([100.0, 50.5, 10.0, 7.25]),
        "l_discount": pa.array([0.1, 0.0, 0.05, 0.0]),
        "l_tax": pa.array([0.02, 0.0, 0.0, 0.08]),
        "l_quantity": pa.array([2.0, 1.0, 3.0, 4.0]),
        "l_returnflag": pa.array(["A", "A", "N", "N"]),
        "l_linestatus": pa.array(["F", "F", "O", "O"]),
        "l_shipdate": pa.array(
            [np.datetime64("1997-01-01", "us")] * 3
            + [np.datetime64("2000-01-01", "us")]),
    })


def test_pricing_rollup_and_cutoff():
    out = pricing_combine(pricing_partials(_lineitems())).to_pandas()
    out = out.set_index(["l_returnflag", "l_linestatus"])
    # the 2000 row falls past the 1998-12-01 cutoff
    assert out.loc[("N", "O"), "count_order"] == 1
    assert out.loc[("A", "F"), "sum_qty"] == 300
    assert out.loc[("A", "F"), "sum_base_price_c"] == 15050
    # 100*0.9 + 50.5 = 140.5 -> 1405000 in 1e-4 units
    assert out.loc[("A", "F"), "sum_disc_price_u"] == 1405000
    # 90*1.02 + 50.5 = 142.3 -> 1e-6 units
    assert out.loc[("A", "F"), "sum_charge_u"] == 142300000


def test_order_join_inner_semantics():
    li = order_join_partials(_lineitems(), n_buckets=4)
    orders = pa.table({
        "o_orderkey": pa.array([1, 2, 9], type=pa.int64()),
        "o_custkey": pa.array([10, 20, 30], type=pa.int64()),
        "o_orderpriority": pa.array(["1-URGENT", "3-MEDIUM", "5-LOW"]),
    })
    od = order_rows(orders, n_buckets=4)
    out = order_join_group(pa.concat_tables([li, od])).to_pandas()
    out = out.set_index("o_orderkey").sort_index()
    # order 9 has no lineitems -> dropped (inner join); order 3 has no
    # order row -> dropped
    assert list(out.index) == [1, 2]
    assert out.loc[1, "n_items"] == 2
    assert out.loc[1, "revenue_u"] == 900000 + 505000
    assert out.loc[2, "o_orderpriority"] == "3-MEDIUM"


def test_order_join_partials_preaggregate():
    li = order_join_partials(_lineitems(), n_buckets=4).to_pandas()
    # 4 lineitem rows but 3 distinct orders -> 3 partial rows
    assert len(li) == 3 and (li["kind"] == 0).all()


def test_segment_revenue_probe():
    orders = pa.table({
        "o_custkey": pa.array([10, 10, 99], type=pa.int64()),
        "o_totalprice": pa.array([100.0, 1.005, 7.0]),
    })
    out = segment_revenue_batch(
        orders, seg_of={10: "BUILDING", 20: "AUTO"}
    ).to_pandas().set_index("mktsegment")
    # 1.005 is 1.00499... in binary -> snaps to 100 (the SQL mirror
    # computes the identical double, so both sides agree)
    assert out.loc["BUILDING", "revenue_c"] == 10000 + 100
    assert out.loc["BUILDING", "n_orders"] == 2
    assert out.loc["UNKNOWN", "n_orders"] == 1
