"""Planted-input checks for the relational operators (oracle parity is
covered by tests/test_driver_contract.py; these pin the semantics the
hash compare can't localize: cents rounding, tie-breaks, join mapping)."""

import datetime

import pyarrow as pa
import pyarrow.parquet as pq


def _write(d, name, table):
    pq.write_table(table, d / f"{name}.parquet")


def test_top_parts_tie_break_and_cents(ray_session, tmp_path):
    """Equal revenues must tie-break by part key ascending, and each
    line item rounds to cents ONCE before the integer sum (2 x 0.005
    rounds to 2 cents, not 1)."""
    from humid_ray.pipelines.relational import top_parts_by_revenue

    _write(tmp_path, "lineitem", pa.table({
        "l_partkey": pa.array([2, 1, 1, 3], type=pa.int64()),
        "l_extendedprice": pa.array([10.0, 5.0, 5.0, 0.005], type=pa.float64()),
        "l_discount": pa.array([0.0, 0.0, 0.0, 0.0], type=pa.float64()),
    }))
    _write(tmp_path, "part", pa.table({
        "p_partkey": pa.array([1, 2, 3], type=pa.int64()),
        "p_name": pa.array(["p1", "p2", "p3"], type=pa.string()),
    }))
    out = top_parts_by_revenue(str(tmp_path), k=3).to_pandas()
    # parts 1 and 2 both have 1000 cents -> part 1 ranks first
    assert out.p_partkey.tolist() == [1, 2, 3]
    assert out["rank"].tolist() == [1, 2, 3]
    assert out.revenue_cents.tolist() == [1000, 1000, 1]  # 0.005 -> 1 cent
    assert out.p_name.tolist() == ["p1", "p2", "p3"]


def test_orders_by_nation_broadcast_mapping(ray_session, tmp_path):
    """Every order lands in its customer's nation through the
    searchsorted probe, including unsorted dimension input."""
    from humid_ray.pipelines.relational import orders_by_nation

    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([30, 10, 20], type=pa.int64()),  # unsorted
        "c_nationkey": pa.array([1, 0, 1], type=pa.int64()),
    }))
    _write(tmp_path, "orders", pa.table({
        "o_custkey": pa.array([10, 20, 30, 20], type=pa.int64()),
        "o_totalprice": pa.array([1.0, 2.0, 3.0, 4.0], type=pa.float64()),
    }))
    _write(tmp_path, "nation", pa.table({
        "n_nationkey": pa.array([0, 1], type=pa.int64()),
        "n_name": pa.array(["A", "B"], type=pa.string()),
    }))
    out = (orders_by_nation(str(tmp_path)).to_pandas()
           .sort_values("n_name").reset_index(drop=True))
    assert out.n_name.tolist() == ["A", "B"]
    assert out.n_orders.tolist() == [1, 3]
    assert out.total_cents.tolist() == [100, 900]


def test_pricing_summary_groups_and_averages(ray_session, tmp_path):
    from humid_ray.pipelines.relational import pricing_summary

    _write(tmp_path, "lineitem", pa.table({
        "l_returnflag": pa.array(["A", "A", "N"], type=pa.string()),
        "l_linestatus": pa.array(["F", "F", "O"], type=pa.string()),
        "l_quantity": pa.array([2.0, 4.0, 10.0], type=pa.float64()),
        "l_extendedprice": pa.array([100.0, 50.0, 20.0], type=pa.float64()),
        "l_discount": pa.array([0.5, 0.0, 0.1], type=pa.float64()),
    }))
    out = (pricing_summary(str(tmp_path)).to_pandas()
           .sort_values("l_returnflag").reset_index(drop=True))
    af = out.iloc[0]
    assert (af.l_returnflag, af.l_linestatus) == ("A", "F")
    assert af.sum_qty == 6 and af.count_order == 2
    assert af.sum_base_cents == 15000
    assert af.sum_disc_cents == 10000  # 100*0.5 + 50
    assert af.avg_qty == 3.0 and af.avg_price == 75.0
    no = out.iloc[1]
    assert no.sum_disc_cents == 1800 and no.avg_qty == 10.0


def test_priority_revenue_join(ray_session, tmp_path):
    """Fact x fact join: per-order rollup joins orders on the key;
    orders with no lineitems drop (inner), revenue lands on the
    right priority."""
    from humid_ray.pipelines.relational import priority_revenue

    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3], type=pa.int64()),
        "l_extendedprice": pa.array([10.0, 5.0, 7.0, 2.0], type=pa.float64()),
        "l_discount": pa.array([0.0, 0.2, 0.5, 0.0], type=pa.float64()),
    }))
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([1, 2, 3, 4], type=pa.int64()),  # 4: no items
        "o_orderpriority": pa.array(["HI", "LO", "HI", "HI"],
                                    type=pa.string()),
    }))
    out = (priority_revenue(str(tmp_path)).to_pandas()
           .sort_values("o_orderpriority").reset_index(drop=True))
    assert out.o_orderpriority.tolist() == ["HI", "LO"]
    assert out.n_orders.tolist() == [2, 1]  # order 4 has no lineitems
    assert out.revenue_cents.tolist() == [1000 + 400 + 200, 350]


def test_segment_revenue_three_table_chain(ray_session, tmp_path):
    """lineitem |><| orders |><| customer: per-order collapse before join
    #1, per-customer collapse before join #2, inner joins drop childless
    orders and customer-less orders."""
    from humid_ray.pipelines.relational import segment_revenue

    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([1, 1, 2, 3, 5], type=pa.int64()),
        "l_extendedprice": pa.array([10.0, 5.0, 7.0, 2.0, 9.0],
                                    type=pa.float64()),
        "l_discount": pa.array([0.0, 0.2, 0.5, 0.0, 0.0],
                               type=pa.float64()),
    }))
    _write(tmp_path, "orders", pa.table({
        # order 4: no lineitems (drops); order 5's customer is missing
        "o_orderkey": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "o_custkey": pa.array([100, 100, 200, 200, 999], type=pa.int64()),
    }))
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([100, 200, 300], type=pa.int64()),
        "c_mktsegment": pa.array(["BUILDING", "AUTO", "AUTO"],
                                 type=pa.string()),
    }))
    out = (segment_revenue(str(tmp_path)).to_pandas()
           .sort_values("c_mktsegment").reset_index(drop=True))
    assert out.c_mktsegment.tolist() == ["AUTO", "BUILDING"]
    # AUTO: order 3 only (order 4 childless) -> 200 cents
    # BUILDING: orders 1 (1000+400) + 2 (350) -> 1750 cents
    assert out.n_orders.tolist() == [1, 2]
    assert out.revenue_cents.tolist() == [200, 1750]


def test_orders_by_nation_drops_orphan_custkeys(ray_session, tmp_path):
    """An order whose o_custkey is absent from customer must be
    DROPPED (inner-join oracle semantics), not attributed to a
    neighboring customer's nation by the clipped searchsorted probe."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    pq.write_table(
        pa.table({"c_custkey": pa.array([1, 5], type=pa.int64()),
                  "c_nationkey": pa.array([10, 20], type=pa.int64())}),
        tmp_path / "customer.parquet",
    )
    pq.write_table(
        pa.table({"o_custkey": pa.array([1, 5, 3, 99], type=pa.int64()),
                  "o_totalprice": pa.array([10.0, 20.0, 30.0, 40.0])}),
        tmp_path / "orders.parquet",
    )
    pq.write_table(
        pa.table({"n_nationkey": pa.array([10, 20], type=pa.int64()),
                  "n_name": pa.array(["A", "B"])}),
        tmp_path / "nation.parquet",
    )
    from humid_ray.pipelines.relational import orders_by_nation

    got = (orders_by_nation(str(tmp_path)).to_pandas()
           .sort_values("n_name").reset_index(drop=True))
    # orphans 3 and 99 dropped: one order per nation, exact cents
    assert got.n_name.tolist() == ["A", "B"]
    assert got.n_orders.tolist() == [1, 1]
    assert got.total_cents.tolist() == [1000, 2000]


def test_segment_revenue_custkeys_beyond_float53(ray_session, tmp_path):
    """Custkeys above 2**53 are NOT representable in float64: two
    distinct keys one float-ULP apart must stay distinct through the
    bucket-join chain (the probe fetches o_custkey with Arrow ``take``,
    never a whole-column to_numpy that would detour through float64
    because of the lineitem side's nulls)."""
    from humid_ray.pipelines.relational import segment_revenue

    big1, big2 = (1 << 53) + 1, (1 << 53) + 3  # both round to 2**53 in f64
    _write(tmp_path, "lineitem", pa.table({
        "l_orderkey": pa.array([1, 2], type=pa.int64()),
        "l_extendedprice": pa.array([10.0, 20.0], type=pa.float64()),
        "l_discount": pa.array([0.0, 0.0], type=pa.float64()),
    }))
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([1, 2], type=pa.int64()),
        "o_custkey": pa.array([big1, big2], type=pa.int64()),
    }))
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([big1, big2], type=pa.int64()),
        "c_mktsegment": pa.array(["AUTO", "BUILDING"], type=pa.string()),
    }))
    out = (segment_revenue(str(tmp_path)).to_pandas()
           .sort_values("c_mktsegment").reset_index(drop=True))
    assert out.c_mktsegment.tolist() == ["AUTO", "BUILDING"]
    assert out.n_orders.tolist() == [1, 1]
    assert out.revenue_cents.tolist() == [1000, 2000]


def test_customers_without_orders_anti_join(ray_session, tmp_path):
    """Anti-join semantics: only customers with ZERO orders survive;
    a customer with many orders ships once per batch (collapse), and
    empty-orders degenerates to the full customer list."""
    from humid_ray.pipelines.relational import customers_without_orders

    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([1, 2, 3, 4], type=pa.int64()),
        "c_name": pa.array(["a", "b", "c", "d"], type=pa.string()),
    }))
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([10, 11, 12], type=pa.int64()),
        "o_custkey": pa.array([1, 1, 3], type=pa.int64()),
        "o_orderstatus": pa.array(["F", "O", "F"], type=pa.string()),
    }))
    out = (customers_without_orders(str(tmp_path), status=None).to_pandas()
           .sort_values("c_custkey").reset_index(drop=True))
    assert out.c_custkey.tolist() == [2, 4]
    assert out.c_name.tolist() == ["b", "d"]

    # status predicate on the right side: customer 3's only order is
    # 'F', customer 1 has one 'F' among two -> anti set unchanged; with
    # status 'O' only customer 1 has a match
    out_f = (customers_without_orders(str(tmp_path), status="F").to_pandas()
             .sort_values("c_custkey").reset_index(drop=True))
    assert out_f.c_custkey.tolist() == [2, 4]
    out_o = (customers_without_orders(str(tmp_path), status="O").to_pandas()
             .sort_values("c_custkey").reset_index(drop=True))
    assert out_o.c_custkey.tolist() == [2, 3, 4]

    # empty orders -> every customer is unmatched
    _write(tmp_path, "orders", pa.table({
        "o_orderkey": pa.array([], type=pa.int64()),
        "o_custkey": pa.array([], type=pa.int64()),
    }))
    out2 = customers_without_orders(str(tmp_path), status=None).to_pandas()
    assert sorted(out2.c_custkey.tolist()) == [1, 2, 3, 4]


def test_shipping_priority_q3_shape(ray_session, tmp_path):
    """TPC-H Q3 semantics on a planted corpus: segment filter, order
    date < cutoff, shipdate > cutoff, per-order revenue, top-k ordered
    by revenue DESC then o_orderdate then l_orderkey; DuckDB parity."""
    import duckdb
    import numpy as np

    from humid_ray.pipelines.relational import (
        shipping_priority, shipping_priority_sql,
    )

    ts = lambda s: np.datetime64(s, "us")
    _write(tmp_path, "customer", pa.table({
        "c_custkey": pa.array([100, 200, 300], type=pa.int64()),
        "c_mktsegment": pa.array(["BUILDING", "AUTO", "BUILDING"],
                                 type=pa.string()),
    }))
    _write(tmp_path, "orders", pa.table({
        # order 1: qualifies; order 2: wrong segment; order 3: placed
        # after cutoff; order 4: qualifies (same revenue as 1 -> date
        # tie-break); order 5: customer missing
        "o_orderkey": pa.array([1, 2, 3, 4, 5], type=pa.int64()),
        "o_custkey": pa.array([100, 200, 100, 300, 999], type=pa.int64()),
        "o_orderdate": pa.array(
            [ts("1998-01-02"), ts("1998-01-01"), ts("1998-08-01"),
             ts("1998-01-01"), ts("1998-01-01")],
            type=pa.timestamp("us")),
    }))
    _write(tmp_path, "lineitem", pa.table({
        # order 1: two shipped-late items (5.00 + 5.00); one shipped
        # early (excluded). order 4: one 10.00 item. orders 2/3/5: 1.00
        "l_orderkey": pa.array([1, 1, 1, 4, 2, 3, 5], type=pa.int64()),
        "l_extendedprice": pa.array([5.0, 5.0, 99.0, 10.0, 1.0, 1.0, 1.0],
                                    type=pa.float64()),
        "l_discount": pa.array([0.0] * 7, type=pa.float64()),
        "l_shipdate": pa.array(
            [ts("1998-08-01"), ts("1998-09-01"), ts("1998-01-01"),
             ts("1998-08-01"), ts("1998-08-01"), ts("1998-09-01"),
             ts("1998-08-01")],
            type=pa.timestamp("us")),
    }))
    out = shipping_priority(str(tmp_path)).to_pandas()
    # orders 1 and 4 tie at 1000 cents; order 4's earlier date wins
    assert out.l_orderkey.tolist() == [4, 1]
    assert out.revenue_cents.tolist() == [1000, 1000]
    assert out["rank"].tolist() == [1, 2]

    con = duckdb.connect()
    for t in ("customer", "orders", "lineitem"):
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM "
                    f"read_parquet('{tmp_path}/{t}.parquet')")
    orc = con.execute(shipping_priority_sql()).df()
    assert out.l_orderkey.tolist() == orc.l_orderkey.tolist()
    assert out.revenue_cents.tolist() == orc.revenue_cents.tolist()
    assert out.o_orderdate.tolist() == orc.o_orderdate.tolist()
