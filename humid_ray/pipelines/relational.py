"""Relational operators over the TPC-H-ish fact/dimension tables.

The engine's general query side, in the three shapes every warehouse
workload reduces to, each expressed scale-first:

* ``pricing_summary`` — full-fact-table aggregate with a HANDFUL of
  groups: a per-batch combiner collapses every batch to <= |flag x
  status| partial rows, so the shuffle carries group partials, never
  line items (the same partial-then-tiny-groupby shape as the flagship
  histogram stages, stages/outputs.py).
* ``orders_by_nation`` — fact x dimension broadcast join: the
  customer->nation mapping is collected once, ``ray.put`` once, and
  probed per batch with vectorized ``searchsorted``; the orders fact
  table streams and only 25 nation partials shuffle. Partitioning
  assumption: DIMENSION tables fit one worker's heap (TPC-H customer
  is ~1e-4 of lineitem bytes; at a scale where it doesn't, swap the
  probe stage for ``Dataset.join`` — the same switch the dedup verify
  path makes, pipelines/dedup_text.py).
* ``top_parts_by_revenue`` — aggregate + distributed top-k + small
  join-back: per-part partials shuffle once, each result block yields
  its local top-k, the driver merges <= k x n_blocks candidate rows,
  and only the k winners' names are fetched (``pc.is_in`` pruned scan
  of the part table).

All money is summed as INTEGER CENTS (each line item rounds
half-away-from-zero once, exactly like the DuckDB oracle) so the
aggregate is associative and bit-exact regardless of reduction order —
a double sum over 1e12 rows differs between any two plans in the 6th
decimal; an int64 sum never does.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data
from ray.data.aggregate import Sum

from humid_ray.util import round_half_away


def _read(sf_dir: str, table: str, columns=None):
    return ray.data.read_parquet(f"{sf_dir}/{table}.parquet", columns=columns)


def _cents(x: np.ndarray) -> np.ndarray:
    """Dollars (double) -> int64 cents, half-away rounding (DuckDB
    ``round(x*100, 0)`` parity)."""
    return round_half_away(x * 100.0, 0).astype(np.int64)


# --- pricing summary (few-group full-table aggregate) ----------------------

_PRICING_PARTIAL_EMPTY = {
    "l_returnflag": pa.array([], type=pa.string()),
    "l_linestatus": pa.array([], type=pa.string()),
    "sum_qty": pa.array([], type=pa.int64()),
    "sum_base_cents": pa.array([], type=pa.int64()),
    "sum_disc_cents": pa.array([], type=pa.int64()),
    "count_order": pa.array([], type=pa.int64()),
}


def pricing_summary(sf_dir: str):
    """(l_returnflag, l_linestatus, sum_qty, sum_base_cents,
    sum_disc_cents, count_order, avg_qty, avg_price): the TPC-H-Q1
    pricing rollup over lineitem."""

    def partial(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(_PRICING_PARTIAL_EMPTY)
        flag = np.asarray(t.column("l_returnflag").to_pylist(), dtype=object)
        stat = np.asarray(t.column("l_linestatus").to_pylist(), dtype=object)
        qty = t.column("l_quantity").to_numpy(zero_copy_only=False)
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        uf, fi = np.unique(flag, return_inverse=True)
        us, si = np.unique(stat, return_inverse=True)
        ukey, inv = np.unique(fi * len(us) + si, return_inverse=True)
        g = len(ukey)
        base_c = _cents(price)
        disc_c = _cents(price * (1.0 - disc))
        return pa.table(
            {
                "l_returnflag": pa.array(
                    uf[ukey // len(us)].tolist(), type=pa.string()
                ),
                "l_linestatus": pa.array(
                    us[ukey % len(us)].tolist(), type=pa.string()
                ),
                "sum_qty": pa.array(
                    _bincount_i64(inv, qty.astype(np.int64), g)
                ),
                "sum_base_cents": pa.array(_bincount_i64(inv, base_c, g)),
                "sum_disc_cents": pa.array(_bincount_i64(inv, disc_c, g)),
                "count_order": pa.array(np.bincount(inv, minlength=g).astype(np.int64)),
            }
        )

    agg = (
        _read(sf_dir, "lineitem",
              columns=["l_returnflag", "l_linestatus", "l_quantity",
                       "l_extendedprice", "l_discount"])
        .map_batches(partial, batch_format="pyarrow", zero_copy_batch=True)
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("sum_qty", alias_name="sum_qty"),
            Sum("sum_base_cents", alias_name="sum_base_cents"),
            Sum("sum_disc_cents", alias_name="sum_disc_cents"),
            Sum("count_order", alias_name="count_order"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                dict(_PRICING_PARTIAL_EMPTY,
                     avg_qty=pa.array([], type=pa.float64()),
                     avg_price=pa.array([], type=pa.float64()))
            )
        n = t.column("count_order").to_numpy(zero_copy_only=False).astype(np.float64)
        sq = t.column("sum_qty").to_numpy(zero_copy_only=False).astype(np.float64)
        sb = t.column("sum_base_cents").to_numpy(zero_copy_only=False).astype(np.float64)
        with np.errstate(invalid="ignore", divide="ignore"):
            avg_qty = round_half_away(sq / n, 6)
            avg_price = round_half_away(sb / 100.0 / n, 6)
        return t.append_column("avg_qty", pa.array(avg_qty)).append_column(
            "avg_price", pa.array(avg_price)
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


def _bincount_i64(inv: np.ndarray, vals: np.ndarray, g: int) -> np.ndarray:
    """Exact int64 segment sums (np.bincount's float weights would
    round above 2^53)."""
    out = np.zeros(g, dtype=np.int64)
    np.add.at(out, inv, vals)
    return out


# --- orders by nation (fact x dimension broadcast join) --------------------

def orders_by_nation(sf_dir: str):
    """(n_name, n_orders, total_cents): order count and total order
    value per customer nation — orders ⋈ customer ⋈ nation."""
    chunks = list(
        _read(sf_dir, "customer", columns=["c_custkey", "c_nationkey"])
        .iter_batches(batch_size=262144, batch_format="pyarrow")
    )
    if chunks:
        cust = pa.concat_tables(chunks)
        ck = cust.column("c_custkey").to_numpy(zero_copy_only=False)
        nk = cust.column("c_nationkey").to_numpy(zero_copy_only=False)
    else:
        ck = nk = np.empty(0, dtype=np.int64)
    order_c = np.argsort(ck, kind="stable")
    dim_ref = ray.put((ck[order_c], nk[order_c]))

    class Probe:
        def __init__(self, dim_ref):
            self.ck, self.nk = ray.get(dim_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            if t.num_rows == 0 or len(self.ck) == 0:
                return pa.table(
                    {"c_nationkey": pa.array([], type=pa.int64()),
                     "n_orders": pa.array([], type=pa.int64()),
                     "total_cents": pa.array([], type=pa.int64())}
                )
            oc = t.column("o_custkey").to_numpy(zero_copy_only=False)
            pos = np.searchsorted(self.ck, oc)
            pos = np.minimum(pos, len(self.ck) - 1)
            # drop orders whose custkey is ABSENT from customer — the
            # inner-join semantics of the oracle (a clipped probe
            # would silently attribute the order to a neighbor key)
            found = self.ck[pos] == oc
            if not found.all():
                pos, oc = pos[found], oc[found]
                t = t.filter(pa.array(found))
                if t.num_rows == 0:
                    return pa.table(
                        {"c_nationkey": pa.array([], type=pa.int64()),
                         "n_orders": pa.array([], type=pa.int64()),
                         "total_cents": pa.array([], type=pa.int64())}
                    )
            nat = self.nk[pos]
            tot = _cents(t.column("o_totalprice").to_numpy(zero_copy_only=False))
            unat, inv = np.unique(nat, return_inverse=True)
            g = len(unat)
            return pa.table(
                {
                    "c_nationkey": pa.array(unat.astype(np.int64)),
                    "n_orders": pa.array(np.bincount(inv, minlength=g).astype(np.int64)),
                    "total_cents": pa.array(_bincount_i64(inv, tot, g)),
                }
            )

    agg = (
        _read(sf_dir, "orders", columns=["o_custkey", "o_totalprice"])
        .map_batches(Probe, fn_constructor_kwargs={"dim_ref": dim_ref},
                     batch_format="pyarrow", zero_copy_batch=True,
                     concurrency=(1, 4))
        .groupby("c_nationkey")
        .aggregate(Sum("n_orders", alias_name="n_orders"),
                   Sum("total_cents", alias_name="total_cents"))
    )
    nchunks = list(
        _read(sf_dir, "nation", columns=["n_nationkey", "n_name"])
        .iter_batches(batch_size=4096, batch_format="pyarrow")
    )
    names = (pa.concat_tables(nchunks) if nchunks
             else pa.table({"n_nationkey": pa.array([], type=pa.int64()),
                            "n_name": pa.array([], type=pa.string())}))
    nmap = dict(zip(names.column("n_nationkey").to_pylist(),
                    names.column("n_name").to_pylist()))

    def finalize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {"n_name": pa.array([], type=pa.string()),
                 "n_orders": pa.array([], type=pa.int64()),
                 "total_cents": pa.array([], type=pa.int64())}
            )
        keys = t.column("c_nationkey").to_pylist()
        return pa.table(
            {
                "n_name": pa.array([nmap[k] for k in keys], type=pa.string()),
                "n_orders": t.column("n_orders"),
                "total_cents": t.column("total_cents"),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")


# --- top parts by revenue (aggregate + distributed top-k + join-back) ------

def top_parts_by_revenue(sf_dir: str, k: int = 10):
    """(p_partkey, p_name, revenue_cents, rank): the k parts with the
    highest discounted revenue, tie-broken by part key ascending."""
    rev = (
        _read(sf_dir, "lineitem",
              columns=["l_partkey", "l_extendedprice", "l_discount"])
        .map_batches(_part_revenue_partial, batch_format="pyarrow",
                     zero_copy_batch=True)
        .groupby("l_partkey")
        .aggregate(Sum("revenue_cents", alias_name="revenue_cents"))
    )

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        pk = t.column("l_partkey").to_numpy(zero_copy_only=False)
        rc = t.column("revenue_cents").to_numpy(zero_copy_only=False)
        sel = np.lexsort((pk, -rc))[:k]
        return t.take(pa.array(np.sort(sel)))

    chunks = list(
        rev.map_batches(local_topk, batch_format="pyarrow")
        .iter_batches(batch_size=65536, batch_format="pyarrow")
    )
    if not chunks or (cands := pa.concat_tables(chunks)).num_rows == 0:
        return pa.table(
            {"p_partkey": pa.array([], type=pa.int64()),
             "p_name": pa.array([], type=pa.string()),
             "revenue_cents": pa.array([], type=pa.int64()),
             "rank": pa.array([], type=pa.int64())}
        )
    pk = cands.column("l_partkey").to_numpy(zero_copy_only=False)
    rc = cands.column("revenue_cents").to_numpy(zero_copy_only=False)
    win = np.lexsort((pk, -rc))[:k]
    pk, rc = pk[win], rc[win]
    pk_arr = pa.array(pk.astype(np.int64))
    nchunks = list(
        _read(sf_dir, "part", columns=["p_partkey", "p_name"])
        .map_batches(
            lambda t: t.filter(pc.is_in(t.column("p_partkey"), value_set=pk_arr)),
            batch_format="pyarrow",
        )
        .iter_batches(batch_size=65536, batch_format="pyarrow")
    )
    nmap = {}
    for b in nchunks:
        nmap.update(zip(b.column("p_partkey").to_pylist(),
                        b.column("p_name").to_pylist()))
    return pa.table(
        {
            "p_partkey": pa.array(pk.astype(np.int64)),
            "p_name": pa.array([nmap.get(int(p)) for p in pk], type=pa.string()),
            "revenue_cents": pa.array(rc.astype(np.int64)),
            "rank": pa.array(np.arange(1, len(pk) + 1, dtype=np.int64)),
        }
    )


def _part_revenue_partial(t: pa.Table) -> pa.Table:
    if t.num_rows == 0:
        return pa.table(
            {"l_partkey": pa.array([], type=pa.int64()),
             "revenue_cents": pa.array([], type=pa.int64())}
        )
    pk = t.column("l_partkey").to_numpy(zero_copy_only=False)
    price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
    disc = t.column("l_discount").to_numpy(zero_copy_only=False)
    rev = _cents(price * (1.0 - disc))
    upk, inv = np.unique(pk, return_inverse=True)
    return pa.table(
        {
            "l_partkey": pa.array(upk.astype(np.int64)),
            "revenue_cents": pa.array(_bincount_i64(inv, rev, len(upk))),
        }
    )


# --- fact x fact co-partitioned bucket join --------------------------------

_PRIORITY_PARTIAL_EMPTY = {
    "o_orderpriority": pa.array([], type=pa.string()),
    "n_orders": pa.array([], type=pa.int64()),
    "revenue_cents": pa.array([], type=pa.int64()),
}


# co-partition sizing + hashed bucket ids shared with the other
# bucket-join operators (stages/joins.py)
from humid_ray.stages.joins import copart_buckets as _copart_buckets
from humid_ray.stages.joins import key_buckets as _key_buckets
from humid_ray.stages.joins import probe_sorted_side as _probe_sorted_side
from humid_ray.stages.joins import take_column as _take_column


def _order_revenue_partial(t: pa.Table) -> pa.Table:
    """Per-batch lineitem -> (l_orderkey, revenue_cents) collapse —
    the per-ORDER combiner shared by priority_revenue and
    segment_revenue (both SQL oracles assume identical cents math)."""
    if t.num_rows == 0:
        return pa.table(
            {"l_orderkey": pa.array([], type=pa.int64()),
             "revenue_cents": pa.array([], type=pa.int64())}
        )
    ok = t.column("l_orderkey").to_numpy(zero_copy_only=False)
    price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
    disc = t.column("l_discount").to_numpy(zero_copy_only=False)
    rev = _cents(price * (1.0 - disc))
    uok, inv = np.unique(ok, return_inverse=True)
    return pa.table(
        {"l_orderkey": pa.array(uok.astype(np.int64)),
         "revenue_cents": pa.array(_bincount_i64(inv, rev, len(uok)))}
    )


def _li_bucket_side(t: pa.Table, n_buckets: int, tag_type: pa.DataType,
                    tag_name: str) -> pa.Table:
    """Lineitem batch -> tagged co-partition rows: collapse to one
    partial row per order seen in the batch, bucket by hashed order
    key. ``tag_name`` carries the orders-side payload column (null on
    this side so the union schemas line up)."""
    p = _order_revenue_partial(t)
    k = p.column("l_orderkey").to_numpy(zero_copy_only=False)
    return pa.table(
        {
            "bucket": pa.array(_key_buckets(k, n_buckets)),
            "key": p.column("l_orderkey"),
            "revenue_cents": p.column("revenue_cents"),
            tag_name: pa.nulls(len(k), tag_type),
            "side": pa.array(np.zeros(len(k), dtype=np.int8)),
        }
    )


def priority_revenue(sf_dir: str):
    """(o_orderpriority, n_orders, revenue_cents): discounted lineitem
    revenue rolled up to order priority — the FACT x FACT join shape
    (`orders_by_nation` broadcasts its small dimension; here BOTH
    sides are fact tables, so neither may be collected).

    Scale shape: a SINGLE co-partitioning exchange. Each side tags its
    rows with ``bucket = splitmix64(order key) % P`` (lineitem first
    collapses per batch to one partial row per order), the union
    groups by bucket, and one numpy kernel per bucket finishes the
    collapse, probes the orders side with ``searchsorted`` and emits
    <= |priorities| partial rows. A prior version spelled the same
    semantics as groupby + distributed ``Dataset.join`` + groupby —
    three all-to-all exchanges whose fixed hash-shuffle cost dominated
    at bench scale; co-locating both sides by one hashed key does the
    join task-locally, which is also the shape that survives 100 TB
    (bucket count scales with rows, per-task work stays ~constant).
    Revenue is int64 cents throughout, so every reduction order gives
    the same bits."""
    lineitem = _read(sf_dir, "lineitem",
                     columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_orderpriority"])
    # parquet-metadata counts (no scan): an empty side loses its
    # schema through groupby/map_groups, so short-circuit the inner join
    n_li, n_ord = lineitem.count(), orders.count()
    if n_li == 0 or n_ord == 0:
        return ray.data.from_arrow(pa.table(_PRIORITY_PARTIAL_EMPTY))
    n_buckets = _copart_buckets(n_li, n_ord)

    def ord_side(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "bucket": pa.array(_key_buckets(k, n_buckets)),
                "key": pa.array(k),
                "revenue_cents": pa.array(np.zeros(len(k), dtype=np.int64)),
                "o_orderpriority": t.column("o_orderpriority"),
                "side": pa.array(np.ones(len(k), dtype=np.int8)),
            }
        )

    def bucket_join(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False)
        rc = g.column("revenue_cents").to_numpy(zero_copy_only=False)
        li = side == 0
        if not li.any() or li.all():
            return pa.table(_PRIORITY_PARTIAL_EMPTY)
        # finish the per-order collapse (batch partials may repeat keys)
        uok, inv = np.unique(key[li], return_inverse=True)
        orev = _bincount_i64(inv, rc[li], len(uok))
        # probe the orders side (o_orderkey is unique per order)
        m, rows = _probe_sorted_side(key, np.flatnonzero(~li), uok)
        if not m.any():
            return pa.table(_PRIORITY_PARTIAL_EMPTY)
        pr = _take_column(g, "o_orderpriority", rows).to_numpy(
            zero_copy_only=False
        )
        up, pinv = np.unique(pr, return_inverse=True)
        return pa.table(
            {"o_orderpriority": pa.array(up.tolist(), type=pa.string()),
             "n_orders": pa.array(np.bincount(pinv, minlength=len(up))
                                  .astype(np.int64)),
             "revenue_cents": pa.array(_bincount_i64(pinv, orev[m], len(up)))}
        )

    li_rows = lineitem.map_batches(
        lambda t: _li_bucket_side(t, n_buckets, pa.string(), "o_orderpriority"),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    ord_rows = orders.map_batches(
        ord_side, batch_format="pyarrow", zero_copy_batch=True
    )
    return (
        li_rows.union(ord_rows)
        .groupby("bucket")
        .map_groups(bucket_join, batch_format="pyarrow")
        .groupby("o_orderpriority")
        .aggregate(Sum("n_orders", alias_name="n_orders"),
                   Sum("revenue_cents", alias_name="revenue_cents"))
    )


# --- 3-table chained distributed hash join ---------------------------------

_SEGMENT_PARTIAL_EMPTY = {
    "c_mktsegment": pa.array([], type=pa.string()),
    "n_orders": pa.array([], type=pa.int64()),
    "revenue_cents": pa.array([], type=pa.int64()),
}


def segment_revenue(sf_dir: str):
    """(c_mktsegment, n_orders, revenue_cents): discounted lineitem
    revenue rolled up through orders to the customer market segment —
    the THREE-fact-table join chain (lineitem |><| orders |><| customer;
    none of the three is broadcastable at scale).

    Scale shape: TWO co-partitioning exchanges, one per join key (the
    priority_revenue bucket-join pattern chained). Exchange #1 buckets
    lineitem partials and orders by hashed ORDER key; its per-bucket
    kernel joins them and collapses to (custkey, n_orders, cents)
    partials, already tagged with the hashed-CUSTOMER bucket for
    exchange #2, whose kernel joins against customer and emits
    <= |segments| rows. The earlier spelling (two ``Dataset.join``s
    with groupbys around them) paid five all-to-all exchanges of
    fixed hash-shuffle cost for the same result. Revenue stays int64
    cents end to end, so every reduction order gives the same bits."""
    lineitem = _read(sf_dir, "lineitem",
                     columns=["l_orderkey", "l_extendedprice", "l_discount"])
    orders = _read(sf_dir, "orders", columns=["o_orderkey", "o_custkey"])
    customer = _read(sf_dir, "customer",
                     columns=["c_custkey", "c_mktsegment"])
    n_li, n_ord, n_cust = (lineitem.count(), orders.count(),
                           customer.count())
    if n_li == 0 or n_ord == 0 or n_cust == 0:
        return ray.data.from_arrow(pa.table(_SEGMENT_PARTIAL_EMPTY))
    nb1 = _copart_buckets(n_li, n_ord)
    nb2 = _copart_buckets(n_ord, n_cust)

    def ord_side(t: pa.Table) -> pa.Table:
        k = t.column("o_orderkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table(
            {
                "bucket": pa.array(_key_buckets(k, nb1)),
                "key": pa.array(k),
                "revenue_cents": pa.array(np.zeros(len(k), dtype=np.int64)),
                "o_custkey": t.column("o_custkey").cast(pa.int64()),
                "side": pa.array(np.ones(len(k), dtype=np.int8)),
            }
        )

    _CUST_PARTIAL_EMPTY = {
        "bucket": pa.array([], type=pa.int64()),
        "key": pa.array([], type=pa.int64()),
        "n_orders": pa.array([], type=pa.int64()),
        "revenue_cents": pa.array([], type=pa.int64()),
        "c_mktsegment": pa.array([], type=pa.string()),
        "side": pa.array([], type=pa.int8()),
    }

    def order_bucket_join(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False)
        rc = g.column("revenue_cents").to_numpy(zero_copy_only=False)
        li = side == 0
        if not li.any() or li.all():
            return pa.table(_CUST_PARTIAL_EMPTY)
        uok, inv = np.unique(key[li], return_inverse=True)
        orev = _bincount_i64(inv, rc[li], len(uok))
        m, rows = _probe_sorted_side(key, np.flatnonzero(~li), uok)
        if not m.any():
            return pa.table(_CUST_PARTIAL_EMPTY)
        # Arrow take, NOT a whole-column to_numpy: o_custkey carries
        # nulls on the lineitem side, and numpy's null handling would
        # route every value through float64 (keys beyond 2**53 collapse)
        ck = _take_column(g, "o_custkey", rows).to_numpy(
            zero_copy_only=False
        ).astype(np.int64)
        # collapse matched orders to one partial row per customer
        uck, cinv = np.unique(ck, return_inverse=True)
        return pa.table(
            {
                "bucket": pa.array(_key_buckets(uck, nb2)),
                "key": pa.array(uck),
                "n_orders": pa.array(np.bincount(cinv, minlength=len(uck))
                                     .astype(np.int64)),
                "revenue_cents": pa.array(
                    _bincount_i64(cinv, orev[m], len(uck))
                ),
                "c_mktsegment": pa.nulls(len(uck), pa.string()),
                "side": pa.array(np.zeros(len(uck), dtype=np.int8)),
            }
        )

    def cust_side(t: pa.Table) -> pa.Table:
        k = t.column("c_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        z = np.zeros(len(k), dtype=np.int64)
        return pa.table(
            {
                "bucket": pa.array(_key_buckets(k, nb2)),
                "key": pa.array(k),
                "n_orders": pa.array(z),
                "revenue_cents": pa.array(z),
                "c_mktsegment": t.column("c_mktsegment"),
                "side": pa.array(np.ones(len(k), dtype=np.int8)),
            }
        )

    def cust_bucket_join(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False)
        no = g.column("n_orders").to_numpy(zero_copy_only=False)
        rc = g.column("revenue_cents").to_numpy(zero_copy_only=False)
        pp = side == 0
        if not pp.any() or pp.all():
            return pa.table(_SEGMENT_PARTIAL_EMPTY)
        # finish the per-customer collapse (one partial per exchange-#1
        # bucket may repeat a custkey)
        uck, inv = np.unique(key[pp], return_inverse=True)
        cno = _bincount_i64(inv, no[pp], len(uck))
        crev = _bincount_i64(inv, rc[pp], len(uck))
        m, rows = _probe_sorted_side(key, np.flatnonzero(~pp), uck)
        if not m.any():
            return pa.table(_SEGMENT_PARTIAL_EMPTY)
        seg = _take_column(g, "c_mktsegment", rows).to_numpy(
            zero_copy_only=False
        )
        useg, sinv = np.unique(seg, return_inverse=True)
        return pa.table(
            {"c_mktsegment": pa.array(useg.tolist(), type=pa.string()),
             "n_orders": pa.array(_bincount_i64(sinv, cno[m], len(useg))),
             "revenue_cents": pa.array(_bincount_i64(sinv, crev[m],
                                                     len(useg)))}
        )

    li_rows = lineitem.map_batches(
        lambda t: _li_bucket_side(t, nb1, pa.int64(), "o_custkey"),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    ord_rows = orders.map_batches(
        ord_side, batch_format="pyarrow", zero_copy_batch=True
    )
    per_cust = (
        li_rows.union(ord_rows)
        .groupby("bucket")
        .map_groups(order_bucket_join, batch_format="pyarrow")
    )
    cust_rows = customer.map_batches(
        cust_side, batch_format="pyarrow", zero_copy_batch=True
    )
    return (
        per_cust.union(cust_rows)
        .groupby("bucket")
        .map_groups(cust_bucket_join, batch_format="pyarrow")
        .groupby("c_mktsegment")
        .aggregate(Sum("n_orders", alias_name="n_orders"),
                   Sum("revenue_cents", alias_name="revenue_cents"))
    )


_SHIPPING_EMPTY = {
    "l_orderkey": pa.array([], type=pa.int64()),
    "o_orderdate": pa.array([], type=pa.timestamp("us")),
    "revenue_cents": pa.array([], type=pa.int64()),
    "rank": pa.array([], type=pa.int64()),
}


def shipping_priority(sf_dir: str, segment: str = "BUILDING",
                      cutoff: str = "1998-07-01", k: int = 10):
    """(l_orderkey, o_orderdate, revenue_cents, rank): the TPC-H Q3
    shape — the k unshipped-revenue-heaviest orders of one customer
    segment: customers in ``segment``, orders placed BEFORE ``cutoff``,
    lineitems shipped AFTER it, revenue per order, top k by revenue
    DESC (ties: o_orderdate then l_orderkey ascending).

    Scale shape: the ``segment_revenue`` two-exchange bucket-join
    chain with the filters pushed to the scans. Exchange #1 buckets
    date-filtered orders and segment-filtered customers by hashed
    CUSTOMER key; its kernel is a semi-join emitting surviving orders
    already tagged with the hashed-ORDER bucket for exchange #2, whose
    kernel collapses shipdate-filtered lineitem partials per order and
    probes the surviving orders — ONE result row per qualifying order,
    no further groupby (an order's partials all land in its one
    bucket). Top-k is per-block partial top-k then one tiny driver
    fold (never a global sort). Revenue is int64 cents throughout."""
    cut = np.datetime64(cutoff, "us")
    lineitem = _read(sf_dir, "lineitem",
                     columns=["l_orderkey", "l_extendedprice",
                              "l_discount", "l_shipdate"])
    orders = _read(sf_dir, "orders",
                   columns=["o_orderkey", "o_custkey", "o_orderdate"])
    customer = _read(sf_dir, "customer",
                     columns=["c_custkey", "c_mktsegment"])
    n_li, n_ord, n_cust = (lineitem.count(), orders.count(),
                           customer.count())
    if n_li == 0 or n_ord == 0 or n_cust == 0:
        return pa.table(_SHIPPING_EMPTY)
    nb1 = _copart_buckets(n_ord, n_cust)
    nb2 = _copart_buckets(n_li, n_ord)

    _SURV_EMPTY = {
        "bucket": pa.array([], type=pa.int64()),
        "key": pa.array([], type=pa.int64()),
        "odate_us": pa.array([], type=pa.int64()),
        "revenue_cents": pa.array([], type=pa.int64()),
        "side": pa.array([], type=pa.int8()),
    }

    def ord_side(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "bucket": pa.array([], type=pa.int64()),
                "key": pa.array([], type=pa.int64()),
                "o_orderkey": pa.array([], type=pa.int64()),
                "odate_us": pa.array([], type=pa.int64()),
                "side": pa.array([], type=pa.int8()),
            })
        od = t.column("o_orderdate").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(od < cut))
        ck = t.column("o_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        od_us = t.column("o_orderdate").to_numpy(
            zero_copy_only=False).astype("datetime64[us]").view(np.int64)
        return pa.table({
            "bucket": pa.array(_key_buckets(ck, nb1)),
            "key": pa.array(ck),
            "o_orderkey": t.column("o_orderkey").cast(pa.int64()),
            "odate_us": pa.array(od_us),
            "side": pa.array(np.zeros(t.num_rows, dtype=np.int8)),
        })

    def cust_side(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t.column("c_mktsegment"), segment))
        ck = t.column("c_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64)
        z = np.zeros(len(ck), dtype=np.int64)
        return pa.table({
            "bucket": pa.array(_key_buckets(ck, nb1)),
            "key": pa.array(ck),
            "o_orderkey": pa.array(z),
            "odate_us": pa.array(z),
            "side": pa.array(np.ones(len(ck), dtype=np.int8)),
        })

    def cust_semi_join(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False)
        orow = side == 0
        if not orow.any() or orow.all():
            return pa.table(_SURV_EMPTY)
        ckeys = np.unique(key[~orow])
        pos = np.searchsorted(ckeys, key)
        pos[pos == len(ckeys)] = 0
        hit = orow & (ckeys[pos] == key)
        if not hit.any():
            return pa.table(_SURV_EMPTY)
        rows = np.flatnonzero(hit)
        ok = _take_column(g, "o_orderkey", rows).to_numpy(
            zero_copy_only=False).astype(np.int64)
        od = _take_column(g, "odate_us", rows).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "bucket": pa.array(_key_buckets(ok, nb2)),
            "key": pa.array(ok),
            "odate_us": pa.array(od),
            "revenue_cents": pa.array(np.zeros(len(ok), dtype=np.int64)),
            "side": pa.array(np.ones(len(ok), dtype=np.int8)),
        })

    def li_side(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(_SURV_EMPTY)
        sd = t.column("l_shipdate").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(sd > cut))
        p = _order_revenue_partial(t)
        kk = p.column("l_orderkey").to_numpy(zero_copy_only=False)
        return pa.table({
            "bucket": pa.array(_key_buckets(kk, nb2)),
            "key": p.column("l_orderkey"),
            "odate_us": pa.array(np.zeros(len(kk), dtype=np.int64)),
            "revenue_cents": p.column("revenue_cents"),
            "side": pa.array(np.zeros(len(kk), dtype=np.int8)),
        })

    _ORDER_OUT_EMPTY = {
        "l_orderkey": pa.array([], type=pa.int64()),
        "odate_us": pa.array([], type=pa.int64()),
        "revenue_cents": pa.array([], type=pa.int64()),
    }

    def order_bucket_join(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False)
        rc = g.column("revenue_cents").to_numpy(zero_copy_only=False)
        li = side == 0
        if not li.any() or li.all():
            return pa.table(_ORDER_OUT_EMPTY)
        uok, inv = np.unique(key[li], return_inverse=True)
        orev = _bincount_i64(inv, rc[li], len(uok))
        m, rows = _probe_sorted_side(key, np.flatnonzero(~li), uok)
        if not m.any():
            return pa.table(_ORDER_OUT_EMPTY)
        od = _take_column(g, "odate_us", rows).to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({
            "l_orderkey": pa.array(uok[m].astype(np.int64)),
            "odate_us": pa.array(od),
            "revenue_cents": pa.array(orev[m]),
        })

    per_order = (
        orders.map_batches(ord_side, batch_format="pyarrow",
                           zero_copy_batch=True)
        .union(customer.map_batches(cust_side, batch_format="pyarrow",
                                    zero_copy_batch=True))
        .groupby("bucket")
        .map_groups(cust_semi_join, batch_format="pyarrow")
        .union(lineitem.map_batches(li_side, batch_format="pyarrow",
                                    zero_copy_batch=True))
        .groupby("bucket")
        .map_groups(order_bucket_join, batch_format="pyarrow")
    )

    def local_topk(t: pa.Table) -> pa.Table:
        if t.num_rows <= k:
            return t
        okk = t.column("l_orderkey").to_numpy(zero_copy_only=False)
        od = t.column("odate_us").to_numpy(zero_copy_only=False)
        rc = t.column("revenue_cents").to_numpy(zero_copy_only=False)
        sel = np.lexsort((okk, od, -rc))[:k]
        return t.take(pa.array(np.sort(sel)))

    chunks = list(
        per_order.map_batches(local_topk, batch_format="pyarrow")
        .iter_batches(batch_size=65536, batch_format="pyarrow")
    )
    if not chunks or (cands := pa.concat_tables(chunks)).num_rows == 0:
        return pa.table(_SHIPPING_EMPTY)
    okk = cands.column("l_orderkey").to_numpy(zero_copy_only=False)
    od = cands.column("odate_us").to_numpy(zero_copy_only=False)
    rc = cands.column("revenue_cents").to_numpy(zero_copy_only=False)
    win = np.lexsort((okk, od, -rc))[:k]
    return pa.table({
        "l_orderkey": pa.array(okk[win].astype(np.int64)),
        "o_orderdate": pa.array(od[win].astype("datetime64[us]")),
        "revenue_cents": pa.array(rc[win].astype(np.int64)),
        "rank": pa.array(np.arange(1, len(win) + 1, dtype=np.int64)),
    })


def shipping_priority_sql(segment: str = "BUILDING",
                          cutoff: str = "1998-07-01", k: int = 10) -> str:
    """DuckDB oracle for ``shipping_priority`` (TPC-H Q3 shape)."""
    return (
        "WITH c AS (SELECT c_custkey FROM customer "
        f"WHERE c_mktsegment = '{segment}'), "
        "o AS (SELECT o_orderkey, o_orderdate, o_custkey FROM orders "
        f"WHERE o_orderdate < TIMESTAMP '{cutoff}'), "
        "l AS (SELECT l_orderkey, "
        "CAST(round(l_extendedprice*(1-l_discount)*100, 0) AS BIGINT) "
        f"AS cents FROM lineitem WHERE l_shipdate > TIMESTAMP '{cutoff}'), "
        "r AS (SELECT l.l_orderkey, o.o_orderdate, "
        "CAST(SUM(l.cents) AS BIGINT) AS revenue_cents "
        "FROM l JOIN o ON o.o_orderkey = l.l_orderkey "
        "JOIN c ON c.c_custkey = o.o_custkey "
        "GROUP BY l.l_orderkey, o.o_orderdate) "
        "SELECT l_orderkey, o_orderdate, revenue_cents, "
        "CAST(row_number() OVER (ORDER BY revenue_cents DESC, "
        "o_orderdate, l_orderkey) AS BIGINT) AS \"rank\" "
        f"FROM r QUALIFY \"rank\" <= {k}"
    )


def segment_revenue_sql() -> str:
    """DuckDB oracle for ``segment_revenue``."""
    return (
        "WITH r AS (SELECT l_orderkey, "
        "CAST(SUM(CAST(round(l_extendedprice*(1-l_discount)*100, 0) "
        "AS BIGINT)) AS BIGINT) AS revenue_cents "
        "FROM lineitem GROUP BY l_orderkey) "
        "SELECT c_mktsegment, CAST(COUNT(*) AS BIGINT) AS n_orders, "
        "CAST(SUM(r.revenue_cents) AS BIGINT) AS revenue_cents "
        "FROM r JOIN orders ON o_orderkey = r.l_orderkey "
        "JOIN customer ON c_custkey = o_custkey "
        "GROUP BY c_mktsegment"
    )


# --- left-anti join (customers with no orders) ------------------------------

_ANTI_EMPTY = {
    "c_custkey": pa.array([], type=pa.int64()),
    "c_name": pa.array([], type=pa.string()),
}


def customers_without_orders(sf_dir: str, status: str | None = "F"):
    """(c_custkey, c_name): customers with NO order of the given
    status (default 'F'; ``status=None`` means no orders at all) —
    the LEFT-ANTI JOIN shape (TPC-H Q22's core), the set-difference
    every coverage/backfill audit reduces to ("which docs have no
    embedding row", "which shards produced no output").

    Scale shape: a SINGLE co-partitioning exchange, no broadcast and
    no driver-side key set. The orders side filters at the read, then
    collapses per batch to its DISTINCT customer keys (batch combiner
    — a customer with 10^4 orders ships once per batch, not per
    order); both sides bucket by ``splitmix64(custkey) % P``, and one
    numpy kernel per bucket sort-merges: customer keys absent from
    the bucket's order-key set are emitted. Anti-join semantics make
    the per-bucket result exact (key co-location is total: every row
    of a key lands in one bucket), so no final aggregate is needed."""
    cust = _read(sf_dir, "customer", columns=["c_custkey", "c_name"])
    ocols = ["o_custkey"] + (["o_orderstatus"] if status else [])
    orders = _read(sf_dir, "orders", columns=ocols)
    if status:
        orders = orders.map_batches(
            lambda t: t.filter(
                pc.equal(t.column("o_orderstatus"), status)
            ).select(["o_custkey"]),
            batch_format="pyarrow", zero_copy_batch=True,
        )
    # metadata-only counts (the RAW orders row count upper-bounds the
    # filtered side for bucket sizing — counting post-filter would
    # execute the filter scan just to size buckets)
    n_c = cust.count()
    if n_c == 0:
        return ray.data.from_arrow(pa.table(_ANTI_EMPTY))
    n_o_raw = _read(sf_dir, "orders", columns=["o_custkey"]).count()
    # an empty (or fully filtered) orders side flows through the
    # bucket kernel and yields every customer — no count pass needed
    nb = _copart_buckets(n_c, n_o_raw)

    def cust_side(t: pa.Table) -> pa.Table:
        k = t.column("c_custkey").to_numpy(zero_copy_only=False).astype(
            np.int64
        )
        return pa.table({
            "bucket": pa.array(_key_buckets(k, nb)),
            "key": pa.array(k),
            "c_name": t.column("c_name"),
            "side": pa.array(np.ones(len(k), dtype=np.int8)),
        })

    def ord_side(t: pa.Table) -> pa.Table:
        k = np.unique(
            t.column("o_custkey").to_numpy(zero_copy_only=False).astype(
                np.int64
            )
        )
        return pa.table({
            "bucket": pa.array(_key_buckets(k, nb)),
            "key": pa.array(k),
            "c_name": pa.nulls(len(k), pa.string()),
            "side": pa.array(np.zeros(len(k), dtype=np.int8)),
        })

    def bucket_anti(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        key = g.column("key").to_numpy(zero_copy_only=False)
        cidx = np.flatnonzero(side == 1)
        if not len(cidx):
            return pa.table(_ANTI_EMPTY)
        okeys = np.unique(key[side == 0])
        ck = key[cidx]
        if len(okeys):
            pos = np.searchsorted(okeys, ck)
            hit = (pos < len(okeys)) & (
                okeys[np.minimum(pos, len(okeys) - 1)] == ck
            )
        else:
            hit = np.zeros(len(ck), dtype=bool)
        anti = np.flatnonzero(~hit)
        if not len(anti):
            return pa.table(_ANTI_EMPTY)
        rows = cidx[anti]
        return pa.table({
            "c_custkey": pa.array(ck[~hit]),
            "c_name": _take_column(g, "c_name", rows),
        })

    return (
        cust.map_batches(cust_side, batch_format="pyarrow",
                         zero_copy_batch=True)
        .union(orders.map_batches(ord_side, batch_format="pyarrow",
                                  zero_copy_batch=True))
        .groupby("bucket")
        .map_groups(bucket_anti, batch_format="pyarrow")
    )


def customers_without_orders_sql(status: str | None = "F") -> str:
    """DuckDB oracle for ``customers_without_orders``."""
    pred = f" AND o.o_orderstatus = '{status}'" if status else ""
    return (
        "SELECT c_custkey, c_name FROM customer c "
        "WHERE NOT EXISTS (SELECT 1 FROM orders o "
        f"WHERE o.o_custkey = c.c_custkey{pred})"
    )
