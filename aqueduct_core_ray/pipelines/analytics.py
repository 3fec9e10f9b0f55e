"""Classic warehouse analytics over the TPC-H-shaped tables
(``lineitem`` / ``orders`` / ``customer``), expressed Ray-Data-first.

Money is aggregated in INTEGER CENTS, rounded per row with the explicit
``floor(x*100 + 0.5)`` convention — the same float64 expression DuckDB
evaluates — so distributed partial sums are order-insensitive and the
SQL oracles match bit-exactly (float sums would drift by reduction
order across block counts).

Scale shapes:

- ``pricing_summary`` (Q1 flavor): per-block Arrow ``group_by`` partial
  sums over the 6-key (returnflag, linestatus) space, then a native
  distributed sum — the shuffle moves six rows per block.
- ``top_orders_by_revenue`` (Q3 flavor): the customer segment is a
  dimension side, broadcast once as a sorted key array (``ray.put``);
  lineitem revenue is pre-aggregated per orderkey BEFORE any join
  (shuffle moves (orderkey, cents) pairs, never line items); the
  orders⋈revenue equi-join runs co-partitioned on hash(orderkey) % P
  via the union-tag + ``groupby(part).map_groups`` pattern; the top-k
  head collapses per partition first, so the final rank sees at most
  k·P candidate rows.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

import ray
import ray.data

_Q1_CUTOFF = np.datetime64("1998-09-02T00:00:00", "us")


def _cents(arr: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """floor(x*100 + 0.5) as int64 — the shared row-rounding convention."""
    v = arr.to_numpy(zero_copy_only=False).astype(np.float64)
    return np.floor(v * 100.0 + 0.5).astype(np.int64)


def pricing_summary(sf_dir: str) -> ray.data.Dataset:
    """TPC-H Q1-style pricing summary: per (l_returnflag, l_linestatus)
    integer-cent sums of qty / base price / discounted price / charge
    plus the line count, over lines shipped on or before 1998-09-02."""

    def partial(t: pa.Table) -> pa.Table:
        ship = t.column("l_shipdate").to_numpy(zero_copy_only=False)
        t = t.filter(pa.array(ship <= _Q1_CUTOFF))
        if t.num_rows == 0:
            return pa.table({
                "l_returnflag": pa.array([], pa.string()),
                "l_linestatus": pa.array([], pa.string()),
                "sum_qty_c": pa.array([], pa.int64()),
                "sum_base_c": pa.array([], pa.int64()),
                "sum_disc_c": pa.array([], pa.int64()),
                "sum_charge_c": pa.array([], pa.int64()),
                "n_lines": pa.array([], pa.int64()),
            })
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        tax = t.column("l_tax").to_numpy(zero_copy_only=False)
        g = pa.table({
            "l_returnflag": t.column("l_returnflag"),
            "l_linestatus": t.column("l_linestatus"),
            "qty_c": pa.array(_cents(t.column("l_quantity"))),
            "base_c": pa.array(np.floor(price * 100.0 + 0.5
                                        ).astype(np.int64)),
            "disc_c": pa.array(np.floor(price * (1.0 - disc) * 100.0
                                        + 0.5).astype(np.int64)),
            "charge_c": pa.array(np.floor(price * (1.0 - disc)
                                          * (1.0 + tax) * 100.0
                                          + 0.5).astype(np.int64)),
            "one": pa.array(np.ones(t.num_rows, np.int64)),
        })
        agg = g.group_by(["l_returnflag", "l_linestatus"]).aggregate(
            [("qty_c", "sum"), ("base_c", "sum"), ("disc_c", "sum"),
             ("charge_c", "sum"), ("one", "sum")])
        return agg.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty_c", "sum_base_c",
             "sum_disc_c", "sum_charge_c", "n_lines"])

    ds = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_returnflag", "l_linestatus", "l_quantity",
                 "l_extendedprice", "l_discount", "l_tax", "l_shipdate"])

    def rename(t: pa.Table) -> pa.Table:
        return t.rename_columns(
            ["l_returnflag", "l_linestatus", "sum_qty_c", "sum_base_c",
             "sum_disc_c", "sum_charge_c", "n_lines"])

    return (ds.map_batches(partial, batch_format="pyarrow")
            .groupby(["l_returnflag", "l_linestatus"])
            .sum(["sum_qty_c", "sum_base_c", "sum_disc_c",
                  "sum_charge_c", "n_lines"])
            .map_batches(rename, batch_format="pyarrow"))


def top_orders_by_revenue(sf_dir: str, segment: str = "BUILDING",
                          k: int = 10,
                          num_partitions: int = 16) -> ray.data.Dataset:
    """TPC-H Q3-style: the ``k`` highest-revenue orders from customers
    in ``segment`` (revenue in integer cents; ties rank by orderkey).
    Returns (o_orderkey, o_orderdate, o_orderpriority, revenue_c, rk)."""
    # customer is the dimension side: column-pruned read, filtered and
    # collected once on the driver, broadcast as a sorted key array
    seg_df = ray.data.read_parquet(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_mktsegment"]).to_pandas()
    seg_keys = np.sort(seg_df.loc[seg_df["c_mktsegment"] == segment,
                                  "c_custkey"].to_numpy())
    ref = ray.put(seg_keys)

    def rev_partial(t: pa.Table) -> pa.Table:
        price = t.column("l_extendedprice").to_numpy(zero_copy_only=False)
        disc = t.column("l_discount").to_numpy(zero_copy_only=False)
        g = pa.table({
            "o_orderkey": t.column("l_orderkey"),
            "rev_c": pa.array(np.floor(price * (1.0 - disc) * 100.0
                                       + 0.5).astype(np.int64)),
        })
        return (g.group_by("o_orderkey").aggregate([("rev_c", "sum")])
                .rename_columns(["o_orderkey", "rev_c"]))

    rev = (ray.data.read_parquet(
               f"{sf_dir}/lineitem.parquet",
               columns=["l_orderkey", "l_extendedprice", "l_discount"])
           .map_batches(rev_partial, batch_format="pyarrow")
           .groupby("o_orderkey").sum("rev_c"))

    def tag_rev(t: pa.Table) -> pa.Table:
        keys = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        part = (pd.util.hash_array(keys.copy(), categorize=False)
                % np.uint64(num_partitions)).astype(np.int32)
        return pa.table({
            "part": pa.array(part),
            "o_orderkey": t.column("o_orderkey"),
            "rev_c": t.column("sum(rev_c)"),
            "o_orderdate": pa.nulls(t.num_rows, pa.timestamp("us")),
            "o_orderpriority": pa.nulls(t.num_rows, pa.string()),
            "side": pa.array(np.zeros(t.num_rows, np.int8)),
        })

    def tag_orders(t: pa.Table) -> pa.Table:
        cust = t.column("o_custkey").to_numpy(zero_copy_only=False)
        want = ray.get(ref)
        if len(want):
            pos = np.minimum(np.searchsorted(want, cust), len(want) - 1)
            t = t.filter(pa.array(want[pos] == cust))
        else:
            t = t.slice(0, 0)
        keys = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        part = (pd.util.hash_array(keys.copy(), categorize=False)
                % np.uint64(num_partitions)).astype(np.int32)
        return pa.table({
            "part": pa.array(part),
            "o_orderkey": t.column("o_orderkey"),
            "rev_c": pa.nulls(t.num_rows, pa.int64()),
            "o_orderdate": t.column("o_orderdate"),
            "o_orderpriority": t.column("o_orderpriority"),
            "side": pa.array(np.ones(t.num_rows, np.int8)),
        })

    orders = (ray.data.read_parquet(
                  f"{sf_dir}/orders.parquet",
                  columns=["o_orderkey", "o_custkey", "o_orderdate",
                           "o_orderpriority"])
              .map_batches(tag_orders, batch_format="pyarrow"))

    def join_topk(g: pa.Table) -> pa.Table:
        side = g.column("side").to_numpy(zero_copy_only=False)
        rv = g.filter(pa.array(side == 0))
        od = g.filter(pa.array(side == 1))
        rk_, rc = (rv.column("o_orderkey").to_numpy(zero_copy_only=False),
                   rv.column("rev_c").to_numpy(zero_copy_only=False))
        order = np.argsort(rk_)
        rk_, rc = rk_[order], rc[order]
        ok = od.column("o_orderkey").to_numpy(zero_copy_only=False)
        if len(rk_) == 0 or len(ok) == 0:
            return _TOPK_EMPTY
        pos = np.minimum(np.searchsorted(rk_, ok), len(rk_) - 1)
        hit = rk_[pos] == ok
        od = od.filter(pa.array(hit))
        rev_c = rc[pos[hit]].astype(np.int64)
        head = np.lexsort((od.column("o_orderkey").to_numpy(
            zero_copy_only=False), -rev_c))[:k]
        sel = pa.array(head)
        return pa.table({
            "o_orderkey": od.column("o_orderkey").take(sel),
            "o_orderdate": od.column("o_orderdate").take(sel),
            "o_orderpriority": od.column("o_orderpriority").take(sel),
            "rev_c": pa.array(rev_c[head]),
        })

    def final_topk(t: pa.Table) -> pa.Table:
        rev_c = t.column("rev_c").to_numpy(zero_copy_only=False)
        keys = t.column("o_orderkey").to_numpy(zero_copy_only=False)
        head = np.lexsort((keys, -rev_c))[:k]
        sel = pa.array(head)
        return pa.table({
            "o_orderkey": t.column("o_orderkey").take(sel),
            "o_orderdate": t.column("o_orderdate").take(sel),
            "o_orderpriority": t.column("o_orderpriority").take(sel),
            "revenue_c": pa.array(rev_c[head].astype(np.int64)),
            "rk": pa.array(np.arange(1, len(head) + 1, dtype=np.int64)),
        })

    joined = (rev.map_batches(tag_rev, batch_format="pyarrow")
              .union(orders)
              .groupby("part")
              .map_groups(join_topk, batch_format="pyarrow"))
    # k·P candidate rows -> one tiny final ranking group
    return (joined
            .map_batches(lambda t: t.append_column(
                "g", pa.array(np.zeros(t.num_rows, np.int8))),
                batch_format="pyarrow")
            .groupby("g")
            .map_groups(lambda t: final_topk(t.drop_columns(["g"])),
                        batch_format="pyarrow"))


_TOPK_EMPTY = pa.table({
    "o_orderkey": pa.array([], pa.int64()),
    "o_orderdate": pa.array([], pa.timestamp("us")),
    "o_orderpriority": pa.array([], pa.string()),
    "rev_c": pa.array([], pa.int64()),
})
