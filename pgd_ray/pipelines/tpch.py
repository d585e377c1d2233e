"""Classic relational analytics over the TPC-H-shaped tables —
demonstrates the engine's general Dataset surface (pruned reads,
vectorized filters/derived columns, partial aggregation, native hash
joins) beyond the graph/text pipelines.

* ``q1`` — pricing summary (filter → derived columns → one hash
  aggregation; everything partial-aggregates inside ``map_batches``
  before the tiny groupby).
* ``q3`` — shipping priority (two native ``Dataset.join`` hash joins
  partitioned on the key, filter pushdown on all three reads, then a
  small aggregate + ordered head).  At scale the customer side is
  small enough to broadcast instead — the hash join is used here
  deliberately to exercise the shuffle-join path.

Monetary sums are rounded to 2 decimals (cents) and unit-scale
averages to 6 — double summation order differs between any two
engines, so the mirrored rounding IS the contract.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data
from ray.data.aggregate import Count, Sum


def q1(sf_dir: str, cutoff_us: int) -> pd.DataFrame:
    """Pricing summary report for l_shipdate <= cutoff (epoch-µs).
    Columns: (l_returnflag, l_linestatus, sum_qty, sum_base_price,
    sum_disc_price, sum_charge, avg_qty, avg_price, avg_disc,
    count_order)."""
    from pgd_ray.util import read_parquet_clean

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_tax",
                 "l_returnflag", "l_linestatus", "l_shipdate"],
    )

    def part(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        m = ship <= cutoff_us
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)[m]
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        disc = t["l_discount"].to_numpy(zero_copy_only=False)[m]
        tax = t["l_tax"].to_numpy(zero_copy_only=False)[m]
        disc_price = price * (1.0 - disc)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"].filter(pa.array(m)),
                "l_linestatus": t["l_linestatus"].filter(pa.array(m)),
                "qty": qty,
                "price": price,
                "disc": disc,
                "disc_price": disc_price,
                "charge": disc_price * (1.0 + tax),
            }
        )

    agg = (
        li.map_batches(part, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("qty", alias_name="sum_qty"),
            Sum("price", alias_name="sum_base_price"),
            Sum("disc_price", alias_name="sum_disc_price"),
            Sum("charge", alias_name="sum_charge"),
            Sum("disc", alias_name="sum_disc"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    n = agg["count_order"].astype("int64")
    out = pd.DataFrame(
        {
            "l_returnflag": agg["l_returnflag"],
            "l_linestatus": agg["l_linestatus"],
            "sum_qty": agg["sum_qty"].round(2),
            "sum_base_price": agg["sum_base_price"].round(2),
            "sum_disc_price": agg["sum_disc_price"].round(2),
            "sum_charge": agg["sum_charge"].round(2),
            "avg_qty": (agg["sum_qty"] / n).round(6),
            "avg_price": (agg["sum_base_price"] / n).round(6),
            "avg_disc": (agg["sum_disc"] / n).round(6),
            "count_order": n,
        }
    )
    return out.sort_values(["l_returnflag", "l_linestatus"],
                           ignore_index=True)


def q3(
    sf_dir: str,
    cutoff_us: int,
    segment: str = "BUILDING",
    k: int = 10,
    num_partitions: int = 8,
) -> pd.DataFrame:
    """Shipping-priority top-k: revenue per urgent order.  Columns
    (l_orderkey, revenue, o_orderdate, o_orderpriority), top ``k`` by
    (revenue desc, o_orderdate asc, l_orderkey asc)."""
    from pgd_ray.util import read_parquet_clean

    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_mktsegment"]
    ).map_batches(
        lambda t: t.filter(
            pc.equal(t["c_mktsegment"].combine_chunks(), segment)
        ).select(["c_custkey"]),
        batch_format="pyarrow",
    )

    def ts_filter(col, keep_before):
        def fn(t: pa.Table) -> pa.Table:
            v = t[col].to_numpy(zero_copy_only=False).astype(
                "datetime64[us]").astype(np.int64)
            m = v < cutoff_us if keep_before else v > cutoff_us
            return t.filter(pa.array(m))
        return fn

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_orderpriority"],
    ).map_batches(ts_filter("o_orderdate", True), batch_format="pyarrow")

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_shipdate"],
    ).map_batches(ts_filter("l_shipdate", False), batch_format="pyarrow")

    def revenue(t: pa.Table) -> pa.Table:
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "rev": price * (1.0 - disc)})

    # fractional-CPU aggregators so a join pool never starves the rest
    # of the pipeline on small clusters, and a materialize barrier
    # between the two joins so only ONE aggregator pool exists at a
    # time (two live pools can reserve every CPU and deadlock the
    # upstream read/map tasks)
    jargs = {"num_cpus": 0.25}
    j1 = orders.join(
        cust, "inner", num_partitions,
        on=("o_custkey",), right_on=("c_custkey",),
        aggregator_ray_remote_args=jargs,
    ).materialize()
    j2 = li.map_batches(revenue, batch_format="pyarrow").join(
        j1, "inner", num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",),
        aggregator_ray_remote_args=jargs,
    )
    per_order = j2.groupby(
        ["l_orderkey", "o_orderdate", "o_orderpriority"]
    ).aggregate(Sum("rev", alias_name="revenue"))

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "revenue": np.round(
                    t["revenue"].to_numpy(zero_copy_only=False), 6
                ),
                "o_orderdate": t["o_orderdate"].to_numpy(
                    zero_copy_only=False).astype("datetime64[us]")
                    .astype(np.int64),
                "o_orderpriority": t["o_orderpriority"],
            }
        )

    # distributed ordered head — the driver only ever sees k rows
    top = (
        per_order.map_batches(finish, batch_format="pyarrow")
        .sort(["revenue", "o_orderdate", "l_orderkey"],
              descending=[True, False, False])
        .limit(k)
        .to_pandas()
    )
    return top[["l_orderkey", "revenue", "o_orderdate", "o_orderpriority"]]
