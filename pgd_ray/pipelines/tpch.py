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
* ``q5`` — local-supplier volume by nation: ONE shuffle join
  (orders⋈lineitem, the two big tables); region/nation/supplier/
  customer become broadcast lookup arrays (``ray.put`` once, zero-copy
  views per worker) — the canonical star-schema pattern: never shuffle
  a dimension table.  Customer is the largest broadcast side (1.5 MB
  at SF-1; at SF-1000 promote it to the q3-style hash join).
* ``q6`` — forecast revenue change: pure filter + one global sum, no
  shuffle at all (per-batch partials, driver adds a handful of rows).

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

from pgd_ray.util import round_half_away as _rha


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
        # every money/rate column is an exact 2-decimal: sum EXACT
        # integer units (qty/price/disc ×100; disc_price ×1e4; charge
        # ×1e6) — float partial sums are combine-order-dependent at
        # rounding boundaries (the q7/q9 class found at sf0.1)
        q100 = np.rint(t["l_quantity"].to_numpy(
            zero_copy_only=False)[m] * 100.0).astype(np.int64)
        p100 = np.rint(t["l_extendedprice"].to_numpy(
            zero_copy_only=False)[m] * 100.0).astype(np.int64)
        d100 = np.rint(t["l_discount"].to_numpy(
            zero_copy_only=False)[m] * 100.0).astype(np.int64)
        t100 = np.rint(t["l_tax"].to_numpy(
            zero_copy_only=False)[m] * 100.0).astype(np.int64)
        dp4 = p100 * (100 - d100)
        return pa.table(
            {
                "l_returnflag": t["l_returnflag"].filter(pa.array(m)),
                "l_linestatus": t["l_linestatus"].filter(pa.array(m)),
                "q100": pa.array(q100, pa.int64()),
                "p100": pa.array(p100, pa.int64()),
                "d100": pa.array(d100, pa.int64()),
                "dp4": pa.array(dp4, pa.int64()),
                "ch6": pa.array(dp4 * (100 + t100), pa.int64()),
            }
        )

    agg = (
        li.map_batches(part, batch_format="pyarrow")
        .groupby(["l_returnflag", "l_linestatus"])
        .aggregate(
            Sum("q100", alias_name="sum_q100"),
            Sum("p100", alias_name="sum_p100"),
            Sum("dp4", alias_name="sum_dp4"),
            Sum("ch6", alias_name="sum_ch6"),
            Sum("d100", alias_name="sum_d100"),
            Count(alias_name="count_order"),
        )
        .to_pandas()
    )
    from pgd_ray.util import int_sum_headroom, round_half_away

    # ch6 averages ~4e10 per row — per-group int64 sums wrap past
    # ~sf150 while the oracle promotes to HUGEINT; fail loudly instead
    int_sum_headroom(agg["sum_ch6"].to_numpy(np.int64), "q1 sum_ch6")
    int_sum_headroom(agg["sum_dp4"].to_numpy(np.int64), "q1 sum_dp4")
    n = agg["count_order"].astype("int64")
    nf = n.to_numpy(np.float64)
    out = pd.DataFrame(
        {
            "l_returnflag": agg["l_returnflag"],
            "l_linestatus": agg["l_linestatus"],
            "sum_qty": round_half_away(
                agg["sum_q100"].to_numpy(np.float64) / 100.0, 2),
            "sum_base_price": round_half_away(
                agg["sum_p100"].to_numpy(np.float64) / 100.0, 2),
            "sum_disc_price": round_half_away(
                agg["sum_dp4"].to_numpy(np.float64) / 10000.0, 2),
            "sum_charge": round_half_away(
                agg["sum_ch6"].to_numpy(np.float64) / 1000000.0, 2),
            "avg_qty": round_half_away(
                agg["sum_q100"].to_numpy(np.float64) / (100.0 * nf), 6),
            "avg_price": round_half_away(
                agg["sum_p100"].to_numpy(np.float64) / (100.0 * nf), 6),
            "avg_disc": round_half_away(
                agg["sum_d100"].to_numpy(np.float64) / (100.0 * nf), 6),
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
        # exact 1e-4-dollar integer units (the q7/q9 float-sum class)
        rev4 = (np.rint(price * 100.0).astype(np.int64)
                * (100 - np.rint(disc * 100.0).astype(np.int64)))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "rev4": pa.array(rev4, pa.int64())})

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
    ).aggregate(Sum("rev4", alias_name="rev4"))

    def finish(t: pa.Table) -> pa.Table:
        from pgd_ray.util import round_half_away

        return pa.table(
            {
                "l_orderkey": t["l_orderkey"],
                "revenue": round_half_away(
                    t["rev4"].to_numpy(zero_copy_only=False)
                    .astype(np.float64) / 10000.0, 6),
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


_DIM_CACHE: dict = {}


def _dim_arrays(ref):
    """Zero-copy per-worker view of the broadcast dimension arrays."""
    key = ref.hex()
    st = _DIM_CACHE.get(key)
    if st is None:
        st = ray.get(ref)
        _DIM_CACHE.clear()
        _DIM_CACHE[key] = st
    return st


def q5(
    sf_dir: str,
    region: str,
    date_lo_us: int,
    date_hi_us: int,
    num_partitions: int = 8,
) -> pd.DataFrame:
    """Local-supplier volume: revenue per nation of the given region,
    over orders in [date_lo, date_hi), where the supplying nation
    equals the customer's nation.  Columns (n_name, revenue), revenue
    desc."""
    import pyarrow.parquet as pq

    from pgd_ray.util import read_parquet_clean

    # dimension tables -> dense lookup arrays, broadcast ONCE
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    cst = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    rkey = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    in_region = np.zeros(int(nat["n_nationkey"].max()) + 1, dtype=bool)
    names = np.empty(len(in_region), dtype=object)
    for _, r in nat.iterrows():
        in_region[r["n_nationkey"]] = r["n_regionkey"] in rkey
        names[r["n_nationkey"]] = r["n_name"]
    sup_nat = np.full(int(sup["s_suppkey"].max()) + 1, -1, dtype=np.int64)
    sup_nat[sup["s_suppkey"].to_numpy()] = sup["s_nationkey"].to_numpy()
    cst_nat = np.full(int(cst["c_custkey"].max()) + 1, -1, dtype=np.int64)
    cst_nat[cst["c_custkey"].to_numpy()] = cst["c_nationkey"].to_numpy()
    dims = ray.put((in_region, names, sup_nat, cst_nat))

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey", "o_orderdate"]
    ).map_batches(
        lambda t: t.filter(pa.array(
            (lambda v: (v >= date_lo_us) & (v < date_hi_us))(
                t["o_orderdate"].to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").astype(np.int64)
            )
        )).select(["o_orderkey", "o_custkey"]),
        batch_format="pyarrow",
    )
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"],
    )
    j = li.join(
        orders, "inner", num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )

    def local_rev(t: pa.Table, dims_ref) -> pa.Table:
        in_region, names, sup_nat, cst_nat = _dim_arrays(dims_ref)
        sn = sup_nat[t["l_suppkey"].to_numpy(zero_copy_only=False)]
        cn = cst_nat[t["o_custkey"].to_numpy(zero_copy_only=False)]
        m = (sn == cn) & (sn >= 0) & in_region[np.maximum(sn, 0)]
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        disc = t["l_discount"].to_numpy(zero_copy_only=False)[m]
        # exact 1e-4-dollar integer units (the q7/q9 float-sum class)
        rev4 = (np.rint(price * 100.0).astype(np.int64)
                * (100 - np.rint(disc * 100.0).astype(np.int64)))
        return pa.table({
            "n_name": pa.array(names[sn[m]], pa.string()),
            "rev4": pa.array(rev4, pa.int64()),
        })

    agg = (
        j.map_batches(local_rev, fn_kwargs={"dims_ref": dims},
                      batch_format="pyarrow")
        .groupby("n_name")
        .aggregate(Sum("rev4", alias_name="rev4"))
        .to_pandas()
    )
    from pgd_ray.util import round_half_away

    agg["revenue"] = round_half_away(
        agg.pop("rev4").to_numpy(np.float64) / 10000.0, 2)
    return agg.sort_values(
        ["revenue", "n_name"], ascending=[False, True], ignore_index=True
    )


def q6(
    sf_dir: str,
    date_lo_us: int,
    date_hi_us: int,
    disc_lo: float,
    disc_hi: float,
    qty_below: float,
) -> pd.DataFrame:
    """Forecast revenue change: SUM(l_extendedprice·l_discount) over
    shipdate ∈ [lo, hi), discount ∈ [disc_lo, disc_hi], quantity <
    qty_below.  One column (revenue), one row."""
    from pgd_ray.util import read_parquet_clean

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_shipdate"],
    )

    def part(t: pa.Table) -> pa.Table:
        ship = t["l_shipdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        m = ((ship >= date_lo_us) & (ship < date_hi_us)
             & (disc >= disc_lo) & (disc <= disc_hi) & (qty < qty_below))
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        # exact 1e-4-dollar integer partials (the q7/q9 class)
        r4 = (np.rint(price[m] * 100.0).astype(np.int64)
              * np.rint(disc[m] * 100.0).astype(np.int64))
        return pa.table({"rev4": pa.array([int(r4.sum())], pa.int64())})

    total4 = sum(
        int(b["rev4"].to_numpy(zero_copy_only=False).sum())
        for b in li.map_batches(part, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow")
    )
    return pd.DataFrame({"revenue": [float(_rha(total4 / 10000.0, 2))]})


def q4(
    sf_dir: str,
    date_lo_us: int,
    date_hi_us: int,
    returnflag: str = "R",
    strategy: str = "partitioned",
) -> pd.DataFrame:
    """Order-priority check (TPC-H Q4 shape on this schema's columns):
    orders in [lo, hi) having AT LEAST ONE lineitem with the given
    return flag — an EXISTS semi-join — counted per priority.

    The semi-join is the distributed path by default (distinct
    l_orderkey hash agg → hash join): the lineitem side is the BIG
    table, exactly the case the broadcast strategy must not assume."""
    from pgd_ray.stages.joins import semi_join
    from pgd_ray.util import read_parquet_clean

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderdate", "o_orderpriority"],
    )

    def in_window(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        return t.filter(pa.array((d >= date_lo_us) & (d < date_hi_us)))

    orders = orders.map_batches(in_window, batch_format="pyarrow")
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag"],
    ).filter(expr=f"l_returnflag == '{returnflag}'")
    hit = semi_join(orders, li, left_key="o_orderkey",
                    right_key="l_orderkey", strategy=strategy)
    agg = hit.groupby("o_orderpriority").aggregate(
        Count(alias_name="order_count"))
    df = agg.to_pandas().sort_values("o_orderpriority", ignore_index=True)
    df["order_count"] = df["order_count"].astype(np.int64)
    return df[["o_orderpriority", "order_count"]]


def q10(
    sf_dir: str,
    date_lo_us: int,
    date_hi_us: int,
    returnflag: str = "R",
    k: int = 20,
    num_partitions: int = 8,
) -> pd.DataFrame:
    """Returned-item revenue ranking (TPC-H Q10 shape on this schema):
    top-k customers by revenue of returned lineitems on orders placed
    in [lo, hi).  ONE big⋈big hash join (flag-filtered lineitem ⋈
    window-filtered orders), revenue pre-aggregated per custkey BEFORE
    the customer/nation dimensions are touched; the dimensions
    decorate the small per-customer aggregate via a broadcast lookup
    (never shuffled).  Columns (c_custkey, c_name, revenue, c_acctbal,
    n_name), ordered (revenue desc, c_custkey) — revenue rounded to
    cents first, the engine/oracle ordering contract."""
    import pyarrow.parquet as pq_mod

    from pgd_ray.util import read_parquet_clean

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_extendedprice", "l_discount", "l_returnflag"],
    )

    def rev(t: pa.Table) -> pa.Table:
        t = t.filter(pc.equal(t["l_returnflag"].combine_chunks(), returnflag))
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        # exact 1e-4-dollar integer units (the q7/q9 float-sum class)
        rev4 = (np.rint(price * 100.0).astype(np.int64)
                * (100 - np.rint(disc * 100.0).astype(np.int64)))
        return pa.table({"l_orderkey": t["l_orderkey"],
                         "rev4": pa.array(rev4, pa.int64())})

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    )

    def in_window(t: pa.Table) -> pa.Table:
        d = t["o_orderdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        return t.filter(pa.array((d >= date_lo_us) & (d < date_hi_us))
                        ).select(["o_orderkey", "o_custkey"])

    owin = orders.map_batches(in_window, batch_format="pyarrow").materialize()
    if owin.count() == 0:
        # Ray's hash join cannot finalize against an empty build side
        return pd.DataFrame({
            "c_custkey": pd.Series([], dtype=np.int64),
            "c_name": pd.Series([], dtype=object),
            "revenue": pd.Series([], dtype=np.float64),
            "c_acctbal": pd.Series([], dtype=np.float64),
            "n_name": pd.Series([], dtype=object)})
    j = li.map_batches(rev, batch_format="pyarrow").join(
        owin, "inner", num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )
    per_cust = j.groupby("o_custkey").aggregate(Sum("rev4", alias_name="rev4"))

    cst = pq_mod.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_name", "c_acctbal", "c_nationkey"])
    nat = pq_mod.read_table(f"{sf_dir}/nation.parquet",
                            columns=["n_nationkey", "n_name"])
    nnames = np.empty(int(nat["n_nationkey"].to_numpy().max()) + 1, object)
    nnames[nat["n_nationkey"].to_numpy()] = nat["n_name"].to_numpy(
        zero_copy_only=False)
    ck = cst["c_custkey"].to_numpy().astype(np.int64)
    size = int(ck.max()) + 1
    cname = np.empty(size, object)
    cbal = np.zeros(size, np.float64)
    cnat = np.zeros(size, np.int64)
    cname[ck] = cst["c_name"].to_numpy(zero_copy_only=False)
    cbal[ck] = cst["c_acctbal"].to_numpy()
    cnat[ck] = cst["c_nationkey"].to_numpy().astype(np.int64)
    dims = ray.put((cname, cbal, cnat, nnames))

    def decorate(t: pa.Table, dims_ref) -> pa.Table:
        cname, cbal, cnat, nnames = _dim_arrays(dims_ref)
        c = t["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "c_custkey": pa.array(c, pa.int64()),
            "c_name": pa.array(cname[c], pa.string()),
            "revenue": _rha(t["rev4"].to_numpy(zero_copy_only=False)
                            .astype(np.float64) / 10000.0, 2),
            "c_acctbal": pa.array(cbal[c], pa.float64()),
            "n_name": pa.array(nnames[cnat[c]], pa.string()),
        })

    top = (
        per_cust.map_batches(decorate, fn_kwargs={"dims_ref": dims},
                             batch_format="pyarrow")
        .sort(["revenue", "c_custkey"], descending=[True, False])
        .limit(k)
        .to_pandas()
    )
    return top[["c_custkey", "c_name", "revenue", "c_acctbal", "n_name"]]


def q18(
    sf_dir: str,
    qty_over: float = 250.0,
    k: int = 100,
    num_partitions: int = 8,
) -> pd.DataFrame:
    """Large-volume customers (TPC-H Q18 shape): orders whose total
    lineitem quantity exceeds ``qty_over``, decorated with the order
    and customer, top-k by (o_totalprice desc, o_orderdate,
    o_orderkey).  The HAVING side is ONE per-orderkey hash aggregate
    of lineitem (never the raw rows); the qualifying key set is tiny
    and joins orders distributed, customer decorates via broadcast."""
    import pyarrow.parquet as pq_mod

    from pgd_ray.util import read_parquet_clean

    li = read_parquet_clean(f"{sf_dir}/lineitem.parquet",
                            columns=["l_orderkey", "l_quantity"])
    per_order = li.groupby("l_orderkey").aggregate(
        Sum("l_quantity", alias_name="total_qty"))

    def over(t: pa.Table) -> pa.Table:
        q = t["total_qty"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(q > qty_over))

    big = per_order.map_batches(over, batch_format="pyarrow").materialize()
    cols = ["c_custkey", "c_name", "o_orderkey", "o_orderdate",
            "o_totalprice", "total_qty"]
    if big.count() == 0:
        # Ray's hash join cannot finalize against an empty build side
        return pd.DataFrame({
            c: pd.Series([], dtype=object if c == "c_name" else
                         (np.float64 if c in ("o_totalprice", "total_qty")
                          else np.int64)) for c in cols})

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    j = orders.join(
        big, "inner", num_partitions,
        on=("o_orderkey",), right_on=("l_orderkey",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )

    cst = pq_mod.read_table(f"{sf_dir}/customer.parquet",
                            columns=["c_custkey", "c_name"])
    ck = cst["c_custkey"].to_numpy().astype(np.int64)
    cname = np.empty(int(ck.max()) + 1, object)
    cname[ck] = cst["c_name"].to_numpy(zero_copy_only=False)
    dims = ray.put(cname)

    def decorate(t: pa.Table, dims_ref) -> pa.Table:
        cname = _dim_arrays(dims_ref)
        c = t["o_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "c_custkey": pa.array(c, pa.int64()),
            "c_name": pa.array(cname[c], pa.string()),
            "o_orderkey": t["o_orderkey"],
            "o_orderdate": t["o_orderdate"].to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").astype(np.int64),
            "o_totalprice": t["o_totalprice"],
            "total_qty": np.round(
                t["total_qty"].to_numpy(zero_copy_only=False), 2),
        })

    top = (
        j.map_batches(decorate, fn_kwargs={"dims_ref": dims},
                      batch_format="pyarrow")
        .sort(["o_totalprice", "o_orderdate", "o_orderkey"],
              descending=[True, False, False])
        .limit(k)
        .to_pandas()
    )
    return top[cols]


def q12(
    sf_dir: str,
    date_lo_us: int,
    date_hi_us: int,
    num_partitions: int = 8,
) -> pd.DataFrame:
    """Shipping-priority split (TPC-H Q12 shape on this schema): per
    return flag, how many shipped-in-window lineitems belong to
    high- vs low-priority orders — conditional aggregation over ONE
    distributed hash join of the two big tables (orders pre-projected
    to (key, is_high int8) before the shuffle)."""
    from pgd_ray.util import read_parquet_clean

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_orderpriority"])

    def proj(t: pa.Table) -> pa.Table:
        pr = t["o_orderpriority"].to_numpy(zero_copy_only=False)
        hi = np.isin(pr, ("1-URGENT", "2-HIGH")).astype(np.int64)
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "is_high": pa.array(hi, pa.int64())})

    orders = orders.map_batches(proj, batch_format="pyarrow").materialize()
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_returnflag", "l_shipdate"])

    def in_window(t: pa.Table) -> pa.Table:
        d = t["l_shipdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        t = t.filter(pa.array((d >= date_lo_us) & (d < date_hi_us)))
        return t.drop_columns(["l_shipdate"])

    li = li.map_batches(in_window, batch_format="pyarrow").materialize()
    j = li.join(
        orders, "inner", num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    ).materialize()
    agg = j.groupby("l_returnflag").aggregate(
        Sum("is_high", alias_name="high_line_count"),
        Count(alias_name="_n"),
    )
    df = agg.to_pandas().sort_values("l_returnflag", ignore_index=True)
    df["high_line_count"] = df["high_line_count"].astype(np.int64)
    df["low_line_count"] = (df["_n"] - df["high_line_count"]).astype(np.int64)
    return df[["l_returnflag", "high_line_count", "low_line_count"]]


def q14(
    sf_dir: str,
    date_lo_us: int,
    date_hi_us: int,
) -> pd.DataFrame:
    """Promotion-revenue share (TPC-H Q14 shape): part is the TRUE
    dimension table, broadcast once as a sorted (p_partkey ->
    is_promo) lookup probed inside every lineitem batch — the big
    side never shuffles; the result is two partial sums."""
    import ray

    import pyarrow.parquet as pq_mod

    from pgd_ray.util import read_parquet_clean

    pt = pq_mod.read_table(f"{sf_dir}/part.parquet",
                           columns=["p_partkey", "p_type"])
    keys = pt["p_partkey"].to_numpy(zero_copy_only=False).astype(np.int64)
    promo = np.char.startswith(
        pt["p_type"].to_numpy(zero_copy_only=False).astype(str), "PROMO")
    order = np.argsort(keys)
    ref = ray.put((keys[order], promo[order]))

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_extendedprice", "l_discount", "l_shipdate"])

    class Part:
        def __init__(self, lookup_ref):
            self.keys, self.promo = ray.get(lookup_ref)

        def __call__(self, t: pa.Table) -> pa.Table:
            d = t["l_shipdate"].to_numpy(zero_copy_only=False).astype(
                "datetime64[us]").astype(np.int64)
            m = (d >= date_lo_us) & (d < date_hi_us)
            pk = t["l_partkey"].to_numpy(zero_copy_only=False)[m]
            # exact 1e-4-dollar integer partials (the q7/q9 class)
            pr = t["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
            dc = t["l_discount"].to_numpy(zero_copy_only=False)[m]
            rev4 = (np.rint(pr * 100.0).astype(np.int64)
                    * (100 - np.rint(dc * 100.0).astype(np.int64)))
            pos = np.searchsorted(self.keys, pk)
            pos[pos == len(self.keys)] = 0
            isp = (self.keys[pos] == pk) & self.promo[pos]
            return pa.table({
                "promo4": pa.array([int(rev4[isp].sum())], pa.int64()),
                "total4": pa.array([int(rev4.sum())], pa.int64()),
            })

    from pgd_ray.util import bound_cls

    promo4 = total4 = 0
    for b in li.map_batches(
        bound_cls(Part, lookup_ref=ref), batch_format="pyarrow",
        batch_size=65536, concurrency=(1, 8),
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        promo4 += int(b["promo4"].to_numpy(zero_copy_only=False).sum())
        total4 += int(b["total4"].to_numpy(zero_copy_only=False).sum())
    share = 100.0 * float(promo4) / float(total4) if total4 else 0.0
    return pd.DataFrame({"promo_revenue": [float(_rha(share, 4))]})


def q13(sf_dir: str, exclude_priority: str = "1-URGENT") -> pd.DataFrame:
    """Customer order-count distribution (TPC-H Q13 shape on this
    schema: the comment-pattern exclusion becomes a priority
    exclusion).  NO join at all: the per-customer count histogram
    comes from one hash aggregate of filtered orders, and the
    zero-order bucket is (total customers − customers with orders) —
    two scalar counts.  Columns (c_count, custdist), ordered
    (custdist desc, c_count desc)."""
    from pgd_ray.util import read_parquet_clean

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_orderpriority"]
    ).filter(expr=f"o_orderpriority != '{exclude_priority}'")
    per_cust = orders.groupby("o_custkey").aggregate(
        Count(alias_name="c_count")).materialize()
    hist = (
        per_cust.groupby("c_count")
        .aggregate(Count(alias_name="custdist"))
        .to_pandas()
    )
    n_customers = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey"]).count()
    zero = n_customers - int(per_cust.count())
    if zero > 0:
        hist = pd.concat([hist, pd.DataFrame(
            {"c_count": [0], "custdist": [zero]})], ignore_index=True)
    hist = hist.astype({"c_count": np.int64, "custdist": np.int64})
    return hist.sort_values(["custdist", "c_count"],
                            ascending=[False, False], ignore_index=True)


def q7(
    sf_dir: str,
    nation_a: str = "NATION_3",
    nation_b: str = "NATION_19",
    date_lo_us: int = 788_918_400_000_000,
    date_hi_us: int = 1_009_843_200_000_000,
    num_partitions: int = 8,
) -> pd.DataFrame:
    """Volume shipping between two nations (TPC-H Q7 shape): revenue
    per (supplier nation, customer nation, ship year) for cross-nation
    pairs, shipdate in [lo, hi).  ONE big⋈big hash join
    (lineitem⋈orders); supplier / customer / nation dimensions are
    broadcast lookup arrays (the q5 star-schema pattern).  Columns
    (supp_nation, cust_nation, l_year, revenue), ordered by the three
    keys."""
    import pyarrow.parquet as pq_mod

    from pgd_ray.util import read_parquet_clean

    nat = pq_mod.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    sup = pq_mod.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey"]).to_pandas()
    cst = pq_mod.read_table(
        f"{sf_dir}/customer.parquet",
        columns=["c_custkey", "c_nationkey"]).to_pandas()
    names = np.empty(int(nat["n_nationkey"].max()) + 1, object)
    names[nat["n_nationkey"].to_numpy()] = nat["n_name"].to_numpy()
    sup_nat = np.full(int(sup["s_suppkey"].max()) + 1, -1, np.int64)
    sup_nat[sup["s_suppkey"].to_numpy()] = sup["s_nationkey"].to_numpy()
    cst_nat = np.full(int(cst["c_custkey"].max()) + 1, -1, np.int64)
    cst_nat[cst["c_custkey"].to_numpy()] = cst["c_nationkey"].to_numpy()
    dims = ray.put((names, sup_nat, cst_nat))

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_custkey"])
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_extendedprice",
                 "l_discount", "l_shipdate"])

    def in_window(t: pa.Table) -> pa.Table:
        d = t["l_shipdate"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        return t.filter(pa.array((d >= date_lo_us) & (d < date_hi_us)))

    j = li.map_batches(in_window, batch_format="pyarrow").join(
        orders, "inner", num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )

    def volume(t: pa.Table, dims_ref=dims) -> pa.Table:
        names, sup_nat, cst_nat = _dim_arrays(dims_ref)
        sn = sup_nat[t["l_suppkey"].to_numpy(zero_copy_only=False)]
        cn = cst_nat[t["o_custkey"].to_numpy(zero_copy_only=False)]
        sname = names[np.maximum(sn, 0)]
        cname = names[np.maximum(cn, 0)]
        m = (((sname == nation_a) & (cname == nation_b))
             | ((sname == nation_b) & (cname == nation_a))) \
            & (sn >= 0) & (cn >= 0)
        if not m.any():
            return pa.table({"supp_nation": pa.array([], pa.string()),
                             "cust_nation": pa.array([], pa.string()),
                             "l_year": pa.array([], pa.int64()),
                             "vol4": pa.array([], pa.int64())})
        ship = t["l_shipdate"].to_numpy(zero_copy_only=False)[m]
        year = ship.astype("datetime64[Y]").astype(np.int64) + 1970
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        disc = t["l_discount"].to_numpy(zero_copy_only=False)[m]
        # exact 1e-4-dollar integer volume: price is integer cents,
        # discount integer percent — float partial sums are combine-
        # order-dependent and land on the wrong side of the cent
        # rounding boundary at sf0.1 (same class as user_activity)
        vol4 = (np.rint(price * 100.0).astype(np.int64)
                * (100 - np.rint(disc * 100.0).astype(np.int64)))
        return pa.table({
            "supp_nation": pa.array(sname[m], pa.string()),
            "cust_nation": pa.array(cname[m], pa.string()),
            "l_year": pa.array(year, pa.int64()),
            "vol4": pa.array(vol4, pa.int64()),
        })

    agg = (
        j.map_batches(volume, batch_format="pyarrow")
        .groupby(["supp_nation", "cust_nation", "l_year"])
        .aggregate(Sum("vol4", alias_name="rev4"))
        .to_pandas()
    )
    if agg.empty:  # empty aggregates lose their columns
        return pd.DataFrame({
            "supp_nation": pd.Series([], dtype=object),
            "cust_nation": pd.Series([], dtype=object),
            "l_year": pd.Series([], dtype=np.int64),
            "revenue": pd.Series([], dtype=np.float64)})
    from pgd_ray.util import round_half_away

    agg["revenue"] = round_half_away(
        agg.pop("rev4").to_numpy(np.float64) / 10000.0, 2)
    return agg.sort_values(["supp_nation", "cust_nation", "l_year"],
                           ignore_index=True)


def q8(
    sf_dir: str,
    nation: str,
    region: str,
    ptype: str,
    date_lo_us: int,
    date_hi_us: int,
    num_partitions: int = 8,
) -> pd.DataFrame:
    """National market share: per order-year in [lo, hi), the share of
    ``region``-market revenue (customer's nation in the region, part
    of the given type) supplied by ``nation``.  Columns
    (o_year, mkt_share).  Same star-schema posture as q5: ONE shuffle
    join (orders⋈lineitem); part/supplier/customer/nation/region all
    collapse to broadcast dense lookup arrays."""
    import pyarrow.parquet as pq

    from pgd_ray.util import read_parquet_clean

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    prt = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).to_pandas()
    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    cst = pq.read_table(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_nationkey"]
    ).to_pandas()
    rkey = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    in_region = np.zeros(int(nat["n_nationkey"].max()) + 1, dtype=bool)
    for _, r in nat.iterrows():
        in_region[r["n_nationkey"]] = r["n_regionkey"] in rkey
    tkeys = nat.loc[nat["n_name"] == nation, "n_nationkey"]
    target = int(tkeys.iloc[0]) if len(tkeys) else -1
    sel_part = np.zeros(int(prt["p_partkey"].max()) + 1, dtype=bool)
    sel_part[prt.loc[prt["p_type"] == ptype, "p_partkey"].to_numpy()] = True
    sup_nat = np.full(int(sup["s_suppkey"].max()) + 1, -1, dtype=np.int64)
    sup_nat[sup["s_suppkey"].to_numpy()] = sup["s_nationkey"].to_numpy()
    cst_nat = np.full(int(cst["c_custkey"].max()) + 1, -1, dtype=np.int64)
    cst_nat[cst["c_custkey"].to_numpy()] = cst["c_nationkey"].to_numpy()
    dims = ray.put((in_region, sel_part, sup_nat, cst_nat, target))

    def ord_proj(t: pa.Table) -> pa.Table:
        d = (t["o_orderdate"].to_numpy(zero_copy_only=False)
             .astype("datetime64[us]"))
        m = (d.astype(np.int64) >= date_lo_us) & (d.astype(np.int64) < date_hi_us)
        yr = d[m].astype("datetime64[Y]").astype(np.int64) + 1970
        return pa.table({
            "o_orderkey": t["o_orderkey"].filter(pa.array(m)),
            "o_custkey": t["o_custkey"].filter(pa.array(m)),
            "o_year": yr,
        })

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate"],
    ).map_batches(ord_proj, batch_format="pyarrow")
    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    )
    j = li.join(
        orders, "inner", num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )

    def vols(t: pa.Table, dims_ref) -> pa.Table:
        in_region, sel_part, sup_nat, cst_nat, target = _dim_arrays(dims_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        ck = t["o_custkey"].to_numpy(zero_copy_only=False)
        cn = cst_nat[ck]
        m = sel_part[pk] & (cn >= 0) & in_region[np.maximum(cn, 0)]
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        disc = t["l_discount"].to_numpy(zero_copy_only=False)[m]
        # exact 1e-4-dollar integer units (the q7/q9 float-sum class)
        vol4 = (np.rint(price * 100.0).astype(np.int64)
                * (100 - np.rint(disc * 100.0).astype(np.int64)))
        is_t = sup_nat[t["l_suppkey"].to_numpy(zero_copy_only=False)[m]] == target
        return pa.table({
            "o_year": t["o_year"].filter(pa.array(m)),
            "vol4": pa.array(vol4, pa.int64()),
            "tvol4": pa.array(np.where(is_t, vol4, 0), pa.int64()),
        })

    agg = (
        j.map_batches(vols, fn_kwargs={"dims_ref": dims},
                      batch_format="pyarrow")
        .groupby("o_year")
        .aggregate(Sum("vol4", alias_name="vol4"),
                   Sum("tvol4", alias_name="tvol4"))
        .to_pandas()
    )
    if agg.empty:
        return pd.DataFrame({"o_year": pd.Series([], dtype=np.int64),
                             "mkt_share": pd.Series([], dtype=np.float64)})
    return pd.DataFrame({
        "o_year": agg["o_year"].astype(np.int64),
        "mkt_share": _rha(agg["tvol4"].to_numpy(np.float64)
                          / agg["vol4"].to_numpy(np.float64), 6),
    }).sort_values("o_year", ignore_index=True)


def q15(
    sf_dir: str,
    date_lo_us: int,
    date_hi_us: int,
) -> pd.DataFrame:
    """Top supplier(s) by revenue over one quarter of shipments:
    per-batch partial sums per suppkey (combine-before-shuffle), one
    tiny groupby, driver-side max + tie filter (output is O(#ties)),
    supplier names decorated from the small dimension read.  Columns
    (s_suppkey, s_name, total_revenue)."""
    import pyarrow.parquet as pq

    from pgd_ray.util import read_parquet_clean

    def part(t: pa.Table) -> pa.Table:
        ship = (t["l_shipdate"].to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").astype(np.int64))
        m = (ship >= date_lo_us) & (ship < date_hi_us)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)[m]
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        disc = t["l_discount"].to_numpy(zero_copy_only=False)[m]
        # exact 1e-4-dollar integer partials (the q7/q9 class)
        r4 = (np.rint(price * 100.0).astype(np.int64)
              * (100 - np.rint(disc * 100.0).astype(np.int64)))
        df = pd.DataFrame({"s": sk, "r4": r4})
        g = df.groupby("s", as_index=False)["r4"].sum()
        return pa.table({"l_suppkey": g["s"].to_numpy(np.int64),
                         "rev4": g["r4"].to_numpy(np.int64)})

    rev = (
        read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_suppkey", "l_extendedprice", "l_discount",
                     "l_shipdate"],
        )
        .map_batches(part, batch_format="pyarrow")
        .groupby("l_suppkey")
        .aggregate(Sum("rev4", alias_name="rev4"))
        .to_pandas()
    )
    if rev.empty:
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype=np.int64),
                             "s_name": pd.Series([], dtype=object),
                             "total_revenue": pd.Series([], dtype=np.float64)})
    rev["total_revenue"] = _rha(rev.pop("rev4").to_numpy(np.float64)
                                / 10000.0, 2)
    best = rev[rev["total_revenue"] == rev["total_revenue"].max()]
    names = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_name"]
    ).to_pandas().set_index("s_suppkey")["s_name"]
    out = pd.DataFrame({
        "s_suppkey": best["l_suppkey"].astype(np.int64).to_numpy(),
        "s_name": best["l_suppkey"].map(names).to_numpy(),
        "total_revenue": best["total_revenue"].to_numpy(),
    })
    return out.sort_values("s_suppkey", ignore_index=True)


def q17(
    sf_dir: str,
    brand: str,
) -> pd.DataFrame:
    """Small-quantity-order revenue for one brand (the p_container
    predicate of canonical Q17 is dropped — the slim schema carries no
    container column): average yearly revenue lost if orders with
    l_quantity < 0.2·avg(per-part quantity) were not filled.  Pass 1
    aggregates per-part (sum, count) over the brand's lineitems; the
    resulting per-part threshold map is O(#brand parts) and broadcast;
    pass 2 filters and sums.  One row (avg_yearly)."""
    import pyarrow.parquet as pq

    from pgd_ray.util import read_parquet_clean

    prt = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand"]
    ).to_pandas()
    sel = np.zeros(int(prt["p_partkey"].max()) + 1, dtype=bool)
    sel[prt.loc[prt["p_brand"] == brand, "p_partkey"].to_numpy()] = True
    sel_ref = ray.put(sel)

    def brand_rows(t: pa.Table, sel_ref) -> pa.Table:
        s = _dim_arrays(sel_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(s[pk]))

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice"],
    ).map_batches(brand_rows, fn_kwargs={"sel_ref": sel_ref},
                  batch_format="pyarrow").materialize()
    per_part = (
        li.groupby("l_partkey")
        .aggregate(Sum("l_quantity", alias_name="qsum"),
                   Count(alias_name="qcnt"))
        .to_pandas()
    )
    if per_part.empty:
        return pd.DataFrame({"avg_yearly": pd.Series([], dtype=np.float64)})
    thr = dict(zip(
        per_part["l_partkey"].to_numpy(np.int64),
        0.2 * (per_part["qsum"].to_numpy(np.float64)
               / per_part["qcnt"].to_numpy(np.float64)),
    ))
    thr_ref = ray.put(thr)

    def small(t: pa.Table, thr_ref) -> pa.Table:
        tm = _dim_arrays(thr_ref)
        pk = t["l_partkey"].to_pandas()
        lim = pk.map(tm).to_numpy(np.float64)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        # price summed as exact integer cents (the q7/q9 class);
        # quantities are pure integers so the threshold is exact
        p100 = np.rint(price[qty < lim] * 100.0).astype(np.int64)
        return pa.table({"p100": pa.array([int(p100.sum())], pa.int64())})

    total100 = sum(
        int(b["p100"].to_numpy(zero_copy_only=False).sum())
        for b in li.map_batches(small, fn_kwargs={"thr_ref": thr_ref},
                                batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    return pd.DataFrame({"avg_yearly": [float(_rha(
        total100 / 100.0 / 7.0, 2))]})


def q19(
    sf_dir: str,
    disjuncts: list[tuple[str, int, int, float, float]] = (
        ("Brand#12", 1, 25, 1.0, 11.0),
        ("Brand#23", 1, 30, 10.0, 20.0),
        ("Brand#34", 1, 40, 20.0, 30.0),
    ),
) -> pd.DataFrame:
    """Discounted-revenue for disjunctive brand/size/quantity
    predicates (TPC-H Q19 shape; the slim schema carries no
    container / shipmode / shipinstruct columns, so each disjunct is
    (brand, size_lo, size_hi, qty_lo, qty_hi)).

    NO shuffle at all: part's (brand-id, size) become two broadcast
    arrays indexed by p_partkey (``ray.put`` once, zero-copy view per
    worker); each lineitem batch evaluates the whole OR-of-ANDs as a
    vectorized mask and emits one partial revenue sum — the driver
    adds a handful of scalars.  One row (revenue)."""
    import pyarrow.parquet as pq_mod

    from pgd_ray.util import read_parquet_clean

    prt = pq_mod.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_brand", "p_size"]
    ).to_pandas()
    brands = sorted({d[0] for d in disjuncts})
    bid = {b: i for i, b in enumerate(brands)}
    n_slot = int(prt["p_partkey"].max()) + 1 if len(prt) else 1
    # -1 = brand not referenced by any disjunct -> never matches
    part_bid = np.full(n_slot, -1, np.int64)
    part_bid[prt["p_partkey"].to_numpy()] = (
        prt["p_brand"].map(bid).fillna(-1).to_numpy(np.int64))
    part_size = np.zeros(n_slot, np.int64)
    part_size[prt["p_partkey"].to_numpy()] = prt["p_size"].to_numpy(np.int64)
    dims = ray.put((part_bid, part_size,
                    [(bid[b], slo, shi, qlo, qhi)
                     for b, slo, shi, qlo, qhi in disjuncts]))

    def part_rev(t: pa.Table, dims) -> pa.Table:
        part_bid, part_size, dj = _dim_arrays(dims)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        qty = t["l_quantity"].to_numpy(zero_copy_only=False)
        b = part_bid[pk]
        s = part_size[pk]
        m = np.zeros(len(pk), bool)
        for dbid, slo, shi, qlo, qhi in dj:
            m |= (b == dbid) & (s >= slo) & (s <= shi) \
                 & (qty >= qlo) & (qty <= qhi)
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)[m]
        disc = t["l_discount"].to_numpy(zero_copy_only=False)[m]
        # exact 1e-4-dollar integer partials (the q7/q9 class)
        p4 = (np.rint(price * 100.0).astype(np.int64)
              * (100 - np.rint(disc * 100.0).astype(np.int64)))
        return pa.table({"p4": pa.array([int(p4.sum())], pa.int64())})

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_partkey", "l_quantity", "l_extendedprice", "l_discount"],
    )
    total4 = sum(
        int(b["p4"].to_numpy(zero_copy_only=False).sum())
        for b in li.map_batches(part_rev, fn_kwargs={"dims": dims},
                                batch_format="pyarrow")
        .iter_batches(batch_size=None, batch_format="pyarrow")
    )
    return pd.DataFrame({"revenue": [float(_rha(total4 / 10000.0, 2))]})


def q22(
    sf_dir: str,
    totalprice_above: float = 450_000.0,
) -> pd.DataFrame:
    """Global-sales-opportunity (TPC-H Q22 shape on the slim schema:
    no c_phone, so the country code is the deterministic
    ``c_custkey % 10``, and the "has placed no orders" predicate
    becomes "has placed no order with o_totalprice > threshold" —
    every sf>0 customer here has orders, which would make the
    canonical anti-join vacuously empty).

    Shape preserved end to end: scalar subquery (avg positive
    acctbal, one aggregate pass) -> anti-join of customers against
    the qualifying-order custkey set (``stages.joins.anti_join``
    broadcast strategy: the distinct-key array is ∝ high-price
    customers, shipped once) -> tiny group-aggregate.  Columns
    (cntrycode, numcust, totacctbal), ordered by cntrycode."""
    from pgd_ray.stages.joins import anti_join
    from pgd_ray.util import read_parquet_clean

    cust = read_parquet_clean(
        f"{sf_dir}/customer.parquet", columns=["c_custkey", "c_acctbal"])

    def cents_col(t: pa.Table) -> pa.Table:
        c100 = np.rint(t["c_acctbal"].to_numpy(zero_copy_only=False)
                       * 100.0).astype(np.int64)
        return t.append_column("c100", pa.array(c100, pa.int64()))

    cust = cust.map_batches(cents_col, batch_format="pyarrow"
                            ).materialize()
    pos = cust.filter(expr="c100 > 0").aggregate(
        Sum("c100", alias_name="s"), Count(alias_name="n"))
    if not pos["n"]:
        return pd.DataFrame({
            "cntrycode": pd.Series([], dtype=np.int64),
            "numcust": pd.Series([], dtype=np.int64),
            "totacctbal": pd.Series([], dtype=np.float64)})
    s_cents, n_pos = int(pos["s"]), int(pos["n"])

    big_orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_custkey", "o_totalprice"]
    ).filter(expr=f"o_totalprice > {totalprice_above!r}")
    # the avg-balance threshold compares EXACT integers
    # (cents·n > Σcents): a float average as the cut line can place
    # borderline customers differently than the SQL oracle.  (Ray's
    # filter expr can't take an arithmetic left operand.)
    def _rich(t: pa.Table, n_pos=n_pos, s_cents=s_cents) -> pa.Table:
        c = t["c100"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(c * n_pos > s_cents))

    rich = cust.map_batches(_rich, batch_format="pyarrow")
    kept = anti_join(rich, big_orders,
                     left_key="c_custkey", right_key="o_custkey")

    def code(t: pa.Table) -> pa.Table:
        ck = t["c_custkey"].to_numpy(zero_copy_only=False)
        return pa.table({
            "cntrycode": pa.array(ck % 10, pa.int64()),
            "c100": t["c100"],
        })

    out = (
        kept.map_batches(code, batch_format="pyarrow")
        .groupby("cntrycode")
        .aggregate(Count(alias_name="numcust"),
                   Sum("c100", alias_name="c100"))
        .to_pandas()
    )
    out["numcust"] = out["numcust"].astype(np.int64)
    out["totacctbal"] = _rha(
        out.pop("c100").to_numpy(np.float64) / 100.0, 2)
    return out.sort_values("cntrycode", ignore_index=True)


def q21(
    sf_dir: str,
    top: int = 20,
) -> pd.DataFrame:
    """Suppliers-who-kept-orders-waiting (TPC-H Q21 shape; the slim
    schema has no commit/receipt dates, so "the only supplier whose
    lineitems were late" becomes "the only supplier with a RETURNED
    (l_returnflag = 'R') lineitem on a multi-supplier order" — the
    EXISTS + NOT-EXISTS double-correlated structure is preserved).

    Plan: ONE distinct (orderkey, suppkey, had_R) aggregate over
    lineitem (per-batch combiners shrink the exchange), a per-order
    aggregate of (#suppliers, #suppliers-with-R), then the qualifying
    pairs filter — all hash aggregations; supplier names decorate via
    a broadcast array.  Columns (s_name, numwait), ordered
    (numwait desc, s_name) limit ``top``."""
    import pyarrow.parquet as pq_mod

    from pgd_ray.util import read_parquet_clean

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_suppkey", "l_returnflag"])

    def keyed(t: pa.Table) -> pa.Table:
        r = pc.equal(t["l_returnflag"], "R")
        return pa.table({
            "o": t["l_orderkey"],
            "s": t["l_suppkey"],
            "r": pa.array(r.to_numpy(zero_copy_only=False)
                          .astype(np.int64), pa.int64())})

    pairs = (
        li.map_batches(keyed, batch_format="pyarrow")
        .groupby(["o", "s"])
        .aggregate(Sum("r", alias_name="n_r"))
        .materialize()
    )

    def pair_flags(t: pa.Table) -> pa.Table:
        return pa.table({
            "o": t["o"],
            "one": pa.array(np.ones(t.num_rows, np.int64), pa.int64()),
            "has_r": pa.array(
                (t["n_r"].to_numpy(zero_copy_only=False) > 0)
                .astype(np.int64), pa.int64())})

    per_order = (
        pairs.map_batches(pair_flags, batch_format="pyarrow")
        .groupby("o")
        .aggregate(Sum("one", alias_name="n_supp"),
                   Sum("has_r", alias_name="n_supp_r"))
    )
    qual = per_order.filter(expr="n_supp > 1 and n_supp_r == 1") \
        .to_pandas()
    qual_keys = np.sort(qual["o"].to_numpy(np.int64))
    qref = ray.put(qual_keys)

    def keep(t: pa.Table, qref) -> pa.Table:
        qs = _dim_arrays(qref)  # sorted key array, searchsorted member
        o = t["o"].to_numpy(zero_copy_only=False).astype(np.int64)
        r = t["n_r"].to_numpy(zero_copy_only=False)
        if len(qs):
            pos = np.searchsorted(qs, o)
            pos[pos == len(qs)] = 0
            hit = qs[pos] == o
        else:
            hit = np.zeros(len(o), bool)
        m = hit & (r > 0)
        return pa.table({"s": t["s"].filter(pa.array(m))})

    waits = (
        pairs.map_batches(keep, fn_kwargs={"qref": qref},
                          batch_format="pyarrow")
        .groupby("s")
        .aggregate(Count(alias_name="numwait"))
        .to_pandas()
    )
    sup = pq_mod.read_table(f"{sf_dir}/supplier.parquet",
                            columns=["s_suppkey", "s_name"]).to_pandas()
    out = waits.merge(sup, left_on="s", right_on="s_suppkey")
    out["numwait"] = out["numwait"].astype(np.int64)
    return (out.sort_values(["numwait", "s_name"],
                            ascending=[False, True], ignore_index=True)
            [["s_name", "numwait"]].head(top).reset_index(drop=True))


def q2(
    sf_dir: str,
    p_type: str = "ECONOMY",
    region: str = "ASIA",
    top: int = 100,
) -> pd.DataFrame:
    """Minimum-cost supplier (TPC-H Q2 shape on the slim schema: no
    partsupp table, so the part-supplier relation is the DISTINCT
    (l_partkey, l_suppkey) pairs observed in lineitem and the supply
    cost is MIN(l_extendedprice) over those rows; no p_mfgr/s_address
    output columns).

    Star-schema plan: part/supplier/nation/region collapse into
    broadcast arrays (selected-part bool by p_partkey; in-region bool,
    acctbal, name, nation-name by s_suppkey) — ``ray.put`` once,
    zero-copy view per worker.  ONE scan of lineitem emits per-batch
    partial (pk, sk, min cost) rows; a tiny groupby finishes the min;
    the per-part argmin + tie filter runs on the driver over the
    O(#qualifying pairs) result.  Columns (s_acctbal, s_name, n_name,
    p_partkey, cost) ordered by s_acctbal desc, n_name, s_name,
    p_partkey; first ``top`` rows."""
    import pyarrow.parquet as pq
    from ray.data.aggregate import Min

    from pgd_ray.util import read_parquet_clean

    prt = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_type"]
    ).to_pandas()
    sel = np.zeros(int(prt["p_partkey"].max()) + 1, dtype=bool)
    sel[prt.loc[prt["p_type"] == p_type, "p_partkey"].to_numpy()] = True

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    reg = pq.read_table(f"{sf_dir}/region.parquet").to_pandas()
    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey", "s_name", "s_acctbal"],
    ).to_pandas()
    rkeys = set(reg.loc[reg["r_name"] == region, "r_regionkey"])
    nat_in = {int(r["n_nationkey"]): (r["n_regionkey"] in rkeys)
              for _, r in nat.iterrows()}
    nat_name = dict(zip(nat["n_nationkey"], nat["n_name"]))
    n_slot = int(sup["s_suppkey"].max()) + 1 if len(sup) else 1
    sup_in = np.zeros(n_slot, dtype=bool)
    sup_in[sup["s_suppkey"].to_numpy()] = (
        sup["s_nationkey"].map(nat_in).fillna(False).to_numpy(bool))
    dims = ray.put((sel, sup_in))

    def part_min(t: pa.Table, dims) -> pa.Table:
        sel, sup_in = _dim_arrays(dims)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        m = sel[pk] & sup_in[sk]
        df = pd.DataFrame({
            "pk": pk[m], "sk": sk[m],
            "c": t["l_extendedprice"].to_numpy(zero_copy_only=False)[m],
        })
        g = df.groupby(["pk", "sk"], as_index=False)["c"].min()
        return pa.table({"pk": g["pk"].to_numpy(np.int64),
                         "sk": g["sk"].to_numpy(np.int64),
                         "c": g["c"].to_numpy(np.float64)})

    cost = (
        read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_extendedprice"],
        )
        .map_batches(part_min, fn_kwargs={"dims": dims},
                     batch_format="pyarrow")
        .groupby(["pk", "sk"])
        .aggregate(Min("c", alias_name="cost"))
        .to_pandas()
    )
    cols = ["s_acctbal", "s_name", "n_name", "p_partkey", "cost"]
    if cost.empty:
        return pd.DataFrame({
            "s_acctbal": pd.Series([], dtype=np.float64),
            "s_name": pd.Series([], dtype=object),
            "n_name": pd.Series([], dtype=object),
            "p_partkey": pd.Series([], dtype=np.int64),
            "cost": pd.Series([], dtype=np.float64)})
    best = cost[cost["cost"] == cost.groupby("pk")["cost"].transform("min")]
    sup_ix = sup.set_index("s_suppkey")
    out = pd.DataFrame({
        "s_acctbal": best["sk"].map(sup_ix["s_acctbal"]).to_numpy(np.float64),
        "s_name": best["sk"].map(sup_ix["s_name"]).to_numpy(),
        "n_name": best["sk"].map(sup_ix["s_nationkey"]).map(nat_name).to_numpy(),
        "p_partkey": best["pk"].astype(np.int64).to_numpy(),
        "cost": best["cost"].round(2).to_numpy(np.float64),
    })
    return (out.sort_values(
        ["s_acctbal", "n_name", "s_name", "p_partkey"],
        ascending=[False, True, True, True], ignore_index=True)
        [cols].head(top).reset_index(drop=True))


def q9(
    sf_dir: str,
    name_like: str = "bolt",
    num_partitions: int = 8,
) -> pd.DataFrame:
    """Product-type profit by nation and year (TPC-H Q9 shape on the
    slim schema: no partsupp, so profit is the discounted revenue
    sum(l_extendedprice·(1−l_discount)) — the ps_supplycost·l_quantity
    term has no source column).

    Plan: part name-match and supplier→nation-name become broadcast
    arrays; the lineitem scan filters to matching parts, then ONE
    shuffle join against orders (the only other big table) attaches
    o_orderdate; per-batch partials per (nation, year) collapse in a
    tiny groupby.  Columns (nation, o_year, sum_profit) ordered by
    nation asc, o_year desc."""
    import pyarrow.parquet as pq

    from pgd_ray.util import read_parquet_clean

    prt = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    ).to_pandas()
    sel = np.zeros(int(prt["p_partkey"].max()) + 1, dtype=bool)
    sel[prt.loc[prt["p_name"].str.contains(name_like, regex=False),
                "p_partkey"].to_numpy()] = True
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    nat_name = dict(zip(nat["n_nationkey"], nat["n_name"]))
    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    n_slot = int(sup["s_suppkey"].max()) + 1 if len(sup) else 1
    sup_nat = np.empty(n_slot, dtype=object)
    sup_nat[sup["s_suppkey"].to_numpy()] = (
        sup["s_nationkey"].map(nat_name).to_numpy())
    dims = ray.put((sel, sup_nat))

    def keep(t: pa.Table, dims) -> pa.Table:
        sel, _ = _dim_arrays(dims)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(sel[pk])).select(
            ["l_orderkey", "l_suppkey", "l_extendedprice", "l_discount"])

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_suppkey",
                 "l_extendedprice", "l_discount"],
    ).map_batches(keep, fn_kwargs={"dims": dims}, batch_format="pyarrow")
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"])
    j = li.join(
        orders, "inner", num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )

    def part(t: pa.Table, dims) -> pa.Table:
        _, sup_nat = _dim_arrays(dims)
        year = (t["o_orderdate"].to_numpy(zero_copy_only=False)
                .astype("datetime64[Y]").astype(np.int64) + 1970)
        price = t["l_extendedprice"].to_numpy(zero_copy_only=False)
        disc = t["l_discount"].to_numpy(zero_copy_only=False)
        # exact 1e-4-dollar integer partials (price = integer cents,
        # discount = integer percent): float partial sums are combine-
        # order-dependent at the cent rounding boundary (seen sf0.1)
        p4 = (np.rint(price * 100.0).astype(np.int64)
              * (100 - np.rint(disc * 100.0).astype(np.int64)))
        df = pd.DataFrame({
            "nation": sup_nat[t["l_suppkey"].to_numpy(zero_copy_only=False)],
            "o_year": year,
            "p4": p4,
        })
        g = df.groupby(["nation", "o_year"], as_index=False)["p4"].sum()
        return pa.table({"nation": pa.array(g["nation"], pa.string()),
                         "o_year": g["o_year"].to_numpy(np.int64),
                         "p4": g["p4"].to_numpy(np.int64)})

    out = (
        j.map_batches(part, fn_kwargs={"dims": dims}, batch_format="pyarrow")
        .groupby(["nation", "o_year"])
        .aggregate(Sum("p4", alias_name="sum4"))
        .to_pandas()
    )
    from pgd_ray.util import round_half_away

    out["sum_profit"] = round_half_away(
        out.pop("sum4").to_numpy(np.float64) / 10000.0, 2)
    out["o_year"] = out["o_year"].astype(np.int64)
    return out.sort_values(["nation", "o_year"], ascending=[True, False],
                           ignore_index=True)


def q11(
    sf_dir: str,
    nation: str = "NATION_3",
    fraction: float = 0.0005,
) -> pd.DataFrame:
    """Important-stock identification (TPC-H Q11 shape on the slim
    schema: no partsupp, so the per-part "value" is SUM(l_quantity)
    over lineitems supplied by the nation's suppliers — ps_availqty
    has no source column).

    Plan: supplier-in-nation bool broadcast by s_suppkey; one lineitem
    scan with per-batch per-part partial sums; tiny groupby; the
    global-total scalar and the threshold filter run on the driver
    over the O(#parts) result.  Columns (p_partkey, value) ordered by
    value desc, p_partkey."""
    import pyarrow.parquet as pq

    from pgd_ray.util import read_parquet_clean

    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    nkeys = set(nat.loc[nat["n_name"] == nation, "n_nationkey"])
    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet", columns=["s_suppkey", "s_nationkey"]
    ).to_pandas()
    n_slot = int(sup["s_suppkey"].max()) + 1 if len(sup) else 1
    sup_in = np.zeros(n_slot, dtype=bool)
    sup_in[sup["s_suppkey"].to_numpy()] = (
        sup["s_nationkey"].isin(nkeys).to_numpy())
    sel_ref = ray.put(sup_in)

    def part(t: pa.Table, sel_ref) -> pa.Table:
        sup_in = _dim_arrays(sel_ref)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        m = sup_in[sk]
        df = pd.DataFrame({
            "pk": t["l_partkey"].to_numpy(zero_copy_only=False)[m],
            "q": t["l_quantity"].to_numpy(zero_copy_only=False)[m],
        })
        g = df.groupby("pk", as_index=False)["q"].sum()
        return pa.table({"pk": g["pk"].to_numpy(np.int64),
                         "q": g["q"].to_numpy(np.float64)})

    v = (
        read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_quantity"],
        )
        .map_batches(part, fn_kwargs={"sel_ref": sel_ref},
                     batch_format="pyarrow")
        .groupby("pk")
        .aggregate(Sum("q", alias_name="value"))
        .to_pandas()
    )
    if v.empty:
        return pd.DataFrame({"p_partkey": pd.Series([], dtype=np.int64),
                             "value": pd.Series([], dtype=np.float64)})
    thr = fraction * float(v["value"].sum())
    keep = v[v["value"] > thr]
    out = pd.DataFrame({
        "p_partkey": keep["pk"].astype(np.int64).to_numpy(),
        "value": keep["value"].round(2).to_numpy(np.float64),
    })
    return out.sort_values(["value", "p_partkey"],
                           ascending=[False, True], ignore_index=True)


def q16(
    sf_dir: str,
    exclude_brand: str = "Brand#13",
    exclude_type: str = "PROMO",
    sizes: tuple = (1, 4, 9, 16, 25, 36, 49),
    supp_mod: int = 4,
) -> pd.DataFrame:
    """Parts/supplier relationship (TPC-H Q16 shape on the slim
    schema: the part-supplier relation is the distinct (l_partkey,
    l_suppkey) pairs in lineitem; the "customer complaint" supplier
    exclusion — canonical Q16 matches s_comment — is the deterministic
    ``l_suppkey % supp_mod == 0``).

    Plan: part attribute arrays broadcast by p_partkey; the lineitem
    scan filters and emits per-batch DISTINCT (pk, sk) pairs; one
    groupby dedups pairs globally; the distinct-supplier count per
    (brand, type, size) is a second tiny groupby over the O(#pairs)
    result decorated driver-side.  Columns (p_brand, p_type, p_size,
    supplier_cnt) ordered by supplier_cnt desc, brand, type, size."""
    import pyarrow.parquet as pq

    from pgd_ray.util import read_parquet_clean

    prt = pq.read_table(
        f"{sf_dir}/part.parquet",
        columns=["p_partkey", "p_brand", "p_type", "p_size"],
    ).to_pandas()
    keep_part = prt[(prt["p_brand"] != exclude_brand)
                    & (prt["p_type"] != exclude_type)
                    & (prt["p_size"].isin(sizes))]
    n_slot = int(prt["p_partkey"].max()) + 1 if len(prt) else 1
    sel = np.zeros(n_slot, dtype=bool)
    sel[keep_part["p_partkey"].to_numpy()] = True
    sel_ref = ray.put(sel)

    def pairs(t: pa.Table, sel_ref) -> pa.Table:
        sel = _dim_arrays(sel_ref)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        m = sel[pk] & (sk % supp_mod != 0)
        df = pd.DataFrame({"pk": pk[m], "sk": sk[m]}).drop_duplicates()
        return pa.table({"pk": df["pk"].to_numpy(np.int64),
                         "sk": df["sk"].to_numpy(np.int64)})

    dp = (
        read_parquet_clean(
            f"{sf_dir}/lineitem.parquet", columns=["l_partkey", "l_suppkey"])
        .map_batches(pairs, fn_kwargs={"sel_ref": sel_ref},
                     batch_format="pyarrow")
        .groupby(["pk", "sk"])
        .aggregate(Count(alias_name="_n"))
        .to_pandas()
    )
    if dp.empty:
        return pd.DataFrame({
            "p_brand": pd.Series([], dtype=object),
            "p_type": pd.Series([], dtype=object),
            "p_size": pd.Series([], dtype=np.int64),
            "supplier_cnt": pd.Series([], dtype=np.int64)})
    attrs = keep_part.set_index("p_partkey")
    dp = dp.assign(
        p_brand=dp["pk"].map(attrs["p_brand"]),
        p_type=dp["pk"].map(attrs["p_type"]),
        p_size=dp["pk"].map(attrs["p_size"]).astype(np.int64),
    )
    g = (dp.drop_duplicates(["p_brand", "p_type", "p_size", "sk"])
         .groupby(["p_brand", "p_type", "p_size"], as_index=False)
         .agg(supplier_cnt=("sk", "size")))
    g["supplier_cnt"] = g["supplier_cnt"].astype(np.int64)
    return g.sort_values(
        ["supplier_cnt", "p_brand", "p_type", "p_size"],
        ascending=[False, True, True, True], ignore_index=True)


def q20(
    sf_dir: str,
    name_like: str = "widget",
    date_lo_us: int = 788_918_400_000_000,   # 1995-01-01
    date_hi_us: int = 852_076_800_000_000,   # 1997-01-01
    qty_above: float = 20.0,
    nation: str = "NATION_3",
) -> pd.DataFrame:
    """Potential part promotion (TPC-H Q20 shape on the slim schema:
    no partsupp, so "excess stock" is a (l_partkey, l_suppkey) pair
    whose shipped-quantity sum inside the window exceeds
    ``qty_above`` — canonical Q20's 0.5·SUM threshold against
    ps_availqty has no source column).

    Plan: widget-part bool and supplier-in-nation bool broadcast; one
    windowed lineitem scan with per-batch (pk, sk) partial quantity
    sums; tiny groupby; threshold + distinct-supplier + name
    decoration on the driver over the O(#pairs) result.  Columns
    (s_suppkey, s_name) ordered by s_name."""
    import pyarrow.parquet as pq

    from pgd_ray.util import read_parquet_clean

    prt = pq.read_table(
        f"{sf_dir}/part.parquet", columns=["p_partkey", "p_name"]
    ).to_pandas()
    seln = np.zeros(int(prt["p_partkey"].max()) + 1, dtype=bool)
    seln[prt.loc[prt["p_name"].str.contains(name_like, regex=False),
                 "p_partkey"].to_numpy()] = True
    nat = pq.read_table(f"{sf_dir}/nation.parquet").to_pandas()
    nkeys = set(nat.loc[nat["n_name"] == nation, "n_nationkey"])
    sup = pq.read_table(
        f"{sf_dir}/supplier.parquet",
        columns=["s_suppkey", "s_nationkey", "s_name"],
    ).to_pandas()
    n_slot = int(sup["s_suppkey"].max()) + 1 if len(sup) else 1
    sup_in = np.zeros(n_slot, dtype=bool)
    sup_in[sup["s_suppkey"].to_numpy()] = (
        sup["s_nationkey"].isin(nkeys).to_numpy())
    dims = ray.put((seln, sup_in))

    def part(t: pa.Table, dims) -> pa.Table:
        seln, sup_in = _dim_arrays(dims)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        sk = t["l_suppkey"].to_numpy(zero_copy_only=False)
        ship = (t["l_shipdate"].to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").astype(np.int64))
        m = seln[pk] & sup_in[sk] & (ship >= date_lo_us) & (ship < date_hi_us)
        df = pd.DataFrame({
            "pk": pk[m], "sk": sk[m],
            "q": t["l_quantity"].to_numpy(zero_copy_only=False)[m],
        })
        g = df.groupby(["pk", "sk"], as_index=False)["q"].sum()
        return pa.table({"pk": g["pk"].to_numpy(np.int64),
                         "sk": g["sk"].to_numpy(np.int64),
                         "q": g["q"].to_numpy(np.float64)})

    pq_sum = (
        read_parquet_clean(
            f"{sf_dir}/lineitem.parquet",
            columns=["l_partkey", "l_suppkey", "l_quantity", "l_shipdate"],
        )
        .map_batches(part, fn_kwargs={"dims": dims}, batch_format="pyarrow")
        .groupby(["pk", "sk"])
        .aggregate(Sum("q", alias_name="qsum"))
        .to_pandas()
    )
    if pq_sum.empty:
        return pd.DataFrame({"s_suppkey": pd.Series([], dtype=np.int64),
                             "s_name": pd.Series([], dtype=object)})
    sks = np.unique(
        pq_sum.loc[pq_sum["qsum"] > qty_above, "sk"].to_numpy(np.int64))
    names = sup.set_index("s_suppkey")["s_name"]
    out = pd.DataFrame({"s_suppkey": sks,
                        "s_name": pd.Series(sks).map(names).to_numpy()})
    return out.sort_values("s_name", ignore_index=True)
