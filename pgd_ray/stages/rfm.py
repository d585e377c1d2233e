"""RFM customer segmentation over the orders table — the classic
marketing-analytics program, expressed distributed end to end:

1. per-customer aggregate (ONE hash groupby): recency_days = whole
   days between the customer's last order and the corpus-wide max
   order date (one scalar aggregate), frequency = order count,
   monetary = Σ o_totalprice ROUNDED TO CENTS (rounding before the
   rank makes the float-sum order difference between any two engines
   invisible to the quintile assignment);
2. three exact ``NTILE(5) OVER (ORDER BY metric, c_custkey)`` passes
   via ``stages.windows.global_ntile`` (distributed sort +
   O(#blocks) driver offsets each — never a driver-side rank);
   r_q orders by recency ASC (1 = most recent), f_q / m_q by value
   ASC (5 = best), matching the plain SQL mirror.

The reference has no relational surface (SURVEY.md §2.8); TPC-H-style
coverage addition."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Max, Sum


def rfm_segments(sf_dir: str, k: int = 5) -> pd.DataFrame:
    """Columns (c_custkey, recency_days, frequency, monetary, r_q,
    f_q, m_q), ordered by c_custkey."""
    from pgd_ray.stages.windows import global_ntile
    from pgd_ray.util import read_parquet_clean

    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet",
        columns=["o_custkey", "o_totalprice", "o_orderdate"])

    def keyed(t: pa.Table) -> pa.Table:
        ts = (t["o_orderdate"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        # o_totalprice is exact integer cents: sum int64 (float
        # partial sums are combine-order-dependent at boundaries)
        cents = np.rint(t["o_totalprice"].to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64)
        return pa.table({"c_custkey": t["o_custkey"],
                         "cents": pa.array(cents, pa.int64()),
                         "ots": pa.array(ts, pa.int64())})

    per_cust = (
        orders.map_batches(keyed, batch_format="pyarrow")
        .groupby("c_custkey")
        .aggregate(Count(alias_name="frequency"),
                   Sum("cents", alias_name="cents"),
                   Max("ots", alias_name="last_ts"))
        .materialize()
    )
    if per_cust.count() == 0:
        return pd.DataFrame({c: pd.Series([], dtype=np.int64)
                             for c in ("c_custkey", "recency_days",
                                       "frequency")} |
                            {"monetary": pd.Series([], dtype=np.float64)} |
                            {c: pd.Series([], dtype=np.int64)
                             for c in ("r_q", "f_q", "m_q")})
    max_ts = int(per_cust.max("last_ts"))

    def derive(t: pa.Table, max_ts=max_ts) -> pa.Table:
        last = t["last_ts"].to_numpy(zero_copy_only=False)
        rec = (max_ts - last) // 86_400_000_000
        return pa.table({
            "c_custkey": t["c_custkey"],
            "recency_days": pa.array(rec, pa.int64()),
            "frequency": pa.array(
                t["frequency"].to_numpy(zero_copy_only=False)
                .astype(np.int64), pa.int64()),
            "monetary": pa.array(
                t["cents"].to_numpy(zero_copy_only=False)
                .astype(np.float64) / 100.0, pa.float64()),
        })

    base = per_cust.map_batches(derive, batch_format="pyarrow")
    base = global_ntile(base, "recency_days", "c_custkey", k, out_col="r_q")
    base = global_ntile(base, "frequency", "c_custkey", k, out_col="f_q")
    base = global_ntile(base, "monetary", "c_custkey", k, out_col="m_q")
    out = base.to_pandas().sort_values("c_custkey", ignore_index=True)
    return out[["c_custkey", "recency_days", "frequency", "monetary",
                "r_q", "f_q", "m_q"]]


def revenue_pareto(sf_dir: str, top_frac: float = 0.1) -> pd.DataFrame:
    """Revenue-concentration (Pareto) summary: what share of total
    order revenue do the top ``top_frac`` of customers hold?
    Integer-cents contract (floor(x·100 + 0.5) per order — the
    portable half-up rule) so every sum is exact.

    Distributed shape: one per-customer hash aggregation → the exact
    k-th-largest revenue via the histogram-refinement rank engine (no
    sort) → ONE partial pass folding (total, Σ above-threshold,
    #above-threshold).  The tie algebra makes the top-k sum
    tie-agnostic: top = Σ_{>thr} + (k − #_{>thr})·thr.  One row
    (n_customers, top_k, total_cents, top_cents, share)."""
    import math

    from ray.data.aggregate import Sum

    from pgd_ray.stages.quantiles import exact_ranks
    from pgd_ray.util import read_parquet_clean

    od = read_parquet_clean(f"{sf_dir}/orders.parquet",
                            columns=["o_custkey", "o_totalprice"])

    def to_cents(t: pa.Table) -> pa.Table:
        v = t["o_totalprice"].to_numpy(zero_copy_only=False)
        return pa.table({"c": t["o_custkey"],
                         "cents": np.floor(v * 100.0 + 0.5)
                        .astype(np.int64)})

    pc = (od.map_batches(to_cents, batch_format="pyarrow")
          .groupby("c").aggregate(Sum("cents", alias_name="cents"))
          .materialize())
    n = int(pc.count())
    if n == 0:
        return pd.DataFrame({"n_customers": [np.int64(0)],
                             "top_k": [np.int64(0)],
                             "total_cents": [np.int64(0)],
                             "top_cents": [np.int64(0)],
                             "share": [0.0]})
    k = int(math.ceil(top_frac * n))
    ranks, _ = exact_ranks(pc, "cents", lambda nn: {nn - k})
    thr = int(ranks[n - k])

    def fold(t: pa.Table) -> pa.Table:
        c = t["cents"].to_numpy(zero_copy_only=False)
        return pa.table({"total": [int(c.sum())],
                         "gt_sum": [int(c[c > thr].sum())],
                         "gt_cnt": [int((c > thr).sum())]})

    f = pc.map_batches(fold, batch_format="pyarrow",
                       batch_size=None).to_pandas()
    total = int(f["total"].sum())
    top = int(f["gt_sum"].sum()) + (k - int(f["gt_cnt"].sum())) * thr
    return pd.DataFrame({"n_customers": [np.int64(n)],
                         "top_k": [np.int64(k)],
                         "total_cents": [np.int64(total)],
                         "top_cents": [np.int64(top)],
                         "share": [round(top / total, 9)]})
