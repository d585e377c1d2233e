"""Time-sliced graph metrics: per-month co-purchase subgraph stats.

Temporal graph monitoring — how the co-occurrence structure evolves
over calendar slices: per month of ``o_orderdate`` the subgraph of
parts co-ordered WITHIN that month, with (n_vertices, n_edges,
n_triangles).

Ray shape: the heavy part — joining the order month onto the basket
incidence and expanding per-order pairs — is two native Dataset hash
joins (materialized between, fractional-CPU aggregators: the chained-
join pool guard) plus one dedup groupby, exactly the
`stages.basket.pair_counts` pattern with the month carried through.
The per-month edge lists are thin (months partition the edge set);
each month's triangle count runs as its own Ray task over its slice —
months are the parallel axis, the same per-slice kernel contract as
the graphlet stages (sorted-adjacency intersection per edge,
graphlet_core.cpp:702-800's neighborhood walk).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count


def _tri_total(src: np.ndarray, dst: np.ndarray) -> int:
    """Exact triangle total of a small canonical edge list: per edge
    |N(u) ∩ N(v)| over sorted adjacency, summed = 3T."""
    if len(src) == 0:
        return 0
    verts, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    n = len(verts)
    a, b = inv[: len(src)], inv[len(src):]
    ss = np.concatenate([a, b])
    dd = np.concatenate([b, a])
    o = np.lexsort((dd, ss))
    ss, dd = ss[o], dd[o]
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr[1:], ss, 1)
    indptr = np.cumsum(indptr)
    tot = 0
    for u, v in zip(a, b):
        nu = dd[indptr[u]:indptr[u + 1]]
        nv = dd[indptr[v]:indptr[v + 1]]
        # sorted merge intersection
        tot += len(np.intersect1d(nu, nv, assume_unique=True))
    return tot // 3


@ray.remote
def _month_stats(month: int, src: np.ndarray, dst: np.ndarray) -> tuple:
    n = len(np.unique(np.concatenate([src, dst])))
    return (month, n, len(src), _tri_total(src, dst))


def monthly_graph_stats(sf_dir: str, num_partitions: int = 8) -> pd.DataFrame:
    """(month, n_vertices, n_edges, n_triangles) per o_orderdate month
    (month key = year*100 + month)."""
    from pgd_ray.stages.basket import order_part_incidence
    from pgd_ray.util import read_parquet_clean

    po = (
        order_part_incidence(sf_dir)
        .materialize()
        .repartition(num_partitions)
        .materialize()
    )
    orders = read_parquet_clean(
        f"{sf_dir}/orders.parquet", columns=["o_orderkey", "o_orderdate"])

    def to_month(t: pa.Table) -> pa.Table:
        d = (t["o_orderdate"].to_numpy(zero_copy_only=False)
             .astype("datetime64[M]"))
        y = d.astype("datetime64[Y]").astype(np.int64) + 1970
        m = d.astype(np.int64) % 12 + 1
        return pa.table({"o_orderkey": t["o_orderkey"],
                         "month": pa.array(y * 100 + m, pa.int64())})

    om = (orders.map_batches(to_month, batch_format="pyarrow")
          .repartition(num_partitions).materialize())
    inc = po.join(
        om, "inner", num_partitions,
        on=("l_orderkey",), right_on=("o_orderkey",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    ).materialize()

    def rn(t: pa.Table) -> pa.Table:
        return t.select(["l_orderkey", "l_partkey"]).rename_columns(
            ["okey", "part_b"])

    right = po.map_batches(rn, batch_format="pyarrow").materialize()
    j = inc.join(
        right, "inner", num_partitions,
        on=("l_orderkey",), right_on=("okey",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )

    def orient(t: pa.Table) -> pa.Table:
        a = t["l_partkey"].to_numpy(zero_copy_only=False)
        b = t["part_b"].to_numpy(zero_copy_only=False)
        m = t["month"].to_numpy(zero_copy_only=False)
        keep = a < b
        return pa.table({"month": m[keep], "part_a": a[keep],
                         "part_b": b[keep]})

    edges = (
        j.map_batches(orient, batch_format="pyarrow")
        .groupby(["month", "part_a", "part_b"])
        .aggregate(Count(alias_name="n_ord"))
        .select_columns(["month", "part_a", "part_b"])
        .to_pandas()
    )
    if edges.empty:
        return pd.DataFrame({"month": pd.Series([], dtype=np.int64),
                             "n_vertices": pd.Series([], dtype=np.int64),
                             "n_edges": pd.Series([], dtype=np.int64),
                             "n_triangles": pd.Series([], dtype=np.int64)})
    futs = [
        _month_stats.remote(
            int(mo), g["part_a"].to_numpy(np.int64),
            g["part_b"].to_numpy(np.int64))
        for mo, g in edges.groupby("month", sort=True)
    ]
    rows = ray.get(futs)
    return pd.DataFrame(rows, columns=["month", "n_vertices", "n_edges",
                                       "n_triangles"]).astype(np.int64)
