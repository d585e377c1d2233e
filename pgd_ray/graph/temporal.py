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
    """Exact triangle total of a canonical edge list, fully vectorized
    (round 5 — the old version looped Python per edge): orient every
    edge away from its lower-(degree, id) endpoint, enumerate each
    triangle once at its minimum-rank vertex as an oriented wedge
    whose closing edge exists — wedge generation by segmented index
    arithmetic, closure probe by searchsorted on packed edge keys."""
    m = len(src)
    if m == 0:
        return 0
    verts, inv = np.unique(np.concatenate([src, dst]), return_inverse=True)
    n = len(verts)
    a, b = inv[:m], inv[m:]
    deg = np.bincount(np.concatenate([a, b]), minlength=n)
    rk = np.empty(n, np.int64)
    rk[np.lexsort((np.arange(n), deg))] = np.arange(n)
    lo = rk[a] < rk[b]
    u = np.where(lo, a, b)
    w = np.where(lo, b, a)
    o = np.lexsort((w, u))
    u, w = u[o], w[o]
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr[1:], u, 1)
    indptr = np.cumsum(indptr)
    # wedges at each edge i = pairs (w[i], w[j]) for j in (i, seg_end)
    idx = np.arange(m)
    seg_end = indptr[u + 1]
    cnt = seg_end - idx - 1  # wedges whose FIRST leg is edge i
    W = int(cnt.sum())
    if W == 0:
        return 0
    i_rep = np.repeat(idx, cnt)
    starts = np.concatenate(([0], np.cumsum(cnt)[:-1]))
    j = i_rep + (np.arange(W) - np.repeat(starts, cnt)) + 1
    x, y = w[i_rep], w[j]
    wk_lo = np.minimum(x, y)
    wk_hi = np.maximum(x, y)
    # closure probe against the canonical (min, max) edge-key set
    ekey = np.sort(np.minimum(a, b) * n + np.maximum(a, b))
    q = wk_lo * n + wk_hi
    pos = np.searchsorted(ekey, q)
    ok = pos < len(ekey)
    return int((ekey[pos[ok]] == q[ok]).sum())


def _month_stats_group(t: pa.Table) -> pa.Table:
    """Per-month stats, one coarse ``map_groups`` group per month —
    the edge rows never visit the driver."""
    src = t["part_a"].to_numpy(zero_copy_only=False).astype(np.int64)
    dst = t["part_b"].to_numpy(zero_copy_only=False).astype(np.int64)
    mo = int(t["month"][0].as_py())
    nv = len(np.unique(np.concatenate([src, dst])))
    return pa.table({"month": pa.array([mo], pa.int64()),
                     "n_vertices": pa.array([nv], pa.int64()),
                     "n_edges": pa.array([len(src)], pa.int64()),
                     "n_triangles": pa.array([_tri_total(src, dst)],
                                             pa.int64())})


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

    # distinct on the sort path, not a hash aggregate: the
    # (month, edge) key cardinality ≈ the row count, the regime where
    # Ray's hash groupby measured ~60× slower (BASELINE.md)
    from pgd_ray.stages.distinct import distinct_rows

    edges = distinct_rows(
        j.map_batches(orient, batch_format="pyarrow"),
        ["month", "part_a", "part_b"],
    )
    # months are the parallel axis: one coarse map_groups group per
    # month runs the vectorized triangle kernel where the edges live —
    # the driver receives only the O(#months) result rows (the old
    # code pulled every distinct monthly edge driver-side first)
    out = (edges.groupby("month")
           .map_groups(_month_stats_group, batch_format="pyarrow")
           .to_pandas())
    if out.empty:
        return pd.DataFrame({"month": pd.Series([], dtype=np.int64),
                             "n_vertices": pd.Series([], dtype=np.int64),
                             "n_edges": pd.Series([], dtype=np.int64),
                             "n_triangles": pd.Series([], dtype=np.int64)})
    return (out.sort_values("month", ignore_index=True)
            .astype(np.int64))


def monthly_edge_overlap(sf_dir: str, num_partitions: int = 8) -> pd.DataFrame:
    """Month-over-month co-purchase edge persistence: for every pair
    of CONSECUTIVE observed months, the Jaccard overlap of their
    distinct canonical edge sets — the graph-structure drift monitor
    (a collapsing overlap means the co-occurrence structure is
    churning).

    Scale shape: ONE sort by (edge, month) doing double duty —
    position-keyed block dedup makes the rows distinct (the sort
    path, per BASELINE.md's hash-aggregate finding) and the same
    order feeds the adjacent-month pass directly (no second sort).
    An edge contributes to pair (mᵢ, mᵢ₊₁) iff both
    months are present, and because mᵢ₊₁ is the globally NEXT observed
    month they are then adjacent in the edge's sorted month list — so
    per-block adjacent-row checks + the ≤ 2 boundary edges per block
    count every overlap exactly once, no masks, no month-count limit.
    Columns (month_a, month_b, n_a, n_b, n_both, jaccard)."""
    from ray.data.aggregate import Count
    from pgd_ray.stages.basket import order_part_incidence
    from pgd_ray.util import read_parquet_clean

    po = (order_part_incidence(sf_dir).materialize()
          .repartition(num_partitions).materialize())
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

    # distinct (month, edge) on the SORT path (BASELINE.md's 638-s
    # hash-aggregate finding): one global sort by (edge, month) —
    # which is also exactly the order the adjacent-month pass below
    # needs, so the old second sort disappears too — then
    # position-keyed block dedup; block order (and thus sortedness)
    # is preserved through the filter
    from pgd_ray.stages.distinct import dedup_sorted_blocks

    srt0 = (j.map_batches(orient, batch_format="pyarrow")
            .sort(["part_a", "part_b", "month"]).materialize())
    srt = dedup_sorted_blocks(
        srt0, ["part_a", "part_b", "month"]).materialize()

    per_month = (srt.groupby("month").aggregate(Count(alias_name="n"))
                 .to_pandas().sort_values("month", ignore_index=True))
    months = per_month["month"].to_numpy(np.int64)
    n_of = dict(zip(months, per_month["n"].astype(int)))
    nxt = {int(months[i]): int(months[i + 1])
           for i in range(len(months) - 1)}

    def adjacent(pa_arr, pb_arr, mo_arr) -> pd.DataFrame | None:
        if len(mo_arr) < 2:
            return None
        same = (pa_arr[1:] == pa_arr[:-1]) & (pb_arr[1:] == pb_arr[:-1])
        prev_m = mo_arr[:-1][same]
        next_m = mo_arr[1:][same]
        want = np.array([nxt.get(int(p), -1) for p in prev_m],
                        dtype=np.int64)
        hit = want == next_m
        if not hit.any():
            return None
        return (pd.DataFrame({"ma": prev_m[hit]})
                .groupby("ma").size().rename("c").reset_index())

    def block(t: pa.Table) -> pa.Table:
        empty = pa.table({"ma": pa.array([], pa.int64()),
                          "c": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        a = t["part_a"].to_numpy(zero_copy_only=False)
        b = t["part_b"].to_numpy(zero_copy_only=False)
        m = t["month"].to_numpy(zero_copy_only=False)
        first = (a == a[0]) & (b == b[0])
        last = (a == a[-1]) & (b == b[-1])
        interior = ~(first | last)
        d = adjacent(a[interior], b[interior], m[interior])
        if d is None:
            return empty
        return pa.table({"ma": d["ma"].to_numpy(np.int64),
                         "c": d["c"].to_numpy(np.int64)})

    def boundary(t: pa.Table) -> pa.Table:
        cols = ["part_a", "part_b", "month"]
        if t.num_rows == 0:
            return t.select(cols)
        a = t["part_a"].to_numpy(zero_copy_only=False)
        b = t["part_b"].to_numpy(zero_copy_only=False)
        m = ((a == a[0]) & (b == b[0])) | ((a == a[-1]) & (b == b[-1]))
        return t.select(cols).filter(pa.array(m))

    parts = srt.map_batches(block, batch_format="pyarrow",
                            batch_size=None).to_pandas()
    bdf = srt.map_batches(boundary, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    both: dict = {}
    for ma, c in zip(parts["ma"], parts["c"]):
        both[int(ma)] = both.get(int(ma), 0) + int(c)
    if len(bdf):
        bdf = bdf.drop_duplicates().sort_values(
            ["part_a", "part_b", "month"], ignore_index=True)
        d = adjacent(bdf["part_a"].to_numpy(), bdf["part_b"].to_numpy(),
                     bdf["month"].to_numpy(np.int64))
        if d is not None:
            for ma, c in zip(d["ma"], d["c"]):
                both[int(ma)] = both.get(int(ma), 0) + int(c)
    rows = []
    for i in range(len(months) - 1):
        ma, mb = int(months[i]), int(months[i + 1])
        na, nb = n_of[ma], n_of[mb]
        nb_both = both.get(ma, 0)
        union = na + nb - nb_both
        rows.append((ma, mb, na, nb, nb_both,
                     round(nb_both / union, 9) if union else 0.0))
    return pd.DataFrame(rows, columns=["month_a", "month_b", "n_a",
                                       "n_b", "n_both", "jaccard"])
