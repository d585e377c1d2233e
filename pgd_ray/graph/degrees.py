"""Degree table and edge-centric graph statistics.

Reference parity:
  - vertex_degrees            graphlet_core.cpp:877-891
  - basic stats / density     graphlet_core.cpp:562-590
  - compute_assortativity     graphlet_core.cpp:1029-1057 (incl. the
    NaN→1 / out-of-[-1,1]→1 / m==0→0 clamps, SURVEY.md Q4)

Everything is partial-aggregated inside ``map_batches`` before the
``groupby`` so the shuffle moves one row per (vertex, batch), not one
row per edge (SURVEY.md §4.2 "macro totals: partial+final").
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum


def degree_table(canonical_ds: ray.data.Dataset) -> ray.data.Dataset:
    """Per-vertex degree of the undirected simple graph.

    Input: canonical edges (src<dst, deduped).  Per-batch combiner
    counts both endpoints with ``np.unique``; final ``groupby("v")``
    sums the partials.  Output columns: ``v``, ``degree``.
    """

    def partial(t: pa.Table) -> pa.Table:
        vals = np.concatenate(
            [
                t["src"].to_numpy(zero_copy_only=False),
                t["dst"].to_numpy(zero_copy_only=False),
            ]
        )
        v, c = np.unique(vals, return_counts=True)
        return pa.table({"v": v, "partial_deg": c.astype(np.int64)})

    out = (
        canonical_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("partial_deg", alias_name="degree"))
    )
    return out


def degree_array(canonical_ds: ray.data.Dataset, n: int) -> np.ndarray:
    """Dense int64 degree vector (dense-id graphs only)."""
    deg = np.zeros(n, dtype=np.int64)
    for b in degree_table(canonical_ds).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        if b.num_rows:
            deg[b["v"].to_numpy(zero_copy_only=False)] = b["degree"].to_numpy(
                zero_copy_only=False
            )
    return deg


def graph_stats(canonical_ds: ray.data.Dataset) -> pd.DataFrame:
    """n, m, density, d_max, d_avg as a one-row frame
    (graphlet_core.cpp:562-590)."""
    from ray.data.aggregate import Count, Max

    # One aggregate pass — Sum+Count+Max together so the (lazy) degree
    # pipeline executes exactly once, not once per scalar.
    agg = degree_table(canonical_ds).aggregate(
        Sum("degree", alias_name="s"),
        Count(alias_name="n_v"),
        Max("degree", alias_name="dmx"),
    )
    n = int(agg.get("n_v") or 0) if agg else 0
    s = agg.get("s") if agg else 0
    m = (s or 0) // 2
    d_max = int(agg.get("dmx") or 0) if n else 0
    density = (2.0 * m) / (n * (n - 1)) if n > 1 else 0.0
    d_avg = (2.0 * m) / n if n else 0.0
    return pd.DataFrame(
        [
            {
                "n": int(n),
                "m": int(m),
                "density": float(density),
                "d_max": int(d_max),
                "d_avg": float(d_avg),
            }
        ]
    )


def assortativity(canonical_ds: ray.data.Dataset, degree_vec: np.ndarray | None = None) -> float:
    """Degree assortativity r, edge-centric partial sums
    (graphlet_core.cpp:1029-1057).

    Per canonical edge (v,u):  mu += dv*du, jd += (dv+du)/2,
    psi += (dv²+du²)/2;  r = (mu/m − (jd/m)²) / (psi/m − (jd/m)²) with
    the reference's clamps (Q4): NaN→1, |r|>1→1, m==0→0.
    """
    if degree_vec is None:
        # two-pass: degree table joined back via broadcast lookup
        vids_deg = degree_table(canonical_ds)
        rows_v, rows_d = [], []
        for b in vids_deg.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
            if b.num_rows:
                rows_v.append(b["v"].to_numpy(zero_copy_only=False))
                rows_d.append(b["degree"].to_numpy(zero_copy_only=False))
        if not rows_v:
            return 0.0
        v = np.concatenate(rows_v)
        d = np.concatenate(rows_d)
        order = np.argsort(v)
        vid_sorted, deg_sorted = v[order], d[order]
        ref = ray.put((vid_sorted, deg_sorted))

        def lookup(t: pa.Table) -> pa.Table:
            vs, ds_ = ray.get(ref)
            dv = ds_[np.searchsorted(vs, t["src"].to_numpy(zero_copy_only=False))]
            du = ds_[np.searchsorted(vs, t["dst"].to_numpy(zero_copy_only=False))]
            return _assort_partial(dv, du)

        partials = canonical_ds.map_batches(lookup, batch_format="pyarrow")
    else:
        ref = ray.put(np.ascontiguousarray(degree_vec))

        def lookup_dense(t: pa.Table) -> pa.Table:
            dvec = ray.get(ref)
            dv = dvec[t["src"].to_numpy(zero_copy_only=False)]
            du = dvec[t["dst"].to_numpy(zero_copy_only=False)]
            return _assort_partial(dv, du)

        partials = canonical_ds.map_batches(lookup_dense, batch_format="pyarrow")

    agg = partials.aggregate(
        Sum("mu", alias_name="mu"),
        Sum("jd", alias_name="jd"),
        Sum("psi", alias_name="psi"),
        Sum("cnt", alias_name="m"),
    )
    m = float(agg.get("m") or 0)
    if m == 0:
        return 0.0
    mu, jd, psi = float(agg["mu"]), float(agg["jd"]), float(agg["psi"])
    tau = (jd / m) * (jd / m)
    denom = (psi / m) - tau
    with np.errstate(divide="ignore", invalid="ignore"):
        r = ((mu / m) - tau) / denom if denom != 0 else float("nan")
    if np.isnan(r) or r < -1.0 or r > 1.0:
        r = 1.0
    return float(r)


def _assort_partial(dv: np.ndarray, du: np.ndarray) -> pa.Table:
    dv = dv.astype(np.float64)
    du = du.astype(np.float64)
    return pa.table(
        {
            "mu": [float(np.dot(dv, du))],
            "jd": [float(0.5 * (dv.sum() + du.sum()))],
            "psi": [float(0.5 * (np.dot(dv, dv) + np.dot(du, du)))],
            "cnt": [int(len(dv))],
        }
    )


def degree_histogram_log2(deg_ds: ray.data.Dataset) -> ray.data.Dataset:
    """Log2-binned degree histogram over a (v, degree) Dataset —
    columns (bin, n_vertices) with bin = floor(log2(degree)); the
    standard heavy-tail eyeball plot, computed as per-batch bincount
    partials + one tiny groupby."""

    def partial(t: pa.Table) -> pa.Table:
        d = t["degree"].to_numpy(zero_copy_only=False)
        b = np.floor(np.log2(d)).astype(np.int64)
        ub, c = np.unique(b, return_counts=True)
        return pa.table({"bin": pa.array(ub, pa.int64()),
                         "part": pa.array(c.astype(np.int64), pa.int64())})

    return (
        deg_ds.map_batches(partial, batch_format="pyarrow")
        .groupby("bin")
        .aggregate(Sum("part", alias_name="n_vertices"))
    )


def hill_alpha(deg_ds: ray.data.Dataset, d_min: int) -> pd.DataFrame:
    """Hill power-law tail estimator over degrees >= d_min:
    alpha = 1 + k / Σ ln(d_i / d_min).  One streamed pass of (k,
    Σ ln d) partials; returns a single row (d_min, k_tail, alpha)."""

    def partial(t: pa.Table) -> pa.Table:
        d = t["degree"].to_numpy(zero_copy_only=False).astype(np.float64)
        d = d[d >= d_min]
        return pa.table({"k": pa.array([len(d)], pa.int64()),
                         "lsum": pa.array([float(np.log(d).sum())],
                                          pa.float64())})

    k = 0
    lsum = 0.0
    for b in deg_ds.map_batches(partial, batch_format="pyarrow").iter_batches(
            batch_size=None, batch_format="pyarrow"):
        k += int(b["k"].to_numpy(zero_copy_only=False).sum())
        lsum += float(b["lsum"].to_numpy(zero_copy_only=False).sum())
    denom = lsum - k * np.log(float(d_min))
    alpha = 1.0 + k / denom if denom > 0 else float("nan")
    return pd.DataFrame({"d_min": [np.int64(d_min)], "k_tail": [np.int64(k)],
                         "alpha": [round(alpha, 6)]})


def degree_gini(canonical_ds: ray.data.Dataset) -> pd.DataFrame:
    """Exact Gini coefficient of the degree distribution — the
    inequality/hub-concentration screen (0 = regular graph, →1 =
    star-like).  Computed from the degree HISTOGRAM, never a global
    sort: degree_table → ``groupby("degree").count()`` leaves
    O(#distinct degrees) rows (≪ n always), and the driver applies the
    exact rank-sum closed form
    G = 2·Σᵢ i·xᵢ / (n·Σx) − (n+1)/n with integer group rank sums
    Σ_{i∈k} i = c_k·cum_{k-1} + c_k(c_k+1)/2.  One row
    (n_vertices, mean_degree, gini)."""
    from ray.data.aggregate import Count

    hist = (
        degree_table(canonical_ds)
        .groupby("degree")
        .aggregate(Count(alias_name="c"))
        .to_pandas()
        .sort_values("degree", ignore_index=True)
    )
    if hist.empty:
        return pd.DataFrame({"n_vertices": [np.int64(0)],
                             "mean_degree": [np.nan], "gini": [np.nan]})
    v = hist["degree"].to_numpy(np.int64)
    c = hist["c"].to_numpy(np.int64)
    n = int(c.sum())
    sx = int((v * c).sum())
    cum = np.concatenate(([0], np.cumsum(c)[:-1]))
    sr = int((v * (c * cum + c * (c + 1) // 2)).sum())
    gini = 2.0 * sr / (n * float(sx)) - (n + 1.0) / n
    return pd.DataFrame({"n_vertices": [np.int64(n)],
                         "mean_degree": [round(sx / n, 9)],
                         "gini": [round(gini, 9)]})
