"""Community quality metrics over a per-vertex label vector.

Newman modularity, decomposed per community:
    q_c = m_in(c)/m  -  (deg_sum(c) / (2m))^2
with Q = sum_c q_c.  Labels come from any engine program that emits a
per-vertex partition (label propagation, connected components, LP on
the tool graph).  The reference has no community surface; this extends
D5's iterative family (SURVEY §2.6) with the standard evaluation
metric used alongside label propagation.

Scale shape: the edge-side term is one `map_batches` pass over the
canonical edge Dataset with the label vector broadcast once via
`ray.put` (zero-copy numpy view inside each task), emitting per-batch
partial (label, m_in) rows — the shuffle carries at most
#batches x #labels-touched rows, never edges.  The vertex-side term is
a bincount over the driver-held degree/label vectors (same O(n)
footprint as the label vector itself).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray

from .csr import CSRGraph


def modularity_by_label(
    edges,
    csr: CSRGraph,
    labels: np.ndarray,
    round_to: int = 9,
) -> pd.DataFrame:
    """Per-community modularity table over canonical (src<dst) edges.

    Returns one row per community: ``label``, ``n_vertices``,
    ``m_in`` (intra-community edge count), ``deg_sum`` and the
    modularity contribution ``q`` rounded to ``round_to``.
    """
    labels = np.asarray(labels, dtype=np.int64)
    n = csr.n
    if labels.shape[0] != n:
        raise ValueError(f"labels length {labels.shape[0]} != n {n}")
    m = int(csr.indices.size // 2)
    if n == 0 or m == 0:
        return pd.DataFrame({"label": np.array([], np.int64),
                             "n_vertices": np.array([], np.int64),
                             "m_in": np.array([], np.int64),
                             "deg_sum": np.array([], np.int64),
                             "q": np.array([], np.float64)})
    lab_ref = ray.put(labels)

    def intra_part(b: pa.Table) -> pa.Table:
        lab = ray.get(lab_ref)
        s = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        ls = lab[s]
        keep = ls == lab[d]
        u, c = np.unique(ls[keep], return_counts=True)
        return pa.table({"label": u.astype(np.int64),
                         "m_in": c.astype(np.int64)})

    from ray.data.aggregate import Sum

    part = edges.map_batches(intra_part, batch_format="pyarrow")
    intra_df = (part.groupby("label")
                .aggregate(Sum("m_in", alias_name="m_in"))
                .to_pandas())
    intra = dict(zip(intra_df["label"].to_numpy(),
                     intra_df["m_in"].to_numpy()))

    deg = csr.degrees().astype(np.int64)
    uniq, inv = np.unique(labels, return_inverse=True)
    deg_sum = np.bincount(inv, weights=deg).astype(np.int64)
    n_vert = np.bincount(inv).astype(np.int64)
    m_in = np.zeros(uniq.size, dtype=np.int64)
    if intra:
        ik = np.fromiter(intra.keys(), dtype=np.int64, count=len(intra))
        iv = np.fromiter(intra.values(), dtype=np.int64, count=len(intra))
        m_in[np.searchsorted(uniq, ik)] = iv
    mm = float(m)
    q = m_in / mm - (deg_sum / (2 * mm)) * (deg_sum / (2 * mm))
    return pd.DataFrame({
        "label": uniq, "n_vertices": n_vert, "m_in": m_in,
        "deg_sum": deg_sum, "q": np.round(q, round_to),
    })


def modularity(edges, csr: CSRGraph, labels: np.ndarray) -> float:
    """Scalar Newman modularity Q of the labeling."""
    tab = modularity_by_label(edges, csr, labels, round_to=15)
    return float(tab["q"].sum())


def conductance_by_label(
    edges,
    csr: CSRGraph,
    labels: np.ndarray,
    round_to: int = 9,
) -> pd.DataFrame:
    """Per-community conductance φ(c) = cut(c) / min(vol(c), 2m-vol(c))
    over canonical (src<dst) edges — the standard cut-quality score
    complementing ``modularity_by_label``.  cut(c) counts edges with
    exactly one endpoint in c (each such edge charges BOTH endpoint
    communities); vol is the degree sum.  Edge side distributed with
    the label vector broadcast once; communities spanning the whole
    volume (denominator 0) report φ = 0.  Columns (label, cut_edges,
    volume, conductance)."""
    labels = np.asarray(labels, dtype=np.int64)
    n = csr.n
    if labels.shape[0] != n:
        raise ValueError(f"labels length {labels.shape[0]} != n {n}")
    m = int(csr.indices.size // 2)
    if n == 0:
        return pd.DataFrame({"label": np.array([], np.int64),
                             "cut_edges": np.array([], np.int64),
                             "volume": np.array([], np.int64),
                             "conductance": np.array([], np.float64)})
    lab_ref = ray.put(labels)

    def cut_part(b: pa.Table) -> pa.Table:
        lab = ray.get(lab_ref)
        ls = lab[b["src"].to_numpy(zero_copy_only=False)]
        ld = lab[b["dst"].to_numpy(zero_copy_only=False)]
        keep = ls != ld
        u, c = np.unique(np.concatenate([ls[keep], ld[keep]]),
                         return_counts=True)
        return pa.table({"label": u.astype(np.int64),
                         "cut": c.astype(np.int64)})

    from ray.data.aggregate import Sum

    cut_df = (
        edges.map_batches(cut_part, batch_format="pyarrow")
        .groupby("label")
        .aggregate(Sum("cut", alias_name="cut"))
        .to_pandas()
    )
    deg = csr.degrees().astype(np.int64)
    uniq, inv = np.unique(labels, return_inverse=True)
    vol = np.bincount(inv, weights=deg).astype(np.int64)
    cut = np.zeros(uniq.size, dtype=np.int64)
    if len(cut_df):
        cut[np.searchsorted(uniq, cut_df["label"].to_numpy())] = (
            cut_df["cut"].to_numpy())
    den = np.minimum(vol, 2 * m - vol).astype(np.float64)
    phi = np.divide(cut.astype(np.float64), den,
                    out=np.zeros(len(uniq)), where=den > 0)
    return pd.DataFrame({
        "label": uniq, "cut_edges": cut, "volume": vol,
        "conductance": np.round(phi, round_to),
    })


def cheeger_cut(csr, scores: np.ndarray, round_to: int = 9) -> pd.DataFrame:
    """Spectral sweep cut: order vertices by the (round-9) Fiedler
    score, evaluate the conductance of every prefix cut, return the
    best (the Cheeger-inequality certificate that the Fiedler vector
    actually finds a sparse cut).  Vectorized delta-array sweep:
    cut(k) = Σ_{r≤k} (+1 at an edge's low rank, −1 at its high rank);
    vol(k) = prefix degree sum.  One row (k, cut_edges, vol_small,
    conductance) — ties in conductance break to the smallest k.
    Driver math over the broadcast-class CSR arrays (the same
    residence the Fiedler iteration itself used)."""
    n = csr.n
    s9 = np.round(np.asarray(scores, dtype=np.float64), round_to)
    order = np.lexsort((np.arange(n), s9))
    rank = np.empty(n, dtype=np.int64)
    rank[order] = np.arange(1, n + 1)  # 1-based, SQL row_number
    v_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(csr.indptr))
    u_of = csr.indices.astype(np.int64)
    canon = v_of < u_of
    lo = np.minimum(rank[v_of[canon]], rank[u_of[canon]])
    hi = np.maximum(rank[v_of[canon]], rank[u_of[canon]])
    delta = np.zeros(n + 2, dtype=np.int64)
    np.add.at(delta, lo, 1)
    np.add.at(delta, hi, -1)
    cuts = np.cumsum(delta[1:n])  # cut after prefix k for k=1..n-1
    deg = csr.degrees().astype(np.int64)
    vol = np.cumsum(deg[order])[: n - 1]
    tot = int(deg.sum())
    small = np.minimum(vol, tot - vol)
    cond = cuts / np.maximum(small, 1).astype(np.float64)
    k = int(np.argmin(cond)) + 1
    return pd.DataFrame({"k": [np.int64(k)],
                         "cut_edges": [np.int64(cuts[k - 1])],
                         "vol_small": [np.int64(small[k - 1])],
                         "conductance": [round(float(cond[k - 1]), 9)]})
