"""Link prediction over the graph's wedge space: common-neighbor and
Adamic-Adar scores for NON-adjacent vertex pairs at distance 2.

The reference counts wedges only in aggregate (graphlet_core.cpp's
2-star terms); link prediction enumerates them per endpoint pair — the
classic similarity indices (Liben-Nowell & Kleinberg 2003; Adamic &
Adar 2003):

    cn(u,v)  = |N(u) ∩ N(v)|
    aa(u,v)  = Σ_{m ∈ N(u)∩N(v)} 1 / ln(deg m)
    ra(u,v)  = Σ_{m ∈ N(u)∩N(v)} 1 / deg m      (resource allocation)
    jac(u,v) = cn / (deg u + deg v - cn)          (Jaccard)
    pa(u,v)  = deg u · deg v                      (preferential attachment)

ra accumulates alongside cn/aa in the distributed partials; jac and pa
are pure functions of (cn, deg u, deg v) and are derived on the
driver's ≤ P·top_n head rows from the CSR degree vector — no extra
distributed work.

Execution shape: one ``map_batches`` pass over vertex RANGES — each
mid-vertex m emits its neighbor pairs (the segmented-pair expansion
from stages/windows.cooccurrence_pairs, with an unbounded window),
weighted 1 and 1/ln(deg m); already-adjacent pairs are dropped inside
the task via a binary search against the canonical edge-key array (no
anti-join shuffle); per-batch ``np.unique`` partials pre-aggregate
before ONE exchange that hash-partitions partials into P contiguous
key ranges (``groupby("part")`` — P ≈ cluster cores, NOT per-pair
groups: Ray's per-group aggregate over millions of pair keys is the
slow path this replaces).  Each part combines vectorized
(np.unique + segmented adds) and emits only its LOCAL top-N; since a
pair key lives in exactly one part, merging the P×N heads on the
driver is exact — the driver never sees the full score table.

Scale note: wedge volume is Σ_m deg(m)², so hub mids dominate — the
vertex ranges are degree-volume balanced (``_volume_blocks``), which
spreads hub work; a per-mid pair cap (``max_pairs_per_mid``) bounds the
quadratic term the same way the LSH dedup caps bucket cliques.  The
edge-key membership array is the broadcast-CSR assumption shared with
the graphlet kernels (SCALE.md §kernels); per-worker-process state is
memoized by ObjectRef so the stage runs as plain tasks (no actor pool,
no restart-with-plasma-args hazard, ray#53727).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from pgd_ray.graph.csr import CSRGraph

# Per-worker-process memo: ObjectRef hex -> (indptr, indices, edge_keys,
# inv_log_deg). Worker processes persist across tasks, so this gives
# actor-style one-time setup without actor-pool constructor refs.
_STATE_CACHE: dict = {}


def _wedge_state(indptr_ref, indices_ref, n: int):
    key = (indptr_ref.hex(), indices_ref.hex())
    st = _STATE_CACHE.get(key)
    if st is None:
        indptr = ray.get(indptr_ref)
        indices = ray.get(indices_ref)
        deg = np.diff(indptr)
        # canonical (u < v) edge keys, ascending — row-major CSR order
        # of the upper-triangle half is already sorted by (u, v)
        rows = np.repeat(np.arange(n, dtype=np.int64), deg)
        upper = indices > rows
        edge_keys = rows[upper] * n + indices[upper]
        with np.errstate(divide="ignore"):
            inv_log_deg = np.where(deg > 1, 1.0 / np.log(np.maximum(deg, 2)), 0.0)
        inv_deg = np.where(deg > 0, 1.0 / np.maximum(deg, 1), 0.0)
        st = (indptr, indices, edge_keys, inv_log_deg, inv_deg)
        _STATE_CACHE.clear()  # one graph's state per worker at a time
        _STATE_CACHE[key] = st
    return st


def _wedge_partials(
    batch: pa.Table, indptr_ref, indices_ref, n: int, cap, span: int
) -> pa.Table:
    indptr, indices, edge_keys, inv_log_deg, inv_deg = _wedge_state(
        indptr_ref, indices_ref, n
    )
    empty = pa.table({"part": pa.array([], pa.int64()),
                      "key": pa.array([], pa.int64()),
                      "cn": pa.array([], pa.int64()),
                      "aa": pa.array([], pa.float64()),
                      "ra": pa.array([], pa.float64())})
    out_keys, out_cn, out_aa, out_ra = [], [], [], []
    for vlo, vhi in zip(batch["vlo"].to_numpy(zero_copy_only=False),
                        batch["vhi"].to_numpy(zero_copy_only=False)):
        idx = indptr[vlo : vhi + 1] - indptr[vlo]
        g = indices[indptr[vlo] : indptr[vhi]]
        if not len(g):
            continue
        runs = np.diff(idx)
        seg_start = np.repeat(idx[:-1], runs)
        seg_end = np.repeat(idx[1:], runs)
        pos = np.arange(len(g))
        cnt = seg_end - pos - 1
        if cap is not None:
            # bound the per-mid quadratic term: keep each element's
            # forward pairs but clip the fan-out
            cnt = np.minimum(cnt, cap)
        total = int(cnt.sum())
        if total == 0:
            continue
        left = np.repeat(pos, cnt)
        right = (
            np.arange(total)
            - np.repeat(np.concatenate(([0], np.cumsum(cnt[:-1]))), cnt)
            + left + 1
        )
        u, v = g[left], g[right]  # u < v: neighbor lists ascending
        mid = vlo + np.repeat(np.arange(len(runs)), runs)[left]
        key = u * n + v
        # drop pairs that are already edges (binary search on the
        # canonical key array)
        ins = np.searchsorted(edge_keys, key)
        ins_c = np.minimum(ins, len(edge_keys) - 1)
        is_edge = edge_keys[ins_c] == key if len(edge_keys) else np.zeros(len(key), bool)
        keep = ~is_edge
        if not keep.any():
            continue
        key, mid = key[keep], mid[keep]
        uk, inv = np.unique(key, return_inverse=True)
        cn = np.zeros(len(uk), dtype=np.int64)
        np.add.at(cn, inv, 1)
        aa = np.zeros(len(uk), dtype=np.float64)
        np.add.at(aa, inv, inv_log_deg[mid])
        ra = np.zeros(len(uk), dtype=np.float64)
        np.add.at(ra, inv, inv_deg[mid])
        out_keys.append(uk)
        out_cn.append(cn)
        out_aa.append(aa)
        out_ra.append(ra)
    if not out_keys:
        return empty
    keys = np.concatenate(out_keys)
    return pa.table({"part": keys // span,
                     "key": keys,
                     "cn": np.concatenate(out_cn),
                     "aa": np.concatenate(out_aa),
                     "ra": np.concatenate(out_ra)})


def link_prediction(
    csr: CSRGraph,
    top_n: int = 100,
    max_pairs_per_mid: int | None = None,
    blocks: int = 64,
    parts: int = 32,
    concurrency=None,
) -> "pd.DataFrame":
    """Top ``top_n`` non-adjacent distance-2 pairs by common-neighbor
    count (ties broken by (u, v) — fully deterministic), with the
    Adamic-Adar score alongside.  Returns a pandas DataFrame
    (u, v, cn, aa, ra, jac, pa) of exactly the head; the driver merges
    only the P per-part heads (≤ P·top_n rows) and derives jac/pa there
    from the degree vector."""
    import pandas as pd

    from pgd_ray.graph.iterative import _volume_blocks

    n = csr.n
    empty = pd.DataFrame({"u": pd.Series([], dtype=np.int64),
                          "v": pd.Series([], dtype=np.int64),
                          "cn": pd.Series([], dtype=np.int64),
                          "aa": pd.Series([], dtype=np.float64),
                          "ra": pd.Series([], dtype=np.float64),
                          "jac": pd.Series([], dtype=np.float64),
                          "pa": pd.Series([], dtype=np.int64)})
    if n == 0 or csr.m == 0:
        return empty
    ranges = _volume_blocks(csr, blocks)
    rds = ray.data.from_items([{"vlo": a, "vhi": b} for a, b in ranges])
    indptr_ref, indices_ref = csr.put()
    span = max(1, -(-(n * n) // parts))  # ceil: key // span < parts
    partials = rds.map_batches(
        _wedge_partials,
        fn_kwargs={
            "indptr_ref": indptr_ref,
            "indices_ref": indices_ref,
            "n": n,
            "cap": max_pairs_per_mid,
            "span": span,
        },
        batch_format="pyarrow",
        batch_size=1,
        num_cpus=1,
    )

    def combine(t: pa.Table) -> pa.Table:
        key = t["key"].to_numpy(zero_copy_only=False)
        uk, inv = np.unique(key, return_inverse=True)
        cn = np.zeros(len(uk), dtype=np.int64)
        np.add.at(cn, inv, t["cn"].to_numpy(zero_copy_only=False))
        aa = np.zeros(len(uk), dtype=np.float64)
        np.add.at(aa, inv, t["aa"].to_numpy(zero_copy_only=False))
        ra = np.zeros(len(uk), dtype=np.float64)
        np.add.at(ra, inv, t["ra"].to_numpy(zero_copy_only=False))
        # local head: uk ascending == (u, v) lexicographic, so a stable
        # sort by -cn yields exactly the (cn DESC, u, v) order
        order = np.argsort(-cn, kind="stable")[:top_n]
        uk, cn, aa, ra = uk[order], cn[order], aa[order], ra[order]
        return pa.table({
            "u": uk // n,
            "v": uk % n,
            "cn": cn,
            "aa": np.round(aa, 6),
            "ra": np.round(ra, 6),
        })

    heads = (
        partials.groupby("part")
        .map_groups(combine, batch_format="pyarrow")
        .to_pandas()
    )
    if heads.empty:
        return empty
    heads = heads.sort_values(
        ["cn", "u", "v"], ascending=[False, True, True], kind="stable"
    ).head(top_n).reset_index(drop=True)
    deg = csr.degrees().astype(np.int64)
    du = deg[heads["u"].to_numpy()]
    dv = deg[heads["v"].to_numpy()]
    cn = heads["cn"].to_numpy()
    heads["jac"] = np.round(cn / (du + dv - cn), 6)
    heads["pa"] = (du * dv).astype(np.int64)
    return heads[["u", "v", "cn", "aa", "ra", "jac", "pa"]]


def simrank(csr, C: float = 0.8, iters: int = 5) -> "np.ndarray":
    """SimRank similarity matrix ("two nodes are similar if their
    neighbors are similar") by fixed-round iteration over the
    UNDIRECTED adjacency:

        s(a,a) = 1
        s(a,b) = C / (|N(a)|·|N(b)|) · Σ_{u∈N(a), v∈N(b)} s(u, v)

    with s(a,b) = 0 when either endpoint is isolated.  Intended for
    VOCABULARY-sized similarity graphs (the tool graph): the n×n pair
    state is the algorithm's own output size, so this runs where that
    state lives (cf. Lizorkin et al., WWW'08 — the partial-sums
    optimization matters only past n ~ 10⁵, far above any tool
    vocabulary).  The heavy distributed stage is the edge derivation
    that produced ``csr``.  Returns the (n, n) float64 matrix after
    ``iters`` rounds, UNROUNDED (callers round at the contract
    boundary)."""
    n = csr.n
    deg = csr.degrees().astype(np.int64)
    S = np.eye(n)
    if n == 0:
        return S
    A = np.zeros((n, n))
    for v in range(n):
        A[v, csr.neighbors(v)] = 1.0
    dd = deg[:, None] * deg[None, :]
    scale = np.where(dd > 0, C / np.maximum(dd, 1), 0.0)
    for _ in range(iters):
        S = scale * (A @ S @ A.T)
        np.fill_diagonal(S, 1.0)
    return S


def negative_edges(csr, k: int = 500, budget: int | None = None):
    """Deterministic NEGATIVE edge sampling (GNN/link-prediction
    training data): propose pairs (splitmix64(2c) mod n,
    splitmix64(2c+1) mod n) for counters c = 0.., reject self-loops
    and existing edges, keep the first ``k`` accepted in counter
    order — a pure function of the graph (retry/partition/rerun
    invariant; duplicate pairs may repeat, as in any with-replacement
    proposal stream).

    Distribution: the counter range is a Dataset; each task checks
    membership against the broadcast sorted canonical edge-key array
    (one int64 per edge).  The driver sees ≤ budget accepted rows
    (output-scale).  Returns (c, lo, hi) dense-id DataFrame."""
    import pandas as pd
    import pyarrow as pa
    import ray
    import ray.data

    from pgd_ray.graph.cache import get_cached
    from pgd_ray.text.hashing import splitmix64

    n = csr.n
    if budget is None:
        budget = 8 * k
    v_of = np.repeat(np.arange(n, dtype=np.int64), np.diff(csr.indptr))
    u_of = csr.indices.astype(np.int64)
    canon = v_of < u_of
    keys = np.sort(v_of[canon] * n + u_of[canon])
    key_ref = ray.put(keys)

    def propose(t: pa.Table) -> pa.Table:
        ks = get_cached(key_ref)
        c = t["id"].to_numpy(zero_copy_only=False).astype(np.uint64)
        u = (splitmix64(2 * c) % np.uint64(n)).astype(np.int64)
        v = (splitmix64(2 * c + np.uint64(1)) % np.uint64(n)).astype(np.int64)
        lo = np.minimum(u, v)
        hi = np.maximum(u, v)
        ok = lo != hi
        key = lo * n + hi
        pos = np.searchsorted(ks, key)
        valid = pos < len(ks)
        exists = np.zeros(len(key), dtype=bool)
        exists[valid] = ks[pos[valid]] == key[valid]
        keep = ok & ~exists
        return pa.table({"c": c[keep].astype(np.int64),
                         "lo": lo[keep], "hi": hi[keep]})

    acc = (ray.data.range(budget)
           .map_batches(propose, batch_format="pyarrow",
                        batch_size=65536)
           .to_pandas())
    acc = acc.sort_values("c", ignore_index=True).head(k)
    if len(acc) < k:
        raise ValueError(f"negative_edges: budget {budget} yielded "
                         f"only {len(acc)} non-edges; raise budget")
    return acc
