"""k-truss decomposition by distributed peeling rounds.

The k-truss of G is the maximal subgraph in which every edge closes at
least k-2 triangles *within the subgraph* (Cohen 2008).  The reference
engine stops at triangle counts per edge (graphlet_core.cpp:702-800,
its ``tri`` micro column); the truss is the natural fixpoint on top of
them, and the classic parallel formulation maps 1:1 onto Ray Data:

    repeat:
        support   <- edge_triangles(current edge set)  # one map_batches pass
        survivors <- support >= k-2                    # vectorized Arrow filter
        rebuild CSR from survivors                     # one groupby shuffle
    until no edge is dropped

Round-5 round cost (VERDICT r4 item 8): support(u, w) = |N(u) ∩ N(w)|
can only change when u or w is an endpoint of a dropped edge, so once
the per-round drop set is a small fraction of the survivors the
recount runs ONLY over edges incident to a dropped endpoint (the
affected set, broadcast as a sorted id array) and every other edge
reuses its stored support — late rounds (a handful of drops) become
near-free.  Early rounds (mass drops) still recount everything; the
switch is ``affected_frac``.  The same reuse carries the support
Dataset across k-advances in ``trussness`` (a fixpoint at k drops
nothing, so k+1 starts from the same counts — the old code recounted).

Scale shape: each round is one streamed kernel pass over the
(affected) edge Dataset plus one distributed CSR rebuild; the driver
holds the per-round edge count and, on affected rounds, the dropped-
endpoint id array (≤ 2·drops, itself ≤ affected_frac·m).  Round count
is bounded by the peeling depth (typically < 10 on real graphs; the
cap is explicit).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from pgd_ray.graph.csr import CSRGraph, build_csr
from pgd_ray.graph.graphlets import edge_triangles


def _with_const(ds: ray.data.Dataset, name: str, value: int) -> ray.data.Dataset:
    def fn(b):
        return b.append_column(name, pa.array([value] * len(b), pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", num_cpus=1)


def _sorted_member(v: np.ndarray, x: np.ndarray) -> np.ndarray:
    """Membership of x in sorted array v, vectorized."""
    if not len(v):
        return np.zeros(len(x), dtype=bool)
    idx = np.searchsorted(v, x)
    return (idx < len(v)) & (v[np.minimum(idx, len(v) - 1)] == x)


def _recount(
    kept_tri: ray.data.Dataset,
    dropped: ray.data.Dataset,
    new_csr: CSRGraph,
    n_drop: int,
    m_new: int,
    concurrency,
    affected_frac: float = 0.05,
) -> ray.data.Dataset:
    """Per-edge support of the kept edges after ``dropped`` left the
    graph.  Full kernel recount when the AFFECTED edge set — edges
    incident to a dropped endpoint, the only ones whose common
    neighborhood can shrink — is a large fraction of the survivors;
    otherwise recount only those and reuse the stored ``triangle``
    column for the rest.  The gate is the degree sum of the dropped
    endpoints in the new CSR (an upper bound on affected incidences,
    O(|endpoints|) to evaluate): a drop count alone is a bad predictor
    on hub-heavy graphs, where a few dropped edges can touch most of
    the graph, and the affected path pays two extra filter passes —
    only a genuinely tiny affected set (< affected_frac of survivors,
    the late-round regime) beats one clean fused kernel pass.
    ``kept_tri`` may be lazy (a filter over the materialized previous
    support Dataset); the full path fuses it into the kernel pass.
    Returns a materialized (src, dst, triangle) Dataset."""
    full = edge_triangles(
        kept_tri.select_columns(["src", "dst"]), new_csr,
        concurrency=concurrency,
    )
    if n_drop > max(1, int(m_new * affected_frac)):
        return full.materialize()

    vd = np.array([], dtype=np.int64)
    for b in dropped.select_columns(["src", "dst"]).iter_batches(
            batch_size=1 << 18, batch_format="pyarrow"):
        if b.num_rows:
            vd = np.unique(np.concatenate([
                vd,
                b["src"].to_numpy(zero_copy_only=False),
                b["dst"].to_numpy(zero_copy_only=False)]))
    # affected incidences ≤ Σ deg(vd); past the gate the split +
    # near-full recount costs more than one clean kernel pass
    deg = np.diff(new_csr.indptr)
    if len(vd) and int(deg[vd].sum()) > max(1, int(2 * m_new * affected_frac)):
        return full.materialize()
    vd_ref = ray.put(vd)

    def affected_edges(t: pa.Table, vd_ref=vd_ref) -> pa.Table:
        from pgd_ray.graph.cache import get_cached

        v = get_cached(vd_ref)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        aff = _sorted_member(v, src) | _sorted_member(v, dst)
        return t.select(["src", "dst"]).filter(pa.array(aff))

    def rest_edges(t: pa.Table, vd_ref=vd_ref) -> pa.Table:
        from pgd_ray.graph.cache import get_cached

        v = get_cached(vd_ref)
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        aff = _sorted_member(v, src) | _sorted_member(v, dst)
        return t.filter(pa.array(~aff))

    affected = kept_tri.map_batches(affected_edges, batch_format="pyarrow",
                                    num_cpus=1)
    rest = kept_tri.map_batches(rest_edges, batch_format="pyarrow",
                                num_cpus=1)
    tri_aff = edge_triangles(affected, new_csr, concurrency=concurrency)
    return rest.union(tri_aff).materialize()


def ktruss_edges(
    eds: ray.data.Dataset,
    csr: CSRGraph | None = None,
    k: int = 4,
    max_rounds: int = 100,
    concurrency=(1, 32),
) -> ray.data.Dataset:
    """Canonical (src < dst) edges of the k-truss of the graph given by
    ``eds`` (canonical edge Dataset) / ``csr`` (its CSR; built here if
    omitted).  Returns a (possibly empty) Dataset with columns
    (src, dst)."""
    if k < 3:
        raise ValueError(f"k-truss needs k >= 3, got {k}")
    cur_csr = csr if csr is not None else build_csr(eds)
    n = cur_csr.n
    m_cur = cur_csr.m
    if m_cur == 0:
        return eds
    tri = edge_triangles(eds, cur_csr, concurrency=concurrency).materialize()
    for _ in range(max_rounds):
        # kept stays LAZY: the count is a light pass over the
        # materialized support Dataset, and the recount fuses the
        # filter straight into the kernel pass — one heavy pass per
        # round, and the convergence round costs a count only (the old
        # loop paid a full kernel pass to discover nothing dropped)
        kept_tri = tri.filter(expr=f"triangle >= {k - 2}")
        m_new = kept_tri.count()
        if m_new == m_cur or m_new == 0:
            return kept_tri.select_columns(["src", "dst"])
        dropped = tri.filter(expr=f"triangle < {k - 2}")
        n_drop = m_cur - m_new
        m_cur = m_new
        cur_csr = build_csr(kept_tri.select_columns(["src", "dst"]), n=n)
        tri = _recount(kept_tri, dropped, cur_csr, n_drop, m_new,
                       concurrency)
    return tri.select_columns(["src", "dst"])


def trussness(
    eds: ray.data.Dataset,
    csr: CSRGraph | None = None,
    k_max: int = 64,
    concurrency=(1, 32),
) -> ray.data.Dataset:
    """Per-edge trussness — the largest k such that the edge is in the
    k-truss — for every canonical edge, as a Dataset (src, dst,
    trussness).  Peels k = 3, 4, ...: an edge dropped while peeling
    towards the k-truss has trussness k-1; when a peel at k empties the
    graph, the last survivors (the max truss) were labeled k-1 on the
    way out.  Driver state is O(#peel-rounds) Dataset handles; the
    per-edge labels stay distributed (union of per-round drop sets).
    Support counts carry across rounds AND k-advances (see module
    docstring), so a fixpoint at k costs one filter, not a kernel
    pass."""
    cur_csr = csr if csr is not None else build_csr(eds)
    n = cur_csr.n
    m_cur = cur_csr.m
    parts: list[ray.data.Dataset] = []
    tri = (edge_triangles(eds, cur_csr, concurrency=concurrency)
           .materialize() if m_cur > 0 else None)
    k = 3
    while m_cur > 0 and k <= k_max:
        while m_cur > 0:
            kept_tri = tri.filter(expr=f"triangle >= {k - 2}")
            m_new = kept_tri.count()
            if m_new != m_cur:
                dropped = tri.filter(
                    expr=f"triangle < {k - 2}").materialize()
                parts.append(_with_const(
                    dropped.select_columns(["src", "dst"]),
                    "trussness", k - 1))
            if m_new == m_cur:  # fixpoint at this k — advance k,
                break           # support counts still valid
            n_drop = m_cur - m_new
            m_cur = m_new
            if m_cur > 0:
                cur_csr = build_csr(
                    kept_tri.select_columns(["src", "dst"]), n=n)
                tri = _recount(kept_tri, dropped, cur_csr, n_drop, m_new,
                               concurrency)
        k += 1
    if m_cur > 0:  # k_max cap hit: survivors are >= k_max-truss edges
        parts.append(_with_const(
            tri.select_columns(["src", "dst"]), "trussness", k - 1))
    if not parts:
        base = eds.select_columns(["src", "dst"]) if m_cur == 0 else tri
        return _with_const(base, "trussness", 0).limit(0)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
