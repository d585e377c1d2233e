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

Scale shape: each round is one streamed kernel pass over the edge
Dataset plus one distributed CSR rebuild; the driver holds only the
per-round edge count (O(#rounds) ints).  Round count is bounded by the
peeling depth (typically < 10 on real graphs; the cap is explicit).
The support recount is NOT incremental — at 100 TB the alternative
(per-edge support maintenance under deletion) needs a mutable
distributed index; recount-by-rounds keeps every step a pure streaming
pass, trading bounded extra compute for zero shared state.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from pgd_ray.graph.csr import CSRGraph, build_csr
from pgd_ray.graph.graphlets import edge_triangles


def _keep_stage(threshold: int):
    def fn(b):
        return b.filter(pc.greater_equal(b["triangle"], threshold)).select(["src", "dst"])

    return fn


def _drop_stage(threshold: int):
    def fn(b):
        return b.filter(pc.less(b["triangle"], threshold)).select(["src", "dst"])

    return fn


def _with_const(ds: ray.data.Dataset, name: str, value: int) -> ray.data.Dataset:
    def fn(b):
        return b.append_column(name, pa.array([value] * len(b), pa.int64()))

    return ds.map_batches(fn, batch_format="pyarrow", num_cpus=1)


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
    cur = eds
    cur_csr = csr if csr is not None else build_csr(eds)
    n = cur_csr.n
    m_cur = cur_csr.m
    for _ in range(max_rounds):
        if m_cur == 0:
            return cur
        tri = edge_triangles(cur, cur_csr, concurrency=concurrency)
        kept = tri.map_batches(
            _keep_stage(k - 2), batch_format="pyarrow", num_cpus=1
        ).materialize()
        m_new = kept.count()
        cur = kept
        if m_new == m_cur or m_new == 0:
            return cur
        m_cur = m_new
        cur_csr = build_csr(cur, n=n)
    return cur


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
    per-edge labels stay distributed (union of per-round drop sets)."""
    cur = eds
    cur_csr = csr if csr is not None else build_csr(eds)
    n = cur_csr.n
    m_cur = cur_csr.m
    parts: list[ray.data.Dataset] = []
    k = 3
    while m_cur > 0 and k <= k_max:
        while m_cur > 0:
            tri = edge_triangles(cur, cur_csr, concurrency=concurrency).materialize()
            kept = tri.map_batches(
                _keep_stage(k - 2), batch_format="pyarrow", num_cpus=1
            ).materialize()
            m_new = kept.count()
            if m_new != m_cur:
                dropped = tri.map_batches(
                    _drop_stage(k - 2), batch_format="pyarrow", num_cpus=1
                )
                parts.append(_with_const(dropped.materialize(), "trussness", k - 1))
            cur = kept
            if m_new == m_cur:  # fixpoint at this k — advance k
                break
            m_cur = m_new
            if m_cur > 0:
                cur_csr = build_csr(cur, n=n)
        k += 1
    if m_cur > 0:  # k_max cap hit: survivors are >= k_max-truss edges
        parts.append(_with_const(cur, "trussness", k - 1))
    if not parts:
        return _with_const(cur, "trussness", 0).limit(0)
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
