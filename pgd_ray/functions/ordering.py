"""Edge-ordering strategies (SURVEY.md §2.4 O1-O5).

The reference sorts its edge work list so heavy edges schedule first
under dynamic OpenMP scheduling (graphlet_core.cpp:853-867; key
functions cpp:774-834).  Ordering never changes any count — it is a
scheduling / output-order contract only — so here it serves (a) skew
mitigation: a degree-descending sort before the kernel stage makes
early blocks carry the hubs, and (b) the micro-CSV compat writer's
row order (SURVEY.md W2).

All nine implemented reference strategies are reproduced as vectorized
key computations over broadcast degree / kcore arrays inside one
``map_batches``; ``rand`` uses a FIXED seed (the reference seeds with
wall time — SURVEY.md Q5 — which we deliberately make deterministic).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from pgd_ray.graph.csr import CSRGraph

ORDERINGS = [
    "natural",
    "rand",
    "degree",
    "kcore",
    "kcore_degree",
    "degree_vol",
    "kcore_vol",
    "degree_kcore_vol",
    "var",
]


def _vol(csr: CSRGraph, weights: np.ndarray, v: np.ndarray) -> np.ndarray:
    """Σ_{w∈N(v)} weights[w], vectorized over a vertex array."""
    cs = np.concatenate(([0], np.cumsum(weights[csr.indices])))
    return cs[csr.indptr[v + 1]] - cs[csr.indptr[v]]


def edge_ordering_keys(
    canonical_ds: ray.data.Dataset,
    csr: CSRGraph,
    strategy: str = "degree",
    kcore_vec: np.ndarray | None = None,
    seed: int = 42,
) -> ray.data.Dataset:
    """Append an int64 ``key`` column per edge for the chosen strategy
    (graphlet_core.cpp:774-834 semantics)."""
    if strategy not in ORDERINGS:
        raise ValueError(f"unknown ordering {strategy!r}; one of {ORDERINGS}")
    if strategy in ("kcore", "kcore_degree", "kcore_vol", "degree_kcore_vol", "var") and kcore_vec is None:
        from pgd_ray.graph.iterative import kcore as _kcore

        kcore_vec = _kcore(csr)
    deg = csr.degrees()
    refs = {
        "deg": ray.put(deg),
        "kc": ray.put(kcore_vec if kcore_vec is not None else np.zeros(csr.n, np.int64)),
        "indptr": csr.put()[0],
        "indices": csr.put()[1],
    }

    def keys(t: pa.Table) -> pa.Table:
        d = ray.get(refs["deg"])
        kc = ray.get(refs["kc"])
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        if strategy == "natural":
            val = np.zeros(len(src), np.int64)
        elif strategy == "rand":
            # Deterministic (Q5 fixed) AND partition-invariant: the key
            # is a stable splitmix64-style hash of (src, dst, seed), so
            # the global order does not depend on how edges were
            # batched (a per-batch RNG would repeat the same sequence
            # in every batch).  Kept non-negative so the int64 sort
            # matches an unsigned ordering of the mixed bits.
            x = (
                src.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15)
                + dst.astype(np.uint64) * np.uint64(0xBF58476D1CE4E5B9)
                + np.uint64(seed)
            )
            x ^= x >> np.uint64(30)
            x *= np.uint64(0xBF58476D1CE4E5B9)
            x ^= x >> np.uint64(27)
            x *= np.uint64(0x94D049BB133111EB)
            x ^= x >> np.uint64(31)
            val = (x >> np.uint64(1)).astype(np.int64)
        elif strategy == "degree":
            val = d[src] + d[dst]
        elif strategy == "kcore":
            val = kc[src] + kc[dst]
        elif strategy == "kcore_degree":
            val = (d[src] + d[dst]) * (kc[src] + kc[dst])
        elif strategy in ("degree_vol", "kcore_vol", "degree_kcore_vol"):
            indptr = ray.get(refs["indptr"])
            indices = ray.get(refs["indices"])
            local = CSRGraph(csr.n, csr.m, indptr, indices)
            if strategy == "degree_vol":
                w = d
            elif strategy == "kcore_vol":
                w = kc
            else:
                w = d * kc
            val = _vol(local, w, src) + _vol(local, w, dst)
        elif strategy == "var":
            kcs = np.maximum(kc, 1)
            val = kc[src] * (d[src] // kcs[src]) + kc[dst] * (d[dst] // kcs[dst])
        return t.append_column("key", pa.array(val.astype(np.int64)))

    return canonical_ds.map_batches(keys, batch_format="pyarrow")


NEIGHBOR_ORDERINGS = ["natural", "degree", "kcore", "kcore_degree", "rand"]


def order_vertex_neighbors(
    csr: CSRGraph,
    strategy: str = "degree",
    descending: bool = True,
    kcore_vec: np.ndarray | None = None,
    seed: int = 42,
) -> CSRGraph:
    """Per-vertex neighbor-list reordering (SURVEY.md O4,
    graphlet_core.cpp:1910-1953, bucket sort cpp:1846-1877).

    Scheduling-only in the reference (counts are invariant — the
    reference orders neighbor lists so hub scans hit heavy neighbors
    first); default degree-descending, ``--s2l_neigh`` ascending.
    Vectorized: ONE global lexsort keyed (vertex, ±key, neighbor) —
    no per-vertex Python.  The returned CSR's neighbor lists are NOT
    id-sorted; ``GraphletKernel`` detects that and re-normalizes (its
    membership kernels require sorted lists), so the option is safe
    everywhere."""
    if strategy not in NEIGHBOR_ORDERINGS:
        raise ValueError(f"unknown neighbor ordering {strategy!r}; one of {NEIGHBOR_ORDERINGS}")
    if strategy == "natural":
        return csr
    deg = csr.degrees()
    owner = np.repeat(np.arange(csr.n, dtype=np.int64), deg)
    if strategy == "degree":
        key = deg[csr.indices]
    elif strategy == "kcore":
        if kcore_vec is None:
            from pgd_ray.graph.iterative import kcore as _kcore

            kcore_vec = _kcore(csr)
        key = kcore_vec[csr.indices]
    elif strategy == "kcore_degree":
        if kcore_vec is None:
            from pgd_ray.graph.iterative import kcore as _kcore

            kcore_vec = _kcore(csr)
        key = kcore_vec[csr.indices] * deg[csr.indices]
    else:  # rand — stable content hash, deterministic (Q5 fixed)
        x = csr.indices.astype(np.uint64) * np.uint64(0x9E3779B97F4A7C15) + np.uint64(seed)
        x ^= x >> np.uint64(31)
        key = (x >> np.uint64(1)).astype(np.int64)
    key = np.asarray(key, dtype=np.int64)
    if descending:
        key = -key
    perm = np.lexsort((csr.indices, key, owner))
    return CSRGraph(n=csr.n, m=csr.m, indptr=csr.indptr.copy(),
                    indices=csr.indices[perm], neighbors_sorted=False)


def sort_edges(
    canonical_ds: ray.data.Dataset,
    csr: CSRGraph,
    strategy: str = "degree",
    descending: bool = True,
    sample_fraction: float | None = None,
    seed: int = 42,
    **kw,
) -> ray.data.Dataset:
    """Globally sorted edge work list (E_ordered analogue).

    ``sample_fraction`` reproduces the sampled-sort approximation hook
    (graphlet_core.cpp:837-851) with a fixed seed.  ``descending=False``
    is the reference's ``--s2l`` flag.
    """
    ds = canonical_ds
    if sample_fraction is not None:
        ds = ds.random_sample(sample_fraction, seed=seed)
    keyed = edge_ordering_keys(ds, csr, strategy, seed=seed, **kw)
    return keyed.sort(["key", "src", "dst"], descending=[descending, descending, descending])
