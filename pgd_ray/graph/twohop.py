"""Exact 2-hop neighborhood sizes (friends-of-friends cardinality).

For every vertex: |{w != v : dist(v, w) <= 2}| — the exact value the
HyperANF sketch (graph/iterative.py:anf_registers) only estimates at
h=2.  Feature used for spam/hub detection and sampling-bias audits.

Ray shape: the vertex-id Dataset streams through a stateless-task
kernel against the plasma-shared CSR (the graphlets `_kernel_stage`
amortization: one zero-copy fetch per worker process, kernel object
cached).  Per-vertex cost is Σ deg(u) over u ∈ N(v) (the true output
complexity); the per-batch python loop is over VERTICES with
segment-gather numpy inside — the same accepted shape as the graphlet
kernels (graphlet_core.cpp:702-800 walks per-vertex neighborhoods the
same way).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from pgd_ray.graph.csr import CSRGraph

_CACHE: dict = {}


class _TwoHopKernel:
    def __init__(self, indptr_ref, indices_ref):
        self.indptr = np.asarray(ray.get(indptr_ref))
        self.indices = np.asarray(ray.get(indices_ref))

    def __call__(self, t: pa.Table) -> pa.Table:
        vs = t["v"].to_numpy(zero_copy_only=False)
        out = np.empty(len(vs), np.int64)
        ip, ix = self.indptr, self.indices
        for i, v in enumerate(vs):
            nb = ix[ip[v]:ip[v + 1]]
            if not len(nb):
                out[i] = 0
                continue
            cnt = (ip[nb + 1] - ip[nb]).astype(np.int64)
            total = int(cnt.sum())
            pos = (np.arange(total, dtype=np.int64)
                   - np.repeat(np.cumsum(cnt) - cnt, cnt)
                   + np.repeat(ip[nb].astype(np.int64), cnt))
            u = np.unique(np.concatenate([nb, ix[pos]]))
            # exclude v itself (always present via any 2-hop return path)
            j = np.searchsorted(u, v)
            out[i] = len(u) - int(j < len(u) and u[j] == v)
        return pa.table({"v": pa.array(vs, pa.int64()),
                         "n2": pa.array(out, pa.int64())})


def two_hop_sizes(
    csr: CSRGraph,
    batch_size: int = 512,
) -> ray.data.Dataset:
    """(v, n2) for every vertex id 0..n-1."""
    indptr_ref, indices_ref = csr.put()
    key = indptr_ref.binary()

    def fn(t: pa.Table) -> pa.Table:
        k = _CACHE.get(key)
        if k is None:
            k = _TwoHopKernel(indptr_ref, indices_ref)
            _CACHE.clear()
            _CACHE[key] = k
        return k(t)

    ids = ray.data.from_arrow(pa.table({
        "v": pa.array(np.arange(csr.n, dtype=np.int64), pa.int64())}))
    # spread the id table so the kernel actually fans out
    ids = ids.repartition(max(1, csr.n // batch_size))
    return ids.map_batches(fn, batch_format="pyarrow", batch_size=batch_size)
