"""Distance-based centralities over the distributed BFS engine.

Sampled harmonic centrality (Boldi & Vigna, "Axioms for Centrality"):
H(v) = (n-1)/k * sum over k sampled sources s of 1/dist(s, v).  Exact
when the sample is the whole vertex set; the k-seed estimator is the
standard scale path (k BFS sweeps instead of n).  The reference engine
has no centrality surface beyond degree/k-core; this extends D5's
iterative family (SURVEY §2.6) with the same executor contract.

Scale shape: k multi-round BFS passes over the shared worker pool —
per pass O(diameter) rounds, each a frontier relaxation on the
partitioned CSR; the accumulator is one float64[n] on the driver
(same footprint as any per-vertex score vector handed back to the
caller).  No shuffle beyond the engine's per-round exchanges.
"""
from __future__ import annotations

import numpy as np

from .csr import CSRGraph
from .iterative import bfs_distances, kill_pool, worker_pool


def harmonic_centrality(
    csr: CSRGraph,
    seeds,
    n_workers: int = 8,
    engine: str = "actors",
    workers: list | None = None,
) -> np.ndarray:
    """Harmonic centrality estimated from ``seeds`` (deterministic,
    order-invariant).  Unreached pairs contribute 0 (1/inf); the
    vertex's own term (dist 0) is excluded.  Returns float64[n],
    scaled by (n-1)/k so the whole-vertex-set sample equals the exact
    definition."""
    n = csr.n
    if n == 0:
        return np.array([], dtype=np.float64)
    sds = np.unique(np.asarray(seeds, dtype=np.int64))
    if sds.size == 0:
        raise ValueError("harmonic_centrality needs at least one seed")
    if sds.min() < 0 or sds.max() >= n:
        raise ValueError(f"seeds outside [0, {n})")
    own = workers is None and engine == "actors" and n > 1
    pool = worker_pool(csr, n_workers) if own else workers
    acc = np.zeros(n, dtype=np.float64)
    try:
        for s in sds:
            dist = bfs_distances(csr, [int(s)], n_workers=n_workers,
                                 engine=engine, workers=pool)
            m = (dist > 0) & (dist < n)
            acc[m] += 1.0 / dist[m]
    finally:
        if own:
            kill_pool(pool)
    return acc * (float(n - 1) / float(sds.size))
