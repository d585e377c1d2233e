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
from .iterative import (
    _BR_SIG_MASK,
    _BR_UNSET,
    IterativeEngine,
    bfs_distances,
    kill_pool,
    worker_pool,
)


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


def closeness_centrality(
    csr: CSRGraph,
    seeds,
    n_workers: int = 8,
    engine: str = "actors",
    workers: list | None = None,
) -> np.ndarray:
    """Sampled Wasserman-Faust closeness from ``seeds``: with r(v) =
    #seeds at finite positive distance and S(v) their distance sum,
    c(v) = (r/S) · (r/k) — the reachable-fraction-corrected inverse
    mean distance (0 when no seed reaches v).  Deterministic and
    order-invariant; same k-BFS-sweep shape and driver footprint as
    ``harmonic_centrality``."""
    n = csr.n
    if n == 0:
        return np.array([], dtype=np.float64)
    sds = np.unique(np.asarray(seeds, dtype=np.int64))
    if sds.size == 0:
        raise ValueError("closeness_centrality needs at least one seed")
    if sds.min() < 0 or sds.max() >= n:
        raise ValueError(f"seeds outside [0, {n})")
    own = workers is None and engine == "actors" and n > 1
    pool = worker_pool(csr, n_workers) if own else workers
    ssum = np.zeros(n, dtype=np.float64)
    r = np.zeros(n, dtype=np.int64)
    try:
        for s in sds:
            dist = bfs_distances(csr, [int(s)], n_workers=n_workers,
                                 engine=engine, workers=pool)
            m = (dist > 0) & (dist < n)
            ssum[m] += dist[m]
            r[m] += 1
    finally:
        if own:
            kill_pool(pool)
    out = np.zeros(n, dtype=np.float64)
    hit = r > 0
    out[hit] = (r[hit] / ssum[hit]) * (r[hit] / float(sds.size))
    return out


def betweenness_centrality(
    csr: CSRGraph,
    seeds,
    n_workers: int = 8,
    engine: str = "actors",
    workers: list | None = None,
) -> np.ndarray:
    """Sampled Brandes betweenness from ``seeds`` (Brandes 2001): for
    each seed, a level-synchronous forward BFS counts shortest paths
    (packed dist+sigma engine program), then a level-descending
    backward sweep accumulates pair dependencies (x-form program, see
    ``_apply_program``).  Returns sum over seeds of the dependency
    delta_s(v), halved (each unordered pair is counted from both ends
    when the sample is the whole vertex set).  Per seed: O(diameter)
    forward rounds + O(diameter) backward rounds on the shared worker
    pool; driver state is O(n) vectors, same as any score program."""
    import ray

    n = csr.n
    if n == 0:
        return np.array([], dtype=np.float64)
    sds = np.unique(np.asarray(seeds, dtype=np.int64))
    if sds.size == 0:
        raise ValueError("betweenness_centrality needs at least one seed")
    if sds.min() < 0 or sds.max() >= n:
        raise ValueError(f"seeds outside [0, {n})")
    own = workers is None and engine == "actors" and n > 1
    pool = worker_pool(csr, n_workers) if own else workers
    bc = np.zeros(n, dtype=np.float64)
    try:
        for s in sds:
            fwd = IterativeEngine(csr, "brandes_fwd", n_workers=n_workers,
                                  engine=engine, workers=pool)
            init = np.full(n, np.int64(_BR_UNSET) << np.int64(48),
                           dtype=np.int64)
            init[s] = np.int64(1)  # dist 0, sigma 1
            cnt = {"r": 1}

            def fex(_state, c=cnt):
                r = c["r"]
                c["r"] += 1
                return {"round": r}

            state, _ = fwd.run(init, fex, lambda d: d == 0.0, max_iter=n,
                               extras_from_stats=fex)
            dist = (state >> np.int64(48)).astype(np.int64)
            sigma = (state & _BR_SIG_MASK).astype(np.float64)
            reached = dist != int(_BR_UNSET)
            depth = int(dist[reached].max()) if reached.any() else 0
            dist_ref = ray.put(dist)
            sig_ref = ray.put(sigma)
            bwd = IterativeEngine(csr, "brandes_bwd", n_workers=n_workers,
                                  engine=engine, workers=pool)
            lv = {"l": depth}

            def bex(_state, c=lv, dr=dist_ref, sr=sig_ref):
                lev = c["l"]
                c["l"] -= 1
                return {"dist": dr, "sigma": sr, "level": lev}

            x, _ = bwd.run(np.zeros(n, dtype=np.float64), bex,
                           lambda d: False, max_iter=depth + 1,
                           extras_from_stats=bex)
            delta = np.where(reached, sigma * x - 1.0, 0.0)
            delta[s] = 0.0
            bc += delta
    finally:
        if own:
            kill_pool(pool)
    return bc / 2.0
