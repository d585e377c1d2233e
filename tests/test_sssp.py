"""Weighted SSSP (Bellman-Ford engine program) vs a brute Dijkstra."""

import heapq

import numpy as np

from pgd_ray.graph.csr import csr_from_edge_arrays
from pgd_ray.graph.iterative import (SSSP_INF, slot_weights,
                                     sssp_distances)


def _dijkstra(n, adj, src):
    dist = [float("inf")] * n
    dist[src] = 0
    h = [(0, src)]
    while h:
        d, v = heapq.heappop(h)
        if d > dist[v]:
            continue
        for u, w in adj[v]:
            nd = d + w
            if nd < dist[u]:
                dist[u] = nd
                heapq.heappush(h, (nd, u))
    return dist


def test_sssp_matches_dijkstra_random():
    rng = np.random.default_rng(11)
    n = 60
    iu, ju = np.triu_indices(n, 1)
    keep = rng.random(len(iu)) < 0.08
    src, dst = iu[keep], ju[keep]
    w = rng.integers(1, 20, keep.sum())
    csr = csr_from_edge_arrays(src, dst, n=n)
    slots = slot_weights(csr, src, dst, w)
    dist = sssp_distances(csr, slots, source=0, rounds=n)

    adj = [[] for _ in range(n)]
    for a, b, ww in zip(src, dst, w):
        adj[a].append((b, int(ww)))
        adj[b].append((a, int(ww)))
    ref = _dijkstra(n, adj, 0)
    for v in range(n):
        if ref[v] == float("inf"):
            assert dist[v] == SSSP_INF, v
        else:
            assert dist[v] == int(ref[v]), v


def test_sssp_path_graph_closed_form():
    # path 0-1-2-3 with weights 5, 7, 2
    csr = csr_from_edge_arrays(np.array([0, 1, 2]), np.array([1, 2, 3]), n=4)
    slots = slot_weights(csr, np.array([0, 1, 2]), np.array([1, 2, 3]),
                         np.array([5, 7, 2]))
    dist = sssp_distances(csr, slots, source=0, rounds=10)
    assert list(dist) == [0, 5, 12, 14]


def test_slot_weights_rejects_uncovered_edges():
    import pytest

    csr = csr_from_edge_arrays(np.array([0, 1]), np.array([1, 2]), n=3)
    with pytest.raises(ValueError):
        slot_weights(csr, np.array([0]), np.array([1]), np.array([3]))


def test_sssp_warns_on_exhausted_round_bound():
    """Regression (ADVICE r3): a path graph longer than the round
    bound must emit a RuntimeWarning instead of silently returning
    overstated distances."""
    import warnings

    import numpy as np
    import pytest

    from pgd_ray.graph.csr import CSRGraph
    from pgd_ray.graph.iterative import SSSP_INF, slot_weights, sssp_distances

    # path 0-1-2-...-9 (hop diameter 9), unit weights
    n = 10
    src = np.arange(n - 1, dtype=np.int64)
    dst = src + 1
    indptr = np.zeros(n + 1, dtype=np.int64)
    deg = np.bincount(np.concatenate([src, dst]), minlength=n)
    indptr[1:] = np.cumsum(deg)
    indices = np.zeros(indptr[-1], dtype=np.int64)
    fill = indptr[:-1].copy()
    for a, b in zip(src, dst):
        indices[fill[a]] = b; fill[a] += 1
        indices[fill[b]] = a; fill[b] += 1
    csr = CSRGraph(n=n, m=n - 1, indptr=indptr, indices=indices)
    w = slot_weights(csr, src, dst, np.ones(n - 1, dtype=np.int64))
    with pytest.warns(RuntimeWarning, match="still relaxing"):
        d = sssp_distances(csr, w, source=0, rounds=3, n_workers=2)
    assert (d[4:] > 3).all()  # incomplete — sentinel or overstated
    with warnings.catch_warnings():
        warnings.simplefilter("error")  # no warning when converged
        d2 = sssp_distances(csr, w, source=0, rounds=30, n_workers=2)
    assert np.array_equal(d2, np.arange(n, dtype=np.int64))
