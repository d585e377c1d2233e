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
