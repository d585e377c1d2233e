import numpy as np

from pgd_ray.graph.csr import csr_from_edge_arrays
from pgd_ray.graph.wl import wl_class_sizes, wl_colors
from pgd_ray.text.hashing import splitmix64
from tests.brute import random_graph


def _csr(edges, n):
    return csr_from_edge_arrays(
        np.array([a for a, b in edges], np.int64),
        np.array([b for a, b in edges], np.int64), n=n)


def _wl_ref(edges, n, rounds):
    adj = [[] for _ in range(n)]
    for a, b in edges:
        adj[a].append(b)
        adj[b].append(a)
    c = np.array([len(a) for a in adj], np.uint64)
    for _ in range(rounds):
        h = splitmix64(c)
        nb = np.array([h[adj[v]].sum(dtype=np.uint64) if adj[v] else 0
                       for v in range(n)], np.uint64)
        c = splitmix64(h + nb)
    return c


def test_wl_matches_reference_and_refines_real_classes():
    edges = sorted(random_graph(n=80, p=0.05, seed=12))
    n = 80
    csr = _csr(edges, n)
    got = wl_colors(csr, rounds=3)
    ref = _wl_ref(edges, n, 3)
    assert np.array_equal(got["color"].to_numpy(),
                          (ref >> np.uint64(1)).astype(np.int64))
    # refinement never merges classes: counts are non-decreasing
    sizes = wl_class_sizes(csr, rounds=3)["n_classes"].to_numpy()
    assert (np.diff(sizes) >= 0).all()
    assert sizes[-1] > sizes[0]  # degrees alone under-separate this graph


def test_wl_distinguishes_non_isomorphic_regular_neighborhoods():
    # two 3-regular graphs: K4 and C6 — degree-0 colors identical,
    # one WL round must NOT separate members within each graph but
    # separates... K4 vs K_{3,3}: both 3-regular; 1-WL famously can't
    # split regular pairs, so instead check within-graph symmetry:
    # all K4 vertices share a color after any number of rounds.
    edges = [(i, j) for i in range(4) for j in range(i + 1, 4)]
    csr = _csr(edges, 4)
    got = wl_colors(csr, rounds=3)["color"].to_numpy()
    assert len(set(got)) == 1
    # path P4: ends vs middles split at round 0 and stay split
    pcsr = _csr([(0, 1), (1, 2), (2, 3)], 4)
    pc = wl_colors(pcsr, rounds=2)["color"].to_numpy()
    assert pc[0] == pc[3] and pc[1] == pc[2] and pc[0] != pc[1]
