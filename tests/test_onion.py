import numpy as np
import pyarrow as pa
import ray.data as rd

from pgd_ray.graph.csr import csr_from_edge_arrays
from pgd_ray.graph.onion import onion_kernel, onion_layers
from tests.brute import random_graph


def _ds(edges):
    return rd.from_arrow(pa.table({
        "src": pa.array([a for a, b in edges], pa.int64()),
        "dst": pa.array([b for a, b in edges], pa.int64()),
    }))


def _csr(edges, n):
    src = np.array([a for a, b in edges], np.int64)
    dst = np.array([b for a, b in edges], np.int64)
    return csr_from_edge_arrays(src, dst, n=n)


def _onion_ref(edges, n):
    adj = [set() for _ in range(n)]
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    deg = np.array([len(s) for s in adj])
    alive = np.ones(n, bool)
    layer = np.zeros(n, np.int64)
    core = np.zeros(n, np.int64)
    k, li = int(deg.min()), 0
    while alive.any():
        li += 1
        sel = alive & (deg <= k)
        layer[sel] = li
        core[sel] = k
        for v in np.flatnonzero(sel):
            alive[v] = False
            for u in adj[v]:
                if alive[u]:
                    deg[u] -= 1
        if alive.any():
            k = max(k, int(deg[alive].min()))
    return layer, core


def test_kernel_matches_reference_and_kcore():
    from pgd_ray.graph.iterative import kcore

    for seed in (2, 9):
        edges = sorted(random_graph(n=70, p=0.08, seed=seed))
        n = 70
        csr = _csr(edges, n)
        layer, core = onion_kernel(csr.indptr, csr.indices)
        rl, rc = _onion_ref(edges, n)
        assert np.array_equal(layer, rl) and np.array_equal(core, rc)
        # onion cores ARE the k-core numbers
        assert np.array_equal(core, kcore(csr, n_workers=2))


def test_dataset_path_matches_task_path():
    edges = sorted(random_graph(n=40, p=0.15, seed=4))
    n = 40
    touched = sorted({v for e in edges for v in e})
    task = {r["v"]: (r["layer"], r["core"])
            for r in onion_layers(_ds(edges), _csr(edges, n)).take_all()}
    dset = {r["v"]: (r["layer"], r["core"])
            for r in onion_layers(_ds(edges), engine="dataset").take_all()}
    # dataset path covers edge endpoints only; task path covers all ids
    assert set(dset) == set(touched)
    for v in touched:
        assert dset[v] == task[v], v


def test_isolated_vertices_peel_first():
    # vertex 3 isolated in a 5-vertex CSR with a triangle on 0,1,2
    edges = [(0, 1), (0, 2), (1, 2)]
    csr = _csr(edges, 5)
    layer, core = onion_kernel(csr.indptr, csr.indices)
    assert core[3] == 0 and core[4] == 0 and layer[3] == 1
    assert (core[[0, 1, 2]] == 2).all()


def test_two_hop_sizes_matches_bfs_reference():
    from pgd_ray.graph.twohop import two_hop_sizes

    for seed, n in ((3, 50), (8, 50)):
        edges = sorted(random_graph(n=n, p=0.06, seed=seed))
        csr = _csr(edges, n)
        got = {r["v"]: r["n2"] for r in two_hop_sizes(csr).take_all()}
        adj = [set() for _ in range(n)]
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        for v in range(n):
            reach = set(adj[v])
            for u in adj[v]:
                reach |= adj[u]
            reach.discard(v)
            assert got[v] == len(reach), v


def test_two_hop_isolated_and_star():
    from pgd_ray.graph.twohop import two_hop_sizes

    # star 0-1, 0-2, 0-3 + isolated 4: leaves see whole star (3)
    edges = [(0, 1), (0, 2), (0, 3)]
    csr = _csr(edges, 5)
    got = {r["v"]: r["n2"] for r in two_hop_sizes(csr).take_all()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 4: 0}
