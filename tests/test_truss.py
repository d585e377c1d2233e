import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pgd_ray.graph.csr import csr_from_edge_arrays
from pgd_ray.graph.truss import ktruss_edges, trussness
from tests.brute import random_graph


def _ds(edges):
    src = pa.array([a for a, b in edges], pa.int64())
    dst = pa.array([b for a, b in edges], pa.int64())
    return rd.from_arrow(pa.table({"src": src, "dst": dst}))


def _csr(edges, n):
    src = np.array([a for a, b in edges], dtype=np.int64)
    dst = np.array([b for a, b in edges], dtype=np.int64)
    return csr_from_edge_arrays(src, dst, n=n)


def _ktruss_ref(edges, k):
    es = set(edges)
    while es:
        adj = {}
        for a, b in es:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        drop = {(a, b) for (a, b) in es if len(adj[a] & adj[b]) < k - 2}
        if not drop:
            return es
        es -= drop
    return es


def _trussness_ref(edges):
    out = {}
    es = set(edges)
    k = 3
    while es:
        nxt = _ktruss_ref(es, k)
        for e in es - nxt:
            out[e] = k - 1
        if nxt == es:
            k += 1
            continue
        es = nxt
    return out


def _got_edges(ds):
    df = ds.to_pandas()
    if df.empty:  # empty Datasets can drop their schema entirely
        return set()
    return {(int(a), int(b)) for a, b in zip(df["src"], df["dst"])}


def test_ktruss_k4_plus_pendant():
    # K4 on {0..3} plus pendant edge (3,4): 4-truss = the K4 edges
    edges = [(0, 1), (0, 2), (0, 3), (1, 2), (1, 3), (2, 3), (3, 4)]
    got = _got_edges(ktruss_edges(_ds(edges), _csr(edges, 5), k=4))
    assert got == set(edges) - {(3, 4)}
    # 3-truss keeps the K4 (every edge has support >= 1), drops pendant
    got3 = _got_edges(ktruss_edges(_ds(edges), _csr(edges, 5), k=3))
    assert got3 == set(edges) - {(3, 4)}
    # 5-truss of K4 is empty (support 2 < 3)
    assert ktruss_edges(_ds(edges), _csr(edges, 5), k=5).count() == 0


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_ktruss_random_matches_brute(seed):
    edges = sorted(random_graph(30, 0.25, seed))
    for k in (3, 4, 5):
        got = _got_edges(ktruss_edges(_ds(edges), _csr(edges, 30), k=k))
        assert got == _ktruss_ref(edges, k), f"k={k}"


@pytest.mark.parametrize("seed", [1, 2])
def test_trussness_random_matches_brute(seed):
    edges = sorted(random_graph(25, 0.3, seed))
    ref = _trussness_ref(edges)
    df = trussness(_ds(edges), _csr(edges, 25)).to_pandas()
    got = {(int(a), int(b)): int(t)
           for a, b, t in zip(df["src"], df["dst"], df["trussness"])}
    assert got == ref


def test_trussness_k5():
    # K5: every edge has support 3 within the clique -> trussness 5
    edges = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    df = trussness(_ds(edges), _csr(edges, 5)).to_pandas()
    assert len(df) == 10 and (df["trussness"] == 5).all()


def test_ktruss_k_validation():
    edges = [(0, 1)]
    with pytest.raises(ValueError):
        ktruss_edges(_ds(edges), _csr(edges, 2), k=2)
