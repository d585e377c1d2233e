"""Fiedler vector: eigh alignment, bisection, cross-engine parity."""
import numpy as np

from pgd_ray.graph.csr import CSRGraph
from pgd_ray.graph.iterative import fiedler_vector


def _csr(n, E):
    E = np.array(sorted(E), dtype=np.int64).reshape(-1, 2)
    src = np.concatenate([E[:, 0], E[:, 1]])
    dst = np.concatenate([E[:, 1], E[:, 0]])
    o = np.lexsort((dst, src))
    src, dst = src[o], dst[o]
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr[1:], src, 1)
    return CSRGraph(n, len(E), np.cumsum(indptr), dst)


def _two_cliques():
    E = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    E += [(i, j) for i in range(5, 10) for j in range(i + 1, 10)]
    E += [(4, 5)]
    return E


def test_fiedler_bisects_joined_cliques():
    E = _two_cliques()
    x = fiedler_vector(_csr(10, E), iters=128)
    A = np.zeros((10, 10))
    for a, b in E:
        A[a, b] = A[b, a] = 1
    L = np.diag(A.sum(1)) - A
    w, V = np.linalg.eigh(L)
    assert abs(float(x @ V[:, 1])) > 1 - 1e-9
    side = set(np.flatnonzero(x > 0).tolist())
    assert side in ({0, 1, 2, 3, 4}, {5, 6, 7, 8, 9})
    assert np.isclose(np.linalg.norm(x), 1.0) and abs(x.sum()) < 1e-9


def test_fiedler_engine_parity():
    rng = np.random.default_rng(4)
    pairs = set()
    while len(pairs) < 60:
        a, b = rng.integers(0, 25, 2)
        if a != b:
            pairs.add((min(a, b), max(a, b)))
    csr = _csr(25, pairs)
    a = fiedler_vector(csr, iters=32, n_workers=3)
    s = fiedler_vector(csr, iters=32, n_workers=3, engine="sharded")
    d = fiedler_vector(csr, iters=32, n_workers=3, engine="dataset")
    assert np.allclose(a, s, atol=1e-9)
    assert np.allclose(a, d, atol=1e-9)
