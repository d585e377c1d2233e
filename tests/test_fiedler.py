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


def test_cheeger_cut_two_cliques_bridge():
    import numpy as np

    from pgd_ray.graph.community import cheeger_cut
    from pgd_ray.graph.csr import csr_from_edge_arrays
    from pgd_ray.graph.iterative import fiedler_vector

    # two K6 cliques joined by one bridge: the sweep must find the
    # bridge cut (cut=1) with conductance 1/31
    edges = []
    for base in (0, 6):
        for i in range(6):
            for j in range(i + 1, 6):
                edges.append((base + i, base + j))
    edges.append((0, 6))
    src = np.array([a for a, _ in edges])
    dst = np.array([b for _, b in edges])
    csr = csr_from_edge_arrays(src, dst, n=12)
    x = fiedler_vector(csr, iters=64)
    out = cheeger_cut(csr, x)
    assert int(out["cut_edges"].iloc[0]) == 1
    assert int(out["k"].iloc[0]) == 6
    assert abs(out["conductance"].iloc[0] - round(1 / 31, 9)) < 1e-12


def test_cheeger_brute_reference_random():
    import numpy as np

    from pgd_ray.graph.community import cheeger_cut
    from pgd_ray.graph.csr import csr_from_edge_arrays
    from pgd_ray.graph.iterative import fiedler_vector

    rng = np.random.default_rng(4)
    n = 40
    iu, ju = np.triu_indices(n, 1)
    keep = rng.random(len(iu)) < 0.12
    src, dst = iu[keep], ju[keep]
    csr = csr_from_edge_arrays(src, dst, n=n)
    x = np.round(fiedler_vector(csr, iters=64), 9)
    order = np.lexsort((np.arange(n), x))
    deg = csr.degrees()
    tot = int(deg.sum())
    best = (np.inf, None)
    pos = np.empty(n, int)
    pos[order] = np.arange(n)
    for k in range(1, n):
        pref = set(order[:k].tolist())
        cut = sum(1 for a, b in zip(src, dst)
                  if (int(a) in pref) != (int(b) in pref))
        vol = int(deg[order[:k]].sum())
        small = min(vol, tot - vol)
        c = cut / max(small, 1)
        if c < best[0]:
            best = (c, k, cut, small)
    out = cheeger_cut(csr, x)
    assert int(out["k"].iloc[0]) == best[1]
    assert int(out["cut_edges"].iloc[0]) == best[2]
    assert abs(out["conductance"].iloc[0] - round(best[0], 9)) < 1e-12
