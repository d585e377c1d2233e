"""SimRank vs a brute per-pair double-loop reference."""

import numpy as np

from pgd_ray.graph.csr import csr_from_edge_arrays
from pgd_ray.graph.linkpred import simrank


def _brute(nbrs, n, C=0.8, iters=5):
    S = np.eye(n)
    for _ in range(iters):
        N = np.eye(n)
        for a in range(n):
            for b in range(n):
                if a == b:
                    continue
                if not len(nbrs[a]) or not len(nbrs[b]):
                    N[a, b] = 0.0
                    continue
                tot = sum(S[u, v] for u in nbrs[a] for v in nbrs[b])
                N[a, b] = C / (len(nbrs[a]) * len(nbrs[b])) * tot
        S = N
    return S


def test_simrank_matches_brute_random_graph():
    rng = np.random.default_rng(3)
    n = 12
    iu, ju = np.triu_indices(n, 1)
    keep = rng.random(len(iu)) < 0.25
    src, dst = iu[keep], ju[keep]
    csr = csr_from_edge_arrays(src, dst, n=n)
    nbrs = [csr.neighbors(v) for v in range(n)]
    S = simrank(csr, C=0.8, iters=5)
    B = _brute(nbrs, n)
    assert np.allclose(S, B, atol=1e-12)
    assert np.allclose(S, S.T, atol=1e-12)
    assert np.allclose(np.diag(S), 1.0)
    assert (S >= -1e-12).all() and (S <= 1 + 1e-12).all()


def test_simrank_isolated_and_c4_symmetry():
    # C4 ring 0-1-2-3-0 plus isolated node 4
    csr = csr_from_edge_arrays(np.array([0, 1, 2, 0]),
                               np.array([1, 2, 3, 3]), n=5)
    S = simrank(csr, C=0.8, iters=6)
    # opposite corners are structurally equivalent, as are adjacents
    assert abs(S[0, 2] - S[1, 3]) < 1e-12
    adj = [S[0, 1], S[1, 2], S[2, 3], S[0, 3]]
    assert max(adj) - min(adj) < 1e-12
    # opposite corners share ALL neighbors -> more similar than adjacent
    assert S[0, 2] > S[0, 1]
    # isolated node: similarity 0 to everyone, 1 to itself
    assert (S[4, :4] == 0).all() and S[4, 4] == 1.0
