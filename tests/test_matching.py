"""Local-min-edge maximal matching: validity, maximality, determinism."""
import numpy as np
import pytest

from pgd_ray.graph.csr import CSRGraph
from pgd_ray.graph.matching import maximal_matching


def _csr(n, pairs):
    E = np.array(sorted(pairs), dtype=np.int64).reshape(-1, 2)
    src = np.concatenate([E[:, 0], E[:, 1]])
    dst = np.concatenate([E[:, 1], E[:, 0]])
    o = np.lexsort((dst, src))
    src, dst = src[o], dst[o]
    indptr = np.zeros(n + 1, np.int64)
    np.add.at(indptr[1:], src, 1)
    return CSRGraph(n, len(E), np.cumsum(indptr), dst)


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_matching_valid_and_maximal(seed):
    rng = np.random.default_rng(seed)
    for _ in range(60):
        n = int(rng.integers(2, 40))
        m = int(rng.integers(1, n * (n - 1) // 2 + 1))
        pairs = set()
        while len(pairs) < m:
            a, b = rng.integers(0, n, 2)
            if a != b:
                pairs.add((min(a, b), max(a, b)))
        mate = maximal_matching(_csr(n, pairs))
        for v in range(n):
            if mate[v] >= 0:
                assert mate[mate[v]] == v
                assert (min(v, mate[v]), max(v, mate[v])) in pairs
        for a, b in pairs:
            assert mate[a] >= 0 or mate[b] >= 0  # maximal


def test_matching_deterministic_and_edge_cases():
    pairs = {(0, 1), (1, 2), (2, 3), (3, 4), (0, 4), (2, 5)}
    a = maximal_matching(_csr(7, pairs))  # vertex 6 isolated
    b = maximal_matching(_csr(7, pairs))
    assert np.array_equal(a, b)
    assert a[6] == -1
    empty = CSRGraph(0, 0, np.zeros(1, np.int64), np.zeros(0, np.int64))
    assert len(maximal_matching(empty)) == 0
    one = maximal_matching(_csr(2, {(0, 1)}))
    assert one[0] == 1 and one[1] == 0


def test_coarsen_stats_properties():
    import __ray_entry__ as em

    out = em.queries()["coarsen_stats"]("/root/testdata/sf0.001")
    n, ns = int(out["n"].iloc[0]), int(out["n_super"].iloc[0])
    m, mc = int(out["m"].iloc[0]), int(out["m_coarse"].iloc[0])
    # a maximal matching on a connected-ish graph contracts a large
    # fraction; supervertices strictly fewer, at least n/2
    assert n / 2 <= ns < n
    assert 0 < mc < m
    assert abs(out["node_ratio"].iloc[0] - round(ns / n, 9)) < 1e-12
