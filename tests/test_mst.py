"""Borůvka spanning forest vs brute-force Kruskal (union-find)."""
import numpy as np
import pytest

from pgd_ray.graph.mst import boruvka_forest


def _kruskal(a, b, w, maximum):
    """Reference forest under the same strict key (w, a, b)."""
    order = np.lexsort((b, a, -w if maximum else w))
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    keep = np.zeros(len(a), dtype=bool)
    for i in order:
        ra, rb = find(int(a[i])), find(int(b[i]))
        if ra != rb:
            parent[ra] = rb
            keep[i] = True
    return keep


@pytest.mark.parametrize("seed,maximum", [(0, True), (1, True), (2, False)])
def test_boruvka_matches_kruskal(seed, maximum):
    rng = np.random.default_rng(seed)
    for _ in range(40):
        n = int(rng.integers(2, 30))
        mx = n * (n - 1) // 2
        m = int(rng.integers(1, mx + 1))
        pairs = set()
        while len(pairs) < m:
            x, y = rng.integers(0, n, 2)
            if x != y:
                pairs.add((min(x, y), max(x, y)))
        E = np.array(sorted(pairs), dtype=np.int64)
        # duplicate weights on purpose: the (a, b) tie-break must decide
        w = rng.integers(1, 4, len(E)).astype(np.int64)
        keep = boruvka_forest(E[:, 0], E[:, 1], w, maximum=maximum)
        ref = _kruskal(E[:, 0], E[:, 1], w, maximum)
        assert np.array_equal(keep, ref)
        # forest size = n_touched - n_components
        assert keep.sum() <= n - 1


def test_boruvka_empty_and_single():
    assert boruvka_forest(np.array([]), np.array([]), np.array([])).sum() == 0
    k = boruvka_forest(np.array([7]), np.array([9]), np.array([3]))
    assert k.tolist() == [True]
