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


def test_boruvka_ds_matches_numpy_kernel():
    """Distributed Borůvka equals the numpy kernel edge-for-edge on
    random multigraph-free inputs (forest is unique by the strict
    key)."""
    import pandas as pd
    import ray.data

    from pgd_ray.graph.mst import boruvka_forest_ds

    rng = np.random.default_rng(23)
    for trial in range(6):
        n = int(rng.integers(2, 60))
        mx = n * (n - 1) // 2
        m = int(rng.integers(1, mx + 1))
        pairs = set()
        while len(pairs) < m:
            x, y = rng.integers(0, n, 2)
            if x != y:
                pairs.add((min(x, y), max(x, y)))
        E = np.array(sorted(pairs), dtype=np.int64)
        w = rng.integers(1, 4, len(E)).astype(np.int64)
        for maximum in (True, False):
            keep = boruvka_forest(E[:, 0], E[:, 1], w, maximum=maximum)
            ref = pd.DataFrame({"a": E[keep, 0], "b": E[keep, 1],
                                "w": w[keep]}).sort_values(
                ["a", "b"], ignore_index=True)
            ds = ray.data.from_pandas(pd.DataFrame(
                {"a": E[:, 0], "b": E[:, 1], "w": w})).repartition(4)
            out = boruvka_forest_ds(ds, "a", "b", "w", maximum=maximum)
            assert out.equals(ref), (trial, maximum)


def test_boruvka_ds_driver_bound(monkeypatch):
    """Round-5 scale contract (VERDICT r4 item 3): the driver never
    pulls a frame ∝ edge count — only O(#components) winner rows per
    round.  A dense graph makes edges (≈1200) ≫ vertices (50)."""
    import pandas as pd
    import ray.data
    import ray.data.dataset as dsmod

    from pgd_ray.graph.mst import boruvka_forest_ds

    n = 50
    iu, ju = np.triu_indices(n, 1)
    rng = np.random.default_rng(3)
    w = rng.integers(1, 1000, len(iu)).astype(np.int64)
    ds = ray.data.from_pandas(pd.DataFrame(
        {"a": iu.astype(np.int64), "b": ju.astype(np.int64),
         "w": w})).repartition(8)

    pulled = []
    orig = dsmod.Dataset.to_pandas

    def counting(self, *a, **kw):
        out = orig(self, *a, **kw)
        pulled.append(len(out))
        return out

    monkeypatch.setattr(dsmod.Dataset, "to_pandas", counting)
    out = boruvka_forest_ds(ds, "a", "b", "w", maximum=True)
    monkeypatch.undo()
    assert len(out) == n - 1  # connected graph → spanning tree
    # every driver pull is a per-round winner set (≤ #components ≤ n);
    # a full edge collect (1225) would blow this bound
    assert max(pulled, default=0) <= n, pulled
