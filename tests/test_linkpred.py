import math

import numpy as np
import pytest

from pgd_ray.graph.csr import csr_from_edge_arrays
from pgd_ray.graph.linkpred import link_prediction
from tests.brute import random_graph


def _csr(edges, n):
    src = np.array([a for a, b in edges], dtype=np.int64)
    dst = np.array([b for a, b in edges], dtype=np.int64)
    return csr_from_edge_arrays(src, dst, n=n)


def _ref(edges, n):
    adj = [set() for _ in range(n)]
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    out = {}
    for u in range(n):
        for v in range(u + 1, n):
            if v in adj[u]:
                continue
            common = adj[u] & adj[v]
            if common:
                out[(u, v)] = (
                    len(common),
                    sum(1.0 / math.log(len(adj[m])) for m in common),
                )
    return out


@pytest.mark.parametrize("seed", [1, 2, 3])
def test_link_prediction_matches_brute(seed):
    edges = sorted(random_graph(40, 0.12, seed))
    csr = _csr(edges, 40)
    ref = _ref(edges, 40)
    df = link_prediction(csr, top_n=10 ** 6, blocks=5)
    assert len(df) == len(ref)
    for u, v, cn, aa in zip(df["u"], df["v"], df["cn"], df["aa"]):
        rc, ra = ref[(int(u), int(v))]
        assert cn == rc
        assert abs(aa - ra) < 1e-5
    # head ordering: cn desc, then (u, v)
    key = list(zip(-df["cn"], df["u"], df["v"]))
    assert key == sorted(key)


def test_link_prediction_top_n_and_no_adjacent():
    # path 0-1-2-3: distance-2 pairs are (0,2) and (1,3), cn=1 each
    edges = [(0, 1), (1, 2), (2, 3)]
    df = link_prediction(_csr(edges, 4), top_n=1)
    assert len(df) == 1
    assert (int(df["u"][0]), int(df["v"][0])) == (0, 2)
    full = link_prediction(_csr(edges, 4), top_n=100)
    got = {(int(a), int(b)) for a, b in zip(full["u"], full["v"])}
    assert got == {(0, 2), (1, 3)}


def test_link_prediction_cap_bounds_counts():
    # star with hub 0 and 6 leaves: uncapped -> C(6,2)=15 pairs
    edges = [(0, i) for i in range(1, 7)]
    full = link_prediction(_csr(edges, 7), top_n=100)
    assert len(full) == 15
    capped = link_prediction(_csr(edges, 7), top_n=100, max_pairs_per_mid=1)
    assert 0 < len(capped) < 15


def test_link_prediction_empty():
    csr = _csr([], 0)
    assert len(link_prediction(csr)) == 0


def test_link_prediction_extended_scores_match_brute():
    import numpy as np

    from pgd_ray.graph.linkpred import link_prediction
    from tests.brute import random_graph

    from pgd_ray.graph.csr import csr_from_edge_arrays

    edges = sorted(random_graph(30, 0.15, seed=6))
    src = np.array([a for a, b in edges])
    dst = np.array([b for a, b in edges])
    csr = csr_from_edge_arrays(src, dst, n=30)
    head = link_prediction(csr, top_n=20)
    es = set(edges)
    adj = [set() for _ in range(30)]
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    deg = np.array([len(a) for a in adj])
    for r in head.itertuples(index=False):
        common = adj[r.u] & adj[r.v]
        assert r.cn == len(common)
        assert abs(r.ra - round(sum(1.0 / deg[m] for m in common), 6)) < 1e-9
        assert abs(r.jac - round(r.cn / (deg[r.u] + deg[r.v] - r.cn), 6)) < 1e-9
        assert r.pa == deg[r.u] * deg[r.v]
        assert (min(r.u, r.v), max(r.u, r.v)) not in es


def test_negative_edges_are_nonedges_and_deterministic():
    import numpy as np

    from pgd_ray.graph.csr import csr_from_edge_arrays
    from pgd_ray.graph.linkpred import negative_edges

    rng = np.random.default_rng(2)
    n = 100
    iu, ju = np.triu_indices(n, 1)
    keep = rng.random(len(iu)) < 0.1
    src, dst = iu[keep], ju[keep]
    csr = csr_from_edge_arrays(src, dst, n=n)
    edge_set = set(zip(src.tolist(), dst.tolist()))
    a = negative_edges(csr, k=50, budget=1000)
    b = negative_edges(csr, k=50, budget=1000)
    assert (a.to_numpy() == b.to_numpy()).all()  # deterministic
    assert len(a) == 50
    for lo, hi in zip(a["lo"], a["hi"]):
        assert lo < hi
        assert (int(lo), int(hi)) not in edge_set
    # counter-ordered head: counters strictly increasing
    assert (np.diff(a["c"].to_numpy()) > 0).all()
