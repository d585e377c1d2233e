import pyarrow as pa
import ray.data as rd

from pgd_ray.graph.densest import densest_peel, densest_subgraph
from tests.brute import random_graph


def _ds(edges):
    src = pa.array([a for a, b in edges], pa.int64())
    dst = pa.array([b for a, b in edges], pa.int64())
    return rd.from_arrow(pa.table({"src": src, "dst": dst}))


def _peel_ref(edges):
    """Pure-python replay of the eps=0.5 threshold peel."""
    S = {v for e in edges for v in e}
    cur = set(edges)
    hist = [(0, len(S), len(cur))]
    it = 0
    while hist[-1][2] > 0 and it < 64:
        it += 1
        n_s, m_s = hist[-1][1], hist[-1][2]
        deg = {}
        for a, b in cur:
            deg[a] = deg.get(a, 0) + 1
            deg[b] = deg.get(b, 0) + 1
        S = {v for v, d in deg.items() if d * n_s > 3 * m_s}
        if not S:
            break
        cur = {(a, b) for a, b in cur if a in S and b in S}
        hist.append((it, len(S), len(cur)))
    return hist


def _best_ref(hist):
    best = hist[0]
    best_d = best[2] / best[1] if best[1] else 0.0
    for r in hist[1:]:
        d = r[2] / r[1]
        if d > best_d:
            best, best_d = r, d
    return best, best_d, len(hist)


def test_planted_core_found():
    # K10 clique (density 4.5) hidden behind a 90-vertex path that
    # drags the full-graph density to ~1.3: peeling must strip the
    # path first and report the clique round as the densest.
    edges = [(i, j) for i in range(10) for j in range(i + 1, 10)]
    edges += [(i, i + 1) for i in range(10, 99)]
    edges.append((0, 10))  # attach the path to the clique
    res = densest_subgraph(_ds(edges))
    assert res["best_round"] >= 1
    assert res["n_sub"] == 10 and res["m_sub"] == 45
    assert res["density"] == 4.5


def test_peel_matches_reference_on_random_graphs():
    for seed in (1, 7, 13):
        edges = sorted(random_graph(n=60, p=0.12, seed=seed))
        hist = densest_peel(_ds(edges))
        assert [(r.it, r.n, r.m) for r in hist] == _peel_ref(edges)
        res = densest_subgraph(_ds(edges))
        (it, ns, ms), d, rounds = _best_ref(_peel_ref(edges))
        assert (res["best_round"], res["n_sub"], res["m_sub"]) == (it, ns, ms)
        assert res["density"] == d and res["rounds"] == rounds


def test_empty_and_single_edge():
    hist = densest_peel(_ds([(0, 1)]))
    assert [(r.it, r.n, r.m) for r in hist] == [(0, 2, 1)]
    res = densest_subgraph(_ds([(0, 1)]))
    assert res["density"] == 0.5 and res["best_round"] == 0
