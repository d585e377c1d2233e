import numpy as np
import pyarrow as pa
import ray.data as rd

from pgd_ray.graph.csr import csr_from_edge_arrays
from pgd_ray.graph.richclub import rich_club, s_metric
from tests.brute import random_graph


def _ds(edges):
    return rd.from_arrow(pa.table({
        "src": pa.array([a for a, b in edges], pa.int64()),
        "dst": pa.array([b for a, b in edges], pa.int64()),
    }))


def test_rich_club_matches_reference():
    edges = sorted(random_graph(n=60, p=0.15, seed=5))
    n = 60
    csr = csr_from_edge_arrays(
        np.array([a for a, b in edges], np.int64),
        np.array([b for a, b in edges], np.int64), n=n)
    deg = csr.degrees().astype(np.int64)
    ks = [0, 3, 6, 10]
    out = rich_club(_ds(edges), deg, ks)
    for _, row in out.iterrows():
        k = row["k"]
        club = {v for v in range(n) if deg[v] > k}
        ek = sum(1 for a, b in edges if a in club and b in club)
        nk = len(club)
        assert row["n_k"] == nk and row["e_k"] == ek
        phi = 2.0 * ek / (nk * (nk - 1)) if nk >= 2 else 0.0
        assert abs(row["phi"] - round(phi, 9)) < 1e-12
    assert out.attrs["s_metric"] == sum(
        int(deg[a]) * int(deg[b]) for a, b in edges)
    assert s_metric(_ds(edges), deg) == out.attrs["s_metric"]


def test_rich_club_degenerate_thresholds():
    edges = [(0, 1)]
    deg = np.array([1, 1], np.int64)
    out = rich_club(_ds(edges), deg, ks=[0, 5])
    r0 = out[out["k"] == 0].iloc[0]
    assert r0["n_k"] == 2 and r0["e_k"] == 1 and r0["phi"] == 1.0
    r5 = out[out["k"] == 5].iloc[0]
    assert r5["n_k"] == 0 and r5["e_k"] == 0 and r5["phi"] == 0.0


def test_degree_histogram_and_hill():
    import ray.data

    from pgd_ray.graph.degrees import degree_histogram_log2, hill_alpha

    deg = np.array([1, 2, 3, 4, 7, 8, 64, 100, 200], np.int64)
    ds = ray.data.from_arrow(pa.table({
        "v": pa.array(range(len(deg)), pa.int64()),
        "degree": pa.array(deg, pa.int64())}))
    hist = {r["bin"]: r["n_vertices"]
            for r in degree_histogram_log2(ds).take_all()}
    assert hist == {0: 1, 1: 2, 2: 2, 3: 1, 6: 2, 7: 1}
    h = hill_alpha(ds, d_min=64)
    tail = deg[deg >= 64].astype(float)
    alpha = 1 + len(tail) / np.log(tail / 64.0).sum()
    assert h["k_tail"][0] == 3 and abs(h["alpha"][0] - round(alpha, 6)) < 1e-9
