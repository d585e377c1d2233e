import numpy as np
import ray.data as rd

from pgd_ray.graph.csr import csr_from_edge_arrays
from pgd_ray.graph.ego import ego_subgraph


def _setup(edges, n):
    src = np.array([a for a, b in edges], dtype=np.int64)
    dst = np.array([b for a, b in edges], dtype=np.int64)
    csr = csr_from_edge_arrays(src, dst, n=n)
    ds = rd.from_items([{"src": int(a), "dst": int(b)} for a, b in edges])
    return ds, csr


def test_ego_two_hop_path():
    # path 0-1-2-3-4: 2-ball of 0 = {0,1,2}; induced edges (0,1),(1,2)
    ds, csr = _setup([(0, 1), (1, 2), (2, 3), (3, 4)], 5)
    edges, members = ego_subgraph(ds, csr, [0], k=2)
    assert members.tolist() == [0, 1, 2]
    got = sorted((int(r["src"]), int(r["dst"])) for r in edges.take_all())
    assert got == [(0, 1), (1, 2)]


def test_ego_multi_seed_and_isolated():
    ds, csr = _setup([(0, 1), (2, 3)], 5)
    edges, members = ego_subgraph(ds, csr, [0, 4], k=1)
    assert members.tolist() == [0, 1, 4]
    got = sorted((int(r["src"]), int(r["dst"])) for r in edges.take_all())
    assert got == [(0, 1)]


def test_ego_k0_is_seeds_only():
    ds, csr = _setup([(0, 1), (1, 2)], 3)
    edges, members = ego_subgraph(ds, csr, [1], k=0)
    assert members.tolist() == [1]
    assert edges.count() == 0
