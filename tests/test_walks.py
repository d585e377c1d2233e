import numpy as np
import pytest

from pgd_ray.graph.csr import csr_from_edge_arrays
from pgd_ray.graph.walks import STEP_C, random_walks
from pgd_ray.text.hashing import splitmix64
from tests.brute import random_graph


def _csr(edges, n):
    src = np.array([a for a, b in edges], dtype=np.int64)
    dst = np.array([b for a, b in edges], dtype=np.int64)
    return csr_from_edge_arrays(src, dst, n=n)


def _ref_walks(csr, length):
    """Pure-python replay of the walk contract."""
    out = {}
    for w in range(csr.n):
        v = w
        out[(w, 0)] = v
        for t in range(1, length + 1):
            nbrs = csr.neighbors(v)
            if len(nbrs):
                h = int(splitmix64(np.array([w], dtype=np.uint64)
                                   ^ (np.uint64(t) * STEP_C))[0])
                v = int(nbrs[h % len(nbrs)])
            out[(w, t)] = v
    return out


@pytest.mark.parametrize("seed", [1, 2])
def test_walks_match_reference(seed):
    edges = sorted(random_graph(30, 0.15, seed))
    csr = _csr(edges, 30)
    df = random_walks(csr, length=6).to_pandas()
    ref = _ref_walks(csr, 6)
    assert len(df) == 30 * 7
    for w, s, v in zip(df["walk_id"], df["step"], df["v"]):
        assert ref[(int(w), int(s))] == int(v)


def test_walks_partition_invariant():
    edges = sorted(random_graph(50, 0.1, 3))
    csr = _csr(edges, 50)
    a = random_walks(csr, length=5).to_pandas().sort_values(
        ["walk_id", "step"]).reset_index(drop=True)
    b = random_walks(csr, length=5, batch_size=7, concurrency=2).to_pandas(
    ).sort_values(["walk_id", "step"]).reset_index(drop=True)
    assert a.equals(b)


def test_walks_dead_end_holds():
    # vertex 2 is isolated; a walk from it never moves
    csr = _csr([(0, 1)], 3)
    df = random_walks(csr, starts=np.array([2]), length=4).to_pandas()
    assert df["v"].tolist() == [2] * 5


def test_walks_per_start_ids_unique_and_distinct():
    edges = sorted(random_graph(20, 0.3, 4))
    csr = _csr(edges, 20)
    df = random_walks(csr, length=4, walks_per_start=3).to_pandas()
    assert df["walk_id"].nunique() == 60
    # different copies hash differently: some walk diverges from copy 0
    p = df.pivot_table(index="walk_id", columns="step", values="v")
    assert not p.loc[0:19].reset_index(drop=True).equals(
        p.loc[20:39].reset_index(drop=True))


def test_walks_empty():
    csr = _csr([], 0)
    assert random_walks(csr).count() == 0
