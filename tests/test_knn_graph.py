"""Mutual-kNN graph clustering on constructed clouds."""
import numpy as np
import pyarrow as pa
import ray.data

from pgd_ray.stages.similarity import knn_edges, mutual_knn_clusters


def _ds(m, ids=None):
    ids = np.arange(len(m)) if ids is None else np.asarray(ids)
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids, pa.int64()),
        "embedding": pa.array(list(m.astype(np.float32))),
    }))


def _brute_clusters(m, k):
    """Independent mutual-kNN CC: O(n^2) cosine + union-find."""
    m64 = m.astype(np.float32).astype(np.float64)
    mn = m64 / np.linalg.norm(m64, axis=1, keepdims=True)
    sims = mn @ mn.T
    n = len(m)
    np.fill_diagonal(sims, -np.inf)
    top = [set(np.lexsort((np.arange(n), -sims[i]))[:k]) for i in range(n)]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for i in range(n):
        for j in top[i]:
            if i in top[j]:
                ri, rj = find(i), find(int(j))
                if ri != rj:
                    parent[max(ri, rj)] = min(ri, rj)
    return np.array([find(i) for i in range(n)])


def test_matches_brute_force_union_find():
    rng = np.random.default_rng(3)
    c1 = rng.normal(loc=[10, 0, 0, 0], scale=0.1, size=(20, 4))
    c2 = rng.normal(loc=[0, 10, 0, 0], scale=0.1, size=(20, 4))
    m = np.vstack([c1, c2])
    out = mutual_knn_clusters(_ds(m), k=3)
    ref = _brute_clusters(m, k=3)
    assert np.array_equal(out.sort_values("vec_id")["cluster"].to_numpy(), ref)
    # the two clouds never cross-link
    lab = out.set_index("vec_id")["cluster"]
    assert set(lab[lab.index < 20]).isdisjoint(set(lab[lab.index >= 20]))


def test_knn_edges_exclude_self_and_count():
    rng = np.random.default_rng(5)
    m = rng.normal(size=(30, 6))
    ed = knn_edges(_ds(m), k=4)
    assert (ed["src"] != ed["dst"]).all()
    assert (ed.groupby("src").size() == 4).all()
    assert len(ed) == 30 * 4


def test_singleton_corpus():
    one = _ds(np.ones((1, 4)), ids=[7])
    out = mutual_knn_clusters(one, k=5)
    assert out.to_dict("records") == [{"vec_id": 7, "cluster": 7}]


def test_singleton_isolated_vector():
    # one vector orthogonal to a tight cluster still appears, as its
    # own cluster only if no mutual link forms; with k=1 the far
    # vector picks a cluster member, but that member prefers its twin
    m = np.array([[1.0, 0, 0], [1.0, 0.001, 0], [0, 0, 1.0]])
    out = mutual_knn_clusters(_ds(m), k=1)
    lab = out.set_index("vec_id")["cluster"]
    assert lab[0] == 0 and lab[1] == 0
    assert lab[2] == 2  # no mutual edge -> singleton
