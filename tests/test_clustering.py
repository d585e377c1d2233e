import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from pgd_ray.stages.clustering import kmeans_fit, semdedup


def _emb_ds(X, ids=None):
    ids = np.arange(len(X), dtype=np.int64) if ids is None else ids
    return ray.data.from_arrow(pa.table({
        "vec_id": ids,
        "embedding": pa.array(list(X.astype(np.float32))),
    }))


def _kmeans_ref(X, k, iters):
    """Driver-side Lloyd with the engine's determinism contract."""
    X = X.astype(np.float64)
    C = X[:k].copy()
    for _ in range(iters):
        a = np.argmin(((X[:, None] - C[None]) ** 2).sum(2), axis=1)
        for c in range(k):
            if (a == c).any():
                C[c] = np.round(X[a == c].sum(0) / (a == c).sum(), 6)
    return np.argmin(((X[:, None] - C[None]) ** 2).sum(2), axis=1), C


def test_kmeans_matches_reference_lloyd():
    rng = np.random.default_rng(7)
    # 3 well-separated blobs + noise
    blobs = [rng.normal(c, 0.3, (40, 8)) for c in (-5.0, 0.0, 5.0)]
    # interleave so ids 0,1,2 (the k-means seeds) span the 3 blobs
    X = np.stack(blobs, axis=1).reshape(-1, 8)
    truth = np.tile(np.arange(3), 40)
    assign, cents = kmeans_fit(_emb_ds(X), k=3, iters=5)
    got = assign.to_pandas().sort_values("vec_id")
    want_a, want_c = _kmeans_ref(X, 3, 5)
    assert np.array_equal(got["cluster"].to_numpy(), want_a)
    assert np.allclose(cents, want_c)
    # blobs recovered: each true blob maps to exactly one cluster
    for b in range(3):
        assert len(set(want_a[truth == b])) == 1


def test_kmeans_empty_cluster_keeps_centroid():
    # k=3 but only 2 distinct points: one centroid never wins a point
    X = np.array([[0.0, 0.0], [0.1, 0.0], [10.0, 10.0], [10.1, 10.0],
                  [0.05, 0.0], [10.05, 10.0]])
    assign, cents = kmeans_fit(_emb_ds(X), k=3, iters=3)
    a = assign.to_pandas().sort_values("vec_id")["cluster"].to_numpy()
    assert len(a) == 6 and set(a) <= {0, 1, 2}
    ref_a, ref_c = _kmeans_ref(X, 3, 3)
    assert np.array_equal(a, ref_a)
    assert np.allclose(cents, ref_c)


def test_semdedup_keeps_min_id_per_component():
    rng = np.random.default_rng(11)
    base = rng.normal(0, 1, (20, 16))
    # plant near-dups: rows 3,7 duplicate row 1 (tiny jitter); row 12 dups 5
    X = base.copy()
    X[3] = X[1] + 1e-4
    X[7] = X[1] - 1e-4
    X[12] = X[5] + 1e-4
    out = semdedup(_emb_ds(X), k=2, iters=3, threshold=0.95)
    out = out.set_index("vec_id")
    same = out.loc[[1, 3, 7]]
    if same["cluster"].nunique() == 1:  # dups land in one cluster
        assert (same["rep"] == 1).all()
        assert out.loc[1, "keep"] and not out.loc[3, "keep"]
        assert not out.loc[7, "keep"]
    assert out.loc[12, "rep"] == (5 if out.loc[12, "cluster"] ==
                                  out.loc[5, "cluster"] else 12)
    # non-dup rows keep themselves
    kept = out[out.index.isin([0, 2, 4, 6])]
    assert kept["keep"].all() and (kept["rep"] == kept.index).all()
    # every row present exactly once
    assert len(out) == 20


def test_semdedup_no_pairs_all_kept():
    rng = np.random.default_rng(13)
    X = rng.normal(0, 1, (15, 12))
    out = semdedup(_emb_ds(X), k=2, iters=2, threshold=0.9999)
    assert out["keep"].all()
    assert (out["rep"].to_numpy() == out["vec_id"].to_numpy()).all()


def test_silhouette_matches_brute():
    from pgd_ray.stages.clustering import silhouette_by_cluster

    rng = np.random.RandomState(11)
    X = np.concatenate([rng.randn(20, 4) + 5 * i for i in range(3)])
    ds = _emb_ds(X)
    got = silhouette_by_cluster(ds, k=3, iters=4)

    X = X.astype(np.float32).astype(np.float64)  # storage precision
    C = _kmeans_ref(X, 3, 4)[1]
    D = np.sqrt(((X[:, None].astype(np.float64) - C[None]) ** 2).sum(2))
    own = np.argmin(D, 1)
    a = D[np.arange(len(X)), own]
    D2 = D.copy()
    D2[np.arange(len(X)), own] = np.inf
    b = D2.min(1)
    sil = (b - a) / np.maximum(a, b)
    for c in range(3):
        row = got[got["cluster"] == c]
        assert int(row["n"].iloc[0]) == int((own == c).sum())
        assert abs(float(row["mean_silhouette"].iloc[0])
                   - sil[own == c].mean()) < 1e-6


def test_conductance_matches_brute():
    import ray.data as rd

    from pgd_ray.graph.community import conductance_by_label
    from pgd_ray.graph.csr import csr_from_edge_arrays

    # two triangles joined by one edge; labels split them
    src = np.array([0, 0, 1, 3, 3, 4, 2], np.int64)
    dst = np.array([1, 2, 2, 4, 5, 5, 3], np.int64)
    csr = csr_from_edge_arrays(src, dst, n=6)
    eds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    labels = np.array([7, 7, 7, 9, 9, 9], np.int64)
    got = conductance_by_label(eds, csr, labels).set_index("label")
    # each side: cut 1, volume 7 (3 internal edges *2 + 1 cut),
    # min(7, 14-7) = 7
    for lbl in (7, 9):
        assert int(got.loc[lbl, "cut_edges"]) == 1
        assert int(got.loc[lbl, "volume"]) == 7
        assert abs(float(got.loc[lbl, "conductance"]) - 1 / 7) < 1e-9
    # single community covering everything -> denominator 0 -> 0.0
    one = conductance_by_label(eds, csr, np.zeros(6, np.int64))
    assert float(one["conductance"].iloc[0]) == 0.0


def _brute_dbscan(ids, X, eps, min_pts):
    n = len(ids)
    D = np.round(((X[:, None, :] - X[None, :, :]) ** 2).sum(2), 9)
    A = D <= eps * eps
    core = A.sum(1) >= min_pts
    # min-label components over core-core adjacency
    lab = ids.astype(np.int64).copy()
    for _ in range(n):
        before = lab.copy()
        for i in range(n):
            if not core[i]:
                continue
            nb = np.flatnonzero(A[i] & core)
            m = min(lab[i], lab[nb].min()) if len(nb) else lab[i]
            lab[i] = m
            lab[nb] = np.minimum(lab[nb], m)
        if np.array_equal(lab, before):
            break
    out = np.full(n, -1, np.int64)
    out[core] = lab[core]
    for i in range(n):
        if core[i]:
            continue
        nb = np.flatnonzero(A[i] & core & (ids != ids[i]))
        if len(nb):
            out[i] = lab[nb].min()
    return out, core


def test_dbscan_matches_bruteforce():
    from pgd_ray.stages.clustering import dbscan

    rng = np.random.default_rng(3)
    blob1 = rng.standard_normal((12, 4)) * 0.2
    blob2 = rng.standard_normal((10, 4)) * 0.2 + 5.0
    lone = np.array([[20.0, 20.0, 20.0, 20.0]])
    edgep = blob1[0] + 0.55  # border candidate near blob1
    X = np.vstack([blob1, blob2, lone, edgep[None, :]])
    ids = np.arange(100, 100 + len(X), dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(ids),
        "embedding": pa.array([list(map(float, v)) for v in X],
                              pa.list_(pa.float64())),
    })).repartition(4)
    got = dbscan(ds, eps=0.6, min_pts=4).sort_values(
        "vec_id", ignore_index=True)
    want_lab, want_core = _brute_dbscan(ids, X, 0.6, 4)
    np.testing.assert_array_equal(got["label"].to_numpy(), want_lab)
    np.testing.assert_array_equal(got["is_core"].to_numpy(),
                                  want_core.astype(np.int64))
    # structure sanity: two clusters, the lone point is noise
    labs = set(got["label"]) - {-1}
    assert len(labs) == 2
    assert got.loc[got["vec_id"] == ids[22], "label"].iloc[0] == -1


def test_cluster_validity_matches_sklearn_formulas():
    import numpy as np
    import pyarrow.parquet as pq
    import ray.data

    from pgd_ray.stages.clustering import cluster_validity
    from pgd_ray.util import read_parquet_clean

    SF = "/root/testdata/sf0.001"
    ds = read_parquet_clean(f"{SF}/embeddings.parquet",
                            columns=["vec_id", "embedding", "label"])
    out = cluster_validity(ds)

    ref = pq.read_table(f"{SF}/embeddings.parquet").to_pandas()
    X = np.stack(ref["embedding"].to_numpy()).astype(np.float64)
    lab = ref["label"].to_numpy().astype(np.int64)
    labels = np.unique(lab)
    k, n = len(labels), len(X)
    C = np.stack([X[lab == l].mean(axis=0) for l in labels])
    g = X.mean(axis=0)
    W = sum(((X[lab == l] - C[i]) ** 2).sum()
            for i, l in enumerate(labels))
    B = sum((lab == l).sum() * ((C[i] - g) ** 2).sum()
            for i, l in enumerate(labels))
    ch = (B / (k - 1)) / (W / (n - k))
    s = np.array([np.linalg.norm(X[lab == l] - C[i], axis=1).mean()
                  for i, l in enumerate(labels)])
    db_terms = []
    for i in range(k):
        r = [(s[i] + s[j]) / np.linalg.norm(C[i] - C[j])
             for j in range(k) if j != i]
        db_terms.append(max(r))
    db = float(np.mean(db_terms))

    assert int(out["k"].iloc[0]) == k and int(out["n"].iloc[0]) == n
    assert abs(out["ch_index"].iloc[0] - ch) < 1e-4 * max(1, abs(ch))
    assert abs(out["db_index"].iloc[0] - db) < 1e-6
