"""K-means clustering over an embedding column, and SemDeDup-style
semantic deduplication (Abbas et al., 2023: cluster first, then
near-dup detection *within* clusters so the quadratic term is bounded
by cluster size, never corpus size).

Determinism contract (what makes the DuckDB oracle bit-exact):
- init = the k rows with the smallest ids, centroid id = rank;
- Lloyd assignment = argmin squared L2, ties to the smallest cid;
- centroid update = per-dimension SUM/COUNT rounded to 6 decimals —
  the rounding collapses summation-order float jitter (~1e-15) to the
  same double on every executor and in SQL, so iteration t+1 starts
  from identical centroids everywhere;
- empty clusters keep their previous centroid.

Scale shape: each Lloyd iteration is ONE `map_batches` pass with the
k x d centroid matrix broadcast via `ray.put`; the shuffle carries
k x d partial-sum rows per batch (k*d << batch rows).  The final
labeling pass streams.  SemDeDup groups by cluster — the published
design's point is exactly that clusters are small enough for local
all-pairs — and keeps the smallest id per cosine-connected component.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum


def _stack(col, dtype=np.float64) -> np.ndarray:
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    flat = arr.values.to_numpy(zero_copy_only=False).astype(dtype)
    return flat.reshape(len(arr), -1)


def kmeans_fit(
    ds: ray.data.Dataset,
    k: int = 8,
    iters: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    round_to: int = 6,
) -> tuple[ray.data.Dataset, np.ndarray]:
    """Lloyd k-means; returns (assignments Dataset with columns
    [id_col, 'cluster'], final k x d centroid matrix)."""
    seed_rows = ds.sort(id_col).limit(k).to_pandas()
    if len(seed_rows) == 0:
        return ds.select_columns([id_col]).map_batches(
            lambda b: pa.table({id_col: b[id_col],
                                "cluster": pa.nulls(len(b), pa.int64())}),
            batch_format="pyarrow"), np.zeros((0, 0))
    cents = np.stack(seed_rows[vec_col].to_numpy()).astype(np.float64)
    kk = cents.shape[0]

    for _ in range(iters):
        cref = ray.put(cents)

        def partial(b: pa.Table) -> pa.Table:
            C = ray.get(cref)
            X = _stack(b[vec_col])
            a = np.argmin(
                ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2), axis=1)
            sums = np.zeros_like(C)
            np.add.at(sums, a, X)
            cnt = np.bincount(a, minlength=C.shape[0]).astype(np.int64)
            cid = np.repeat(np.arange(C.shape[0], dtype=np.int64), C.shape[1])
            dim = np.tile(np.arange(C.shape[1], dtype=np.int64), C.shape[0])
            return pa.table({"cid": cid, "dim": dim, "s": sums.ravel(),
                             "n": np.repeat(cnt, C.shape[1])})

        agg = (ds.map_batches(partial, batch_format="pyarrow")
               .groupby(["cid", "dim"])
               .aggregate(Sum("s", alias_name="s"), Sum("n", alias_name="n"))
               .to_pandas())
        new = cents.copy()
        nz = agg[agg["n"] > 0]
        new[nz["cid"].to_numpy(), nz["dim"].to_numpy()] = np.round(
            nz["s"].to_numpy() / nz["n"].to_numpy(), round_to)
        cents = new

    cref = ray.put(cents)

    def label(b: pa.Table) -> pa.Table:
        C = ray.get(cref)
        X = _stack(b[vec_col])
        a = np.argmin(((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2),
                      axis=1)
        return pa.table({id_col: b[id_col],
                         "cluster": pa.array(a.astype(np.int64))})

    return ds.map_batches(label, batch_format="pyarrow"), cents


def semdedup(
    ds: ray.data.Dataset,
    k: int = 8,
    iters: int = 4,
    threshold: float = 0.45,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Cluster with k-means, then within each cluster connect pairs
    with cosine >= threshold and keep the smallest id per component.
    Returns (id_col, cluster, rep, keep) for every input row."""
    cents_ds, cents = kmeans_fit(ds, k=k, iters=iters,
                                 vec_col=vec_col, id_col=id_col)
    if cents.size == 0:
        return pd.DataFrame({id_col: [], "cluster": [], "rep": [],
                             "keep": []})
    cref = ray.put(cents)

    def tag(b: pa.Table) -> pa.Table:
        C = ray.get(cref)
        X = _stack(b[vec_col])
        a = np.argmin(((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2),
                      axis=1)
        return b.append_column("cluster", pa.array(a.astype(np.int64)))

    tagged = ds.map_batches(tag, batch_format="pyarrow")

    def dedup_cluster(g: pd.DataFrame) -> pd.DataFrame:
        ids = g[id_col].to_numpy()
        order = np.argsort(ids)
        ids = ids[order]
        X = np.stack(g[vec_col].to_numpy()[order]).astype(np.float64)
        norm = np.linalg.norm(X, axis=1)
        norm[norm == 0] = 1.0
        S = (X / norm[:, None]) @ (X / norm[:, None]).T
        iu, ju = np.triu_indices(len(ids), 1)
        hit = S[iu, ju] >= threshold
        parent = np.arange(len(ids))

        def find(x):
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b2 in zip(iu[hit], ju[hit]):
            ra, rb = find(a), find(b2)
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        rep = ids[np.array([find(i) for i in range(len(ids))])]
        return pd.DataFrame({id_col: ids,
                             "cluster": g["cluster"].iloc[0],
                             "rep": rep, "keep": ids == rep})

    out = (tagged.groupby("cluster")
           .map_groups(dedup_cluster, batch_format="pandas")
           .to_pandas())
    return out.sort_values(id_col, ignore_index=True)


def silhouette_by_cluster(
    ds: ray.data.Dataset,
    k: int = 8,
    iters: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> pd.DataFrame:
    """Simplified (centroid-based) silhouette per cluster: for each
    point, a = L2 distance to its own centroid, b = min distance to
    any other centroid, s = (b-a)/max(a,b); the per-cluster mean is
    the standard clustering-quality score that avoids the O(n^2)
    pairwise silhouette.  One extra streaming pass over the vectors
    with the k x d centroid matrix broadcast; the exchange is <= k
    rows of (sum, count) partials.  Columns (cluster, n,
    mean_silhouette)."""
    _asg, cents = kmeans_fit(ds, k=k, iters=iters, vec_col=vec_col,
                             id_col=id_col)
    if cents.size == 0:
        return pd.DataFrame({"cluster": pd.Series([], dtype=np.int64),
                             "n": pd.Series([], dtype=np.int64),
                             "mean_silhouette": pd.Series([], dtype=np.float64)})
    cref = ray.put(cents)

    def partial(b: pa.Table) -> pa.Table:
        C = ray.get(cref)
        X = _stack(b[vec_col])
        D = np.sqrt(((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2))
        own = np.argmin(D, axis=1)
        rows = np.arange(len(X))
        a = D[rows, own]
        D2 = D.copy()
        D2[rows, own] = np.inf
        bmin = D2.min(axis=1)
        sil = (bmin - a) / np.maximum(a, bmin)
        ssum = np.zeros(C.shape[0])
        np.add.at(ssum, own, sil)
        cnt = np.bincount(own, minlength=C.shape[0]).astype(np.int64)
        nz = np.flatnonzero(cnt)
        return pa.table({"cluster": nz.astype(np.int64),
                         "ssum": ssum[nz], "n": cnt[nz]})

    agg = (
        ds.select_columns([id_col, vec_col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("cluster")
        .aggregate(Sum("ssum", alias_name="ssum"),
                   Sum("n", alias_name="n"))
        .to_pandas()
    )
    return pd.DataFrame({
        "cluster": agg["cluster"].astype(np.int64),
        "n": agg["n"].astype(np.int64),
        "mean_silhouette": np.round(
            agg["ssum"].to_numpy(np.float64) / agg["n"].to_numpy(np.float64),
            6),
    }).sort_values("cluster", ignore_index=True)


def centroid_confusion(
    emb: ray.data.Dataset, col: str = "embedding", label_col: str = "label",
) -> pd.DataFrame:
    """Nearest-centroid classifier confusion over labeled embeddings:
    per-label mean centroid (one distributed sum/count aggregate —
    d+1 rows per label leave the workers), then every vector is
    assigned to the cosine-nearest centroid (ties -> smaller label)
    by a stateless map against the broadcast L x d matrix, and the
    (label_true, label_pred) pairs reduce to counts.  The standard
    label-quality / cluster-separability audit for embedding tables.
    Columns (label_true, label_pred, n)."""

    def partial(t: pa.Table) -> pa.Table:
        c = t[col].combine_chunks()
        if len(c) == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "sxy": pa.array([], pa.float64())})
        d = len(c[0])
        m = (c.flatten().to_numpy(zero_copy_only=False)
             .astype(np.float64).reshape(-1, d))
        lab = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        ul, inv = np.unique(lab, return_inverse=True)
        sums = np.zeros((len(ul), d), np.float64)
        np.add.at(sums, inv, m)
        cnt = np.bincount(inv).astype(np.float64)
        # dim 0 row carries the count
        return pa.table({
            "label": np.concatenate([np.repeat(ul, d), ul]),
            "dim": np.concatenate([np.tile(np.arange(1, d + 1), len(ul)),
                                   np.zeros(len(ul), np.int64)]),
            "sxy": np.concatenate([sums.ravel(), cnt]),
        })

    agg = (
        emb.select_columns([label_col, col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby(["label", "dim"])
        .aggregate(Sum("sxy", alias_name="sxy"))
        .to_pandas()
    )
    if agg.empty:
        return pd.DataFrame({"label_true": pd.Series([], dtype=np.int64),
                             "label_pred": pd.Series([], dtype=np.int64),
                             "n": pd.Series([], dtype=np.int64)})
    labels = np.sort(agg["label"].unique())
    d = int(agg["dim"].max())
    cnts = agg[agg["dim"] == 0].set_index("label")["sxy"]
    cent = np.zeros((len(labels), d), np.float64)
    for li, lb in enumerate(labels):
        g = agg[(agg["label"] == lb) & (agg["dim"] > 0)].sort_values("dim")
        cent[li] = g["sxy"].to_numpy(np.float64) / float(cnts[lb])
    cn = cent / np.maximum(
        np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    ref = ray.put((labels, cn))

    def assign(t: pa.Table) -> pa.Table:
        labs, c = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
        col_ = t[col].combine_chunks()
        if len(col_) == 0:
            return pa.table({"label_true": pa.array([], pa.int64()),
                             "label_pred": pa.array([], pa.int64())})
        m = (col_.flatten().to_numpy(zero_copy_only=False)
             .astype(np.float64).reshape(-1, c.shape[1]))
        mn = m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)
        sims = mn @ c.T
        pred = labs[np.argmax(sims, axis=1)]  # first max -> smaller label
        return pa.table({
            "label_true": t[label_col].cast(pa.int64()),
            "label_pred": pa.array(pred, pa.int64()),
        })

    from ray.data.aggregate import Count

    out = (
        emb.select_columns([label_col, col])
        .map_batches(assign, batch_format="pyarrow")
        .groupby(["label_true", "label_pred"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    out["n"] = out["n"].astype(np.int64)
    return out.sort_values(["label_true", "label_pred"], ignore_index=True)


def dbscan(
    ds: ray.data.Dataset,
    eps: float,
    min_pts: int,
    col: str = "embedding",
    id_col: str = "vec_id",
    batch_size: int = 2048,
    concurrency=(1, 16),
) -> pd.DataFrame:
    """Exact DBSCAN (Ester et al., 1996) over the embedding column.

    Deterministic contract (bit-identical to the SQL mirror):
    * neighborhood test = ``round(||x-y||², 9) <= eps²`` — the direct
      (x−y)² form (no BLAS cancellation, cf. hopkins_statistic) with
      the round-9 threshold absorbing summation-order float jitter;
    * a point's eps-count INCLUDES itself (sklearn's min_samples
      convention): core ⇔ count >= min_pts;
    * cluster label = MIN core vec_id of the core component (min-label
      contract shared with the CC engine);
    * border points take the MIN label among their core neighbors
      (the published algorithm is arrival-order-dependent here; min is
      the deterministic refinement); noise = -1.

    Scale shape: the corpus matrix is broadcast ONCE (`ray.put`) and
    the same Dataset streams through two stateful passes — pass 1
    emits one (id, count) row per vector, pass 2 emits edges to CORE
    neighbors only (the core-id set is a second tiny broadcast).  This
    is the documented exact-baseline contract of `knn_edges`; at
    corpus sizes where n² flops bite, the bucketed pre-filter
    (`IVFIndex` / LSH bands) bounds the candidate pairs first.
    Returns (vec_id, label, is_core).
    """
    eps2 = float(eps) * float(eps)
    corpus = ds.select_columns([id_col, col]).to_pandas()
    vid_all = corpus[id_col].to_numpy(np.int64)
    m_all = np.stack(corpus[col].to_numpy()).astype(np.float64)
    ref = ray.put((vid_all, m_all))

    class CoreCount:
        def __init__(self):
            self.vid, self.m = ray.get(ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            qid = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            q = _stack(b[col])
            cnt = np.empty(len(qid), np.int64)
            for i in range(len(qid)):
                d2 = np.round(((self.m - q[i]) ** 2).sum(1), 9)
                cnt[i] = int((d2 <= eps2).sum())
            return pa.table({"vec_id": pa.array(qid),
                             "cnt": pa.array(cnt)})

    counts = ds.map_batches(
        CoreCount, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    ).to_pandas()
    core_ids = np.sort(counts.loc[counts["cnt"] >= min_pts,
                                  "vec_id"].to_numpy(np.int64))
    core_ref = ray.put(core_ids)

    class CoreEdges:
        def __init__(self):
            self.vid, self.m = ray.get(ref)
            cs = ray.get(core_ref)
            self.is_core = np.isin(self.vid, cs)

        def __call__(self, b: pa.Table) -> pa.Table:
            qid = b[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
            q = _stack(b[col])
            src, dst = [], []
            for i in range(len(qid)):
                d2 = np.round(((self.m - q[i]) ** 2).sum(1), 9)
                sel = (d2 <= eps2) & self.is_core & (self.vid != qid[i])
                hits = self.vid[sel]
                src.append(np.full(len(hits), qid[i], np.int64))
                dst.append(hits.astype(np.int64))
            return pa.table({
                "src": pa.array(np.concatenate(src) if src else
                                np.array([], np.int64)),
                "dst": pa.array(np.concatenate(dst) if dst else
                                np.array([], np.int64)),
            })

    edges = ds.map_batches(
        CoreEdges, batch_format="pyarrow", batch_size=batch_size,
        concurrency=concurrency,
    ).to_pandas()

    # components over core-core edges (min-label + pointer jumping)
    lab_of = {}
    if len(core_ids):
        lab = core_ids.copy()
        ccm = edges[np.isin(edges["src"].to_numpy(np.int64), core_ids)]
        sa = np.searchsorted(core_ids, ccm["src"].to_numpy(np.int64))
        da = np.searchsorted(core_ids, ccm["dst"].to_numpy(np.int64))
        while True:
            before = lab.copy()
            np.minimum.at(lab, sa, lab[da])
            np.minimum.at(lab, da, lab[sa])
            lab = np.minimum(lab, lab[np.searchsorted(core_ids, lab)])
            if np.array_equal(lab, before):
                break
        lab_of = dict(zip(core_ids.tolist(), lab.tolist()))

    vid_sorted = np.sort(vid_all)
    is_core_all = np.isin(vid_sorted, core_ids)
    # border: min core-neighbor component label (vectorized groupby)
    bm = edges[~np.isin(edges["src"].to_numpy(np.int64), core_ids)]
    border_lab = {}
    if len(bm) and len(core_ids):
        dlab = lab[np.searchsorted(core_ids, bm["dst"].to_numpy(np.int64))]
        border_lab = pd.Series(dlab, index=bm["src"].to_numpy(np.int64)) \
            .groupby(level=0).min().to_dict()
    labels = np.array(
        [lab_of.get(int(v), border_lab.get(int(v), -1)) for v in vid_sorted],
        np.int64)
    return pd.DataFrame({
        "vec_id": vid_sorted,
        "label": labels,
        "is_core": is_core_all.astype(np.int64),
    })


def cluster_validity(
    ds: ray.data.Dataset,
    vec_col: str = "embedding",
    label_col: str = "label",
) -> pd.DataFrame:
    """Calinski-Harabasz and Davies-Bouldin validity indices of a
    GIVEN labeling (the two scikit-learn-standard internal metrics
    next to silhouette): CH = (B/(k−1)) / (W/(n−k)) with B/W the
    between/within squared scatter; DB = mean_i max_{j≠i}
    (s_i + s_j)/d_ij with s = mean Euclidean distance to the own
    centroid and d = centroid distance.

    Distribution: pass 1 per-label (count, Σvec) partials → k×d
    centroids on the driver; pass 2 broadcast-centroid distance
    partials (Σd², Σd per label).  Shuffles carry k·d rows per batch,
    never vectors.  One row: (k, n, ch_index, db_index), rounded 6."""
    from ray.data.aggregate import Sum

    def p1(t: pa.Table) -> pa.Table:
        X = _stack(t[vec_col])
        lab = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(X) == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "dim": pa.array([], pa.int64()),
                             "s": pa.array([], pa.float64()),
                             "cnt": pa.array([], pa.int64())})
        ulab, inv = np.unique(lab, return_inverse=True)
        d = X.shape[1]
        sums = np.zeros((len(ulab), d))
        np.add.at(sums, inv, X)
        cnt = np.bincount(inv)
        return pa.table({
            "label": np.repeat(ulab, d),
            "dim": np.tile(np.arange(d, dtype=np.int64), len(ulab)),
            "s": sums.ravel(),
            "cnt": np.repeat(cnt, d).astype(np.int64),
        })

    agg = (ds.map_batches(p1, batch_format="pyarrow")
           .groupby(["label", "dim"])
           .aggregate(Sum("s", alias_name="s"), Sum("cnt", alias_name="cnt"))
           .to_pandas().sort_values(["label", "dim"], ignore_index=True))
    labels = np.unique(agg["label"].to_numpy())
    k = len(labels)
    d = int(agg["dim"].max()) + 1
    S = agg["s"].to_numpy().reshape(k, d)
    cnt = agg["cnt"].to_numpy().reshape(k, d)[:, 0].astype(np.int64)
    n = int(cnt.sum())
    C = S / cnt[:, None]
    g = S.sum(axis=0) / n  # global centroid

    cref = ray.put((labels, C))

    def p2(t: pa.Table) -> pa.Table:
        from pgd_ray.graph.cache import get_cached

        labs, cen = get_cached(cref)
        X = _stack(t[vec_col])
        lab = t[label_col].to_numpy(zero_copy_only=False).astype(np.int64)
        if len(X) == 0:
            return pa.table({"label": pa.array([], pa.int64()),
                             "d2": pa.array([], pa.float64()),
                             "d1": pa.array([], pa.float64())})
        pos = np.searchsorted(labs, lab)
        diff = X - cen[pos]
        sq = (diff * diff).sum(axis=1)
        dist = np.sqrt(sq)
        d2 = np.zeros(len(labs))
        d1 = np.zeros(len(labs))
        np.add.at(d2, pos, sq)
        np.add.at(d1, pos, dist)
        return pa.table({"label": labs.astype(np.int64),
                         "d2": d2, "d1": d1})

    p2agg = (ds.map_batches(p2, batch_format="pyarrow")
             .groupby("label")
             .aggregate(Sum("d2", alias_name="d2"),
                        Sum("d1", alias_name="d1"))
             .to_pandas().sort_values("label", ignore_index=True))
    W = float(p2agg["d2"].sum())
    B = float((cnt * ((C - g) ** 2).sum(axis=1)).sum())
    ch = (B / (k - 1)) / (W / (n - k)) if k > 1 and n > k and W > 0 else 0.0
    s = p2agg["d1"].to_numpy() / cnt
    db = 0.0
    if k > 1:
        ratios = np.zeros((k, k))
        for i in range(k):
            for j in range(k):
                if i != j:
                    dij = float(np.sqrt(((C[i] - C[j]) ** 2).sum()))
                    ratios[i, j] = (s[i] + s[j]) / dij
        db = float(ratios.max(axis=1).mean())
    return pd.DataFrame({"k": [np.int64(k)], "n": [np.int64(n)],
                         "ch_index": [round(ch, 6)],
                         "db_index": [round(db, 6)]})
