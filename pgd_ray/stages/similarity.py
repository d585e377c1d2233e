"""Approximate-nearest-neighbor search over an embedding column.

Baseline: brute-force cosine top-k — the query matrix is broadcast
once (``ray.put``), every batch of the embedding table does one numpy
matmul against it and emits its local top-k per query; the driver
merges #batches × k candidates per query (tiny).  No shuffle; scales
linearly in table size and worker count.

Scale path: IVF — a small centroid codebook trained with distributed
Lloyd iterations (partial sums inside ``map_batches``, combined on the
driver), vectors bucketed by nearest centroid (one hash shuffle),
queries probing only the closest ``nprobe`` buckets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data


def _normalize(m: np.ndarray) -> np.ndarray:
    return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-12)


def _stack_embeddings(col: pa.ChunkedArray | pa.Array, dtype=np.float32) -> np.ndarray:
    """list<float> column → (nb, d) matrix without per-row Python.

    Flattens the Arrow list buffer (zero-copy when offsets are
    contiguous) and reshapes; falls back to to_pylist only for ragged
    rows, which embedding tables don't have."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    vals = col.flatten().to_numpy(zero_copy_only=False)
    nb = len(col)
    if nb == 0:
        return np.empty((0, 0), dtype=dtype)
    if len(vals) % nb == 0:
        offs = col.offsets.to_numpy(zero_copy_only=False)
        widths = np.diff(offs)
        if (widths == widths[0]).all():
            return vals.reshape(nb, -1).astype(dtype, copy=False)
    return np.stack(col.to_pylist()).astype(dtype)


def _local_topk(sims: np.ndarray, vid: np.ndarray, kk: int) -> np.ndarray:
    """Indices of the exact local top-kk by (-cosine, vec_id).

    argpartition on cosine alone can drop a lower vec_id when equal
    cosines straddle the boundary; here every candidate tied with the
    kk-th value is kept and the composite order decides."""
    part = np.argpartition(-sims, kk - 1)[:kk]
    thresh = sims[part].min()
    cand = np.flatnonzero(sims >= thresh)
    order = np.lexsort((vid[cand], -sims[cand]))[:kk]
    return cand[order]


_BCAST_CACHE: dict = {}


def _cached_get(ref):
    """Fetch a broadcast object once per worker PROCESS (module cache,
    the joins._key_filter pattern) — task stages stay actor-free, so
    no constructor refs sit in the object store (ray#53727)."""
    ck = ref.hex() if isinstance(ref, ray.ObjectRef) else None
    val = _BCAST_CACHE.get(ck)
    if val is None:
        val = ray.get(ref) if ck is not None else ref
        if ck is not None:
            _BCAST_CACHE.clear()
            _BCAST_CACHE[ck] = val
    return val


def _ivf_score(b: pa.Table, pq_ref, k: int, dtype) -> pa.Table:
    """Task-stage IVF probe scorer: (probes, q) fetched through the
    per-worker module cache."""
    probes, q = _cached_get(pq_ref)
    empty = pa.table(
        {"query_id": pa.array([], pa.int64()),
         "vec_id": pa.array([], pa.int64()),
         "cosine": pa.array([], pa.float64())}
    )
    if b.num_rows == 0:
        return empty
    vid = b["vec_id"].to_numpy(zero_copy_only=False)
    cid = b["cid"].to_numpy(zero_copy_only=False)
    m = _normalize(_stack_embeddings(b["embedding"], dtype))
    out = []
    for qi in range(len(q)):
        mask = np.isin(cid, probes[qi])
        if not mask.any():
            continue
        sims = m[mask] @ q[qi]
        kk = min(k, len(sims))
        mvid = vid[mask]
        sel = _local_topk(sims, mvid, kk)
        out.append(
            pa.table(
                {
                    "query_id": np.full(len(sel), qi, np.int64),
                    "vec_id": mvid[sel].astype(np.int64),
                    "cosine": sims[sel].astype(np.float64),
                }
            )
        )
    return pa.concat_tables(out) if out else empty


def topk_cosine(
    emb: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    batch_size: int = 4096,
    concurrency=(1, 16),
    dtype=np.float32,
) -> pd.DataFrame:
    """Exact top-k by cosine.  Returns (query_id, rank, vec_id, cosine),
    rank 0-based, ties broken by vec_id (deterministic).  dtype=float64
    mirrors DuckDB's double-precision list_cosine_similarity for the
    oracle comparison; float32 is the fast path."""
    q = _normalize(np.asarray(queries, dtype=dtype))

    # plain-function task stage (query matrix is nq×d — small by
    # contract, shipped in the closure): an actor pool here would put
    # its constructor state in the object store, the ray#53727
    # restart hazard
    def scorer(b: pa.Table) -> pa.Table:
        vid = b["vec_id"].to_numpy(zero_copy_only=False)
        m = _normalize(_stack_embeddings(b["embedding"], dtype))
        if len(m) == 0:
            return pa.table(
                {"query_id": pa.array([], pa.int64()), "vec_id": pa.array([], pa.int64()),
                 "cosine": pa.array([], pa.float64())}
            )
        sims = q @ m.T  # (nq, nb)
        kk = min(k, sims.shape[1])
        rows = []
        for qi in range(sims.shape[0]):
            sel = _local_topk(sims[qi], vid, kk)
            rows.append(
                pa.table(
                    {
                        "query_id": np.full(len(sel), qi, np.int64),
                        "vec_id": vid[sel].astype(np.int64),
                        "cosine": sims[qi, sel].astype(np.float64),
                    }
                )
            )
        return pa.concat_tables(rows)

    task_cap = concurrency[1] if isinstance(concurrency, tuple) else concurrency
    cands = emb.select_columns(["vec_id", "embedding"]).map_batches(
        scorer, batch_format="pyarrow", batch_size=batch_size, concurrency=task_cap
    ).to_pandas()
    # driver merge: #batches×k rows per query
    cands = cands.sort_values(
        ["query_id", "cosine", "vec_id"], ascending=[True, False, True]
    )
    top = cands.groupby("query_id", sort=True).head(k).reset_index(drop=True)
    top["rank"] = top.groupby("query_id").cumcount()
    return top[["query_id", "rank", "vec_id", "cosine"]]


def train_ivf_centroids(
    emb: ray.data.Dataset, n_centroids: int = 16, iters: int = 5, seed: int = 11
) -> np.ndarray:
    """Distributed Lloyd: per-batch partial (sum, count) per centroid
    inside ``map_batches``, combined on the driver each iteration.
    Deterministic init: seeded sample of the table."""
    sample = emb.select_columns(["embedding"]).random_sample(
        min(1.0, 4096 / max(emb.count(), 1)), seed=seed
    ).to_pandas()
    pts = _normalize(np.stack(sample["embedding"].to_numpy()).astype(np.float32))
    rng = np.random.default_rng(seed)
    cents = pts[rng.choice(len(pts), min(n_centroids, len(pts)), replace=False)]
    for _ in range(iters):
        c_ref = ray.put(cents)

        def partial(b: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            m = _normalize(_stack_embeddings(b["embedding"]))
            assign = np.argmax(m @ c.T, axis=1)
            sums = np.zeros_like(c)
            np.add.at(sums, assign, m)
            cnts = np.bincount(assign, minlength=len(c))
            return pa.table(
                {
                    "cid": np.arange(len(c), dtype=np.int64),
                    "sum": pa.array(list(sums.astype(np.float64)), pa.large_list(pa.float64())),
                    "cnt": cnts.astype(np.int64),
                }
            )

        sums = np.zeros_like(cents, dtype=np.float64)
        cnts = np.zeros(len(cents), dtype=np.int64)
        for b in (
            emb.select_columns(["embedding"])
            .map_batches(partial, batch_format="pyarrow", batch_size=8192)
            .iter_batches(batch_size=1 << 16, batch_format="pyarrow")
        ):
            cid = b["cid"].to_numpy(zero_copy_only=False)
            cnt = b["cnt"].to_numpy(zero_copy_only=False)
            for i in range(len(cid)):
                sums[cid[i]] += np.asarray(b["sum"][i].values)
                cnts[cid[i]] += cnt[i]
        nz = cnts > 0
        cents = cents.copy()
        cents[nz] = _normalize((sums[nz] / cnts[nz, None]).astype(np.float32))
    return cents


class IVFIndex:
    """Centroid-PARTITIONED IVF index: the corpus is bucketed by
    nearest centroid ONCE (one assignment scan writing per-cid parquet
    partitions + an O(#files) manifest), and every query set then
    READS only its ``nprobe`` partitions — I/O, not just compute, is
    pruned by nprobe/nlist (the round-2 version rescanned 100 % of the
    corpus per query set and filtered inside the scan).

    Layout: ``index_dir/cid=<c>/part-<uuid>.parquet`` — files are
    written by the assignment tasks themselves (no extra shuffle; a
    partition is just the set of files listing it in the manifest),
    the same resumable one-file-per-unit pattern as the RangeCSR
    build."""

    def __init__(self, centroids: np.ndarray, files: dict, counts: dict,
                 index_dir: str):
        self.centroids = centroids
        self.files = files      # cid -> [parquet paths]
        self.counts = counts    # cid -> row count
        self.index_dir = index_dir
        self.last_rows_read = None  # rows scanned by the latest search

    @classmethod
    def build(
        cls,
        emb: ray.data.Dataset,
        n_centroids: int = 16,
        index_dir: str | None = None,
        iters: int = 5,
        seed: int = 11,
        dtype=np.float32,
    ) -> "IVFIndex":
        import tempfile
        import uuid
        from pathlib import Path

        import pyarrow.parquet as pq

        cents = train_ivf_centroids(emb, n_centroids=n_centroids, iters=iters,
                                    seed=seed)
        index_dir = index_dir or tempfile.mkdtemp(prefix="pgd_ivf_", dir="/tmp")
        for c in range(len(cents)):
            Path(index_dir, f"cid={c}").mkdir(parents=True, exist_ok=True)
        c_ref = ray.put(cents)

        def bucket_write(b: pa.Table) -> pa.Table:
            c = ray.get(c_ref)
            if b.num_rows == 0:
                return pa.table({"cid": pa.array([], pa.int64()),
                                 "rows": pa.array([], pa.int64()),
                                 "path": pa.array([], pa.string())})
            m = _normalize(_stack_embeddings(b["embedding"], dtype))
            assign = np.argmax(m @ c.T, axis=1).astype(np.int64)
            b = b.append_column("cid", pa.array(assign))
            cids, paths, rows = [], [], []
            for cid in np.unique(assign):
                part = b.filter(pa.array(assign == cid))
                p = Path(index_dir, f"cid={int(cid)}",
                         f"part-{uuid.uuid4().hex}.parquet")
                tmp = p.with_suffix(".tmp")
                pq.write_table(part, tmp)
                tmp.rename(p)
                cids.append(int(cid))
                rows.append(part.num_rows)
                paths.append(str(p))
            return pa.table({"cid": pa.array(cids, pa.int64()),
                             "rows": pa.array(rows, pa.int64()),
                             "path": pa.array(paths, pa.string())})

        manifest = (
            emb.select_columns(["vec_id", "embedding"])
            .map_batches(bucket_write, batch_format="pyarrow", batch_size=8192)
            .take_all()
        )  # O(#files) rows — the only thing the driver holds
        files: dict = {}
        counts: dict = {}
        for r in manifest:
            files.setdefault(r["cid"], []).append(r["path"])
            counts[r["cid"]] = counts.get(r["cid"], 0) + r["rows"]
        return cls(cents, files, counts, index_dir)

    def search(
        self,
        queries: np.ndarray,
        k: int = 10,
        nprobe: int = 4,
        concurrency=(1, 16),
        dtype=np.float32,
    ) -> pd.DataFrame:
        """Probe-read: only the partitions in some query's nprobe list
        are opened.  Output schema matches ``topk_cosine``; with
        nprobe == n_centroids the result is exact."""
        from pgd_ray.util import read_parquet_clean

        q = _normalize(np.asarray(queries, dtype=dtype))
        probes = np.argsort(-(q @ self.centroids.T), axis=1)[:, :nprobe]
        needed = sorted({int(c) for row in probes for c in row if int(c) in self.files})
        self.last_rows_read = sum(self.counts.get(c, 0) for c in needed)
        paths = [p for c in needed for p in self.files[c]]
        if not paths:
            return pd.DataFrame(columns=["query_id", "rank", "vec_id", "cosine"])
        part = read_parquet_clean(paths, columns=["vec_id", "embedding", "cid"])
        pq_ref = ray.put((probes, q))

        cap = concurrency[1] if isinstance(concurrency, (tuple, list)) \
            else concurrency
        cands = part.map_batches(
            _ivf_score, batch_format="pyarrow", batch_size=8192,
            concurrency=cap,
            fn_kwargs={"pq_ref": pq_ref, "k": k, "dtype": dtype},
        ).to_pandas()
        if cands.empty:
            return pd.DataFrame(columns=["query_id", "rank", "vec_id", "cosine"])
        cands = cands.sort_values(
            ["query_id", "cosine", "vec_id"], ascending=[True, False, True]
        )
        top = cands.groupby("query_id", sort=True).head(k).reset_index(drop=True)
        top["rank"] = top.groupby("query_id").cumcount()
        return top[["query_id", "rank", "vec_id", "cosine"]]


def ivf_topk_cosine(
    emb: ray.data.Dataset,
    queries: np.ndarray,
    k: int = 10,
    n_centroids: int = 16,
    nprobe: int = 4,
    concurrency=(1, 16),
    dtype=np.float32,
) -> pd.DataFrame:
    """IVF ANN via the centroid-partitioned index: build (one
    assignment scan, partitioned parquet) + probe-read search.  Same
    output schema as ``topk_cosine`` (approximate recall).  With
    ``nprobe == n_centroids`` every bucket is probed, so the result is
    EXACT (independent of the trained centroids) — the oracle-checked
    configuration; ``dtype=float64`` mirrors DuckDB's doubles."""
    index = IVFIndex.build(emb, n_centroids=n_centroids, dtype=dtype)
    return index.search(queries, k=k, nprobe=nprobe, concurrency=concurrency,
                        dtype=dtype)


def mmr_rerank(
    emb: ray.data.Dataset,
    query: np.ndarray,
    k: int = 5,
    lam: float = 0.7,
    batch_size: int = 4096,
    dtype=np.float64,
) -> pd.DataFrame:
    """Greedy maximal-marginal-relevance selection of ``k`` vectors:
    round r picks argmax of ``lam*cos(q, d) - (1-lam)*max_{s in
    selected} cos(d, s)`` (ties -> min vec_id; round 0 has no
    diversity term).  Returns (rank, vec_id, score).

    Distribution shape: each round is ONE streamed pass — every batch
    emits its single best candidate against the broadcast
    (query, selected) state, the driver reduces #batches rows and
    grows the selected set by one (k·d floats).  k passes over the
    corpus; at scale run it over an ANN candidate pool
    (``ivf_topk_cosine`` N >> k) instead of the raw table — the
    greedy recurrence itself is inherently sequential in k.
    """
    qv = _normalize(np.asarray(query, dtype=dtype)[None, :])[0]
    sel_ids: list[int] = []
    sel_vecs: list[np.ndarray] = []
    ranks: list[dict] = []
    src = emb.select_columns(["vec_id", "embedding"]).materialize()
    for r in range(k):
        state = ray.put((
            qv,
            np.stack(sel_vecs) if sel_vecs else np.empty((0, len(qv)), dtype),
            np.asarray(sel_ids, np.int64),
        ))

        def best(b: pa.Table, state_ref=state) -> pa.Table:
            empty = pa.table({"vec_id": pa.array([], pa.int64()),
                              "score": pa.array([], pa.float64()),
                              "emb": pa.array([], pa.list_(pa.float64()))})
            q, S, sids = ray.get(state_ref)
            vid = b["vec_id"].to_numpy(zero_copy_only=False)
            m = _normalize(_stack_embeddings(b["embedding"], dtype))
            if len(m) == 0:
                return empty
            score = lam * (m @ q)
            if len(S):
                score = score - (1.0 - lam) * np.max(m @ S.T, axis=1)
            mask = ~np.isin(vid, sids)
            if not mask.any():
                return empty
            sm, vm, mm = score[mask], vid[mask], m[mask]
            i = np.lexsort((vm, -sm))[0]
            return pa.table({"vec_id": pa.array([int(vm[i])], pa.int64()),
                             "score": pa.array([float(sm[i])], pa.float64()),
                             "emb": pa.array([mm[i].tolist()],
                                             pa.list_(pa.float64()))})

        cands = src.map_batches(
            best, batch_format="pyarrow", batch_size=batch_size
        ).to_pandas()
        if cands.empty:
            break
        cands = cands.sort_values(["score", "vec_id"],
                                  ascending=[False, True], ignore_index=True)
        top = cands.iloc[0]
        sel_ids.append(int(top["vec_id"]))
        sel_vecs.append(np.asarray(top["emb"], dtype))
        ranks.append({"rank": r, "vec_id": int(top["vec_id"]),
                      "score": float(top["score"])})
    return pd.DataFrame(ranks, columns=["rank", "vec_id", "score"]).astype(
        {"rank": np.int64, "vec_id": np.int64, "score": np.float64})


def knn_edges(
    emb: ray.data.Dataset,
    k: int = 5,
    batch_size: int = 4096,
    concurrency=(1, 16),
    dtype=np.float64,
) -> pd.DataFrame:
    """Directed exact k-nearest-neighbor edges (src, dst) by cosine,
    self excluded, ties broken by vec_id — every vector is both query
    and candidate.  The normalized corpus matrix is broadcast once
    (`ray.put`) and the SAME dataset streams through a stateful scorer
    as the query side, so the exchange is one matrix put + O(n·k)
    edge rows.  Brute force is the exact baseline; at corpus sizes
    where n² flops bite, route queries through the IVF bucketed path
    (ivf_topk_cosine) instead."""
    corpus = emb.select_columns(["vec_id", "embedding"]).to_pandas()
    vid_all = corpus["vec_id"].to_numpy(np.int64)
    m_all = _normalize(np.stack(corpus["embedding"].to_numpy()).astype(dtype))
    ref = ray.put((vid_all, m_all))

    def scorer(b: pa.Table) -> pa.Table:
        # broadcast corpus fetched once per worker via the module
        # cache — task stage, no actor constructor refs (ray#53727)
        vid_c, m_c = _cached_get(ref)
        qid = b["vec_id"].to_numpy(zero_copy_only=False)
        q = _normalize(_stack_embeddings(b["embedding"], dtype))
        if len(q) == 0:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        sims = q @ m_c.T
        outs, outd = [], []
        for i in range(len(qid)):
            s = sims[i].copy()
            s[vid_c == qid[i]] = -np.inf  # exclude self
            kk = min(k, len(s) - 1)
            if kk <= 0:
                continue  # singleton corpus: no neighbors
            sel = _local_topk(s, vid_c, kk)
            outs.append(np.full(len(sel), qid[i], np.int64))
            outd.append(vid_c[sel].astype(np.int64))
        if not outs:
            return pa.table({"src": pa.array([], pa.int64()),
                             "dst": pa.array([], pa.int64())})
        return pa.table({"src": pa.array(np.concatenate(outs)),
                         "dst": pa.array(np.concatenate(outd))})

    cap = concurrency[1] if isinstance(concurrency, (tuple, list)) \
        else concurrency
    return emb.select_columns(["vec_id", "embedding"]).map_batches(
        scorer, batch_format="pyarrow", batch_size=batch_size,
        concurrency=cap,
    ).to_pandas()


def mutual_knn_clusters(emb: ray.data.Dataset, k: int = 5) -> pd.DataFrame:
    """Connected components of the MUTUAL k-NN graph (u and v link iff
    each is in the other's top-k): the standard density-respecting
    clustering for embedding corpora.  Components via min-label
    propagation with pointer jumping over the thin mutual edge list
    (O(n·k) rows — the same driver contract as the graph kernels; the
    distributed alternative is the engine's hash-min CC program).
    Returns (vec_id, cluster), cluster = min vec_id in component;
    vectors with no mutual neighbor are singletons."""
    ed = knn_edges(emb, k=k)
    s = ed["src"].to_numpy(np.int64) if len(ed) else np.array([], np.int64)
    d = ed["dst"].to_numpy(np.int64) if len(ed) else np.array([], np.int64)
    ids = emb.select_columns(["vec_id"]).to_pandas()["vec_id"]
    # mutual: the canonical (min,max) pair occurs in both directions —
    # directed pairs are unique, so pair-count == 2 identifies it
    lo, hi = np.minimum(s, d), np.maximum(s, d)
    pk = np.stack([lo, hi], axis=1)
    upairs, cnt = np.unique(pk, axis=0, return_counts=True) if len(pk) else (
        np.empty((0, 2), np.int64), np.array([], np.int64))
    ma, mb = upairs[cnt == 2, 0], upairs[cnt == 2, 1]
    verts = np.unique(ids.to_numpy(np.int64))
    lab = verts.astype(np.int64).copy()
    if len(ma):
        pa_ = np.searchsorted(verts, ma)
        pb = np.searchsorted(verts, mb)
        while True:
            before = lab.copy()
            np.minimum.at(lab, pa_, lab[pb])
            np.minimum.at(lab, pb, lab[pa_])
            idx = np.searchsorted(verts, lab)
            lab = np.minimum(lab, lab[idx])
            if np.array_equal(lab, before):
                break
    return pd.DataFrame({"vec_id": verts, "cluster": lab}).sort_values(
        "vec_id", ignore_index=True)


def rrf_fusion(
    bm25_top: pd.DataFrame,
    cosine_top: pd.DataFrame,
    k0: int = 60,
    out_k: int = 10,
) -> pd.DataFrame:
    """Reciprocal-rank fusion of a lexical (BM25) and a dense
    (cosine top-k) ranking — the standard hybrid-retrieval combiner:
    rrf(d) = Σ_lists 1/(k0 + rank_d), 1-based ranks, absent list
    contributes 0.  Inputs are the two top-k frames produced by
    ``text.bm25.bm25_rank`` (doc_id, score, rk — 1-based) and
    ``topk_cosine`` for ONE query (query_id, rank — 0-based, vec_id,
    cosine), joined on doc_id == vec_id.  Output (id, rrf, rk_bm25,
    rk_cosine) — absent ranks pinned to -1 — top ``out_k`` by
    (rrf DESC, id).  Fusion input is two k-row lists, so this is
    driver arithmetic by construction; the heavy distributed work is
    in the two rankers."""
    r1 = dict(zip(bm25_top["doc_id"].astype(int),
                  bm25_top["rk"].astype(int)))
    r2 = dict(zip(cosine_top["vec_id"].astype(int),
                  cosine_top["rank"].astype(int) + 1))
    ids = sorted(set(r1) | set(r2))
    rows = []
    for i in ids:
        a, b = r1.get(i), r2.get(i)
        s = (1.0 / (k0 + a) if a is not None else 0.0) + \
            (1.0 / (k0 + b) if b is not None else 0.0)
        rows.append((i, s, a if a is not None else -1,
                     b if b is not None else -1))
    rows.sort(key=lambda t: (-t[1], t[0]))
    rows = rows[:out_k]
    return pd.DataFrame({
        "id": pd.Series([r[0] for r in rows], dtype=np.int64),
        "rrf": np.round(np.array([r[1] for r in rows]), 9),
        "rk_bm25": pd.Series([r[2] for r in rows], dtype=np.int64),
        "rk_cosine": pd.Series([r[3] for r in rows], dtype=np.int64),
    })


def rbo_rankings(
    a_ids: "np.ndarray",
    b_ids: "np.ndarray",
    p: float = 0.9,
) -> pd.DataFrame:
    """Truncated rank-biased overlap (Webber et al. 2010, no
    extrapolation): RBO@k = (1−p)·Σ_{d=1..k} p^{d−1}·|A_d ∩ B_d|/d
    over the two ranked id lists — the top-weighted agreement number
    for comparing retrieval systems (the RRF inputs, two engine
    rankers, a before/after index change...).  Driver arithmetic over
    two k-row lists by construction.  One row (k, p, overlap_at_k,
    rbo round 9); overlap_at_k = |A_k ∩ B_k|/k."""
    a = list(dict.fromkeys(int(x) for x in a_ids))
    b = list(dict.fromkeys(int(x) for x in b_ids))
    k = min(len(a), len(b))
    sa, sb = set(), set()
    rbo = 0.0
    inter = 0
    for d in range(1, k + 1):
        sa.add(a[d - 1])
        sb.add(b[d - 1])
        inter = len(sa & sb)
        rbo += (p ** (d - 1)) * inter / d
    rbo *= (1.0 - p)
    return pd.DataFrame({
        "k": [np.int64(k)], "p": [p],
        "overlap_at_k": [round(inter / k, 9) if k else 0.0],
        "rbo": [round(rbo, 9)],
    })
