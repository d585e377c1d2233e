"""Deduplication stages: exact, MinHash+LSH, SimHash, embedding
near-dup — the scale path for each is the classic
shingle → sketch → band → ``groupby`` bucket pipeline
(one hash-partitioned shuffle on the band key; candidate verification
stays per-bucket; the final grouping reuses the engine's distributed
connected-components).

All sketches are computed vectorized per batch in actor-pool stages;
candidate pairs are verified with exact Jaccard before any doc is
called a duplicate.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

_MERSENNE = (1 << 61) - 1

# NOTE: never use the builtin ``hash()`` here — Python salts string
# hashing per process, which would make sketches differ across Ray
# workers.  All hashing below is explicit and process-stable.


def _stable_hash64(s: str) -> int:
    """FNV-1a 64-bit over the utf-8 bytes; deterministic everywhere."""
    h = 1469598103934665603
    for byte in s.encode():
        h = ((h ^ byte) * 1099511628211) & 0xFFFFFFFFFFFFFFFF
    return h


def _shingle_hashes(text: str, k: int = 5) -> np.ndarray:
    """Distinct hashed character k-shingles of the lowercased text,
    vectorized: byte rolling window + polynomial hash in numpy."""
    t = re.sub(r"\s+", " ", text.lower())
    if len(t) < k:
        t = t.ljust(k)
    raw = np.frombuffer(t.encode("utf-8", "replace"), dtype=np.uint8).astype(np.uint64)
    if len(raw) < k:
        raw = np.pad(raw, (0, k - len(raw)), constant_values=32)
    h = np.zeros(len(raw) - k + 1, dtype=np.uint64)
    for j in range(k):
        h = h * np.uint64(1000003) + raw[j : len(raw) - k + 1 + j]
    return np.unique((h & np.uint64(0xFFFFFFFFFFFF)).astype(np.int64))


class _MinHasher:
    """num_perm universal-hash minhashes over char-shingles; stateful
    per actor (the (a,b) coefficient matrix is built once)."""

    def __init__(self, num_perm: int = 64, k: int = 5, seed: int = 17):
        rng = np.random.default_rng(seed)
        # coefficients < 2^16 so a*shingle(<2^48) stays inside uint64
        self.a = rng.integers(1, 1 << 16, num_perm, dtype=np.uint64)
        self.b = rng.integers(0, 1 << 16, num_perm, dtype=np.uint64)
        self.num_perm = num_perm
        self.k = k

    def signature(self, text: str) -> np.ndarray:
        sh = _shingle_hashes(text, self.k).astype(np.uint64)
        # (num_perm, n_shingles) universal hash, min per row
        v = (self.a[:, None] * sh[None, :] + self.b[:, None]) % np.uint64(_MERSENNE)
        return v.min(axis=1).astype(np.int64)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        sigs = np.stack([self.signature(t) for t in b["text"].fillna("")])
        return pd.DataFrame({"doc_id": b["doc_id"].to_numpy(), "sig": list(sigs)})


def _band_rows(sig_df: pd.DataFrame, bands: int, rows: int) -> pd.DataFrame:
    """Explode signatures to (band_id, band_hash, doc_id) rows."""
    sigs = np.stack(sig_df["sig"].to_numpy())
    doc = sig_df["doc_id"].to_numpy()
    out = []
    for bidx in range(bands):
        chunk = sigs[:, bidx * rows : (bidx + 1) * rows]
        bh = np.zeros(len(chunk), dtype=np.int64)
        for c in range(chunk.shape[1]):
            bh = (bh * 1000003 + chunk[:, c]) % _MERSENNE
        out.append(pd.DataFrame({"band_id": bidx, "band_hash": bh, "doc_id": doc}))
    return pd.concat(out, ignore_index=True)


def _jaccard(a: np.ndarray, b: np.ndarray) -> float:
    inter = np.intersect1d(a, b, assume_unique=True).size
    union = a.size + b.size - inter
    return inter / union if union else 1.0


def exact_dedup(docs: ray.data.Dataset) -> ray.data.Dataset:
    """Exact dedup on text content: md5-hash per batch, hash-partition
    groupby, keep the smallest doc_id per group.  Output: one row per
    distinct text, columns (doc_id, n_dups)."""
    import hashlib

    def add_hash(b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "h": [hashlib.md5(t.encode()).hexdigest() for t in b["text"].fillna("")],
            }
        )

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {"doc_id": [int(g["doc_id"].min())], "n_dups": [len(g)]}
        )

    return (
        docs.select_columns(["doc_id", "text"])
        .map_batches(add_hash, batch_format="pandas", batch_size=4096)
        .groupby("h")
        .map_groups(keep_first, batch_format="pandas")
        .select_columns(["doc_id", "n_dups"])
    )


def candidate_pairs_minhash(
    docs: ray.data.Dataset,
    num_perm: int = 64,
    bands: int = 16,
    k: int = 5,
    threshold: float = 0.7,
    concurrency=(1, 16),
) -> pd.DataFrame:
    """MinHash+LSH near-dup candidates, verified with exact Jaccard.

    shingle→minhash per batch (actor pool) → band explode →
    ``groupby(band_id, band_hash)`` → per-bucket pairs → exact-Jaccard
    verification against broadcast shingle sets of candidate docs only.
    Returns verified pairs (doc_a, doc_b, jaccard ≥ threshold).
    """
    rows = num_perm // bands
    sigs = docs.select_columns(["doc_id", "text"]).map_batches(
        _MinHasher,
        fn_constructor_kwargs={"num_perm": num_perm, "k": k},
        batch_format="pandas",
        batch_size=2048,
        concurrency=concurrency,
    )

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        return _band_rows(b, bands, rows)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        ids = np.unique(g["doc_id"].to_numpy())
        if len(ids) < 2:
            return pd.DataFrame({"doc_a": np.array([], np.int64), "doc_b": np.array([], np.int64)})
        iu, ju = np.triu_indices(len(ids), 1)
        return pd.DataFrame({"doc_a": ids[iu], "doc_b": ids[ju]})

    pairs = (
        sigs.map_batches(explode, batch_format="pandas")
        .groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    ).to_pandas()
    if pairs.empty:
        return pd.DataFrame(columns=["doc_a", "doc_b", "jaccard"])
    pairs = pairs.drop_duplicates(ignore_index=True)

    # verify with exact Jaccard — only candidate docs' shingles move
    cand_ids = np.unique(np.concatenate([pairs["doc_a"], pairs["doc_b"]]))
    cand_ref = ray.put(cand_ids)

    def shingles_of(b: pd.DataFrame) -> pd.DataFrame:
        cids = ray.get(cand_ref)
        sel = b[b["doc_id"].isin(cids)]
        return pd.DataFrame(
            {
                "doc_id": sel["doc_id"].to_numpy(),
                "sh": [_shingle_hashes(t, k) for t in sel["text"].fillna("")],
            }
        )

    sh_map = {}
    for bt in (
        docs.select_columns(["doc_id", "text"])
        .map_batches(shingles_of, batch_format="pandas", batch_size=4096)
        .iter_batches(batch_size=4096, batch_format="pandas")
    ):
        for d, s in zip(bt["doc_id"], bt["sh"]):
            sh_map[int(d)] = np.asarray(s)
    jac = np.array(
        [_jaccard(sh_map[int(a)], sh_map[int(b)]) for a, b in zip(pairs["doc_a"], pairs["doc_b"])]
    )
    out = pairs.assign(jaccard=jac)
    return out[out["jaccard"] >= threshold].reset_index(drop=True)


def _groups_from_pairs(n_docs_ids: np.ndarray, pairs: pd.DataFrame) -> pd.DataFrame:
    """Duplicate groups = connected components of the verified-pair
    graph, via the engine's distributed CC."""
    from pgd_ray.graph.csr import csr_from_edge_arrays
    from pgd_ray.graph.iterative import connected_components

    ids = np.asarray(n_docs_ids, dtype=np.int64)
    if pairs.empty:
        return pd.DataFrame({"doc_id": ids, "dup_group": ids})
    dense = np.searchsorted(ids, np.sort(ids))  # identity, ids sorted
    a = np.searchsorted(ids, pairs["doc_a"].to_numpy())
    b = np.searchsorted(ids, pairs["doc_b"].to_numpy())
    csr = csr_from_edge_arrays(a, b, n=len(ids))
    comp = connected_components(csr, n_workers=4)
    return pd.DataFrame({"doc_id": ids, "dup_group": ids[comp]})


def minhash_lsh_dedup(
    docs: ray.data.Dataset, threshold: float = 0.7, **kw
) -> pd.DataFrame:
    """Full near-dup pipeline: LSH candidates → exact-Jaccard verify →
    distributed CC grouping.  Returns (doc_id, dup_group)."""
    ids = np.sort(
        np.concatenate(
            [
                b["doc_id"].to_numpy(zero_copy_only=False)
                for b in docs.select_columns(["doc_id"]).iter_batches(
                    batch_size=1 << 20, batch_format="pyarrow"
                )
                if b.num_rows
            ]
        )
    )
    pairs = candidate_pairs_minhash(docs, threshold=threshold, **kw)
    return _groups_from_pairs(ids, pairs)


class _SimHasher:
    """64-bit SimHash over word tokens (weight = term frequency)."""

    def __init__(self, seed: int = 23):
        self.word_re = re.compile(r"\w+")

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        out = np.zeros(len(b), dtype=np.int64)
        for i, t in enumerate(b["text"].fillna("")):
            toks = self.word_re.findall(t.lower())
            if not toks:
                continue
            hs = np.array([_stable_hash64(w) for w in toks], dtype=np.uint64)
            bits = ((hs[:, None] >> np.arange(64, dtype=np.uint64)[None, :]) & 1).astype(np.int32)
            v = np.where(bits.sum(axis=0) * 2 >= len(hs), 1, 0).astype(np.uint64)
            out[i] = int((v << np.arange(64, dtype=np.uint64)).sum(dtype=np.uint64).astype(np.int64))
        return pd.DataFrame({"doc_id": b["doc_id"].to_numpy(), "simhash": out})


def simhash_dedup(
    docs: ray.data.Dataset, max_hamming: int = 3, concurrency=(1, 16)
) -> pd.DataFrame:
    """SimHash near-dup: 64-bit fingerprints, 4×16-bit band blocking
    (any identical band → candidate; guarantees recall for hamming ≤ 3),
    hamming-verified pairs.  Returns (doc_a, doc_b, hamming)."""
    sigs = docs.select_columns(["doc_id", "text"]).map_batches(
        _SimHasher, batch_format="pandas", batch_size=4096, concurrency=concurrency
    )

    def explode(b: pd.DataFrame) -> pd.DataFrame:
        h = b["simhash"].to_numpy().astype(np.uint64)
        parts = []
        for band in range(4):
            parts.append(
                pd.DataFrame(
                    {
                        "band_id": band,
                        "band_hash": ((h >> np.uint64(band * 16)) & np.uint64(0xFFFF)).astype(np.int64),
                        "doc_id": b["doc_id"].to_numpy(),
                        "simhash": h.astype(np.int64),
                    }
                )
            )
        return pd.concat(parts, ignore_index=True)

    def bucket_pairs(g: pd.DataFrame) -> pd.DataFrame:
        g = g.drop_duplicates("doc_id").sort_values("doc_id")
        ids = g["doc_id"].to_numpy()
        hs = g["simhash"].to_numpy().astype(np.uint64)
        if len(ids) < 2:
            return pd.DataFrame(
                {"doc_a": np.array([], np.int64), "doc_b": np.array([], np.int64),
                 "hamming": np.array([], np.int64)}
            )
        iu, ju = np.triu_indices(len(ids), 1)
        x = hs[iu] ^ hs[ju]
        ham = np.array([bin(v).count("1") for v in x], dtype=np.int64)
        return pd.DataFrame({"doc_a": ids[iu], "doc_b": ids[ju], "hamming": ham})

    pairs = (
        sigs.map_batches(explode, batch_format="pandas")
        .groupby(["band_id", "band_hash"])
        .map_groups(bucket_pairs, batch_format="pandas")
    ).to_pandas()
    if pairs.empty:
        return pd.DataFrame(columns=["doc_a", "doc_b", "hamming"])
    pairs = pairs.drop_duplicates(subset=["doc_a", "doc_b"], ignore_index=True)
    return pairs[pairs["hamming"] <= max_hamming].reset_index(drop=True)


def embedding_neardup(
    emb: ray.data.Dataset, threshold: float = 0.95, batch_size: int = 2048,
    dtype=np.float32,
) -> pd.DataFrame:
    """Embedding-cosine near-dup: normalized matrix broadcast once
    (``ray.put``), each batch does one matmul block against it and
    emits pairs ≥ threshold.  O(N²/B) flops distributed over the pool;
    scale path = IVF bucketing (see similarity.ivf_index).
    Returns (vec_a, vec_b, cosine)."""
    rows = []
    ids = []
    for b in emb.select_columns(["vec_id", "embedding"]).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow"
    ):
        if b.num_rows:
            ids.append(b["vec_id"].to_numpy(zero_copy_only=False))
            rows.append(np.stack(b["embedding"].to_pylist()))
    if not rows:
        return pd.DataFrame(columns=["vec_a", "vec_b", "cosine"])
    all_ids = np.concatenate(ids)
    mat = np.concatenate(rows).astype(dtype)
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    order = np.argsort(all_ids)
    all_ids, mat = all_ids[order], mat[order]
    mat_ref = ray.put(mat)
    ids_ref = ray.put(all_ids)

    class Block:
        def __init__(self):
            self.mat = ray.get(mat_ref)
            self.ids = ray.get(ids_ref)

        def __call__(self, b: pa.Table) -> pa.Table:
            vid = b["vec_id"].to_numpy(zero_copy_only=False)
            v = np.stack(b["embedding"].to_pylist()).astype(mat.dtype)
            v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-12)
            sims = v @ self.mat.T
            ai, bj = np.nonzero(sims >= threshold)
            va, vb = vid[ai], self.ids[bj]
            keep = va < vb  # canonical, drops self-pairs
            return pa.table(
                {
                    "vec_a": va[keep].astype(np.int64),
                    "vec_b": vb[keep].astype(np.int64),
                    "cosine": sims[ai, bj][keep].astype(np.float64),
                }
            )

    out = emb.select_columns(["vec_id", "embedding"]).map_batches(
        Block, batch_format="pyarrow", batch_size=batch_size, concurrency=(1, 16)
    )
    return out.to_pandas().sort_values(["vec_a", "vec_b"]).reset_index(drop=True)
