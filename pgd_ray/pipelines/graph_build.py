"""Fused graph build: raw pair Dataset → (canonical edges, CSR, ids).

The composable operators (``normalize_edges`` → ``build_csr``) pay one
shuffle per step (dedup groupby, distinct groupby, sort).  This fused
path does ONE distributed sort of the symmetrized pairs and finishes
with a linear-time streaming pass on the driver that simultaneously
 * drops duplicate edges (consecutive in sorted order),
 * assigns dense ids (np.unique of the sorted endpoints),
 * assembles the CSR arrays,
 * derives the canonical (src<dst) edge table back as a Dataset.

Driver cost is O(2m) ints — the adjacency itself, which by design fits
one machine (same assumption as the plasma-broadcast CSR).  For graphs
beyond that, fall back to the stepwise operators which never hold the
edge set in one process.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from pgd_ray.graph.csr import CSRGraph
from pgd_ray.graph.normalize import canonicalize, symmetrize
from pgd_ray.util import default_blocks


def build_graph(
    raw_pairs: ray.data.Dataset, dense: bool = True
) -> tuple[ray.data.Dataset, CSRGraph, np.ndarray | None]:
    """raw (src,dst) pairs (dups/self-loops ok) → (canonical_ds, csr, vids)."""
    srt = symmetrize(canonicalize(raw_pairs)).sort(["src", "dst"])
    srcs, dsts = [], []
    prev = None
    for b in srt.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        if b.num_rows == 0:
            continue
        a = b["src"].to_numpy(zero_copy_only=False)
        d = b["dst"].to_numpy(zero_copy_only=False)
        # drop consecutive duplicates (sorted stream ⇒ dups adjacent)
        keep = np.empty(len(a), dtype=bool)
        keep[0] = prev is None or (a[0], d[0]) != prev
        keep[1:] = (a[1:] != a[:-1]) | (d[1:] != d[:-1])
        prev = (int(a[-1]), int(d[-1]))
        srcs.append(a[keep])
        dsts.append(d[keep])
    if not srcs:
        empty = ray.data.from_arrow(
            pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        )
        return empty, CSRGraph(0, 0, np.zeros(1, np.int64), np.array([], np.int64)), (
            np.array([], np.int64) if dense else None
        )
    a = np.concatenate(srcs)
    d = np.concatenate(dsts)
    vids = None
    if dense:
        vids = np.unique(a)  # symmetric ⇒ every vertex appears as src
        a = np.searchsorted(vids, a)
        d = np.searchsorted(vids, d)
        n = len(vids)
    else:
        n = int(a.max() + 1) if len(a) else 0
    counts = np.bincount(a, minlength=n)
    indptr = np.zeros(n + 1, dtype=np.int64)
    indptr[1:] = np.cumsum(counts)
    csr = CSRGraph(n=n, m=len(a) // 2, indptr=indptr, indices=d)
    # canonical (src<dst) table straight from the CSR
    up = d > np.repeat(np.arange(n), counts)
    canon = pa.table({"src": np.repeat(np.arange(n), counts)[up], "dst": d[up]})
    canonical_ds = ray.data.from_arrow(canon).repartition(default_blocks()).materialize()
    return canonical_ds, csr, vids
