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
    raw_pairs: ray.data.Dataset, dense: bool = True, blocks: int | None = None
) -> tuple[ray.data.Dataset, CSRGraph, np.ndarray | None]:
    """raw (src,dst) pairs (dups/self-loops ok) → (canonical_ds, csr, vids).

    ``blocks`` sets the canonical Dataset's volume-balanced block count
    (default 2×CPUs; kernel stages get one task per block — use ~4×CPUs
    for better tail packing of heterogeneous blocks)."""
    # materialize the (repartitioned) input before the sort: a lazy
    # single-block source serializes the whole map phase ahead of the
    # shuffle (measured 22 s vs 2 s on a 40M-row sort)
    raw_pairs = raw_pairs.materialize()
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
        # a is already sorted ⇒ distinct = boundary scan, not a re-sort
        vids = a[np.concatenate(([True], a[1:] != a[:-1]))] if len(a) else a
        lo_id, hi_id = int(vids[0]), int(vids[-1])
        span = hi_id - lo_id + 1
        if span <= max(16 * len(vids), 1 << 22):
            # O(1) remap via lookup table (id space reasonably dense)
            lut = np.zeros(span, dtype=np.int64)
            lut[vids - lo_id] = np.arange(len(vids))
            a = lut[a - lo_id]
            d = lut[d - lo_id]
        else:  # sparse id space → binary-search remap
            a = np.searchsorted(vids, a)
            d = np.searchsorted(vids, d)
        n = len(vids)
    else:
        n = int(a.max() + 1) if len(a) else 0
    counts = np.bincount(a, minlength=n)
    indptr = np.zeros(n + 1, dtype=np.int64)
    indptr[1:] = np.cumsum(counts)
    csr = CSRGraph(n=n, m=len(a) // 2, indptr=indptr, indices=d)
    # canonical (src<dst) table straight from the CSR, kept in sorted
    # order (the kernel's group-mark pass amortizes hub marking over
    # runs of equal endpoints), but split into DEGREE-VOLUME-balanced
    # blocks rather than equal row counts — hub-heavy ranges get fewer
    # edges per block, the Ray-side analogue of the reference's
    # degree-ordered dynamic scheduling (SURVEY.md §4.1).
    up = d > np.repeat(np.arange(n), counts)
    c_src = np.repeat(np.arange(n), counts)[up]
    c_dst = d[up]
    deg = counts
    w = deg[c_src] + deg[c_dst]
    k = blocks or default_blocks()
    if len(w) and k > 1:
        targets = np.linspace(0, w.sum(), k + 1)[1:-1]
        bounds = np.unique(np.searchsorted(np.cumsum(w), targets))
        bounds = [0, *bounds.tolist(), len(w)]
    else:
        bounds = [0, len(w)]
    canon = pa.table({"src": c_src, "dst": c_dst})
    refs = [
        ray.put(canon.slice(lo, hi - lo))
        for lo, hi in zip(bounds[:-1], bounds[1:])
        if hi > lo
    ]
    canonical_ds = ray.data.from_arrow_refs(refs).materialize()
    return canonical_ds, csr, vids
