"""Weisfeiler–Lehman (1-WL) vertex color refinement.

The standard graph-feature extractor (WL kernels, GNN expressiveness
baselines): round 0 colors vertices by degree; each round re-colors by
the (vertex color, multiset of neighbor colors) pair.  The multiset is
combined COMMUTATIVELY — nbsum(v) = Σ_{u∈N(v)} splitmix64(color(u))
mod 2^64 — so the per-vertex update is one segmented sum over the CSR
(no sorting, no string building), and the DuckDB oracle replays it
exactly with HUGEINT modular arithmetic:

    color'(v) = splitmix64( (splitmix64(color(v)) + nbsum(v)) mod 2^64 )

Hash-combine WL is collision-possible in principle (2^-64 per pair)
but standard practice for WL features at scale.

Ray shape: the color vector is broadcast per round (`ray.put`, one
fetch per worker) and vertex batches stream through a stateless task
computing their new colors with np.add.reduceat — O(rounds) broadcasts
of O(n) state, the same regime as the iterative engine's broadcast
executor; range-routing the color slices (graph/iterative.py sharded
path) is the >10^9-vertex upgrade.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from pgd_ray.graph.csr import CSRGraph
from pgd_ray.text.hashing import splitmix64

_M64 = np.uint64(0xFFFFFFFFFFFFFFFF)


def _wl_round(indptr: np.ndarray, indices: np.ndarray, colors: np.ndarray,
              lo: int, hi: int) -> np.ndarray:
    """New colors for vertices [lo, hi) given the full color vector —
    only the touched entries are hashed (O(deg slice), not O(n))."""
    ip = indptr[lo:hi + 1].astype(np.int64)
    vals = splitmix64(colors[indices[ip[0]:ip[-1]]])
    starts = ip[:-1] - ip[0]
    deg = np.diff(ip)
    # reduceat misbehaves on empty segments (repeats the next value):
    # compute then zero them out
    nb = np.zeros(hi - lo, np.uint64)
    nonempty = deg > 0
    if vals.size:
        red = np.add.reduceat(vals, starts[nonempty])
        nb[nonempty] = red
    return splitmix64(splitmix64(colors[lo:hi]) + nb)


def wl_colors(
    csr: CSRGraph,
    rounds: int = 3,
    batch_size: int = 4096,
) -> pd.DataFrame:
    """(v, color) after ``rounds`` refinements — color is the uint64
    WL color shifted right once (int64-safe, same convention as the
    MIS priority mirror)."""
    n = csr.n
    colors = csr.degrees().astype(np.uint64)
    indptr_ref, indices_ref = csr.put()
    for _ in range(rounds):
        cref = ray.put(colors)

        def step(t: pa.Table, cref=cref) -> pa.Table:
            ip = np.asarray(ray.get(indptr_ref))
            ix = np.asarray(ray.get(indices_ref))
            cols = ray.get(cref)
            vs = t["v"].to_numpy(zero_copy_only=False)
            lo, hi = int(vs[0]), int(vs[-1]) + 1
            assert hi - lo == len(vs), "vertex batches must be contiguous"
            out = _wl_round(ip, ix, cols, lo, hi)
            return pa.table({"v": pa.array(vs, pa.int64()),
                             "c": pa.array(out.view(np.int64), pa.int64())})

        ids = ray.data.from_arrow(pa.table({
            "v": pa.array(np.arange(n, dtype=np.int64), pa.int64())}))
        parts = ids.repartition(max(1, n // batch_size)).map_batches(
            step, batch_format="pyarrow", batch_size=batch_size
        ).to_pandas()
        nxt = np.empty(n, np.uint64)
        nxt[parts["v"].to_numpy()] = parts["c"].to_numpy().view(np.uint64)
        colors = nxt
    return pd.DataFrame({"v": np.arange(n, dtype=np.int64),
                         "color": (colors >> np.uint64(1)).astype(np.int64)})


def wl_class_sizes(csr: CSRGraph, rounds: int = 3) -> pd.DataFrame:
    """Per-round count of distinct WL color classes — the refinement
    trajectory (stabilizes when two consecutive counts agree)."""
    n = csr.n
    colors = csr.degrees().astype(np.uint64)
    out = [{"round": 0, "n_classes": int(len(np.unique(colors)))}]
    ip, ix = csr.indptr, csr.indices
    for r in range(1, rounds + 1):
        colors = _wl_round(ip, ix, colors, 0, n)
        out.append({"round": r, "n_classes": int(len(np.unique(colors)))})
    return pd.DataFrame(out)
