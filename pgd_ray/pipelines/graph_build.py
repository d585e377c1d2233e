"""Fused graph build: raw pair Dataset → (canonical edges, CSR, ids).

Round-1 history: this stage used one distributed sort followed by a
linear O(2m) assembly pass on the DRIVER — correct at 10^7 edges, a
scale-killer at 10^10.  It now routes through the block-structured
build (``graph.block_csr``): one ``groupby(range_id)`` all-to-all,
per-vertex-range (indptr, indices) fragments built and persisted
inside the shuffle's reduce tasks (one parquet file per range, the
resumable ``CSRGraph.write`` layout), contiguous broadcast arrays
concatenated by a remote task.  The driver holds the O(#ranges)
manifest and zero-copy plasma views only.

Reference model: the CSC built once and shared by every thread
(graphlet_core.h:84-86) — here built once per range and shared via
the object store.
"""

from __future__ import annotations

import numpy as np
import ray.data

from pgd_ray.graph.block_csr import build_range_csr
from pgd_ray.graph.csr import CSRGraph
from pgd_ray.util import default_blocks


def build_graph(
    raw_pairs: ray.data.Dataset,
    dense: bool = True,
    blocks: int | None = None,
    out_dir: str | None = None,
) -> tuple[ray.data.Dataset, CSRGraph, np.ndarray | None]:
    """raw (src,dst) pairs (dups/self-loops ok) → (canonical_ds, csr, vids).

    ``blocks`` sets the number of vertex ranges (default 4×CPUs); the
    canonical Dataset comes back as one block per range, derived from
    the persisted fragments (upper-triangular expansion) — kernel
    stages chunk internally by 2-hop volume, so residual inter-range
    skew does not straggle.  ``out_dir`` persists the fragment files
    for resume (default: fresh /tmp scratch).
    """
    rcsr, vids = build_range_csr(
        raw_pairs,
        dense=dense,
        num_ranges=blocks or default_blocks(factor=4),
        out_dir=out_dir,
    )
    rcsr.assemble()  # non-blocking: the concat task overlaps the expansion below
    canonical_ds = rcsr.canonical_edges().materialize()
    csr = rcsr.to_csr()
    if dense and vids is None:
        vids = np.array([], np.int64)
    return canonical_ds, csr, vids
