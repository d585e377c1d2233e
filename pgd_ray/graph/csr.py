"""Partitioned CSR adjacency build over Ray Data.

The reference holds one CSR (``edges`` + ``vertices`` offset arrays,
graphlet_core.h:84-86) in shared memory and lets every OpenMP thread
read it.  The Ray-native equivalent of "shared memory" is the plasma
object store: the CSR arrays are ``ray.put`` once and every kernel
actor maps them zero-copy (read-only numpy views backed by shm).  On a
multi-node cluster Ray replicates the buffers once per node — the same
cost profile as one in-RAM copy per machine, which is exactly the
reference's model scaled out.

Build is distributed: the symmetrized edge table is hash/range sorted
by ``src`` with Ray Data's shuffle, per-range blocks are turned into
(indptr, indices) fragments inside ``map_batches``, and the driver only
concatenates the already-sorted fragments.  The adjacency (vertices +
neighbor ids) is orders of magnitude smaller than the raw transcript
corpus it was derived from; for graphs whose adjacency exceeds one
node's RAM the sharded variant (`shards` > 1) keeps per-vertex-range
CSR blocks as separate objects that actors fetch on demand.

Checkpointing: ``CSRGraph.write`` / ``CSRGraph.read`` persist the
arrays as a single-row Arrow table with ``large_list<int64>`` columns —
the "per-partition CSR blocks as Arrow tensors" layout from SURVEY.md
§1.3 — so any later stage (or a resumed run) reconstructs the graph
without re-running the edge ETL.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from pathlib import Path

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray
import ray.data


@dataclass
class CSRGraph:
    """Immutable CSR adjacency: ``indices[indptr[v]:indptr[v+1]]`` =
    sorted neighbors of v.  ``m`` counts undirected edges (|indices|/2).
    """

    n: int
    m: int
    indptr: np.ndarray  # int64 [n+1]
    indices: np.ndarray  # int64 [2m], neighbor ids sorted ascending per vertex
    _refs: tuple | None = field(default=None, repr=False, compare=False)
    # every construction path in this package produces id-sorted
    # neighbor lists; only functions.ordering.order_vertex_neighbors
    # sets this False (the kernels then re-normalize once)
    neighbors_sorted: bool = field(default=True, compare=False)
    # back-pointer to the RangeCSR manifest this CSR was assembled
    # from (block_csr.RangeCSR.to_csr).  Lets consumers that prefer
    # per-range fragment files over the contiguous broadcast arrays
    # (the sharded iterative engine) find them without plumbing a
    # second handle through every call site.
    range_csr: object | None = field(default=None, repr=False, compare=False)

    def degrees(self) -> np.ndarray:
        return np.diff(self.indptr)

    @property
    def max_degree(self) -> int:
        return int(self.degrees().max()) if self.n else 0

    def neighbors(self, v: int) -> np.ndarray:
        return self.indices[self.indptr[v] : self.indptr[v + 1]]

    def put(self) -> tuple:
        """Broadcast the arrays to the object store (once); kernel
        actors ``ray.get`` zero-copy views in ``__init__``."""
        if self._refs is None:
            self._refs = (ray.put(self.indptr), ray.put(self.indices))
        return self._refs

    def put32(self) -> tuple:
        """Like ``put`` but with int32 neighbor ids (valid when
        n < 2^31): halves the dominant memory stream of the iterative
        engines, which are bandwidth-bound on a single node.  The cast
        runs in a remote task so the driver never allocates a private
        copy of the adjacency."""
        if self.n >= (1 << 31):
            return self.put()
        if getattr(self, "_refs32", None) is None:
            indptr_ref, indices_ref = self.put()
            self._refs32 = (indptr_ref, _cast32.remote(indices_ref))
        return self._refs32

    # -- checkpoint ---------------------------------------------------
    def write(self, path: str | Path) -> None:
        path = Path(path)
        path.parent.mkdir(parents=True, exist_ok=True)
        t = pa.table(
            {
                "n": pa.array([self.n], pa.int64()),
                "m": pa.array([self.m], pa.int64()),
                "indptr": pa.array([self.indptr], pa.large_list(pa.int64())),
                "indices": pa.array([self.indices], pa.large_list(pa.int64())),
            }
        )
        tmp = path.with_suffix(".tmp")
        pq.write_table(t, tmp)
        tmp.rename(path)  # atomic: a reader never sees a partial file

    @classmethod
    def read(cls, path: str | Path) -> "CSRGraph":
        t = pq.read_table(path)
        return cls(
            n=t["n"][0].as_py(),
            m=t["m"][0].as_py(),
            indptr=np.asarray(t["indptr"][0].values),
            indices=np.asarray(t["indices"][0].values),
        )


@ray.remote
def _cast32(indices: np.ndarray) -> np.ndarray:
    return indices.astype(np.int32)


def csr_from_edge_arrays(src: np.ndarray, dst: np.ndarray, n: int | None = None) -> CSRGraph:
    """Build CSR from canonical (src<dst, deduped, dense-id) arrays.

    Mirrors the reference's library ctor from an edge-pair array
    (graphlet_core.cpp:152-182).  Symmetrizes internally.
    """
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    if n is None:
        n = int(max(src.max(initial=-1), dst.max(initial=-1)) + 1) if src.size else 0
    a = np.concatenate([src, dst])
    b = np.concatenate([dst, src])
    order = np.lexsort((b, a))
    a, b = a[order], b[order]
    indptr = np.zeros(n + 1, dtype=np.int64)
    counts = np.bincount(a, minlength=n)
    indptr[1:] = np.cumsum(counts)
    return CSRGraph(n=n, m=len(src), indptr=indptr, indices=b)


def build_csr(
    canonical_ds: ray.data.Dataset,
    n: int | None = None,
    checkpoint: str | Path | None = None,
    num_ranges: int | None = None,
    dedup: bool = True,
) -> CSRGraph:
    """Distributed CSR build from a canonical edge Dataset.

    Delegates to the block-structured build (``graph.block_csr``):
    one ``groupby(range_id)`` all-to-all, per-vertex-range fragments
    built and persisted inside the shuffle's reduce tasks, contiguous
    arrays concatenated by a remote task.  The driver holds only the
    O(#ranges) manifest plus zero-copy plasma views of the result —
    never a private edge-stream copy (the round-1 driver-side linear
    pass is gone).
    """
    from pgd_ray.graph.block_csr import build_range_csr

    if checkpoint is not None and Path(checkpoint).exists():
        return CSRGraph.read(checkpoint)

    rcsr, _ = build_range_csr(canonical_ds, n=n, dense=False,
                              num_ranges=num_ranges, dedup=dedup)
    g = rcsr.to_csr()
    if checkpoint is not None:
        g.write(checkpoint)
    return g
