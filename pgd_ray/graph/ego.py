"""k-hop ego-subgraph extraction — the neighborhood-sampling cut used
to carve training subgraphs around seed entities (GraphSAGE mini-batch
construction, fraud-ring inspection, community drill-down).

Semantics: vertices within unweighted distance ≤ k of ANY seed, plus
the edges INDUCED on them (both endpoints inside).  Distances come
from the engine's multi-source BFS capped at k rounds (synchronous
frontier relaxation reaches exactly the ≤ r-ball after r rounds, so
``max_iter=k`` is the cap, not an approximation); the membership mask
is broadcast once and the edge stream is filtered in one
``map_batches`` pass — no shuffle beyond BFS's slice exchanges.

Scale note: membership is one bool per vertex (n bits broadcast);
the induced-edge filter is embarrassingly parallel over the canonical
edge Dataset.  For seeds whose k-ball is the whole graph this
degrades gracefully to a copy — callers pick k accordingly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from pgd_ray.graph.csr import CSRGraph
from pgd_ray.graph.iterative import bfs_distances

_EGO_CACHE: dict = {}


def _mask_of(ref):
    key = ref.hex()
    st = _EGO_CACHE.get(key)
    if st is None:
        st = ray.get(ref)
        _EGO_CACHE.clear()
        _EGO_CACHE[key] = st
    return st


def _filter_edges(t: pa.Table, mask_ref) -> pa.Table:
    mask = _mask_of(mask_ref)
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    keep = mask[src] & mask[dst]
    return t.filter(pa.array(keep))


def ego_subgraph(
    canonical_ds: ray.data.Dataset,
    csr: CSRGraph,
    seeds,
    k: int = 2,
    n_workers: int = 8,
    engine: str = "actors",
) -> tuple[ray.data.Dataset, np.ndarray]:
    """(induced canonical edge Dataset, member-vertex id array) of the
    union of the seeds' k-hop balls."""
    if csr.n == 0:
        return canonical_ds, np.array([], dtype=np.int64)
    dist = bfs_distances(csr, seeds, max_iter=k, n_workers=n_workers,
                         engine=engine)
    mask = dist <= k
    mask_ref = ray.put(mask)
    edges = canonical_ds.map_batches(
        _filter_edges, fn_kwargs={"mask_ref": mask_ref},
        batch_format="pyarrow",
    )
    return edges, np.flatnonzero(mask).astype(np.int64)
