"""Deterministic random-walk sampling — the neighborhood-sampling
primitive of GraphSAGE / node2vec-style training-data pipelines
(Hamilton et al. 2017; Grover & Leskovec 2016), over the broadcast
CSR.

Determinism contract: step t of walk w moves to

    neighbors(v)[ splitmix64(w XOR t·C) mod deg(v) ]

— a pure function of (graph, walk id, step): reproducible under task
retries, partition changes and resume (the same property the hash
samplers in ``text/sampling.py`` provide), and bit-exactly mirrorable
in SQL (splitmix64 has a DuckDB mirror, ``__ray_entry__._splitmix_sql``).
A walk that reaches an isolated vertex stays there (deg 0 ⇒ hold).

Execution shape: walks are embarrassingly parallel — one
``map_batches`` pass over the seed table; each task advances its
walk batch L steps with vectorized CSR gathers (no Python loop over
walks).  No shuffle anywhere; output is (walk_id, step, v) with
(L+1)·#walks rows, streamed.  Per-worker state (CSR views) is memoized
by ObjectRef so the stage runs as plain tasks (no actor pool, no
restart-with-plasma-args hazard, ray#53727).

Scale note: the broadcast-CSR assumption is shared with the graphlet
kernels (SCALE.md §kernels); beyond per-node RAM, frontiers route by
vertex range per step (a groupby(range) exchange per hop) — walks stay
independent so the exchange carries only (walk_id, v) pairs.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from pgd_ray.graph.csr import CSRGraph
from pgd_ray.text.hashing import splitmix64

# odd mix constant for the per-step key (distinct from splitmix64's
# internal constants)
STEP_C = np.uint64(0xD1342543DE82EF95)

_WALK_CACHE: dict = {}


def _walk_state(indptr_ref, indices_ref):
    key = (indptr_ref.hex(), indices_ref.hex())
    st = _WALK_CACHE.get(key)
    if st is None:
        indptr = ray.get(indptr_ref)
        indices = ray.get(indices_ref)
        st = (indptr, indices, np.diff(indptr))
        _WALK_CACHE.clear()  # one graph's state per worker at a time
        _WALK_CACHE[key] = st
    return st


def _walk_batch(batch: pa.Table, indptr_ref, indices_ref, length: int) -> pa.Table:
    indptr, indices, deg = _walk_state(indptr_ref, indices_ref)
    wid = batch["walk_id"].to_numpy(zero_copy_only=False).astype(np.int64)
    cur = batch["v0"].to_numpy(zero_copy_only=False).astype(np.int64)
    k = len(wid)
    wid_u = wid.view(np.uint64) if wid.dtype == np.int64 else wid.astype(np.uint64)
    levels = [cur]
    for t in range(1, length + 1):
        key = splitmix64(wid_u ^ (np.uint64(t) * STEP_C))
        d = deg[cur]
        pick = (key % np.maximum(d, 1).astype(np.uint64)).astype(np.int64)
        at = indptr[cur] + pick
        at[d == 0] = 0  # dead-end: gather anything valid, discarded below
        nxt = indices[at] if len(indices) else cur
        cur = np.where(d > 0, nxt, cur)
        levels.append(cur)
    return pa.table({
        "walk_id": np.repeat(wid, length + 1),
        "step": np.tile(np.arange(length + 1, dtype=np.int64), k),
        "v": np.stack(levels, axis=1).reshape(-1),
    })


def random_walks(
    csr: CSRGraph,
    starts: np.ndarray | None = None,
    length: int = 8,
    walks_per_start: int = 1,
    batch_size: int = 65536,
    concurrency: int | None = 32,
) -> ray.data.Dataset:
    """Dataset of (walk_id, step, v): ``walks_per_start`` walks of
    ``length`` steps from each start vertex (default: every vertex).
    walk_id = start + k·n for copy k, so ids are unique and the seed
    is recoverable (walk_id mod n)."""
    n = csr.n
    empty = ray.data.from_arrow(pa.table({
        "walk_id": pa.array([], pa.int64()),
        "step": pa.array([], pa.int64()),
        "v": pa.array([], pa.int64()),
    }))
    if n == 0:
        return empty
    if starts is None:
        starts = np.arange(n, dtype=np.int64)
    starts = np.asarray(starts, dtype=np.int64)
    if starts.size == 0:
        return empty
    if starts.min() < 0 or starts.max() >= n:
        raise ValueError(f"starts outside [0, {n})")
    wid = np.concatenate(
        [starts + k * n for k in range(walks_per_start)]
    )
    v0 = np.tile(starts, walks_per_start)
    seeds = ray.data.from_arrow(pa.table({"walk_id": wid, "v0": v0}))
    nblocks = max(1, min(len(wid) // 4096, 4 * (concurrency or 32)))
    if nblocks > 1:
        seeds = seeds.repartition(nblocks)
    indptr_ref, indices_ref = csr.put()
    return seeds.map_batches(
        _walk_batch,
        fn_kwargs={
            "indptr_ref": indptr_ref,
            "indices_ref": indices_ref,
            "length": length,
        },
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
        concurrency=concurrency,
    )
