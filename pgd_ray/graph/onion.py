"""Onion decomposition — peel layers refining the k-core.

Hébert-Dufresne, Grochow & Allard (Sci. Rep. 2016): starting from
k = min degree, each LAYER removes every vertex whose current degree
is <= k simultaneously; after a removal k rises to max(k, new min
degree).  Every vertex gets (layer, core): the round it left and the
threshold that removed it.  The core column IS the k-core number
(property of the decomposition — asserted against the engine's
``kcore`` in tests), so the layers are a strict refinement of the
reference's bucket peeling (graphlet_core.cpp:958-1018).

Two executors, same semantics (tested equal):

* ``engine="task"`` — one vectorized kernel over the CSR inside a Ray
  task (segment-gather neighbor decrement per round, no Python
  per-edge work).  Right whenever one machine holds the CSR — the
  same regime as the reference.
* ``engine="dataset"`` — rounds of (degree_table -> threshold filter
  -> semi_join) over the edge Dataset, the truss/densest peel shape:
  driver holds O(#rounds) scalars, removal sets stay distributed as
  per-round labeled Datasets.  The cluster-scale path; round count is
  the layer count (typically tens on real graphs).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data
from ray.data.aggregate import Min

from pgd_ray.graph.csr import CSRGraph
from pgd_ray.graph.degrees import degree_table
from pgd_ray.stages.joins import semi_join


def onion_kernel(indptr: np.ndarray, indices: np.ndarray,
                 max_rounds: int = 1 << 20):
    """(layer, core) int64 arrays for a symmetric CSR.  Isolated
    vertices peel in the first k=0 layer."""
    n = len(indptr) - 1
    deg = np.diff(indptr).astype(np.int64)
    layer = np.zeros(n, np.int64)
    core = np.zeros(n, np.int64)
    alive = np.ones(n, bool)
    li = 0
    if n == 0:
        return layer, core
    k = int(deg.min())
    while alive.any() and li < max_rounds:
        li += 1
        sel = alive & (deg <= k)
        layer[sel] = li
        core[sel] = k
        alive[sel] = False
        removed = np.flatnonzero(sel)
        cnt = (indptr[removed + 1] - indptr[removed]).astype(np.int64)
        total = int(cnt.sum())
        if total:
            pos = (np.arange(total, dtype=np.int64)
                   - np.repeat(np.cumsum(cnt) - cnt, cnt)
                   + np.repeat(indptr[removed].astype(np.int64), cnt))
            neigh = indices[pos]
            live_n = neigh[alive[neigh]]
            np.subtract.at(deg, live_n, 1)
        if alive.any():
            k = max(k, int(deg[alive].min()))
    return layer, core


@ray.remote
def _onion_task(indptr, indices):
    return onion_kernel(np.asarray(indptr), np.asarray(indices))


def onion_layers(
    eds: ray.data.Dataset,
    csr: CSRGraph | None = None,
    engine: str = "task",
    max_rounds: int = 100_000,
    strategy: str = "broadcast",
) -> ray.data.Dataset:
    """Per-vertex (v, layer, core) for the graph's edge endpoints
    (dataset path) / all CSR ids (task path)."""
    if engine == "task":
        if csr is None:
            from pgd_ray.graph.csr import build_csr

            csr = build_csr(eds)
        layer, core = ray.get(_onion_task.remote(csr.indptr, csr.indices))
        return ray.data.from_arrow(pa.table({
            "v": pa.array(np.arange(len(layer), dtype=np.int64), pa.int64()),
            "layer": pa.array(layer, pa.int64()),
            "core": pa.array(core, pa.int64()),
        }))

    cur = eds
    deg = degree_table(cur).materialize()
    if deg.count() == 0:
        return ray.data.from_arrow(pa.table({
            "v": pa.array([], pa.int64()), "layer": pa.array([], pa.int64()),
            "core": pa.array([], pa.int64())}))
    k = int(deg.min("degree"))
    parts: list[ray.data.Dataset] = []
    li = 0
    while li < max_rounds:
        li += 1

        def split(t: pa.Table, k=k, li=li) -> pa.Table:
            gone = pc.less_equal(t["degree"], pa.scalar(k, pa.int64()))
            rem = t.filter(gone)
            return pa.table({
                "v": rem["v"],
                "layer": pa.array(np.full(rem.num_rows, li, np.int64)),
                "core": pa.array(np.full(rem.num_rows, k, np.int64)),
            })

        parts.append(deg.map_batches(
            split, batch_format="pyarrow").materialize())
        surv = deg.map_batches(
            lambda t, k=k: t.filter(
                pc.greater(t["degree"], pa.scalar(k, pa.int64()))),
            batch_format="pyarrow", num_cpus=1,
        ).materialize()
        if surv.count() == 0:
            break
        cur = semi_join(
            semi_join(cur, surv, left_key="src", right_key="v",
                      strategy=strategy),
            surv, left_key="dst", right_key="v", strategy=strategy,
        ).materialize()
        # survivors with no remaining edge have degree 0 in the new
        # subgraph but must still peel: rebuild the degree table over
        # the SURVIVOR set (left join via a second pass)
        from pgd_ray.stages.joins import anti_join

        newdeg = degree_table(cur).materialize()
        zero = anti_join(
            surv.select_columns(["v"]), newdeg,
            left_key="v", right_key="v", strategy=strategy,
        ).map_batches(
            lambda t: t.append_column(
                "degree", pa.array(np.zeros(t.num_rows, np.int64))),
            batch_format="pyarrow", num_cpus=1,
        )
        deg = newdeg.union(zero).materialize()
        k = max(k, int(deg.min("degree")))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out
