"""Iterative vertex-program engines: PageRank, connected components,
label propagation, k-core — the north-rule extensions (SURVEY.md D5).

Unified "CSR pull" model: the adjacency lives in the object store (one
``ray.put``; zero-copy views in every worker — on a multi-node cluster
Ray replicates the buffers once per node), the per-vertex state vector
is re-broadcast each round, and degree-volume-balanced vertex ranges
are processed in parallel with pure numpy segment reductions.  The
all-to-all shuffle happened once at CSR build time instead of once per
iteration (SURVEY.md §4.2).

Two executors share the same per-block program kernels:

* ``engine="actors"`` (default): a persistent ``@ray.remote`` worker
  pool created once and driven for all rounds.  This is the one spot
  where the raw actor API is genuinely needed — a Dataset
  ``map_batches`` actor pool is torn down when its execution finishes,
  which would pay pool construction + planner startup (~1-2 s) per
  round; a 100-round PageRank would spend 99 % of its time in setup.
* ``engine="dataset"``: one ``map_batches`` pass per round over a
  block Dataset — the pure-Dataset formulation; the right choice when
  a single round is minutes long (massive graphs) and setup amortizes.

Skew mitigation: vertex ranges are split by equal ADJACENCY VOLUME
(cumulative degree), not vertex count, so hub-heavy ranges don't
straggle — the distributed analogue of the reference's degree-ordered
dynamic scheduling (graphlet_core.cpp:853-867).

Checkpointing (north rule: "resumable from checkpoint with
per-partition lineage + metrics"): every ``checkpoint_every`` rounds
the state vector is written atomically (tmp + rename) with a lineage
manifest (iteration, block boundaries, per-round metrics);
``resume=True`` continues from the newest manifest and converges to
the same result as an uninterrupted run (verified in tests).
"""

from __future__ import annotations

import json
import time
from pathlib import Path

import numpy as np
import pyarrow as pa
import ray
import ray.data

from pgd_ray.graph.csr import CSRGraph


# --------------------------------------------------------------------
# segment reductions (empty-segment safe)
# --------------------------------------------------------------------

def _seg_sum(vals: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Per-segment sum via compacted ``reduceat`` — one pass over
    ``vals`` (a cumsum-diff costs ~4 memory passes, and the PageRank
    round is bandwidth-bound).  Empty segments get 0 (reduceat's
    empty-slot quirk avoided by boundary compaction)."""
    out = np.zeros(len(idx) - 1, dtype=np.float64)
    if not vals.size:
        return out
    lens = idx[1:] - idx[:-1]
    nonempty = lens > 0
    out[nonempty] = np.add.reduceat(vals, idx[:-1][nonempty])
    return out


def _seg_lens(idx: np.ndarray) -> np.ndarray:
    return idx[1:] - idx[:-1]


def _seg_ids(idx: np.ndarray) -> np.ndarray:
    return np.repeat(np.arange(len(idx) - 1), _seg_lens(idx))


def _seg_min(vals: np.ndarray, idx: np.ndarray, empty_fill: np.ndarray) -> np.ndarray:
    out = empty_fill.copy()
    lens = _seg_lens(idx)
    nonempty = lens > 0
    if vals.size and nonempty.any():
        out[nonempty] = np.minimum.reduceat(vals, idx[:-1][nonempty])
    return out


# --------------------------------------------------------------------
# per-block vertex programs (shared by both executors)
# --------------------------------------------------------------------

def _run_block(program, indptr, indices, state, extras, precomp, vlo, vhi):
    idx = indptr[vlo : vhi + 1] - indptr[vlo]
    gathered = indices[indptr[vlo] : indptr[vhi]]
    if program == "pagerank":
        # new[v] = base + α·Σ_{u∈N(v)} score[u]/deg[u]
        return extras["base"] + extras["alpha"] * _seg_sum(precomp[gathered], idx)
    if program == "cc":
        own = state[vlo:vhi]
        return np.minimum(own, _seg_min(state[gathered], idx, own))
    if program == "lp":
        return _lp_block(state, gathered, idx, vlo, vhi)
    if program == "kcore":
        return _kcore_block(state, gathered, idx, vlo, vhi)
    raise ValueError(program)


def _lp_block(state, gathered, idx, vlo, vhi):
    """Mode of neighbor labels, ties → smallest label."""
    out = state[vlo:vhi].copy()
    vals = state[gathered]
    if not vals.size:
        return out
    seg = _seg_ids(idx)
    order = np.lexsort((vals, seg))
    sseg, svals = seg[order], vals[order]
    new_run = np.empty(len(svals), dtype=bool)
    new_run[0] = True
    new_run[1:] = (sseg[1:] != sseg[:-1]) | (svals[1:] != svals[:-1])
    run_start = np.flatnonzero(new_run)
    run_seg = sseg[run_start]
    run_label = svals[run_start]
    run_cnt = np.diff(np.append(run_start, len(svals)))
    sel = np.lexsort((run_label, -run_cnt, run_seg))
    first = np.flatnonzero(
        np.concatenate(([True], run_seg[sel][1:] != run_seg[sel][:-1]))
    )
    out[run_seg[sel][first]] = run_label[sel][first]
    return out


def _kcore_block(state, gathered, idx, vlo, vhi):
    """h-index of neighbor values (H-operator; fixpoint = coreness,
    Lü et al. 2016), replacing the reference's sequential bucket
    peeling (graphlet_core.cpp:958-1018) with a parallel round loop."""
    vals = state[gathered]
    if not vals.size:
        return np.zeros(vhi - vlo, dtype=state.dtype)
    seg = _seg_ids(idx)
    order = np.lexsort((-vals, seg))
    svals = vals[order]
    pos = np.arange(len(svals)) - np.repeat(idx[:-1], _seg_lens(idx))
    hit = (svals >= pos + 1).astype(np.float64)
    return _seg_sum(hit, idx).astype(state.dtype)


def _precompute(program, indptr, state, extras):
    if program == "pagerank":
        return state / np.maximum(np.diff(indptr), 1)
    return None


# --------------------------------------------------------------------
# executor 1: persistent actor pool (default)
# --------------------------------------------------------------------

@ray.remote
class _PullWorker:
    """Holds zero-copy CSR views for the whole run; one ``step`` call
    processes this round's assigned vertex ranges.  ObjectRefs passed
    as top-level args are auto-resolved by Ray to plasma-backed
    read-only views — no copies."""

    def __init__(self, indptr, indices):
        self.indptr = indptr
        self.indices = indices

    def ping(self):
        return True

    def step(self, program, state, extras, blocks):
        precomp = _precompute(program, self.indptr, state, extras)
        return [
            (vlo, _run_block(program, self.indptr, self.indices, state, extras, precomp, vlo, vhi))
            for vlo, vhi in blocks
        ]


# --------------------------------------------------------------------
# executor 2: Dataset map_batches per round
# --------------------------------------------------------------------

class _PullBlockStage:
    def __init__(self, indptr_ref, indices_ref, state_ref, program, extras):
        self.indptr = ray.get(indptr_ref)
        self.indices = ray.get(indices_ref)
        self.state = ray.get(state_ref)
        self.program = program
        self.extras = extras
        self.precomp = _precompute(program, self.indptr, self.state, extras)

    def __call__(self, batch: pa.Table) -> pa.Table:
        vlo = int(batch["vlo"][0].as_py())
        vhi = int(batch["vhi"][0].as_py())
        new = _run_block(
            self.program, self.indptr, self.indices, self.state, self.extras,
            self.precomp, vlo, vhi,
        )
        return pa.table(
            {
                "vlo": pa.array([vlo], pa.int64()),
                "values": pa.array([new], pa.large_list(pa.from_numpy_dtype(new.dtype))),
            }
        )


def worker_pool(csr: CSRGraph, n_workers: int) -> list:
    """Spawn a persistent _PullWorker pool for a CSR.  Pass the result
    as ``workers=`` to several IterativeEngine runs (PageRank → CC →
    k-core on the same graph) to pay actor startup once; caller kills
    the actors (ray.kill) when done."""
    indptr_ref, indices_ref = csr.put32()
    pool = [_PullWorker.remote(indptr_ref, indices_ref) for _ in range(max(1, n_workers))]
    ray.get([w.ping.remote() for w in pool])  # force startup now, not in round 1
    return pool


def kill_pool(workers: list) -> None:
    for w in workers:
        ray.kill(w)


# --------------------------------------------------------------------
# driver-side harness
# --------------------------------------------------------------------

def _volume_blocks(csr: CSRGraph, n_blocks: int) -> list[tuple[int, int]]:
    """Split [0,n) into ranges of ~equal adjacency volume (cumdeg)."""
    n = csr.n
    if n == 0:
        return []
    n_blocks = max(1, min(n_blocks, n))
    targets = np.linspace(0, csr.indptr[-1], n_blocks + 1)
    bounds = np.searchsorted(csr.indptr, targets)
    bounds[0], bounds[-1] = 0, n
    bounds = np.unique(bounds)
    return [(int(a), int(b)) for a, b in zip(bounds[:-1], bounds[1:]) if b > a]


class IterativeEngine:
    """Round-loop harness shared by all four vertex programs."""

    def __init__(
        self,
        csr: CSRGraph,
        program: str,
        n_workers: int = 8,
        blocks_per_worker: int = 4,
        engine: str = "actors",
        checkpoint_dir: str | Path | None = None,
        checkpoint_every: int = 5,
        workers: list | None = None,
    ):
        self.csr = csr
        self.program = program
        self.engine = engine
        self.n_workers = max(1, n_workers)
        self.blocks = _volume_blocks(csr, self.n_workers * blocks_per_worker)
        self.checkpoint_dir = Path(checkpoint_dir) if checkpoint_dir else None
        self.checkpoint_every = checkpoint_every
        self.metrics: list[dict] = []
        self._refs = csr.put32()
        self._workers = workers  # shared pool (pool spawn ~seconds; amortize
        self._owns_workers = workers is None  # it across engines, see worker_pool)
        self._block_ds = None

    def _ensure_workers(self):
        if self._workers is None:
            self._workers = worker_pool(self.csr, min(self.n_workers, max(1, len(self.blocks))))

    def close(self):
        if self._workers and self._owns_workers:
            for w in self._workers:
                ray.kill(w)
            self._workers = None

    def _one_round(self, state: np.ndarray, extras: dict) -> np.ndarray:
        state_ref = ray.put(state)
        new = np.empty_like(state)
        if self.engine == "actors":
            self._ensure_workers()
            k = len(self._workers)
            futs = [
                w.step.remote(self.program, state_ref, extras, self.blocks[i::k])
                for i, w in enumerate(self._workers)
            ]
            for res in ray.get(futs):
                for vlo, vals in res:
                    new[vlo : vlo + len(vals)] = vals
        else:
            if self._block_ds is None:
                self._block_ds = ray.data.from_items(
                    [{"vlo": a, "vhi": b} for a, b in self.blocks]
                ).materialize()
            indptr_ref, indices_ref = self._refs
            out = self._block_ds.map_batches(
                _PullBlockStage,
                fn_constructor_kwargs={
                    "indptr_ref": indptr_ref,
                    "indices_ref": indices_ref,
                    "state_ref": state_ref,
                    "program": self.program,
                    "extras": extras,
                },
                batch_format="pyarrow",
                batch_size=1,
                concurrency=(1, self.n_workers),
                num_cpus=1,
            )
            for b in out.iter_batches(batch_size=256, batch_format="pyarrow"):
                vlos = b["vlo"].to_numpy(zero_copy_only=False)
                col = b["values"]
                for i, vlo in enumerate(vlos):
                    vals = np.asarray(col[i].values)
                    new[vlo : vlo + len(vals)] = vals
        return new

    # -- checkpoint / resume (atomic write + lineage manifest) --------
    def _save(self, state: np.ndarray, iteration: int) -> None:
        d = self.checkpoint_dir
        if d is None:
            return
        d.mkdir(parents=True, exist_ok=True)
        tmp = d / f".state_{iteration:06d}.npy.tmp"
        with open(tmp, "wb") as f:
            np.save(f, state)
        tmp.rename(d / f"state_{iteration:06d}.npy")
        manifest = {
            "program": self.program,
            "iteration": iteration,
            "n": self.csr.n,
            "m": self.csr.m,
            "blocks": self.blocks,
            "metrics": self.metrics,
        }
        mt = d / ".manifest.json.tmp"
        mt.write_text(json.dumps(manifest))
        mt.rename(d / "manifest.json")

    def _load(self) -> tuple[np.ndarray, int] | None:
        d = self.checkpoint_dir
        if d is None or not (d / "manifest.json").exists():
            return None
        manifest = json.loads((d / "manifest.json").read_text())
        if manifest["program"] != self.program or manifest["n"] != self.csr.n:
            return None
        it = manifest["iteration"]
        f = d / f"state_{it:06d}.npy"
        if not f.exists():
            return None
        self.metrics = manifest.get("metrics", [])
        return np.load(f), it

    def run(
        self,
        init: np.ndarray,
        extras_fn,
        converged_fn,
        max_iter: int,
        resume: bool = False,
    ) -> tuple[np.ndarray, int]:
        state, start = init, 0
        if resume:
            loaded = self._load()
            if loaded is not None:
                state, start = loaded
        if not self.blocks:
            return state, 0
        try:
            for it in range(start, max_iter):
                t0 = time.perf_counter()
                new = self._one_round(state, extras_fn(state))
                delta = (
                    float(np.max(np.abs(new.astype(np.float64) - state.astype(np.float64))))
                    if len(new)
                    else 0.0
                )
                self.metrics.append(
                    {
                        "iteration": it + 1,
                        "delta": delta,
                        "sec": round(time.perf_counter() - t0, 4),
                    }
                )
                state = new
                if self.checkpoint_dir and (it + 1) % self.checkpoint_every == 0:
                    self._save(state, it + 1)
                if converged_fn(delta):
                    break
            if self.checkpoint_dir:
                self._save(state, self.metrics[-1]["iteration"] if self.metrics else 0)
        finally:
            self.close()
        return state, (self.metrics[-1]["iteration"] if self.metrics else 0)


# --------------------------------------------------------------------
# public entry points
# --------------------------------------------------------------------

def pagerank(
    csr: CSRGraph,
    alpha: float = 0.85,
    tol: float = 1e-10,
    max_iter: int = 200,
    checkpoint_dir=None,
    resume: bool = False,
    n_workers: int = 8,
    engine: str = "actors",
    workers: list | None = None,
) -> np.ndarray:
    """PageRank over the undirected graph (out-degree = degree),
    uniform teleport, dangling mass redistributed uniformly.  Matches
    the dense numpy reference within allclose(1e-6) at convergence."""
    n = csr.n
    if n == 0:
        return np.array([])
    deg = csr.degrees()
    dangling_mask = deg == 0
    eng = IterativeEngine(
        csr, "pagerank", n_workers=n_workers, engine=engine,
        checkpoint_dir=checkpoint_dir, workers=workers,
    )

    def extras(state):
        dangling = float(state[dangling_mask].sum()) if dangling_mask.any() else 0.0
        return {"alpha": alpha, "base": (1.0 - alpha) / n + alpha * dangling / n}

    state, _ = eng.run(
        np.full(n, 1.0 / n), extras, lambda d: d < tol, max_iter, resume=resume
    )
    return state


def connected_components(
    csr: CSRGraph, max_iter: int = 10_000, checkpoint_dir=None, resume=False,
    n_workers: int = 8, engine: str = "actors", workers: list | None = None,
) -> np.ndarray:
    """Min-label propagation; converges in O(diameter) rounds; the
    component id is the smallest vertex id in the component."""
    eng = IterativeEngine(csr, "cc", n_workers=n_workers, engine=engine,
                          checkpoint_dir=checkpoint_dir, workers=workers)
    state, _ = eng.run(
        np.arange(csr.n, dtype=np.int64), lambda s: {}, lambda d: d == 0.0, max_iter,
        resume=resume,
    )
    return state


def label_propagation(
    csr: CSRGraph, max_iter: int = 20, checkpoint_dir=None, resume=False,
    n_workers: int = 8, engine: str = "actors", workers: list | None = None,
) -> np.ndarray:
    """Synchronous community label propagation: each round every vertex
    adopts the most frequent neighbor label (ties → smallest label).
    Deterministic; stops early at a fixpoint (oscillation bounded by
    max_iter).  Isolated vertices keep their own label."""
    eng = IterativeEngine(csr, "lp", n_workers=n_workers, engine=engine,
                          checkpoint_dir=checkpoint_dir, workers=workers)
    state, _ = eng.run(
        np.arange(csr.n, dtype=np.int64), lambda s: {}, lambda d: d == 0.0, max_iter,
        resume=resume,
    )
    return state


def kcore(
    csr: CSRGraph, max_iter: int = 10_000, checkpoint_dir=None, resume=False,
    n_workers: int = 8, engine: str = "actors", workers: list | None = None,
) -> np.ndarray:
    """Exact core numbers via the iterated neighborhood h-index
    (fixpoint = coreness), matching the reference's bucket peeling
    (graphlet_core.cpp:958-1018) without its sequential order."""
    eng = IterativeEngine(csr, "kcore", n_workers=n_workers, engine=engine,
                          checkpoint_dir=checkpoint_dir, workers=workers)
    state, _ = eng.run(
        csr.degrees().astype(np.int64), lambda s: {}, lambda d: d == 0.0, max_iter,
        resume=resume,
    )
    return state


def max_core(csr: CSRGraph) -> int:
    k = kcore(csr)
    return int(k.max()) if len(k) else 0
