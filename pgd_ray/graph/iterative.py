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


def _seg_max(vals: np.ndarray, idx: np.ndarray, empty: int) -> np.ndarray:
    out = np.full(len(idx) - 1, empty, dtype=np.int64)
    lens = _seg_lens(idx)
    nonempty = lens > 0
    if vals.size and nonempty.any():
        out[nonempty] = np.maximum.reduceat(vals, idx[:-1][nonempty])
    return out


def _seg_mex(vals: np.ndarray, idx: np.ndarray) -> np.ndarray:
    """Per-segment mex (minimum excluded non-negative integer) of the
    NON-NEGATIVE entries of ``vals``: sort-dedupe the (segment, value)
    pairs, rank within segment, and take the first rank whose value
    disagrees — fully vectorized."""
    n_seg = len(idx) - 1
    out = np.zeros(n_seg, dtype=np.int64)
    mask = vals >= 0
    if not mask.any():
        return out
    seg = _seg_ids(idx)[mask]
    col = vals[mask].astype(np.int64)
    order = np.lexsort((col, seg))
    s2, c2 = seg[order], col[order]
    keep = np.concatenate(([True], (s2[1:] != s2[:-1]) | (c2[1:] != c2[:-1])))
    s3, c3 = s2[keep], c2[keep]
    starts = np.concatenate(([0], np.flatnonzero(s3[1:] != s3[:-1]) + 1))
    lens = np.diff(np.append(starts, len(s3)))
    rank = np.arange(len(s3)) - np.repeat(starts, lens)
    seg_mex = lens.copy()  # no gap → mex = count of distinct colors
    mism = c3 != rank
    if mism.any():
        segidx = np.repeat(np.arange(len(starts)), lens)
        first_seg, first_at = np.unique(segidx[mism], return_index=True)
        seg_mex[first_seg] = rank[mism][first_at]
    out[s3[starts]] = seg_mex
    return out


# MIS (Luby) state codes: -2 = IN the independent set, -1 = OUT
# (dominated), >= 0 = undecided, carrying THIS round's priority.
_MIS_IN, _MIS_OUT = -2, -1
_MIS_C = np.uint64(0xA24BAED4963EE407)

# Brandes forward pack: dist in bits 48..62 (sentinel 0x7FFF keeps the
# int64 sign bit clear), sigma in bits 0..47.
_BR_UNSET = np.int64(0x7FFF)
_BR_SIG_MASK = np.int64((1 << 48) - 1)


def _mis_priority(ids: np.ndarray, rnd: int) -> np.ndarray:
    """Round-r priority of each vertex: splitmix64(v XOR r·C) >> 1 —
    a bijection of v within a round, so priorities are DISTINCT
    (no ties to break) yet change every round (Luby's fresh coins)."""
    from pgd_ray.text.hashing import splitmix64

    h = splitmix64(ids.astype(np.uint64) ^ (np.uint64(rnd) * _MIS_C))
    return (h >> np.uint64(1)).astype(np.int64)


# --------------------------------------------------------------------
# per-block vertex programs (shared by both executors)
# --------------------------------------------------------------------

def _run_block(program, indptr, indices, state, extras, precomp, vlo, vhi,
               weights=None):
    idx = indptr[vlo : vhi + 1] - indptr[vlo]
    gathered = indices[indptr[vlo] : indptr[vhi]]
    if program in ("pagerank", "ppr"):
        return _apply_program(program, state[vlo:vhi], precomp[gathered], idx, extras, vlo)
    if program == "sssp":
        # weighted relaxation: the neighbor value is dist[u] + w(u→v),
        # with w aligned to the edge SLOT (same slice as `gathered`)
        vals = state[gathered] + weights[indptr[vlo] : indptr[vhi]]
        return _apply_program(program, state[vlo:vhi], vals, idx, extras, vlo)
    return _apply_program(program, state[vlo:vhi], state[gathered], idx, extras, vlo)


def _apply_program(program, own, vals, idx, extras, vlo=0):
    """One vertex-program round for a contiguous range, given the
    range's PRE-GATHERED neighbor values (``vals`` in CSR index order
    — summation order is therefore identical no matter how the values
    were fetched, which is what makes the sharded engine bit-identical
    to the broadcast one).  ``vlo`` is the range's global offset, for
    programs whose update references a global vertex id (ppr seed)."""
    if program == "pagerank":
        # new[v] = base + α·Σ_{u∈N(v)} score[u]/deg[u]
        return extras["base"] + extras["alpha"] * _seg_sum(vals, idx)
    if program == "ppr":
        # personalized PageRank, preference vector e_seed: teleport and
        # dangling mass land on the seed vertex instead of uniformly
        out = extras["alpha"] * _seg_sum(vals, idx)
        s = extras["seed"] - vlo
        if 0 <= s < len(out):
            out[s] += extras["seed_mass"]
        return out
    if program == "eigcen":
        # power iteration for the principal eigenvector: the stored
        # state is the UN-normalized y_t; inv_norm = 1/||y_{t-1}||
        # comes from extras (full-state norm in the broadcast engines,
        # Σ per-shard sumsq stats in the sharded one — the scalar's
        # summation order differs, so cross-engine equality is
        # allclose-level, unlike the integer programs)
        return extras["inv_norm"] * _seg_sum(vals, idx)
    if program == "katz":
        # Katz centrality, Jacobi form: x ← β·1 + α·A·x.  Raw neighbor
        # state (no degree scaling), constant extras — works unchanged
        # on both the broadcast and the sharded executor.
        return extras["beta"] + extras["alpha"] * _seg_sum(vals, idx)
    if program == "fiedler":
        # one deflated power-iteration round on M = cI - L (c = Δ+1
        # keeps M PSD; L = D - A): the stored state is the
        # un-normalized y_t, extras carry the global mean / centered
        # inv-norm of y_{t-1} (centering deflates the constant
        # eigenvector, so the iteration converges to the Fiedler
        # direction).  With z = (y - mu)·inv_norm the update is
        # (c - deg)·z_own + Σ_{u∈N(v)} z_u, and Σ z_u folds the affine
        # shift through the plain neighbor sum.
        nrm = extras["nrm"]
        mu = extras["mu"]
        deg = np.diff(idx).astype(np.float64)
        # element-wise centering/scaling BEFORE the gather-sum — the
        # exact expression shape the SQL mirror evaluates, so parity
        # is ulp-level, not just algebraic
        zown = (own - mu) / nrm if nrm > 0 else np.zeros_like(own)
        zv = (vals - mu) / nrm if nrm > 0 else np.zeros_like(vals)
        return (extras["c"] - deg) * zown + _seg_sum(zv, idx)
    if program == "cc":
        return np.minimum(own, _seg_min(vals, idx, own))
    if program == "sssp":
        # Bellman-Ford synchronous relaxation (vals already carry the
        # per-edge weight; see _run_block): dist[v] = min(dist[v],
        # min_u dist[u] + w)
        return np.minimum(own, _seg_min(vals, idx, own))
    if program == "bfs":
        # frontier relaxation: dist[v] = min(dist[v], 1 + min_{u∈N(v)} dist[u]);
        # the unreached sentinel is n (> any real distance), so empty
        # neighborhoods fall back to min(own, own+1) = own
        return np.minimum(own, _seg_min(vals, idx, own) + 1)
    if program == "anf":
        # HyperANF round (Boldi-Rosa-Vigna 2011): the per-vertex ball
        # sketch is 8 HLL registers (6 bits each) PACKED in one int64;
        # merge = lane-wise max over self ∪ neighbors.  Monotone and
        # bounded → fixpoint in ≤ diameter rounds.
        new = np.zeros_like(own)
        for lane in range(8):
            sh = np.int64(6 * lane)
            ol = (own >> sh) & 63
            nl = _seg_max((vals >> sh) & 63, idx, 0)
            new |= np.maximum(ol, nl) << sh
        return new
    if program == "color":
        # one Jones-Plassmann round: codes ≥ 0 are final colors;
        # code < 0 is an uncolored vertex carrying the STATIC priority
        # -(p+1) (distinct, bijective hash of v — more negative =
        # higher priority).  An uncolored vertex colors itself iff it
        # out-prioritizes every uncolored neighbor; its color is the
        # mex of the already-colored neighbors' colors, so adjacent
        # winners are impossible and the coloring is proper with
        # ≤ Δ+1 colors.
        und = own < 0
        minneg = _seg_min(np.where(vals < 0, vals, 0), idx,
                          np.zeros(len(own), dtype=own.dtype))
        win = und & (own < minneg)
        if not win.any():
            return own.copy()
        new = own.copy()
        new[win] = _seg_mex(vals, idx)[win]
        return new
    if program == "mis":
        # one Luby round: an undecided vertex joins the set iff its
        # priority beats every undecided neighbor's (distinct within a
        # round, so two adjacent vertices can never both join); a
        # neighbor of an IN vertex drops OUT; survivors redraw their
        # priority for round r+1.  extras["round"] = r (0-based).
        und = own >= 0
        has_in = _seg_max((vals == _MIS_IN).astype(np.int64), idx, 0) > 0
        maxp = _seg_max(np.where(vals >= 0, vals, -1), idx, -1)
        ids = vlo + np.arange(len(own), dtype=np.int64)
        new = own.copy()
        new[und & has_in] = _MIS_OUT
        win = und & ~has_in & (own > maxp)
        new[win] = _MIS_IN
        rest = und & ~has_in & ~win
        if rest.any():
            new[rest] = _mis_priority(ids[rest], extras["round"] + 1)
        return new
    if program == "brandes_fwd":
        # level-synchronous BFS with shortest-path counting (Brandes
        # 2001, forward phase).  State packs dist (15 bits, sentinel
        # _BR_UNSET) and sigma (48 bits) in one int64; round r
        # finalizes level r: a still-unreached vertex whose neighbors
        # include level-(r-1) vertices gets dist=r and sigma = the sum
        # of their sigmas (all final since round r-1).
        r = np.int64(extras["round"])
        own_d = own >> np.int64(48)
        vd = vals >> np.int64(48)
        contrib = np.where(vd == r - 1, vals & _BR_SIG_MASK, np.int64(0))
        ssum = _seg_sum(contrib, idx)
        newly = (own_d == _BR_UNSET) & (ssum > 0)
        if not newly.any():
            return own.copy()
        s64 = ssum[newly].astype(np.int64)
        if (s64 >= _BR_SIG_MASK).any():
            raise OverflowError("sigma exceeds the 48-bit pack")
        new = own.copy()
        new[newly] = (r << np.int64(48)) | s64
        return new
    if program == "brandes_bwd":
        # Brandes backward phase in x-form: x[v] = (1+delta[v])/sigma[v],
        # so delta[v] = sigma_v * sum over successors of x[w] follows
        # from gathering PLAIN neighbor state — x is nonzero only for
        # deeper levels (processed in earlier rounds), which makes the
        # successor filter implicit.  extras carry dist/sigma as
        # ObjectRefs (put once per seed, resolved zero-copy here).
        dist = extras["dist"]
        sigma = extras["sigma"]
        if isinstance(dist, ray.ObjectRef):
            dist = ray.get(dist)
        if isinstance(sigma, ray.ObjectRef):
            sigma = ray.get(sigma)
        lvl = extras["level"]
        own_d = dist[vlo:vlo + len(own)]
        at = own_d == lvl
        if not at.any():
            return own.copy()
        own_sig = sigma[vlo:vlo + len(own)]
        ssum = _seg_sum(vals, idx)
        new = own.copy()
        new[at] = (1.0 + own_sig[at] * ssum[at]) / own_sig[at]
        return new
    if program == "lp":
        return _lp_vals(own, vals, idx)
    if program == "kcore":
        return _kcore_vals(own, vals, idx)
    raise ValueError(program)


def _lp_vals(own, vals, idx):
    """Mode of neighbor labels, ties → smallest label."""
    out = own.copy()
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


def _kcore_vals(own, vals, idx):
    """h-index of neighbor values (H-operator; fixpoint = coreness,
    Lü et al. 2016), replacing the reference's sequential bucket
    peeling (graphlet_core.cpp:958-1018) with a parallel round loop."""
    if not vals.size:
        return np.zeros(len(own), dtype=own.dtype)
    seg = _seg_ids(idx)
    order = np.lexsort((-vals, seg))
    svals = vals[order]
    pos = np.arange(len(svals)) - np.repeat(idx[:-1], _seg_lens(idx))
    hit = (svals >= pos + 1).astype(np.float64)
    return _seg_sum(hit, idx).astype(own.dtype)


def _precompute(program, indptr, state, extras):
    if program in ("pagerank", "ppr"):
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

    def __init__(self, indptr, indices, weights=None):
        self.indptr = indptr
        self.indices = indices
        self.weights = weights  # per-edge-slot array (sssp only)

    def ping(self):
        return True

    def step(self, program, state, extras, blocks):
        precomp = _precompute(program, self.indptr, state, extras)
        return [
            (vlo, _run_block(program, self.indptr, self.indices, state,
                             extras, precomp, vlo, vhi,
                             weights=self.weights))
            for vlo, vhi in blocks
        ]


# --------------------------------------------------------------------
# executor 3: sharded state (no per-round O(n) broadcast)
# --------------------------------------------------------------------

@ray.remote
class _ShardWorker:
    """Owns one vertex range's adjacency fragment AND its slice of the
    state vector.  Per round it pulls only the state slices of the
    ranges its neighbor set touches (refs exchanged through the
    driver: O(#ranges) refs per round, never O(n) data).  Gathered
    values are scattered back into CSR index order before the segment
    reduction, so results are BIT-identical to the broadcast engine.

    Scale story: the broadcast engines re-ship an O(n) state vector
    every round; beyond ~1e9 vertices that per-round broadcast is the
    bottleneck (SCALE.md).  Here per-round traffic per worker is
    Σ|touched slices| ≤ n/P × #touched, and each worker can load its
    adjacency from a RangeCSR fragment file instead of the broadcast
    arrays (``fragment_path``), so no process ever holds the full
    graph."""

    def __init__(self, bounds, rid, indptr_ref=None, indices_ref=None,
                 fragment_path=None):
        bounds = np.asarray(bounds, dtype=np.int64)
        self.rid = rid
        self.vlo, self.vhi = int(bounds[rid]), int(bounds[rid + 1])
        if fragment_path is not None:
            from pgd_ray.graph.block_csr import _read_fragment

            if isinstance(fragment_path, (list, tuple)):
                # grouped ranges: [(v_lo, v_hi, path|None), ...] of
                # CONTIGUOUS source ranges — concatenate their local
                # (indptr, indices) into one range-local CSR.  Reading
                # only this worker's fragment files (vs mapping the
                # full broadcast arrays) keeps per-worker I/O at
                # O(m/P) and avoids the 32-way concurrent page-fault
                # storm on the shared 2m-entry indices object.
                ptrs, idxs, base = [np.zeros(1, np.int64)], [], 0
                for f_lo, f_hi, p in fragment_path:
                    if p is None:
                        ptrs.append(np.full(f_hi - f_lo, base, np.int64))
                        continue
                    _, _, fptr, fidx = _read_fragment(p)
                    ptrs.append(fptr[1:] + base)
                    idxs.append(fidx)
                    base += len(fidx)
                indptr = np.concatenate(ptrs)
                indices = (
                    np.concatenate(idxs) if idxs else np.empty(0, np.int64)
                )
            else:
                _, _, indptr, indices = _read_fragment(fragment_path)
            self.idx = indptr
            gathered = indices
        else:
            # top-level ObjectRef args are auto-resolved by Ray to
            # zero-copy plasma views; accept raw refs too (local use)
            indptr = ray.get(indptr_ref) if isinstance(indptr_ref, ray.ObjectRef) else indptr_ref
            indices = ray.get(indices_ref) if isinstance(indices_ref, ray.ObjectRef) else indices_ref
            self.idx = indptr[self.vlo : self.vhi + 1] - indptr[self.vlo]
            gathered = indices[indptr[self.vlo] : indptr[self.vhi]]
        self.deg_own = np.diff(self.idx)
        rid_of = np.searchsorted(bounds, gathered, side="right") - 1
        self.needed = [int(s) for s in np.unique(rid_of)]
        self.pos = {s: np.flatnonzero(rid_of == s) for s in self.needed}
        self.loc = {
            s: (gathered[self.pos[s]] - int(bounds[s])) for s in self.needed
        }
        self.n_gathered = len(gathered)
        self.state = None

    def meta(self):
        return self.needed

    def init_state(self, full_state_ref_or_arr):
        arr = full_state_ref_or_arr
        self.state = np.array(arr[self.vlo : self.vhi])
        return True

    @ray.method(num_returns=2)
    def emit(self, program):
        """(bundle, stats) for the CURRENT state — used to prime round
        0 and after a resume."""
        return self._bundle(program), self._stats(0.0)

    def _bundle(self, program):
        if program in ("pagerank", "ppr"):
            return self.state, self.state / np.maximum(self.deg_own, 1)
        return self.state, None

    def _stats(self, delta):
        if self.state.dtype.kind == "f":
            dang = float(self.state[self.deg_own == 0].sum())
            sumsq = float(self.state.astype(np.float64) @ self.state.astype(np.float64))
            ssum = float(self.state.astype(np.float64).sum())
        else:
            dang = sumsq = ssum = 0.0
        return {"delta": float(delta), "dangling": dang, "sumsq": sumsq,
                "sum": ssum}

    @ray.method(num_returns=2)
    def step(self, program, extras, *bundles):
        """One round: gather neighbor values from the needed slices,
        apply the vertex program, keep the new slice."""
        use_pre = program in ("pagerank", "ppr")
        if bundles:
            first = bundles[0][1] if use_pre else bundles[0][0]
            vals = np.empty(self.n_gathered, dtype=first.dtype)
            for s, bundle in zip(self.needed, bundles):
                sl = bundle[1] if use_pre else bundle[0]
                vals[self.pos[s]] = sl[self.loc[s]]
        else:  # range with no edges
            vals = np.empty(0, dtype=np.float64 if use_pre else self.state.dtype)
        new = _apply_program(program, self.state, vals, self.idx, extras, self.vlo)
        delta = (
            float(np.max(np.abs(new.astype(np.float64) - self.state.astype(np.float64))))
            if len(new)
            else 0.0
        )
        self.state = new
        return self._bundle(program), self._stats(delta)

    def get_state(self):
        return self.state


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


class ShardedPool:
    """Persistent ``_ShardWorker`` set for one graph — the sharded
    analogue of ``worker_pool``.  Construction pays actor spawn +
    adjacency attach + per-range gather-plan build ONCE; pass the pool
    as ``pool=`` to several ``IterativeEngine.run`` calls (or repeated
    timed runs) so per-run cost is just state init + rounds.  Caller
    kills the pool (``kill()``) when done."""

    def __init__(self, csr: CSRGraph, n_workers: int, range_csr=None):
        n = csr.n
        if range_csr is not None:
            rb = np.asarray(range_csr.bounds, dtype=np.int64)
            R = len(rb) - 1
            P = max(1, min(n_workers, R))
            nnz = np.array(
                [range_csr.nnz.get(r, 0) for r in range(R)], dtype=np.int64
            )
            cum = np.cumsum(nnz)
            total = int(cum[-1]) if R else 0
            cuts = np.searchsorted(cum, (np.arange(1, P) * total) // P) + 1
            cuts = np.unique(np.concatenate([[0], cuts, [R]]))
            bounds = rb[cuts]
            frag_groups = [
                [
                    (int(rb[r]), int(rb[r + 1]), range_csr.paths.get(r))
                    for r in range(cuts[g], cuts[g + 1])
                ]
                for g in range(len(cuts) - 1)
            ]
            self.workers = [
                _ShardWorker.remote(bounds, g, None, None, frag_groups[g])
                for g in range(len(bounds) - 1)
            ]
        else:
            blocks = _volume_blocks(csr, max(1, min(n_workers, max(n, 1))))
            bounds = np.array([b[0] for b in blocks] + [n], dtype=np.int64)
            refs = csr.put()
            self.workers = [
                _ShardWorker.remote(bounds, r, refs[0], refs[1], None)
                for r in range(len(bounds) - 1)
            ]
        self.bounds = bounds
        self.needed = ray.get([w.meta.remote() for w in self.workers])

    def kill(self) -> None:
        for w in self.workers:
            ray.kill(w)


def sharded_pool(csr: CSRGraph, n_workers: int, range_csr=None) -> ShardedPool:
    return ShardedPool(csr, n_workers, range_csr=range_csr)


def worker_pool(csr: CSRGraph, n_workers: int, weights_ref=None) -> list:
    """Spawn a persistent _PullWorker pool for a CSR.  Pass the result
    as ``workers=`` to several IterativeEngine runs (PageRank → CC →
    k-core on the same graph) to pay actor startup once; caller kills
    the actors (ray.kill) when done.  ``weights_ref`` (per-edge-slot
    array, aligned to csr.indices) is only needed for the weighted
    sssp program."""
    indptr_ref, indices_ref = csr.put32()
    pool = [_PullWorker.remote(indptr_ref, indices_ref, weights_ref)
            for _ in range(max(1, n_workers))]
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
        weights_ref=None,
    ):
        self.csr = csr
        self.program = program
        self.engine = engine
        self.weights_ref = weights_ref
        if program == "sssp" and engine != "actors":
            raise NotImplementedError(
                "sssp (per-edge weights) runs on the actor executor; "
                "the dataset/sharded executors carry vertex state only"
            )
        self.n_workers = max(1, n_workers)
        self.blocks = _volume_blocks(csr, self.n_workers * blocks_per_worker)
        self.checkpoint_dir = Path(checkpoint_dir) if checkpoint_dir else None
        self.checkpoint_every = checkpoint_every
        self.metrics: list[dict] = []
        self._refs = None  # lazily csr.put32() — only the dataset engine needs it
        self._workers = workers  # shared pool (pool spawn ~seconds; amortize
        self._owns_workers = workers is None  # it across engines, see worker_pool)
        self._block_ds = None

    def _ensure_workers(self):
        if self._workers is None:
            self._workers = worker_pool(
                self.csr, min(self.n_workers, max(1, len(self.blocks))),
                weights_ref=self.weights_ref)

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
            if self._refs is None:
                self._refs = self.csr.put32()
            indptr_ref, indices_ref = self._refs
            from pgd_ray.util import bound_cls

            out = self._block_ds.map_batches(
                bound_cls(_PullBlockStage,
                          indptr_ref=indptr_ref,
                          indices_ref=indices_ref,
                          state_ref=state_ref,
                          program=self.program,
                          extras=extras),
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

    def _run_sharded(
        self, init, extras_fn, converged_fn, max_iter, resume,
        extras_from_dangling=None, extras_from_stats=None,
        range_csr=None, pool=None,
    ) -> tuple[np.ndarray, int]:
        """Sharded-state rounds: each worker owns one vertex range's
        adjacency + state slice; per round only slice REFS move through
        the driver (O(#ranges)), the slices themselves are pulled
        worker-to-worker via plasma.  Results are bit-identical to the
        broadcast engines (same gather order per range; the dangling
        term is a per-slice partial sum, exactly 0.0 on graphs without
        isolated vertices)."""
        state, start = init, 0
        if resume:
            loaded = self._load()
            if loaded is not None:
                state, start = loaded
        n = self.csr.n
        if n == 0:
            return state, 0
        # NB: a block-built CSR carries its fragment manifest in
        # csr.range_csr; pass it as ``range_csr`` when workers must
        # not map the full broadcast arrays (the multi-node posture:
        # per-worker I/O stays O(m/P)).  On one box the plasma arrays
        # are shared pages, so the broadcast refs are FASTER to attach
        # (~2 s vs ~4-5 s of per-fragment parquet decode at m=2e7,
        # P=32) — hence opt-in, not automatic.  A caller-owned
        # ``pool`` (``sharded_pool``) skips worker construction
        # entirely and survives this run.
        owns_pool = pool is None
        if pool is None:
            pool = ShardedPool(self.csr, self.n_workers, range_csr=range_csr)
        workers, needed = pool.workers, pool.needed
        try:
            state_ref = ray.put(state)
            ray.get([w.init_state.remote(state_ref) for w in workers])
            ex = extras_fn(state)
            del state_ref
            pairs = [w.emit.remote(self.program) for w in workers]
            bundles = [p[0] for p in pairs]

            def gather():
                slices = ray.get([w.get_state.remote() for w in workers])
                return np.concatenate(slices) if slices else init

            it = start
            for it in range(start, max_iter):
                t0 = time.perf_counter()
                pairs = [
                    w.step.remote(
                        self.program, ex, *[bundles[s] for s in needed[r]]
                    )
                    for r, w in enumerate(workers)
                ]
                bundles = [p[0] for p in pairs]
                stats = ray.get([p[1] for p in pairs])
                delta = max((s["delta"] for s in stats), default=0.0)
                if extras_from_dangling is not None:
                    ex = extras_from_dangling(sum(s["dangling"] for s in stats))
                elif extras_from_stats is not None:
                    ex = extras_from_stats(stats)
                self.metrics.append(
                    {"iteration": it + 1, "delta": delta,
                     "sec": round(time.perf_counter() - t0, 4)}
                )
                if self.checkpoint_dir and (it + 1) % self.checkpoint_every == 0:
                    self._save(gather(), it + 1)
                if converged_fn(delta):
                    break
            out = gather()
            if self.checkpoint_dir:
                self._save(out, self.metrics[-1]["iteration"] if self.metrics else 0)
            return out, (self.metrics[-1]["iteration"] if self.metrics else 0)
        finally:
            if owns_pool:
                pool.kill()

    def run(
        self,
        init: np.ndarray,
        extras_fn,
        converged_fn,
        max_iter: int,
        resume: bool = False,
        extras_from_dangling=None,
        extras_from_stats=None,
        range_csr=None,
        pool=None,
    ) -> tuple[np.ndarray, int]:
        if self.engine == "sharded":
            return self._run_sharded(
                init, extras_fn, converged_fn, max_iter, resume,
                extras_from_dangling=extras_from_dangling,
                extras_from_stats=extras_from_stats, range_csr=range_csr,
                pool=pool,
            )
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

    def extras_from_dangling(d):
        return {"alpha": alpha, "base": (1.0 - alpha) / n + alpha * d / n}

    state, _ = eng.run(
        np.full(n, 1.0 / n), extras, lambda d: d < tol, max_iter, resume=resume,
        extras_from_dangling=extras_from_dangling,
    )
    return state


def personalized_pagerank(
    csr: CSRGraph,
    seed: int,
    alpha: float = 0.85,
    tol: float = 1e-10,
    max_iter: int = 200,
    checkpoint_dir=None,
    resume: bool = False,
    n_workers: int = 8,
    engine: str = "actors",
    workers: list | None = None,
) -> np.ndarray:
    """Personalized PageRank with preference vector e_seed: both the
    (1-α) teleport and the dangling mass land on ``seed`` instead of
    uniformly.  Same gather-scatter rounds as ``pagerank`` — only the
    base term differs — so all three executors and checkpoint/resume
    apply unchanged."""
    n = csr.n
    if n == 0:
        return np.array([])
    if not (0 <= seed < n):
        raise ValueError(f"seed {seed} outside [0, {n})")
    deg = csr.degrees()
    dangling_mask = deg == 0
    eng = IterativeEngine(
        csr, "ppr", n_workers=n_workers, engine=engine,
        checkpoint_dir=checkpoint_dir, workers=workers,
    )

    def extras(state):
        dangling = float(state[dangling_mask].sum()) if dangling_mask.any() else 0.0
        return {"alpha": alpha, "seed": int(seed),
                "seed_mass": (1.0 - alpha) + alpha * dangling}

    def extras_from_dangling(d):
        return {"alpha": alpha, "seed": int(seed),
                "seed_mass": (1.0 - alpha) + alpha * d}

    init = np.zeros(n)
    init[seed] = 1.0
    state, _ = eng.run(
        init, extras, lambda d: d < tol, max_iter, resume=resume,
        extras_from_dangling=extras_from_dangling,
    )
    return state


def eigenvector_centrality(
    csr: CSRGraph,
    iters: int = 64,
    checkpoint_dir=None,
    resume: bool = False,
    n_workers: int = 8,
    engine: str = "actors",
    workers: list | None = None,
) -> np.ndarray:
    """Principal-eigenvector centrality by power iteration: a FIXED
    number of rounds x̂_{t+1} = A·x̂_t / ‖A·x̂_t‖ from the uniform unit
    vector (fixed — not convergence-tested — so the result is a pure
    function of (graph, iters), mirrorable by a recursive-CTE oracle;
    on bipartite components the sequence oscillates with the sign of
    -λ, and a deterministic iteration count pins which limit is
    reported).  Degenerate to PageRank it is not: no teleport, no
    degree normalization — score mass concentrates on the densest
    subgraph.  Stored state is the un-normalized y_t = A·x̂_{t-1};
    the global norm reaches workers through ``extras`` (full-state
    norm in the broadcast engines, summed per-shard ``sumsq`` stats in
    the sharded one).  Returns the unit-normalized vector."""
    n = csr.n
    if n == 0:
        return np.array([])

    def inv_norm_of(sumsq: float) -> dict:
        return {"inv_norm": 1.0 / np.sqrt(sumsq) if sumsq > 0 else 0.0}

    eng = IterativeEngine(
        csr, "eigcen", n_workers=n_workers, engine=engine,
        checkpoint_dir=checkpoint_dir, workers=workers,
    )
    y, _ = eng.run(
        np.full(n, 1.0 / np.sqrt(n)),
        lambda s: inv_norm_of(float(s.astype(np.float64) @ s.astype(np.float64))),
        lambda d: False,
        iters,
        resume=resume,
        extras_from_stats=lambda stats: inv_norm_of(
            sum(s["sumsq"] for s in stats)
        ),
    )
    nrm = float(np.linalg.norm(y))
    return y / nrm if nrm > 0 else y


def fiedler_vector(
    csr: CSRGraph,
    iters: int = 64,
    n_workers: int = 8,
    engine: str = "actors",
    workers: list | None = None,
) -> np.ndarray:
    """Fiedler vector (algebraic-connectivity eigenvector, the
    spectral-bisection score) by FIXED-horizon deflated power
    iteration on M = (Δ+1)·I - L from the centered ramp start y_0[v]
    = v: each round normalizes and centers the previous state (the
    centering projects out L's constant kernel, so the iteration
    converges to the λ2 eigenvector), then applies M (the "fiedler"
    program — one neighbor-sum gather, degrees local from the CSR
    slice).  A pure function of (graph, iters), so the recursive-CTE
    oracle replays it; like eigencen the scalar mean/norm summation
    order is engine-specific, so cross-checks are round-9 level.
    Returns the centered unit vector (sign = whatever the
    deterministic iteration yields)."""
    n = csr.n
    if n == 0:
        return np.array([])
    c = float(int(csr.degrees().max()) + 1) if csr.m else 1.0

    def ext_of(ssum: float, sumsq: float) -> dict:
        mu = ssum / n
        css = sumsq - n * mu * mu
        return {"c": c, "mu": mu,
                "nrm": float(np.sqrt(css)) if css > 0 else 0.0}

    eng = IterativeEngine(csr, "fiedler", n_workers=n_workers,
                          engine=engine, workers=workers)
    y, _ = eng.run(
        np.arange(n, dtype=np.float64),
        lambda s: ext_of(float(s.astype(np.float64).sum()),
                         float(s.astype(np.float64) @ s.astype(np.float64))),
        lambda d: False,
        iters,
        extras_from_stats=lambda stats: ext_of(
            sum(s["sum"] for s in stats), sum(s["sumsq"] for s in stats)),
    )
    mu = float(y.sum()) / n
    css = float(y @ y) - n * mu * mu
    return (y - mu) / np.sqrt(css) if css > 0 else y - mu


def katz_centrality(
    csr: CSRGraph,
    alpha: float = 0.05,
    beta: float = 1.0,
    iters: int = 32,
    checkpoint_dir=None,
    resume: bool = False,
    n_workers: int = 8,
    engine: str = "actors",
    workers: list | None = None,
) -> np.ndarray:
    """Katz centrality by a FIXED number of Jacobi rounds
    x_{t+1} = β·1 + α·A·x_t from x_0 = β·1 (so the result is a pure
    function of (graph, α, β, iters), mirrorable by a recursive-CTE
    oracle; with α < 1/λ_max the sequence is the truncated Neumann
    series β·Σ_t α^t A^t 1).  Unlike PageRank there is no degree
    normalization and no teleport renormalization — a hub's score
    grows with raw neighborhood volume.  Constant extras, raw-state
    gather: runs unchanged on the broadcast and sharded executors."""
    n = csr.n
    if n == 0:
        return np.array([])
    eng = IterativeEngine(
        csr, "katz", n_workers=n_workers, engine=engine,
        checkpoint_dir=checkpoint_dir, workers=workers,
    )
    x, _ = eng.run(
        np.full(n, float(beta)),
        lambda s: {"alpha": float(alpha), "beta": float(beta)},
        lambda d: False,
        iters,
        resume=resume,
        extras_from_stats=lambda stats: {"alpha": float(alpha),
                                         "beta": float(beta)},
    )
    return x


def bfs_distances(
    csr: CSRGraph,
    sources,
    max_iter: int | None = None,
    checkpoint_dir=None,
    resume: bool = False,
    n_workers: int = 8,
    engine: str = "actors",
    workers: list | None = None,
) -> np.ndarray:
    """Unweighted shortest-path distance from the nearest of
    ``sources`` (multi-source BFS), as synchronous frontier relaxation
    rounds — converges in eccentricity(sources) rounds.  Unreachable
    vertices keep the sentinel ``n`` (callers usually filter or map it
    to -1).  Distances are exact regardless of block/shard boundaries:
    min-relaxation is confluent, like ``connected_components``."""
    n = csr.n
    if n == 0:
        return np.array([], dtype=np.int64)
    src = np.atleast_1d(np.asarray(sources, dtype=np.int64))
    if src.size == 0:
        raise ValueError("bfs_distances needs at least one source")
    if src.min() < 0 or src.max() >= n:
        raise ValueError(f"sources outside [0, {n})")
    eng = IterativeEngine(csr, "bfs", n_workers=n_workers, engine=engine,
                          checkpoint_dir=checkpoint_dir, workers=workers)
    init = np.full(n, n, dtype=np.int64)
    init[src] = 0
    state, _ = eng.run(
        init, lambda s: {}, lambda d: d == 0.0, max_iter or n, resume=resume,
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


def maximal_independent_set(
    csr: CSRGraph,
    max_iter: int = 64,
    n_workers: int = 8,
    engine: str = "actors",
    workers: list | None = None,
) -> np.ndarray:
    """Deterministic Luby MIS: boolean membership of a maximal
    independent set.  Each round every undecided vertex draws the
    priority splitmix64(v XOR r·C)>>1 (distinct within a round — a
    bijection of v) and joins iff it beats all undecided neighbors;
    neighbors of joined vertices drop out.  O(log n) rounds w.h.p.;
    the result is a pure function of the graph, so the SQL oracle
    replays it exactly.  Checkpoint/resume is not supported (the
    round counter seeds the coins)."""
    n = csr.n
    if n == 0:
        return np.array([], dtype=bool)
    eng = IterativeEngine(csr, "mis", n_workers=n_workers, engine=engine)
    rounds = iter(range(max_iter + 1))

    def extras(_state):
        return {"round": next(rounds)}

    def extras_from_stats(_stats):
        return {"round": next(rounds)}

    init = _mis_priority(np.arange(n, dtype=np.int64), 0)
    state, _ = eng.run(
        init, extras, lambda d: d == 0.0, max_iter,
        extras_from_stats=extras_from_stats,
    )
    if (state >= 0).any():
        raise RuntimeError(f"MIS did not converge in {max_iter} rounds")
    return state == _MIS_IN


def greedy_coloring(
    csr: CSRGraph,
    max_iter: int = 512,
    n_workers: int = 8,
    engine: str = "actors",
    workers: list | None = None,
) -> np.ndarray:
    """Deterministic Jones-Plassmann greedy coloring (Jones &
    Plassmann 1993): static priorities splitmix64(v)>>1 (distinct);
    each round every uncolored local-priority-maximum takes the mex of
    its colored neighbors' colors.  Proper coloring with ≤ Δ+1 colors,
    a pure function of the graph (SQL-replayable).  Rounds = length of
    the longest decreasing-priority path (O(log n) w.h.p. on bounded
    degree)."""
    n = csr.n
    if n == 0:
        return np.array([], dtype=np.int64)
    init = -(_mis_priority(np.arange(n, dtype=np.int64), 0) + 1)
    eng = IterativeEngine(csr, "color", n_workers=n_workers, engine=engine,
                          workers=workers)
    state, _ = eng.run(init, lambda s: {}, lambda d: d == 0.0, max_iter)
    if (state < 0).any():
        raise RuntimeError(f"coloring did not converge in {max_iter} rounds")
    return state


def anf_registers(
    csr: CSRGraph,
    rounds: int = 16,
    n_workers: int = 8,
    engine: str = "actors",
    workers: list | None = None,
) -> np.ndarray:
    """HyperANF neighborhood sketches: per vertex, 8 packed 6-bit HLL
    registers over the ball B_rounds(v) (Boldi, Rosa & Vigna 2011,
    "HyperANF: approximating the neighbourhood function of very large
    graphs").  Register init follows ``stages.cardinality``'s exact
    integer convention (splitmix64; bucket = top 3 bits, rho =
    61 − bitlen(low 61 bits) + 1), so the packed state is
    integer-deterministic and bit-exactly SQL-mirrorable.  Stops early
    at the fixpoint (≤ diameter rounds).  m = 8 registers keep the
    whole sketch in the engines' one-int64-per-vertex state — a coarse
    (σ ≈ 1.06/√8 ≈ 37 %) but honest estimator; at scale, widen by
    running R independent banks (vary the hash seed) and averaging."""
    n = csr.n
    if n == 0:
        return np.array([], dtype=np.int64)
    from pgd_ray.text.hashing import splitmix64

    h = splitmix64(np.arange(n, dtype=np.int64).astype(np.uint64))
    bucket = (h >> np.uint64(61)).astype(np.int64)
    w = h & np.uint64((1 << 61) - 1)
    rho = np.where(w == 0, 62, 61 - _bit_length_u64_local(w) + 1)
    init = rho.astype(np.int64) << (6 * bucket)
    eng = IterativeEngine(csr, "anf", n_workers=n_workers, engine=engine,
                          workers=workers)
    state, _ = eng.run(init, lambda s: {}, lambda d: d == 0.0, rounds)
    return state


def _bit_length_u64_local(x: np.ndarray) -> np.ndarray:
    bl = np.zeros(x.shape, dtype=np.int64)
    x = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(s))
        bl[big] += s
        x[big] >>= np.uint64(s)
    return bl + (x != 0)


def neighborhood_sizes(packed: np.ndarray) -> np.ndarray:
    """Per-vertex HLL ball-size estimates from packed ANF registers
    (m = 8: alpha = 0.7213/(1+1.079/8), with the linear-counting
    small-range correction)."""
    if len(packed) == 0:
        return np.array([], dtype=np.float64)
    m = 8
    lanes = np.stack([(packed >> (6 * k)) & 63 for k in range(m)], axis=1)
    alpha = 0.7213 / (1 + 1.079 / m)
    est = alpha * m * m / np.power(2.0, -lanes.astype(np.float64)).sum(axis=1)
    zeros = (lanes == 0).sum(axis=1)
    small = (est <= 2.5 * m) & (zeros > 0)
    with np.errstate(divide="ignore"):
        lc = m * np.log(m / np.maximum(zeros, 1e-300))
    return np.where(small, lc, est)


def neighborhood_function(
    csr: CSRGraph,
    rounds: int = 8,
    n_workers: int = 8,
    workers: list | None = None,
    q: float = 0.9,
):
    """HyperANF neighborhood function N(h) = Σ_v |B_h(v)| estimated
    from the per-round packed registers (states captured via the
    extras hook — the engine calls extras_fn(state) at the start of
    every round, so no extra passes), padded to ``rounds`` past the
    fixpoint exactly like the SQL mirror's fixed-depth recursion.
    Returns (h_array, nf_array, eff_h) where eff_h is the smallest h
    with N(h) >= q·N(rounds) — the integer effective diameter."""
    n = csr.n
    if n == 0:
        return (np.array([], np.int64), np.array([], np.float64), 0)
    from pgd_ray.text.hashing import splitmix64

    h = splitmix64(np.arange(n, dtype=np.int64).astype(np.uint64))
    bucket = (h >> np.uint64(61)).astype(np.int64)
    w = h & np.uint64((1 << 61) - 1)
    rho = np.where(w == 0, 62, 61 - _bit_length_u64_local(w) + 1)
    init = rho.astype(np.int64) << (6 * bucket)
    captured: list[np.ndarray] = []

    def extras(state):
        captured.append(state.copy())
        return {}

    eng = IterativeEngine(csr, "anf", n_workers=n_workers, workers=workers)
    final, _ = eng.run(init, extras, lambda d: d == 0.0, rounds)
    states = captured + [final]
    while len(states) < rounds + 1:
        states.append(final)
    nf = np.array([float(neighborhood_sizes(s).sum()) for s in states])
    hs = np.arange(rounds + 1, dtype=np.int64)
    eff = int(hs[np.argmax(nf >= q * nf[-1])])
    return hs, nf, eff


def max_core(csr: CSRGraph) -> int:
    k = kcore(csr)
    return int(k.max()) if len(k) else 0


SSSP_INF = np.int64(1) << np.int64(60)


def slot_weights(csr: CSRGraph, src: np.ndarray, dst: np.ndarray,
                 w: np.ndarray) -> np.ndarray:
    """Align per-undirected-edge integer weights (canonical (src, dst)
    pairs) to the CSR's edge SLOTS (one value per directed adjacency
    entry).  Raises if any adjacency slot has no weight row — the
    weight table must cover the graph exactly."""
    n = csr.n
    lo = np.minimum(src, dst).astype(np.int64)
    hi = np.maximum(src, dst).astype(np.int64)
    keys = lo * n + hi
    order = np.argsort(keys)
    keys, wv = keys[order], np.asarray(w, dtype=np.int64)[order]
    v_of_slot = np.repeat(np.arange(n, dtype=np.int64), np.diff(csr.indptr))
    u_of_slot = csr.indices.astype(np.int64)
    skey = (np.minimum(v_of_slot, u_of_slot) * n
            + np.maximum(v_of_slot, u_of_slot))
    pos = np.searchsorted(keys, skey)
    if len(keys) == 0 or (pos >= len(keys)).any() or \
            (keys[np.minimum(pos, len(keys) - 1)] != skey).any():
        raise ValueError("slot_weights: weight table does not cover "
                         "every adjacency slot")
    return wv[pos]


def sssp_distances(
    csr: CSRGraph,
    weights: np.ndarray,
    source: int,
    rounds: int = 30,
    n_workers: int = 8,
    workers: list | None = None,
) -> np.ndarray:
    """Weighted single-source shortest paths by synchronous
    Bellman-Ford relaxation (``rounds`` fixed rounds — relaxation is
    monotone, so extra rounds are no-ops once the fixpoint is
    reached; fixed rounds keep the SQL mirror's recursion identical).
    ``rounds`` is a caller-supplied bound that must exceed the graph's
    weighted hop diameter: if the FINAL executed round still relaxed
    any distance the result may be overstated, and a RuntimeWarning is
    emitted (ADVICE r3 — the early-exit predicate alone cannot detect
    non-convergence).  ``weights`` is the per-edge-slot int64 array
    from ``slot_weights`` (nonnegative).  Unreachable vertices keep
    the ``SSSP_INF`` sentinel.  Integer arithmetic end-to-end →
    exact."""
    n = csr.n
    if n == 0:
        return np.array([], dtype=np.int64)
    w = np.ascontiguousarray(weights, dtype=np.int64)
    if len(w) != len(csr.indices):
        raise ValueError("weights must align to csr.indices slots")
    if w.min(initial=0) < 0:
        raise ValueError("sssp needs nonnegative weights")
    state = np.full(n, SSSP_INF, dtype=np.int64)
    state[int(source)] = 0
    eng = IterativeEngine(csr, "sssp", n_workers=n_workers,
                          weights_ref=ray.put(w), workers=workers)
    try:
        x, _ = eng.run(state, lambda s: {}, lambda d: d == 0.0, rounds)
        if (len(eng.metrics) >= rounds and eng.metrics
                and eng.metrics[-1]["delta"] != 0.0):
            import warnings

            warnings.warn(
                f"sssp_distances: round bound {rounds} exhausted while "
                "distances were still relaxing — result may overstate "
                "shortest paths; raise `rounds` above the graph's "
                "weighted hop diameter",
                RuntimeWarning,
                stacklevel=2,
            )
    finally:
        eng.close()
    return x
