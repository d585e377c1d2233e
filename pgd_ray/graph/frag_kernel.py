"""Fragment-backed graphlet kernels — k ≤ 4 counting WITHOUT the
assembled whole-graph CSR.

The broadcast kernels (``graph.graphlets.GraphletKernel``) mirror the
reference's shared-memory adjacency (graphlet_core.h:84-86): every
worker maps the full contiguous (indptr, indices) pair from plasma.
That caps the graph at one node's RAM (~10^10 edges).  This module is
the cluster-scale path: the adjacency stays as the per-vertex-range
fragments the distributed CSR build already produced
(``block_csr.RangeCSR``), each fragment decoded once into plasma, and
kernel workers attach ONLY the fragments a batch actually touches
through a byte-bounded LRU (``FragmentAdjacency``).  Per-worker memory
is the cache budget, not the graph.

The algorithm is unchanged from the chunk-local-membership design of
``GraphletKernel._vec_chunk`` (per-edge-prefixed sorted keys e·n + w);
the only structural difference is that 2-hop expansion volumes are
computed from actual degree lookups instead of a precomputed global
vol2 array, so the second hop self-chunks.  Counts are differential-
tested bit-equal to the broadcast kernel.

Locality: ``RangeCSR.canonical_edges()`` emits blocks whose src all
fall in one vertex range, so the v-side gather of a batch usually hits
one cached fragment; the u-side and 2-hop gathers fan out, which on a
cluster is plasma traffic proportional to the true 2-hop boundary —
the same exchange SURVEY §4.2's range-routed gather plan performs,
here expressed as demand paging instead of an explicit shuffle.
"""

from __future__ import annotations

from collections import OrderedDict

import numpy as np
import ray

from pgd_ray.graph.graphlets import GraphletKernel


def _member(sorted_keys: np.ndarray, q: np.ndarray) -> np.ndarray:
    """Membership of each q in a sorted key array (empty-safe)."""
    if len(sorted_keys) == 0:
        return np.zeros(len(q), dtype=bool)
    pos = np.searchsorted(sorted_keys, q)
    pos[pos == len(sorted_keys)] = 0
    return sorted_keys[pos] == q


class FragmentAdjacency:
    """Degree / neighbor-gather primitives over RangeCSR fragments.

    ``refs`` maps range_id → either an ``ObjectRef`` to the decoded
    ``(indptr, indices)`` pair (plasma, zero-copy attach) or a fragment
    parquet path (decoded locally).  Fragments are cached per instance
    in an LRU bounded by ``cache_bytes`` — the per-worker adjacency
    footprint is the budget, never the whole graph.  Missing range ids
    are empty ranges (isolated vertices)."""

    def __init__(self, bounds, refs: dict, n: int, cache_bytes: int = 2 << 30):
        self.bounds = np.asarray(bounds, dtype=np.int64)
        self.refs = refs
        self.n = int(n)
        self.cache_bytes = int(cache_bytes)
        self._cache: OrderedDict = OrderedDict()
        self._bytes = 0
        # paging telemetry: hits/misses are FRAGMENT-GROUP touches
        # (one per contiguous rid run in a gather), bytes_loaded the
        # cumulative decode/attach volume — cheap, read via stats()
        self.hits = 0
        self.misses = 0
        self.bytes_loaded = 0

    def stats(self) -> dict:
        t = self.hits + self.misses
        return {"hits": self.hits, "misses": self.misses,
                "hit_rate": round(self.hits / t, 4) if t else 1.0,
                "bytes_loaded": self.bytes_loaded,
                "bytes_cached": self._bytes}

    def _frag(self, rid: int):
        ent = self._cache.get(rid)
        if ent is not None:
            self.hits += 1
            self._cache.move_to_end(rid)
            return ent
        self.misses += 1
        v_lo, v_hi = int(self.bounds[rid]), int(self.bounds[rid + 1])
        ref = self.refs.get(rid)
        if ref is None:
            ptr = np.zeros(v_hi - v_lo + 1, dtype=np.int64)
            idxv = np.empty(0, dtype=np.int64)
        elif isinstance(ref, ray.ObjectRef):
            ptr, idxv = ray.get(ref)  # zero-copy plasma views
        else:
            from pgd_ray.graph.block_csr import _read_fragment

            _, _, ptr, idxv = _read_fragment(ref)
        nbytes = ptr.nbytes + idxv.nbytes
        self.bytes_loaded += nbytes
        while self._cache and self._bytes + nbytes > self.cache_bytes:
            _, (optr, oidx, _) = self._cache.popitem(last=False)
            self._bytes -= optr.nbytes + oidx.nbytes
        self._cache[rid] = (ptr, idxv, v_lo)
        self._bytes += nbytes
        return self._cache[rid]

    def _grouped(self, ws: np.ndarray, want_values: bool):
        ws = np.asarray(ws, dtype=np.int64)
        k = len(ws)
        if k == 0:
            lens = np.zeros(0, dtype=np.int64)
            return (np.empty(0, dtype=np.int64), lens) if want_values else lens
        rid = np.searchsorted(self.bounds, ws, side="right") - 1
        order = np.argsort(rid, kind="stable")
        rs = rid[order]
        run_starts = np.flatnonzero(np.concatenate(([True], rs[1:] != rs[:-1])))
        run_ends = np.append(run_starts[1:], k)
        lens_s = np.empty(k, dtype=np.int64)
        parts = []
        for a, b in zip(run_starts, run_ends):
            ptr, idxv, v_lo = self._frag(int(rs[a]))
            wl = ws[order[a:b]] - v_lo
            starts = ptr[wl]
            ln = ptr[wl + 1] - starts
            lens_s[a:b] = ln
            if want_values:
                tot = int(ln.sum())
                if tot:
                    offs = np.repeat(
                        starts - np.concatenate(([0], np.cumsum(ln)[:-1])), ln
                    )
                    parts.append(idxv[offs + np.arange(tot, dtype=np.int64)])
        lens = np.empty(k, dtype=np.int64)
        lens[order] = lens_s
        if not want_values:
            return lens
        vals_s = (
            np.concatenate(parts) if parts else np.empty(0, dtype=np.int64)
        )
        # scatter segments from rid-sorted order back to ws order; the
        # within-segment neighbor ordering (sorted ascending) survives
        out_off = np.concatenate(([0], np.cumsum(lens)))
        src_off = np.concatenate(([0], np.cumsum(lens_s)))
        dst = np.repeat(out_off[order] - src_off[:-1], lens_s) + np.arange(
            len(vals_s), dtype=np.int64
        )
        out = np.empty_like(vals_s)
        out[dst] = vals_s
        return out, lens

    def deg(self, ws: np.ndarray) -> np.ndarray:
        return self._grouped(ws, want_values=False)

    def gather(self, ws: np.ndarray):
        """(concatenated neighbor lists in ws order, per-ws lengths)."""
        return self._grouped(ws, want_values=True)


class FragGraphletKernel(GraphletKernel):
    """GraphletKernel over a FragmentAdjacency — same per-edge counts
    (tri, cycle4, clique4, tailed), same output tables (``__call__`` is
    inherited), no whole-graph arrays.  Two-level chunking keeps
    temporaries bounded: edge batches split by first-hop gather volume
    (Σ deg(v)+deg(u)), 2-hop expansions split by actual Σ deg(w) of the
    sets being expanded."""

    HOP1_BUDGET = 4_000_000
    HOP2_BUDGET = 4_000_000

    def __init__(self, adj: FragmentAdjacency, mode: str = "macro",
                 tailed_mode: str = "zero"):
        # deliberately NOT calling super().__init__ — no global arrays
        self.adj = adj
        self.n = adj.n
        self.mode = mode
        self.tailed_mode = tailed_mode

    def _edge_counts(self, src: np.ndarray, dst: np.ndarray):
        adj = self.adj
        src = np.asarray(src, dtype=np.int64)
        dst = np.asarray(dst, dtype=np.int64)
        dv_raw = adj.deg(src)
        du_raw = adj.deg(dst)
        swap = dv_raw > du_raw
        v_arr = np.where(swap, dst, src)
        u_arr = np.where(swap, src, dst)
        k = len(src)
        tri = np.zeros(k, dtype=np.int64)
        cyc = np.zeros(k, dtype=np.int64)
        clq = np.zeros(k, dtype=np.int64)
        tail = np.zeros(k, dtype=np.int64)
        vol1 = dv_raw + du_raw
        grp = np.cumsum(vol1) // self.HOP1_BUDGET + np.arange(k) // 65536
        cuts = np.flatnonzero(np.diff(grp)) + 1
        for a, b in zip([0, *cuts.tolist()], [*cuts.tolist(), k]):
            if b > a:
                self._chunk(
                    v_arr[a:b], u_arr[a:b],
                    tri[a:b], cyc[a:b], clq[a:b], tail[a:b],
                )
        return tri, cyc, clq, tail, dv_raw, du_raw

    def _chunk(self, v_arr, u_arr, tri, cyc, clq, tail):
        """One first-hop chunk: classify N(u) into T/A and N(v) into B
        via chunk-local sorted keys (e·n + w), then self-chunked 2-hop
        expansions — identical closure tests to
        GraphletKernel._vec_chunk (graphlet_core.cpp:1136-1240)."""
        adj = self.adj
        nn = np.int64(self.n)
        k = len(v_arr)
        e_ids = np.arange(k, dtype=np.int64)
        Gv, lv = adj.gather(v_arr)
        Gu, lu = adj.gather(u_arr)
        ev = np.repeat(e_ids, lv)
        eu = np.repeat(e_ids, lu)
        qv = ev * nn + Gv
        qu = eu * nn + Gu

        in_nv = _member(qv, qu)
        tri[:] = np.bincount(eu[in_nv], minlength=k)
        if self.mode == "tri":
            return
        T = Gu[in_nv]
        eT = eu[in_nv]
        amask = ~in_nv & (Gu != v_arr[eu])
        A = Gu[amask]
        eA = eu[amask]
        if T.size:
            qT = eT * nn + T  # sorted subset of qu
            self._expand_count(T, eT, qT, clq, half=True)
        if A.size:
            in_nu = _member(qu, qv)
            bmask = ~in_nu & (Gv != u_arr[ev])
            B = Gv[bmask]
            eB = ev[bmask]
            qA = eA * nn + A
            if self.tailed_mode == "micro":
                qB = eB * nn + B
                self._expand_count2(A, eA, qB, cyc, qA, tail)
            elif B.size:
                # macro: expand the low-degree side's wedges B, test
                # membership in A — same |E(A,B)| at less gather volume
                self._expand_count(B, eB, qA, cyc, half=False)

    def _expand_count(self, W, eW, q_target, out, half: bool):
        """Σ per edge of |{(w, x) : w ∈ W, x ∈ N(w), key(x) ∈ target}|,
        2-hop gathers chunked by actual Σ deg(w).  ``half`` halves AFTER
        full accumulation (each unordered T-pair is found from both
        endpoints, possibly in different sub-chunks)."""
        adj = self.adj
        nn = np.int64(self.n)
        degW = adj.deg(W)
        acc = np.zeros(len(out), dtype=np.int64)
        grp = np.cumsum(degW) // self.HOP2_BUDGET
        cuts = np.flatnonzero(np.diff(grp)) + 1
        for a, b in zip([0, *cuts.tolist()], [*cuts.tolist(), len(W)]):
            if b <= a:
                continue
            GW, _ = adj.gather(W[a:b])
            ex = np.repeat(eW[a:b], degW[a:b])
            ok = _member(q_target, ex * nn + GW)
            acc += np.bincount(ex[ok], minlength=len(out))
        out[:] = acc // 2 if half else acc

    def _expand_count2(self, A, eA, qB, cyc, qA, tail):
        """Micro path: expand A once, resolving both E(A,B) (cycle4)
        and the tailed term 2·|E(A,A)| from the same gathers."""
        adj = self.adj
        nn = np.int64(self.n)
        degA = adj.deg(A)
        acc_c = np.zeros(len(cyc), dtype=np.int64)
        acc_t = np.zeros(len(tail), dtype=np.int64)
        grp = np.cumsum(degA) // self.HOP2_BUDGET
        cuts = np.flatnonzero(np.diff(grp)) + 1
        for a, b in zip([0, *cuts.tolist()], [*cuts.tolist(), len(A)]):
            if b <= a:
                continue
            GA, _ = adj.gather(A[a:b])
            ey = np.repeat(eA[a:b], degA[a:b])
            qy = ey * nn + GA
            acc_c += np.bincount(ey[_member(qB, qy)], minlength=len(cyc))
            acc_t += np.bincount(ey[_member(qA, qy)], minlength=len(tail))
        cyc[:] = acc_c
        tail[:] = acc_t
