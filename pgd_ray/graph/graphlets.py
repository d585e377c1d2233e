"""Graphlet decomposition (k ≤ 4) — the Ray-Data re-expression of the
reference's core algorithm (graphlet_core.cpp:1366-1625).

Per canonical edge (v,u) with v the LOWER-degree endpoint (the
reference's skew optimization, graphlet_core.cpp:938-946):

  T  = N(v) ∩ N(u)                        triangles     (cpp:1136-1152)
  A  = N(u) \\ N(v) \\ {v}  ("W_u")        wedges at u
  B  = N(v) \\ N(u) \\ {u}                 wedges at v
  cycle4  = |E(A,B)|   — per-edge induced 4-cycles      (cpp:1167-1176)
  clique4 = |E(T,T)|   — per-edge 4-cliques             (cpp:1230-1240)

plus the O(1) combinatorial closure (solve_graphlet_equations,
cpp:1326-1364) and the final automorphism division
(cpp:1449-1473) that yield all 17 macro counts.

Execution model: the CSR arrays live in the object store (one
``ray.put``, zero-copy views in every worker — the Ray analogue of the
reference's shared-memory adjacency); the canonical edge table streams
through ``map_batches`` kernel stages as stateless tasks whose kernel
object (CSR views, key arrays, scratch — the analogue of the
reference's ``firstprivate`` per-thread scratch, cpp:1069-1088) is
cached once per worker process (see ``_kernel_stage``), giving actor
amortization without per-stage pool construction.  Each batch emits
one partial-sum row (macro) or a per-edge Arrow table (micro);
partials are combined on the driver in arbitrary-precision Python
ints, so the engine is exact where the reference's u64 arithmetic
overflows (SURVEY.md Q3).

Three kernel paths with identical semantics (differential-tested):
dense n×n BLAS (n ≤ 8192, mirrors the reference's adjacency-matrix
auto-tuning cpp:602-611), vectorized sparse (batched gathers +
sorted-key membership, hub-volume-chunked), per-edge loop fallback.

Overflow discipline: every per-batch int64 sum is bounded by
``batch_size * (2*max_degree+2)^2``; n-dependent terms (the
disconnected-motif equations) are re-expanded on the driver from
scale-free sums (Σs, Σs², ...) so no n² product ever enters a numpy
array.  Keep ``batch_size ≤ 8192`` for graphs with max_degree ≥ 1e7.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import ray
import ray.data

from pgd_ray.graph.csr import CSRGraph

MACRO_KEYS = [
    "total_2_1edge",
    "total_2_indep",
    "total_3_tris",
    "total_2_star",
    "total_3_1edge",
    "total_3_indep",
    "total_4_clique",
    "total_4_chordcycle",
    "total_4_tailed_tris",
    "total_4_cycle",
    "total_3_star",
    "total_4_path",
    "total_4_1edge",
    "total_4_2edge",
    "total_4_2star",
    "total_4_tri",
    "total_4_indep",
]

_PARTIAL_COLS = [
    "cnt",
    "s_tri",
    "s_star3",
    "s_cliq",
    "s_cyc",
    "n1",
    "n2",
    "n3",
    "n4",
    "n5",
    "n6",
    "s_dvdu",
    "s_s",
    "s_s2",
    "s_star3_s",
    "s_tri_s",
]


def _gather_rows(indptr: np.ndarray, indices: np.ndarray, ws: np.ndarray) -> np.ndarray:
    """Concatenate neighbor lists of all vertices in ``ws`` — the
    vectorized multi-row CSR gather (no Python loop)."""
    if ws.size == 0:
        return np.empty(0, dtype=indices.dtype)
    starts = indptr[ws]
    lens = indptr[ws + 1] - starts
    total = int(lens.sum())
    if total == 0:
        return np.empty(0, dtype=indices.dtype)
    offs = np.repeat(starts - np.concatenate(([0], np.cumsum(lens)[:-1])), lens)
    return indices[offs + np.arange(total, dtype=np.int64)]


class GraphletKernel:
    """Actor-pool stage: per-edge triangle/wedge/4-cycle/4-clique
    counting against the broadcast CSR.

    mode='macro'  → one partial-sums row per batch
    mode='micro'  → per-edge count table (PGD micro columns)
    tailed_mode   → 'zero' reproduces the reference's always-0 micro
                    4-tailed-triangle column (SURVEY.md Q1, the
                    committed golden behavior); 'micro' computes the
                    value the reference's dead ``cycle_micro`` code
                    intended (2·|E(A,A)|, graphlet_core.cpp:1193-1204).
    """

    def __init__(self, indptr_ref, indices_ref, mode: str = "macro", tailed_mode: str = "zero",
                 neighbors_sorted: bool = True):
        self.indptr = ray.get(indptr_ref)
        self.indices = ray.get(indices_ref)
        self.n = len(self.indptr) - 1
        # The membership kernels require id-sorted neighbor lists; a
        # CSR that went through order_vertex_neighbors (O4 — a
        # scheduling-only reordering, flagged neighbors_sorted=False)
        # is re-normalized here, so the option can never corrupt
        # counts.  The flag (not an O(2m) probe) keeps kernel
        # construction cheap in fresh worker processes.
        if not neighbors_sorted and len(self.indices) > 1:
            owner = np.repeat(np.arange(self.n, dtype=np.int64), np.diff(self.indptr))
            self.indices = self.indices[np.lexsort((self.indices, owner))]
        self.deg = np.diff(self.indptr)
        self.ind = np.zeros(self.n, dtype=np.int8)  # scratch for the loop fallback
        self.mode = mode
        self.tailed_mode = tailed_mode
        # vectorized path uses chunk-local (edge_idx·n + w) membership
        # keys; needs chunk·n < 2^63 → n ≲ 1e12 with the default chunk
        # budget.  Beyond that the kernel falls back to the per-edge
        # loop.
        self.vectorized = self.n > 0 and self.n < 1_000_000_000_000
        # dense-adjacency fast path, mirroring the reference's
        # representation auto-tuning (graphlet_core.cpp:602-611): for
        # small graphs the 2-hop terms become batched BLAS matmuls.
        self.dense = 0 < self.n <= 8192 and mode != "tri"
        if self.dense:
            self.adj = np.zeros((self.n, self.n), dtype=bool)
            self.adj[np.repeat(np.arange(self.n), self.deg), self.indices] = True
            self.adjf = self.adj.astype(np.float32)
        self.vol2 = None

    def _ensure_keys(self):
        # 2-hop gather volume bound per vertex: Σ_{w∈N(x)} deg(w).
        # (The global sorted (v·n+w) key array this method used to
        # build is gone — all membership tests are now chunk-local,
        # see _vec_chunk.)
        if self.vol2 is None:
            cs = np.concatenate(([0], np.cumsum(self.deg[self.indices])))
            self.vol2 = cs[self.indptr[1:]] - cs[self.indptr[:-1]]

    def _edge_counts(self, src: np.ndarray, dst: np.ndarray):
        if self.dense:
            return self._edge_counts_dense(src, dst)
        out = (
            self._edge_counts_vec(src, dst)
            if self.vectorized
            else self._edge_counts_loop(src, dst)
        )
        if self.mode == "macro_nocyc":
            out[1][:] = 0  # contract: s_cyc comes from the driver trace term
        return out

    def _edge_counts_dense(self, src: np.ndarray, dst: np.ndarray):
        """Dense path: per-edge masks over the n×n bool adjacency; the
        quadratic terms (E(T,T), E(A,B), E(A,A)) are (mask @ adj)·mask
        float32 matmuls.  Each matmul ENTRY is a 0/1 dot product ≤ n
        ≤ 8192 < 2^24 so the float32 product is exact; the per-edge
        row-sums can exceed 2^24 (up to ~d_max² per edge), so they
        accumulate in a float64 accumulator (`dtype=np.float64`),
        exact up to 2^53.

        mode='macro_nocyc' halves the flops: per-edge cyc is only ever
        SUMMED by the macro closure, and Σcyc has a closed form from
        the 4-walk trace (``graphlet_macro`` adds it back driver-side:
        C4_ind = C4_sub − N3 + 3·K4, C4_sub = (tr A⁴ − 2Σd² + Σd)/8),
        so the AA matmul is skipped entirely."""
        adj, adjf, deg = self.adj, self.adjf, self.deg
        k = len(src)
        # v = lower-degree endpoint, as in the loop/vec paths (Q8) —
        # the tailed term E(A,A) is not symmetric under the swap
        swap = deg[src] > deg[dst]
        v_arr = np.where(swap, dst, src)
        u_arr = np.where(swap, src, dst)
        tri = np.zeros(k, dtype=np.int64)
        cyc = np.zeros(k, dtype=np.int64)
        clq = np.zeros(k, dtype=np.int64)
        tail = np.zeros(k, dtype=np.int64)
        want_tail = self.tailed_mode == "micro"
        want_cyc = self.mode != "macro_nocyc"
        # macro_nocyc contract: BOTH quadratic per-edge terms come from
        # driver-side identities (s_cliq via _nbr_tri_part, s_cyc via
        # the 4-walk trace), so only the linear tri pass remains here
        want_clq = self.mode != "macro_nocyc"
        chunk = max(1, 32_000_000 // (self.n * self.n) * 64)
        for a in range(0, k, chunk):
            b = min(k, a + chunk)
            v = v_arr[a:b]
            u = u_arr[a:b]
            Nv = adj[v]
            Nu = adj[u]
            Tm = Nv & Nu
            tri[a:b] = Tm.sum(axis=1)
            if want_clq:
                TA = Tm.astype(np.float32) @ adjf
                clq[a:b] = np.round((TA * Tm).sum(axis=1, dtype=np.float64) / 2).astype(np.int64)
            if want_cyc or want_tail:
                Am = Nu & ~Nv
                Am[np.arange(b - a), v] = False
                Bm = Nv & ~Nu
                Bm[np.arange(b - a), u] = False
                AA = Am.astype(np.float32) @ adjf
                cyc[a:b] = (AA * Bm).sum(axis=1, dtype=np.float64).astype(np.int64)
                if want_tail:
                    tail[a:b] = (AA * Am).sum(axis=1, dtype=np.float64).astype(np.int64)
        return tri, cyc, clq, tail, deg[src], deg[dst]

    # per-edge 2-hop volume above which the mark-array loop beats the
    # batched-searchsorted path: the loop pays ~15 µs of numpy-call
    # overhead per edge but probes at O(1) cache speed (~3 ns), while
    # searchsorted costs ~35 ns/element — breakeven ≈ 500; measured
    # 5.7× loop win at vol≈14k (copurchase)
    LOOP_VOL_THRESHOLD = 1500

    def _edge_counts_vec(self, src: np.ndarray, dst: np.ndarray):
        """Vectorized kernel with ADAPTIVE heavy-edge routing: first
        hop classifies N(u) into triangles T and wedges A via batched
        chunk-local membership; the 2-hop pass gathers N(w) for w∈T
        (and the cheaper of A/B for cycles) and resolves closures with
        membership tests.  Edges whose estimated 2-hop volume exceeds
        ``LOOP_VOL_THRESHOLD`` are routed to the per-edge mark-array
        loop instead (the reference's scheme, cpp:1069-1088), whose
        O(1) probes win once the volume amortizes its per-edge
        overhead.  Light edges are chunked by gather volume so
        temporaries stay bounded regardless of hub degrees."""
        indptr, indices, deg = self.indptr, self.indices, self.deg
        dv_raw = deg[src]
        du_raw = deg[dst]
        swap = dv_raw > du_raw
        v_arr = np.where(swap, dst, src).astype(np.int64)
        u_arr = np.where(swap, src, dst).astype(np.int64)
        k = len(src)
        tri = np.zeros(k, dtype=np.int64)
        cyc = np.zeros(k, dtype=np.int64)
        clq = np.zeros(k, dtype=np.int64)
        tail = np.zeros(k, dtype=np.int64)
        tri_only = self.mode == "tri"
        want_tail = self.tailed_mode == "micro"
        budget = 4_000_000
        if tri_only:
            vol = deg[v_arr]
            light = np.arange(k)
        else:
            self._ensure_keys()
            est = self.vol2[u_arr] if want_tail else np.minimum(
                self.vol2[v_arr], self.vol2[u_arr]
            )
            heavy = est > self.LOOP_VOL_THRESHOLD
            if heavy.any():
                h = np.flatnonzero(heavy)
                ht, hc, hq, hta, _, _ = self._edge_counts_loop(v_arr[h], u_arr[h])
                tri[h], cyc[h], clq[h], tail[h] = ht, hc, hq, hta
            light = np.flatnonzero(~heavy) if heavy.any() else np.arange(k)
            vol = (deg[u_arr] + np.minimum(est, budget))[light]
        lv, lu = v_arr[light], u_arr[light]
        ltri = np.zeros(len(light), dtype=np.int64)
        lcyc = np.zeros(len(light), dtype=np.int64)
        lclq = np.zeros(len(light), dtype=np.int64)
        ltail = np.zeros(len(light), dtype=np.int64)
        grp = np.cumsum(vol) // budget
        splits = [0, *(np.flatnonzero(np.diff(grp)) + 1).tolist(), len(light)]
        splits = sorted(set(splits))
        for a, b in zip(splits[:-1], splits[1:]):
            self._vec_chunk(
                lv[a:b], lu[a:b], ltri[a:b], lcyc[a:b], lclq[a:b], ltail[a:b],
                tri_only, want_tail,
            )
        tri[light], cyc[light], clq[light], tail[light] = ltri, lcyc, lclq, ltail
        return tri, cyc, clq, tail, deg[src], deg[dst]

    def _tri_group_mark(self, v_arr, u_arr, tri_out, min_group: int = 4):
        """Triangles via two complementary vectorized paths:

        * hub path — the reference's mark-and-scan (cpp:1069-1152)
          amortized across edge groups: edges grouped by their
          HIGH-degree endpoint u, N(u) marked once per group, every
          member's small side probes the mark array with O(1) fancy
          indexing.  Wins when groups are big (hub runs).
        * merge path — for edges whose u-group is smaller than
          ``min_group`` (uniform-degree edges would pay one Python
          round-trip per group): both neighborhoods are gathered for
          the WHOLE set at once as per-edge-prefixed sorted keys
          (e·n + w), and the intersection is one batched searchsorted
          of one sorted array in another — cache-friendly, no loop.
        """
        indptr, indices, deg = self.indptr, self.indices, self.deg
        nn = np.int64(self.n)
        k = len(v_arr)
        order = np.argsort(u_arr, kind="stable")
        u_s = u_arr[order]
        v_s = v_arr[order]
        out = np.zeros(k, dtype=np.int64)
        bounds = np.flatnonzero(np.concatenate(([True], u_s[1:] != u_s[:-1], [True])))
        glens = np.diff(bounds)
        big = np.repeat(glens >= min_group, glens)

        # --- merge path (small groups, all at once) ------------------
        sm = np.flatnonzero(~big)
        if sm.size:
            vs, us = v_s[sm], u_s[sm]
            e_ids = np.arange(len(sm), dtype=np.int64)
            Gv = _gather_rows(indptr, indices, vs)
            ev = np.repeat(e_ids, deg[vs])
            Gu = _gather_rows(indptr, indices, us)
            eu = np.repeat(e_ids, deg[us])
            qa = ev * nn + Gv
            qb = eu * nn + Gu
            pos = np.searchsorted(qb, qa)
            pos[pos == len(qb)] = 0
            hits = qb[pos] == qa
            out[sm] = np.bincount(ev[hits], minlength=len(sm))

        # --- hub path (big groups) -----------------------------------
        mark = np.zeros(self.n, dtype=bool)
        for gi in np.flatnonzero(glens >= min_group):
            lo, hi = bounds[gi], bounds[gi + 1]
            u = u_s[lo]
            Nu = indices[indptr[u] : indptr[u + 1]]
            mark[Nu] = True
            vs = v_s[lo:hi]
            Gv = _gather_rows(indptr, indices, vs)
            hits = mark[Gv]
            e_of = np.repeat(np.arange(hi - lo), deg[vs])
            out[lo:hi] = np.bincount(e_of[hits], minlength=hi - lo)
            mark[Nu] = False
        tri_out[order] = out
        return tri_out

    def _vec_chunk(self, v_arr, u_arr, tri, cyc, clq, tail, tri_only, want_tail):
        """CHUNK-LOCAL membership keys (round-2 rewrite): every 2-hop
        test reduces to set membership in a per-edge neighborhood of
        the CURRENT edge — x∈N(v)∧x∈N(u) ⟺ x∈T, y∈N(v)∖N(u)∖{u} ⟺
        y∈B, y∈N(u)∖N(v)∖{v} ⟺ y∈A — so instead of probing the global
        sorted (v·n+w) key array (O(2m) entries, DRAM-latency-bound at
        ~680 ns/probe on large graphs), all probes search per-edge-
        prefixed key arrays (e·n+w) built from this chunk's gathers,
        which are a few MB and stay in cache.  The arrays are sorted
        for free: the CSR neighbor lists are sorted and the edge
        prefixes are nondecreasing."""
        indptr, indices, deg = self.indptr, self.indices, self.deg
        nn = np.int64(self.n)
        k = len(v_arr)
        if tri_only:
            self._tri_group_mark(v_arr, u_arr, tri)
            return

        def member(sorted_keys, q):
            if len(sorted_keys) == 0:
                return np.zeros(len(q), dtype=bool)
            pos = np.searchsorted(sorted_keys, q)
            pos[pos == len(sorted_keys)] = 0
            return sorted_keys[pos] == q

        e_ids = np.arange(k, dtype=np.int64)
        Gv = _gather_rows(indptr, indices, v_arr)
        ev = np.repeat(e_ids, deg[v_arr])
        Gu = _gather_rows(indptr, indices, u_arr)
        eu = np.repeat(e_ids, deg[u_arr])
        qv = ev * nn + Gv
        qu = eu * nn + Gu

        in_nv = member(qv, qu)  # first hop: classify N(u) into T / A
        tri[:] = np.bincount(eu[in_nv], minlength=k)
        T = Gu[in_nv]
        eT = eu[in_nv]
        amask = ~in_nv & (Gu != v_arr[eu])
        A = Gu[amask]
        eA = eu[amask]
        if T.size:
            qT = eT * nn + T  # sorted subset of qu
            GT = _gather_rows(indptr, indices, T)
            ex = np.repeat(eT, deg[T])
            ok = member(qT, ex * nn + GT)  # x ∈ T  ⟺  4-clique closure
            clq[:] = np.bincount(ex[ok], minlength=k) // 2
        if A.size:
            in_nu = member(qu, qv)  # classify N(v): B = N(v)∖N(u)∖{u}
            bmask = ~in_nu & (Gv != u_arr[ev])
            B = Gv[bmask]
            eB = ev[bmask]
            qA = eA * nn + A  # sorted subset of qu
            if want_tail:
                # micro: expand A once — E(A,B) from the A side plus
                # the tailed term E(A,A)
                qB = eB * nn + B
                GA = _gather_rows(indptr, indices, A)
                ey = np.repeat(eA, deg[A])
                qy = ey * nn + GA
                cyc[:] = np.bincount(ey[member(qB, qy)], minlength=k)
                tail[:] = np.bincount(ey[member(qA, qy)], minlength=k)
            elif B.size:
                # macro: expand the LOW-degree side's wedges B (v is
                # the lower-degree endpoint, Q8) and test membership
                # in A — same |E(A,B)| count at deg(v)/deg(u) of the
                # gather volume
                GB = _gather_rows(indptr, indices, B)
                ez = np.repeat(eB, deg[B])
                cyc[:] = np.bincount(ez[member(qA, ez * nn + GB)], minlength=k)

    def _edge_counts_loop(self, src: np.ndarray, dst: np.ndarray):
        """Core loop: returns per-edge (tri, cycle4, clique4, tailed)."""
        indptr, indices, ind = self.indptr, self.indices, self.ind
        deg = self.deg
        # lower-degree endpoint becomes v (hash the small side, Q8)
        dv_raw = deg[src]
        du_raw = deg[dst]
        swap = dv_raw > du_raw
        v_arr = np.where(swap, dst, src)
        u_arr = np.where(swap, src, dst)
        k = len(src)
        tri = np.zeros(k, dtype=np.int64)
        cyc = np.zeros(k, dtype=np.int64)
        clq = np.zeros(k, dtype=np.int64)
        tail = np.zeros(k, dtype=np.int64)
        want_tail = self.tailed_mode == "micro"
        two_hop = self.mode != "tri"
        if not two_hop:
            # triangles only: sorted-intersection, no scratch writes
            for i in range(k):
                v = v_arr[i]
                u = u_arr[i]
                Nv = indices[indptr[v] : indptr[v + 1]]
                Nu = indices[indptr[u] : indptr[u + 1]]
                pos = np.searchsorted(Nu, Nv)
                pos[pos == len(Nu)] = 0
                tri[i] = int(np.count_nonzero(Nu[pos] == Nv)) if len(Nu) else 0
            return tri, cyc, clq, tail, deg[src], deg[dst]
        for i in range(k):
            v = v_arr[i]
            u = u_arr[i]
            Nv = indices[indptr[v] : indptr[v + 1]]
            Nu = indices[indptr[u] : indptr[u + 1]]
            ind[Nv] = 1
            ind[u] = 0
            marks = ind[Nu]
            tmask = marks == 1
            T = Nu[tmask]
            A = Nu[~tmask]
            A = A[A != v]
            tri[i] = T.size
            ind[T] = 3
            if A.size:
                ind[A] = 2
                xs = _gather_rows(indptr, indices, A)
                xm = ind[xs]
                cyc[i] = np.count_nonzero(xm == 1)
                if want_tail:
                    tail[i] = np.count_nonzero(xm == 2)
            if T.size > 1:
                ys = _gather_rows(indptr, indices, T)
                clq[i] = np.count_nonzero(ind[ys] == 3) >> 1
            # reset scratch (O(|N(v)| + |A|), cpp:1086-1088)
            ind[Nv] = 0
            if A.size:
                ind[A] = 0
        return tri, cyc, clq, tail, deg[src], deg[dst]

    def __call__(self, batch: pa.Table) -> pa.Table:
        src = batch["src"].to_numpy(zero_copy_only=False)
        dst = batch["dst"].to_numpy(zero_copy_only=False)
        if len(src) == 0:
            if self.mode in ("macro", "macro_nocyc"):
                return pa.table({c: pa.array([], pa.int64()) for c in _PARTIAL_COLS})
            if self.mode == "tri":
                return pa.table(
                    {"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64()),
                     "triangle": pa.array([], pa.int64())}
                )
            return _micro_table(src, dst, *[np.array([], np.int64)] * 8)
        tri, cyc, clq, tail, dv, du = self._edge_counts(src, dst)
        if self.mode == "tri":
            return pa.table(
                {"src": np.asarray(src, np.int64), "dst": np.asarray(dst, np.int64),
                 "triangle": tri}
            )
        wv = dv - tri - 1
        wu = du - tri - 1
        star3 = wv + wu
        if self.mode == "micro":
            chordal = tri * (tri - 1) // 2 - clq
            path4 = wv * wu - cyc
            star3_local = wv * (wv - 1) // 2 + wu * (wu - 1) // 2 - tail
            return _micro_table(src, dst, tri, star3, clq, chordal, tail, cyc, star3_local, path4)
        s = star3 + tri + 2  # |N(v) ∪ N(u)|
        ts = tri + star3
        vals = [
            len(src),
            int(tri.sum()),
            int(star3.sum()),
            int(clq.sum()),
            int(cyc.sum()),
            int((ts * (ts - 1) // 2).sum()),          # n1
            int((star3 * (star3 - 1) // 2).sum()),    # n2
            int((tri * (tri - 1) // 2).sum()),        # n3
            int((tri * star3).sum()),                 # n4
            int((wv * wu).sum()),                     # n5
            int((wv * (wv - 1) // 2 + wu * (wu - 1) // 2).sum()),  # n6
            int((dv + du).sum()),                     # for N7 on driver
            int(s.sum()),                             # Σs
            int((s * s).sum()),                       # Σs²
            int((star3 * s).sum()),                   # for N9
            int((tri * s).sum()),                     # for N10
        ]
        return pa.table({c: pa.array([v], pa.int64()) for c, v in zip(_PARTIAL_COLS, vals)})


def _micro_table(src, dst, tri, star2, clq, chordal, tail, cyc, star3, path4) -> pa.Table:
    return pa.table(
        {
            "src": np.asarray(src, np.int64),
            "dst": np.asarray(dst, np.int64),
            "triangle": tri,
            "star2": star2,
            "clique4": clq,
            "chordal4": chordal,
            "tailed4": tail,
            "cycle4": cyc,
            "star3": star3,
            "path4": path4,
        }
    )


@dataclass
class MacroCounts:
    """All 17 graphlet totals + derived scalars, exact Python ints."""

    counts: dict
    total_wedges: int
    global_cc: float
    raw_n: dict | None = None  # unmerged equation sums (for identities)

    def __getitem__(self, k):
        return self.counts[k]

    def as_dict(self) -> dict:
        d = dict(self.counts)
        d["total_wedges"] = self.total_wedges
        d["global_cc"] = self.global_cc
        return d


def _comb2(x: int) -> int:
    return x * (x - 1) // 2


def macro_from_partials(acc: dict, n: int, m: int) -> MacroCounts:
    """Closed-form final combination (graphlet_core.cpp:1449-1473),
    arbitrary-precision."""
    S_tri, S_star3 = acc["s_tri"], acc["s_star3"]
    N3, N4, N5, N6 = acc["n3"], acc["n4"], acc["n5"], acc["n6"]
    # re-expand the n-dependent sums exactly (see module docstring)
    N7 = acc["cnt"] * (m + 1) - acc["s_dvdu"]
    N8 = acc["cnt"] * _comb2(n) - n * acc["s_s"] + (acc["s_s2"] + acc["s_s"]) // 2
    N9 = n * S_star3 - acc["s_star3_s"]
    N10 = n * S_tri - acc["s_tri_s"]
    S_31 = acc["cnt"] * n - acc["s_s"]  # Σ (n - s) = Σ disconn

    c: dict = {}
    c["total_2_1edge"] = m
    c["total_2_indep"] = _comb2(n) - m
    tris = S_tri // 3
    c["total_3_tris"] = tris
    star2 = S_star3 // 2
    c["total_2_star"] = star2
    c["total_3_1edge"] = S_31
    c["total_3_indep"] = n * (n - 1) * (n - 2) // 6 - (tris + star2 + S_31)
    wedges = 3 * tris + star2
    cc = (3.0 * tris / wedges) if wedges else 0.0
    clique = acc["s_cliq"] // 6
    c["total_4_clique"] = clique
    chord = N3 - 6 * clique
    c["total_4_chordcycle"] = chord
    cyc = acc["s_cyc"] // 4
    c["total_4_cycle"] = cyc
    path = N5 - 4 * cyc
    c["total_4_path"] = path
    tailed = (N4 - 4 * chord) // 2
    c["total_4_tailed_tris"] = tailed
    c["total_3_star"] = (N6 - tailed) // 3
    e2 = (N7 - 6 * clique - 4 * cyc - 4 * chord - 2 * path - 2 * tailed) // 2
    c["total_4_2edge"] = e2
    c["total_4_1edge"] = N8 - 2 * e2
    c["total_4_2star"] = (N9 - 2 * path) // 2
    c["total_4_tri"] = (N10 - tailed) // 3
    # 4-independent: C(n,4) minus everything else, exact
    # (the reference's u64 version overflows for n ≳ 55k, Q3)
    others = (
        clique
        + chord
        + c["total_4_tailed_tris"]
        + cyc
        + c["total_3_star"]
        + path
        + c["total_4_1edge"]
        + c["total_4_2edge"]
        + c["total_4_2star"]
        + c["total_4_tri"]
    )
    c["total_4_indep"] = n * (n - 1) * (n - 2) * (n - 3) // 24 - others
    raw = {1: acc["n1"], 2: acc["n2"], 3: N3, 4: N4, 5: N5, 6: N6,
           7: N7, 8: N8, 9: N9, 10: N10}
    return MacroCounts(counts=c, total_wedges=wedges, global_cc=cc, raw_n=raw)


def check_identities(mac: MacroCounts) -> dict[int, int]:
    """The reference's 10 algebraic self-checks
    (test_graphlet_counts, graphlet_core.cpp:1275-1305): relations
    between the unmerged equation sums n₁..n₁₀ and the final totals.
    Returns {i: residual}; all residuals must be 0."""
    c = mac.counts
    ver = {
        1: 3 * c["total_3_star"] + 3 * c["total_4_tailed_tris"] + 4 * c["total_4_cycle"]
           + c["total_4_path"] + 5 * c["total_4_chordcycle"] + 6 * c["total_4_clique"],
        2: 3 * c["total_3_star"] + c["total_4_tailed_tris"] + 4 * c["total_4_cycle"]
           + c["total_4_path"],
        3: c["total_4_chordcycle"] + 6 * c["total_4_clique"],
        4: 2 * c["total_4_tailed_tris"] + 4 * c["total_4_chordcycle"],
        5: c["total_4_path"] + 4 * c["total_4_cycle"],
        6: 3 * c["total_3_star"] + c["total_4_tailed_tris"],
        7: 2 * c["total_4_tailed_tris"] + 4 * c["total_4_cycle"] + 2 * c["total_4_path"]
           + 4 * c["total_4_chordcycle"] + 6 * c["total_4_clique"] + 2 * c["total_4_2edge"],
        8: 2 * c["total_4_2edge"] + c["total_4_1edge"],
        9: 2 * c["total_4_path"] + 2 * c["total_4_2star"],
        10: c["total_4_tailed_tris"] + 3 * c["total_4_tri"],
    }
    return {i: ver[i] - mac.raw_n[i] for i in ver}


_KERNEL_CACHE: dict = {}


def _task_cap(concurrency) -> int | None:
    """Normalize a user-facing ``concurrency`` (int or (min, max)
    actor-pool-style tuple) to the int task cap that function-based
    ``map_batches`` accepts."""
    if concurrency is None:
        return None
    if isinstance(concurrency, (tuple, list)):
        return int(concurrency[-1])
    return int(concurrency)


def _kernel_stage(csr: CSRGraph, mode: str, tailed_mode: str = "zero"):
    """Stateless-task kernel stage: the CSR is fetched zero-copy from
    plasma once per worker process and the kernel object (with its
    reusable scratch array) is cached there — same amortization as an
    actor pool without paying pool construction per pipeline stage.
    On a multi-node cluster each node fetches the CSR once."""
    indptr_ref, indices_ref = csr.put()
    nsorted = getattr(csr, "neighbors_sorted", True)
    key = (indptr_ref.binary(), mode, tailed_mode)

    def fn(batch: pa.Table) -> pa.Table:
        kern = _KERNEL_CACHE.get(key)
        if kern is None:
            kern = GraphletKernel(indptr_ref, indices_ref, mode=mode,
                                  tailed_mode=tailed_mode, neighbors_sorted=nsorted)
            _KERNEL_CACHE.clear()  # one graph at a time per worker
            _KERNEL_CACHE[key] = kern
        return kern(batch)

    return fn


def _fragment_stage(rcsr, mode: str, tailed_mode: str = "zero",
                    cache_bytes: int = 2 << 30):
    """Fragment-backed kernel stage (the cluster-scale path): workers
    attach per-range adjacency fragments on demand through a
    byte-bounded LRU instead of mapping the assembled whole-graph
    arrays — per-worker memory is the cache budget, not the graph.
    See ``graph.frag_kernel``."""
    from pgd_ray.graph.frag_kernel import FragGraphletKernel, FragmentAdjacency

    refs = rcsr.fragment_refs()
    bounds, n = rcsr.bounds, rcsr.n
    anchor = next(iter(sorted(refs))) if refs else -1
    ref_id = refs[anchor].binary() if refs else b"empty"
    key = ("frag", ref_id, mode, tailed_mode, cache_bytes)

    def fn(batch: pa.Table) -> pa.Table:
        kern = _KERNEL_CACHE.get(key)
        if kern is None:
            adj = FragmentAdjacency(bounds, refs, n, cache_bytes=cache_bytes)
            kern = FragGraphletKernel(adj, mode=mode, tailed_mode=tailed_mode)
            _KERNEL_CACHE.clear()  # one graph at a time per worker
            _KERNEL_CACHE[key] = kern
        return kern(batch)

    return fn


def _stage_for(graph, mode: str, tailed_mode: str = "zero",
               cache_bytes: int | None = None):
    """Kernel-stage dispatch: a ``CSRGraph`` uses the broadcast kernels
    (fastest while the assembled adjacency fits a node); a ``RangeCSR``
    manifest uses the fragment-backed kernels (no whole-graph arrays
    anywhere).  Both produce identical counts.  ``cache_bytes`` bounds
    the fragment path's per-worker LRU (ignored by the broadcast
    kernels)."""
    if isinstance(graph, CSRGraph):
        return _kernel_stage(graph, mode, tailed_mode)
    if cache_bytes is None:
        return _fragment_stage(graph, mode, tailed_mode)
    return _fragment_stage(graph, mode, tailed_mode,
                           cache_bytes=cache_bytes)


@ray.remote
def _tr_a4_part(indptr, indices, a: int, b: int) -> int:
    """Partial of tr(A⁴) = ‖A²‖²_F: rows [a, b) of A² squared and
    summed, exactly (entries ≤ n ≤ 8192 are integral in f32; the
    square-sum runs in int64).  Fanned out so no single task owns the
    whole 2n³-flop trace."""
    n = len(indptr) - 1
    adjf = np.zeros((n, n), dtype=np.float32)
    adjf[np.repeat(np.arange(n), np.diff(indptr)), indices] = 1.0
    P = np.rint(adjf[a:b] @ adjf).astype(np.int64)
    return int((P * P).sum())


@ray.remote
def _nbr_tri_part(indptr, indices, a: int, b: int) -> int:
    """Σ_{x∈[a,b)} tr(S_x³) where S_x = adjacency of the subgraph
    induced by N(x): per-vertex neighborhood-triangle totals.  Over all
    vertices, Σ tr(S³) = 6·Σ tri(G[N(x)]) = 24·K4, giving
    s_cliq = Σ_e clq_e = 6·K4 WITHOUT the per-edge (m·n²)-flop masked
    matmul — per-vertex cost is 2·d³ flops (Σ 2d³ ≈ 0.56 TF vs 4.1 TF
    on the 518k-edge dense bench graph).  Entries of S² are < d ≤ n ≤
    8192 < 2²⁴, exact in f32; the masked sum accumulates in f64, exact
    below 2⁵³ (d² ≤ 6.7e7 terms × < 2²⁴ each at the n-cap)."""
    n = len(indptr) - 1
    adj = np.zeros((n, n), dtype=bool)
    adj[np.repeat(np.arange(n), np.diff(indptr)), indices] = True
    total = 0
    for x in range(a, b):
        N = indices[indptr[x] : indptr[x + 1]]
        if len(N) < 2:
            continue
        S = adj[np.ix_(N, N)]
        Sf = S.astype(np.float32)
        total += int((Sf @ Sf)[S].sum(dtype=np.float64))
    return total


def graphlet_macro(
    canonical_ds: ray.data.Dataset,
    csr: CSRGraph,
    batch_size: int = 4096,
    concurrency=(1, 32),
    cache_bytes: int | None = None,
) -> MacroCounts:
    """Macro decomposition: stream canonical edges through the kernel
    stage, combine per-batch partials in Python ints on the driver,
    apply the closure.  ``concurrency`` is an upper bound on in-flight
    tasks (parallelism itself follows the input's block count).

    Small-graph fast path: when the dense kernel applies (n ≤ 8192)
    BOTH per-edge matmuls are skipped — Σcyc is recovered exactly from
    the 4-walk trace identity (C4_ind = C4_sub − N3 + 3·K4 with
    C4_sub = (tr A⁴ − 2Σd² + Σd)/8, so s_cyc = 4·C4_ind) and Σclq
    from the per-vertex neighborhood-triangle identity
    s_cliq = 6·K4 = Σ_v tr(S_v³)/4 (``_nbr_tri_part``), whose Σ 2d³
    flops are ~7× below the per-edge m·n² route on the dense bench
    graph.  Both validated bit-equal on random graphs."""
    dense_fast = isinstance(csr, CSRGraph) and 0 < csr.n <= 8192
    tr_parts = nbr_parts = None
    if dense_fast:
        indptr_ref, indices_ref = csr.put()
        step = max(512, -(-csr.n // 8))
        tr_parts = [
            _tr_a4_part.remote(indptr_ref, indices_ref, a, min(a + step, csr.n))
            for a in range(0, csr.n, step)
        ]  # overlaps with the edge stream below
        # d³-balanced vertex cuts: per-vertex cost is 2·deg³ flops, so
        # uniform vertex ranges would straggle on hubs
        w = np.cumsum(csr.degrees().astype(np.float64) ** 3)
        cuts = np.searchsorted(
            w, np.linspace(0, w[-1] if len(w) else 0.0, 65)[1:-1]
        )
        cuts = np.unique(np.concatenate([[0], cuts, [csr.n]]))
        nbr_parts = [
            _nbr_tri_part.remote(indptr_ref, indices_ref, int(a), int(b))
            for a, b in zip(cuts[:-1], cuts[1:])
            if b > a
        ]
    partials = canonical_ds.map_batches(
        _stage_for(csr, "macro_nocyc" if dense_fast else "macro",
                   cache_bytes=cache_bytes),
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
        concurrency=_task_cap(concurrency),
    )
    acc = {k: 0 for k in _PARTIAL_COLS}
    for b in partials.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        for k in _PARTIAL_COLS:
            col = b[k].to_numpy(zero_copy_only=False)
            acc[k] += int(col.sum())
    if dense_fast:
        deg = csr.degrees().astype(np.int64)
        acc["s_cliq"] = sum(ray.get(nbr_parts)) // 4  # Σ tr(S³) = 24·K4
        tr_a4 = sum(ray.get(tr_parts))
        c4_sub = (tr_a4 - 2 * int((deg * deg).sum()) + int(deg.sum())) // 8
        acc["s_cyc"] = 4 * (c4_sub - acc["n3"] + 3 * (acc["s_cliq"] // 6))
    return macro_from_partials(acc, csr.n, csr.m)


def edge_triangles(
    canonical_ds: ray.data.Dataset,
    csr: CSRGraph,
    batch_size: int = 8192,
    concurrency=(1, 32),
) -> ray.data.Dataset:
    """Per-edge triangle counts only (src, dst, triangle) — the cheap
    O(d_v+d_u) sorted-intersection path, no 2-hop gathers."""
    return canonical_ds.map_batches(
        _stage_for(csr, "tri"),
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
        concurrency=_task_cap(concurrency),
    )


def graphlet_micro(
    canonical_ds: ray.data.Dataset,
    csr: CSRGraph,
    tailed_mode: str = "zero",
    batch_size: int = 4096,
    concurrency=(1, 32),
) -> ray.data.Dataset:
    """Micro decomposition: per-edge count table
    (src, dst, triangle, star2, clique4, chordal4, tailed4, cycle4,
    star3, path4) — the reference's 7 per-edge arrays plus derived
    columns (graphlet_core.cpp:1483-1625)."""
    return canonical_ds.map_batches(
        _stage_for(csr, "micro", tailed_mode),
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
        concurrency=_task_cap(concurrency),
    )


def graphlet_macro_approx(
    canonical_ds: ray.data.Dataset,
    csr: CSRGraph,
    fraction: float = 0.1,
    seed: int = 42,
    batch_size: int = 4096,
    concurrency=(1, 32),
) -> MacroCounts:
    """Edge-sampled estimator — the ``graphlet_approximation(p)``
    documented in the reference README (:293-295) but absent from its
    snapshot (SURVEY.md §2.8); realized here via the sampled
    ``sort_edges`` hook semantics (graphlet_core.cpp:837-851) with a
    FIXED seed: run the kernel on a p-sample of edges and scale the
    per-edge equation sums by 1/p before the closure.  Unbiased for
    every total that is a sum over edges; exact n/m terms are kept.

    The sample is CONTENT-HASH based (splitmix64-style mix of
    (src, dst, seed) against a p·2^64 threshold), not RNG-based: the
    selected edge set is a pure function of edge values, so it is
    invariant to partitioning/block layout and reproducible in SQL —
    the driver oracle ``macro_approx_copurchase`` mirrors the same
    hash and threshold exactly."""
    thresh = np.uint64(int(fraction * 2.0**64)) if fraction < 1.0 else None
    A = np.uint64(0x9E3779B97F4A7C15)
    B = np.uint64(0xBF58476D1CE4E5B9)
    C3 = np.uint64(0x94D049BB133111EB)

    def hash_sample(t: pa.Table) -> pa.Table:
        if thresh is None:
            return t
        src = t["src"].to_numpy(zero_copy_only=False).astype(np.uint64)
        dst = t["dst"].to_numpy(zero_copy_only=False).astype(np.uint64)
        x = src * A + dst * B + np.uint64(seed)
        x ^= x >> np.uint64(30)
        x *= B
        x ^= x >> np.uint64(27)
        x *= C3
        x ^= x >> np.uint64(31)
        return t.filter(pa.array(x < thresh))

    sample = canonical_ds.map_batches(hash_sample, batch_format="pyarrow")
    partials = sample.map_batches(
        _stage_for(csr, "macro"),
        batch_format="pyarrow",
        batch_size=batch_size,
        num_cpus=1,
        concurrency=_task_cap(concurrency),
    )
    acc = {k: 0 for k in _PARTIAL_COLS}
    for b in partials.iter_batches(batch_size=1 << 16, batch_format="pyarrow"):
        for k in _PARTIAL_COLS:
            acc[k] += int(b[k].to_numpy(zero_copy_only=False).sum())
    scale = 1.0 / fraction
    scaled = {k: int(round(v * scale)) for k, v in acc.items()}
    return macro_from_partials(scaled, csr.n, csr.m)


def vertex_triangles(
    canonical_ds: ray.data.Dataset, csr: CSRGraph, **kw
) -> ray.data.Dataset:
    """Per-VERTEX triangle counts — the reference's micro mode is "for
    each edge (or vertex)" (graphlet_core.cpp:1477-1480 doc); the
    vertex statistic derives from the per-edge one: a triangle
    {v,a,b} appears in tri_e of both v-incident edges, so
    tri(v) = Σ_{e ∋ v} tri_e / 2.  Partial per-batch bincount combiner
    → small groupby.  Output: (v, triangles)."""
    from ray.data.aggregate import Sum

    tri = edge_triangles(canonical_ds, csr, **kw)

    def partial(t: pa.Table) -> pa.Table:
        vs = np.concatenate([
            t["src"].to_numpy(zero_copy_only=False),
            t["dst"].to_numpy(zero_copy_only=False),
        ])
        w = np.concatenate([
            t["triangle"].to_numpy(zero_copy_only=False),
            t["triangle"].to_numpy(zero_copy_only=False),
        ])
        order = np.argsort(vs, kind="stable")
        vs, w = vs[order], w[order]
        bounds = np.concatenate(([True], vs[1:] != vs[:-1]))
        starts = np.flatnonzero(bounds)
        cs = np.concatenate(([0], np.cumsum(w)))
        ends = np.append(starts[1:], len(vs))
        return pa.table({"v": vs[starts], "part": cs[ends] - cs[starts]})

    out = (
        tri.map_batches(partial, batch_format="pyarrow")
        .groupby("v")
        .aggregate(Sum("part", alias_name="twice"))
    )

    def finish(t: pa.Table) -> pa.Table:
        return pa.table(
            {"v": t["v"],
             "triangles": (t["twice"].to_numpy(zero_copy_only=False) // 2).astype(np.int64)}
        )

    return out.map_batches(finish, batch_format="pyarrow")


def local_clustering(
    canonical_ds: ray.data.Dataset, csr: CSRGraph, **kw
) -> ray.data.Dataset:
    """Per-vertex local clustering coefficient
    cc(v) = 2·tri(v) / (deg(v)·(deg(v)−1)) (0 when deg < 2) — composes
    ``vertex_triangles`` with a broadcast degree lookup; vertices the
    triangle pass never touches (isolated/degree-1) are absent from
    its output and implicitly 0, so callers wanting every vertex union
    with the degree table.  Output: (v, degree, triangles, local_cc)
    for vertices with ≥ 1 incident edge."""
    deg_ref = ray.put(csr.degrees())

    def cc(t: pa.Table, deg_ref=deg_ref) -> pa.Table:
        deg_all = ray.get(deg_ref)
        v = t["v"].to_numpy(zero_copy_only=False)
        tri = t["triangles"].to_numpy(zero_copy_only=False)
        d = deg_all[v]
        denom = d.astype(np.float64) * (d - 1)
        val = np.where(d >= 2, 2.0 * tri / np.maximum(denom, 1.0), 0.0)
        return pa.table(
            {"v": v, "degree": d.astype(np.int64), "triangles": tri,
             "local_cc": np.round(val, 6)}
        )

    return vertex_triangles(canonical_ds, csr, **kw).map_batches(
        cc, batch_format="pyarrow"
    )


def gfd(mac: MacroCounts, kind: str = "all") -> np.ndarray:
    """Graphlet frequency distribution (graphlet_core.cpp:1955-2041).

    kind='connected' → the 6 connected k=4 motifs normalized;
    kind='disconnected' → the 5 disconnected ones;
    kind='all' → all 11.
    """
    conn = [
        "total_4_clique",
        "total_4_chordcycle",
        "total_4_tailed_tris",
        "total_4_cycle",
        "total_3_star",
        "total_4_path",
    ]
    disc = [
        "total_4_2star",
        "total_4_tri",
        "total_4_2edge",
        "total_4_1edge",
        "total_4_indep",
    ]
    if kind == "connected":
        keys = conn
    elif kind == "disconnected":
        keys = disc
    else:
        keys = conn + disc
    vals = np.array([float(mac[k]) for k in keys])
    tot = vals.sum()
    return vals / tot if tot > 0 else vals


_ECC_DEG_CACHE: dict = {}


def _ecc_batch(t, deg_ref):
    """Task stage: per-edge Radicchi clustering coefficient
    (triangle+1)/(min(deg)-1) with the degenerate min(deg)=1 case
    pinned to 0.0 (not NULL/NaN — keeps the SQL-mirror hash exact)."""
    import pyarrow as pa
    import ray as _ray

    ck = deg_ref.hex() if isinstance(deg_ref, _ray.ObjectRef) else None
    deg = _ECC_DEG_CACHE.get(ck)
    if deg is None:
        deg = _ray.get(deg_ref) if ck is not None else deg_ref
        if ck is not None:
            _ECC_DEG_CACHE.clear()
            _ECC_DEG_CACHE[ck] = deg
    src = t["src"].to_numpy(zero_copy_only=False)
    dst = t["dst"].to_numpy(zero_copy_only=False)
    tri = t["triangle"].to_numpy(zero_copy_only=False).astype(np.float64)
    md = np.minimum(deg[src], deg[dst]).astype(np.float64) - 1.0
    ecc = np.where(md > 0.0, (tri + 1.0) / np.maximum(md, 1.0), 0.0)
    return t.append_column("ecc", pa.array(np.round(ecc, 9), pa.float64()))


def edge_clustering(
    canonical_ds: ray.data.Dataset,
    csr: CSRGraph,
    batch_size: int = 8192,
    concurrency=(1, 32),
) -> ray.data.Dataset:
    """Per-edge clustering coefficient (Radicchi et al. 2004):
    C(u,v) = (triangles(u,v) + 1) / (min(deg u, deg v) - 1), the
    weak-tie screen used for community-edge removal.  Reuses the
    signature sorted-intersection triangle kernel and decorates each
    batch with one broadcast degree-array lookup (task stage +
    per-worker module cache — no actor restart hazard).  Columns
    (src, dst, triangle, ecc); ecc = 0.0 where min(deg) = 1."""
    deg_ref = ray.put(csr.degrees().astype(np.int64))
    return edge_triangles(
        canonical_ds, csr, batch_size=batch_size, concurrency=concurrency
    ).map_batches(
        _ecc_batch, batch_format="pyarrow", batch_size=batch_size,
        fn_kwargs={"deg_ref": deg_ref},
        concurrency=_task_cap(concurrency),
    )


def motif_significance(
    canonical_ds: ray.data.Dataset,
    csr: CSRGraph,
    batch_size: int = 8192,
    concurrency=(1, 32),
) -> "pd.DataFrame":
    """Triangle significance against the degree-preserving null
    (configuration model): E[T]_cfg = S₂³ / (6·S₁³) with S₁ = Σd,
    S₂ = Σd(d−1) (Newman), expected clustering C_cfg = S₂²/S₁³.
    Observed counts come from the signature sorted-intersection
    kernel; the moments from ONE streamed pass over the degree table
    (exact integers).  One row (n_vertices, m_edges, triangles,
    wedges, expected_tri_cfg, tri_ratio, global_cc, expected_cc_cfg);
    ratios/cc rounded to 9, NaN-free (0-wedge graphs report 0)."""
    import pandas as pd

    from pgd_ray.graph.degrees import degree_table

    s1 = s2 = nv = 0
    for b in degree_table(canonical_ds).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow"):
        if b.num_rows:
            d = b["degree"].to_numpy(zero_copy_only=False).astype(object)
            nv += b.num_rows
            s1 += int(sum(d))
            s2 += int(sum(d * (d - 1)))
    tris = 0
    for b in edge_triangles(canonical_ds, csr, batch_size=batch_size,
                            concurrency=concurrency).iter_batches(
            batch_size=1 << 18, batch_format="pyarrow"):
        if b.num_rows:
            tris += int(b["triangle"].to_numpy(zero_copy_only=False).sum())
    tris //= 3
    wedges = s2 // 2
    et = (s2 ** 3) / (6.0 * s1 ** 3) if s1 else 0.0
    cc = 3.0 * tris / wedges if wedges else 0.0
    ecc = (s2 ** 2) / float(s1 ** 3) if s1 else 0.0
    return pd.DataFrame({
        "n_vertices": [np.int64(nv)],
        "m_edges": [np.int64(s1 // 2)],
        "triangles": [np.int64(tris)],
        "wedges": [np.int64(wedges)],
        "expected_tri_cfg": [round(et, 9)],
        "tri_ratio": [round(tris / et, 9) if et > 0 else 0.0],
        "global_cc": [round(cc, 9)],
        "expected_cc_cfg": [round(ecc, 9)],
    })


_ORBIT_CACHE: dict = {}


def _orbit_decorate(t, ref):
    import pyarrow as pa
    import ray as _ray

    ck = ref.hex() if isinstance(ref, _ray.ObjectRef) else None
    st = _ORBIT_CACHE.get(ck)
    if st is None:
        st = _ray.get(ref) if ck is not None else ref
        if ck is not None:
            _ORBIT_CACHE.clear()
            _ORBIT_CACHE[ck] = st
    deg, snbr = st
    v = t["v"].to_numpy(zero_copy_only=False)
    tri = t["triangles"].to_numpy(zero_copy_only=False).astype(np.int64)
    d = deg[v]
    return pa.table({
        "v": pa.array(v, pa.int64()),
        "orbit0_degree": pa.array(d, pa.int64()),
        "orbit1_path_end": pa.array(snbr[v] - d - 2 * tri, pa.int64()),
        "orbit2_wedge_center": pa.array(d * (d - 1) // 2 - tri, pa.int64()),
        "orbit3_triangle": pa.array(tri, pa.int64()),
    })


def vertex_orbits3(
    canonical_ds: ray.data.Dataset,
    csr: CSRGraph,
    batch_size: int = 8192,
    concurrency=(1, 32),
) -> ray.data.Dataset:
    """Per-vertex 3-node graphlet ORBIT vector (the GDV restricted to
    k=3; orbit numbering follows the graphlet literature):
    orbit0 = degree, orbit1 = open-path endpoints
    (Σ_{u∈N(v)}(deg u − 1) − 2·tri), orbit2 = open-wedge centers
    (C(deg,2) − tri), orbit3 = triangle memberships.

    tri comes from the signature sorted-intersection kernel
    (``vertex_triangles``); the neighbor-degree sums from ONE
    map_batches pass over the canonical edges with the broadcast
    degree vector (per-batch bincount partials, O(n) driver combine —
    the degree-array convention used by every iterative engine).
    Columns (v, orbit0_degree, orbit1_path_end, orbit2_wedge_center,
    orbit3_triangle)."""
    from ray.data.aggregate import Sum as RaySum

    deg = csr.degrees().astype(np.int64)
    deg_ref = ray.put(deg)

    def snbr_partial(t: pa.Table, deg_ref) -> pa.Table:
        dd = _ECC_DEG_CACHE.get(deg_ref.hex())
        if dd is None:
            dd = ray.get(deg_ref)
            _ECC_DEG_CACHE.clear()
            _ECC_DEG_CACHE[deg_ref.hex()] = dd
        src = t["src"].to_numpy(zero_copy_only=False)
        dst = t["dst"].to_numpy(zero_copy_only=False)
        vals = np.concatenate([src, dst])
        wts = np.concatenate([dd[dst], dd[src]])
        v, inv = np.unique(vals, return_inverse=True)
        s = np.bincount(inv, weights=wts.astype(np.float64)).astype(np.int64)
        return pa.table({"v": pa.array(v, pa.int64()),
                         "p": pa.array(s, pa.int64())})

    snbr = np.zeros(csr.n, np.int64)
    agg = (canonical_ds.map_batches(
        snbr_partial, batch_format="pyarrow", batch_size=batch_size,
        fn_kwargs={"deg_ref": deg_ref},
        concurrency=_task_cap(concurrency))
        .groupby("v").aggregate(RaySum("p", alias_name="s")))
    for b in agg.iter_batches(batch_size=1 << 20, batch_format="pyarrow"):
        if b.num_rows:
            snbr[b["v"].to_numpy(zero_copy_only=False)] = \
                b["s"].to_numpy(zero_copy_only=False)
    ref = ray.put((deg, snbr))
    vt = vertex_triangles(canonical_ds, csr, batch_size=batch_size,
                          concurrency=concurrency)
    return vt.map_batches(_orbit_decorate, batch_format="pyarrow",
                          batch_size=batch_size, fn_kwargs={"ref": ref},
                          concurrency=_task_cap(concurrency))


def orbit_spearman(
    canonical_ds: ray.data.Dataset,
    csr: CSRGraph,
    batch_size: int = 8192,
    concurrency=(1, 32),
) -> "pd.DataFrame":
    """Graphlet correlation matrix (Yaveroğlu et al. 2014) restricted
    to the k=3 orbits: Spearman rank correlation between every pair of
    ``vertex_orbits3`` columns across vertices — the topology
    fingerprint used to compare networks.

    Exactness contract: average ranks are half-integers, so the
    moments are computed over 2·rank (exact integers) and the final
    r = (n·Sxy − Sx·Sy) / √((n·Sxx − Sx²)(n·Syy − Sy²)) divides two
    exact integers — bit-identical to the SQL mirror.  The rank pass
    is a driver tail over the O(n) orbit table (the query's own output
    scale).  Columns (orbit_a, orbit_b, rho), the 6 unordered pairs,
    rho rounded to 9 (0.0 when either column is constant)."""
    import math

    import pandas as pd

    orb = vertex_orbits3(canonical_ds, csr, batch_size=batch_size,
                         concurrency=concurrency).to_pandas()
    cols = ["orbit0_degree", "orbit1_path_end",
            "orbit2_wedge_center", "orbit3_triangle"]
    n = len(orb)
    if n == 0:
        return pd.DataFrame({"orbit_a": pd.Series([], dtype=object),
                             "orbit_b": pd.Series([], dtype=object),
                             "rho": pd.Series([], dtype=np.float64)})
    r2 = {c: (2 * orb[c].rank(method="average")).astype(np.int64)
          .to_numpy(dtype=object) for c in cols}
    rows = []
    for i in range(len(cols)):
        for j in range(i + 1, len(cols)):
            x, y = r2[cols[i]], r2[cols[j]]
            sx, sy = int(sum(x)), int(sum(y))
            sxx = int(sum(x * x)); syy = int(sum(y * y))
            sxy = int(sum(x * y))
            vx = n * sxx - sx * sx
            vy = n * syy - sy * sy
            num = n * sxy - sx * sy
            rho = (float(num) / math.sqrt(float(vx) * float(vy))
                   if vx > 0 and vy > 0 else 0.0)
            rows.append((cols[i], cols[j], round(rho, 9)))
    return pd.DataFrame(rows, columns=["orbit_a", "orbit_b", "rho"])
