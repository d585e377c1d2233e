"""Deterministic local-min-edge maximal matching.

Parallel greedy maximal matching with Luby-style edge coins: each
round every ALIVE edge (both endpoints unmatched) draws the priority
splitmix64((a<<32 | b) XOR r*C) — a bijection of the canonical edge
key within a round, so priorities are DISTINCT (no ties) yet fresh
every round — and an edge is matched iff its priority beats every
alive edge sharing an endpoint.  Local-minimum edges are pairwise
non-adjacent, so each round's winners form a matching; matched
vertices kill their incident edges.  This is the maximal-matching
analog of Luby MIS run on the line graph (Blelloch, Fineman & Shun
2012 analyse the random-order variant): a constant fraction of alive
edges disappears per round in expectation, so O(log m) rounds w.h.p.
The result is a pure function of the graph — the DuckDB oracle
replays it bit-exactly.

Ray shape: state is one int64 per vertex (the `IterativeEngine` state
contract); the per-round work is a scatter-min of edge priorities
into their two endpoints plus one filter over edges — at cluster
scale this is a segment-min over the canonically-partitioned edge
list (one groupby-free pass per direction, the
`sources/edges.py` sorted-block pattern) with only the O(n) min
vector exchanged, never the edge list.

Reference parity note: nkahmed/PGD has no matching operator; this is
extension surface (a matching = conflict-free edge sample for
decorrelated pair training data).
"""

from __future__ import annotations

import numpy as np

from pgd_ray.graph.csr import CSRGraph

# decorrelated from the MIS constant (graph/iterative.py:_MIS_C)
_MATCH_C = 0xD1B54A32D192ED03
_SENT = np.uint64(0xFFFFFFFFFFFFFFFF)


def _edge_priority(eu: np.ndarray, ev: np.ndarray, rnd: int) -> np.ndarray:
    """Round-r priority of canonical edge (a<b): splitmix64 of the
    packed 64-bit key XOR r*C.  Bijective in the key within a round
    -> distinct across edges (ids must fit 32 bits)."""
    from pgd_ray.text.hashing import splitmix64

    key = (eu.astype(np.uint64) << np.uint64(32)) | ev.astype(np.uint64)
    off = np.uint64((rnd * _MATCH_C) % (1 << 64))
    return splitmix64(key ^ off)


def maximal_matching(csr: CSRGraph, max_iter: int = 64) -> np.ndarray:
    """Return ``mate``: for each dense vertex id its matched partner's
    dense id, or -1 if unmatched.  Maximal on return (asserted): no
    edge has both endpoints unmatched."""
    n = csr.n
    mate = np.full(n, -1, dtype=np.int64)
    if n == 0:
        return mate
    if n > (1 << 32):
        raise ValueError("vertex ids must fit 32 bits for the edge key")
    indptr = np.asarray(csr.indptr)
    indices = np.asarray(csr.indices)
    seg = np.repeat(np.arange(n, dtype=np.int64), np.diff(indptr))
    canon = seg < indices
    eu = seg[canon]
    ev = indices[canon]
    for r in range(max_iter):
        alive = (mate[eu] < 0) & (mate[ev] < 0)
        if not alive.any():
            break
        q = _edge_priority(eu, ev, r)
        qa = q[alive]
        au, av = eu[alive], ev[alive]
        vmin = np.full(n, _SENT, dtype=np.uint64)
        np.minimum.at(vmin, au, qa)
        np.minimum.at(vmin, av, qa)
        win = (qa <= vmin[au]) & (qa <= vmin[av])
        mate[au[win]] = av[win]
        mate[av[win]] = au[win]
    if ((mate[eu] < 0) & (mate[ev] < 0)).any():
        raise RuntimeError(f"matching not maximal after {max_iter} rounds")
    return mate
