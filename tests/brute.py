"""Brute-force O(n⁴) graphlet enumerator — the independent oracle for
property tests (FIXTURES.md §4).  Classifies every 2/3/4-subset of
vertices by its induced subgraph."""

from __future__ import annotations

from itertools import combinations

import numpy as np


def brute_counts(n: int, edges: set[tuple[int, int]]) -> dict:
    adj = {v: set() for v in range(n)}
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    m = len(edges)

    def e(a, b):
        return b in adj[a]

    c = {
        "total_2_1edge": m,
        "total_2_indep": n * (n - 1) // 2 - m,
        "total_3_tris": 0,
        "total_2_star": 0,
        "total_3_1edge": 0,
        "total_3_indep": 0,
        "total_4_clique": 0,
        "total_4_chordcycle": 0,
        "total_4_tailed_tris": 0,
        "total_4_cycle": 0,
        "total_3_star": 0,
        "total_4_path": 0,
        "total_4_1edge": 0,
        "total_4_2edge": 0,
        "total_4_2star": 0,
        "total_4_tri": 0,
        "total_4_indep": 0,
    }
    for t in combinations(range(n), 3):
        k = sum(e(a, b) for a, b in combinations(t, 2))
        c["total_3_tris" if k == 3 else "total_2_star" if k == 2
          else "total_3_1edge" if k == 1 else "total_3_indep"] += 1
    for q in combinations(range(n), 4):
        es = [(a, b) for a, b in combinations(q, 2) if e(a, b)]
        k = len(es)
        if k == 6:
            c["total_4_clique"] += 1
        elif k == 5:
            c["total_4_chordcycle"] += 1
        elif k == 4:
            deg = _degseq(q, es)
            c["total_4_cycle" if deg == (2, 2, 2, 2) else "total_4_tailed_tris"] += 1
        elif k == 3:
            deg = _degseq(q, es)
            if deg == (1, 1, 1, 3):
                c["total_3_star"] += 1
            elif deg == (1, 1, 2, 2):
                c["total_4_path"] += 1
            else:  # (0,2,2,2) triangle + isolated
                c["total_4_tri"] += 1
        elif k == 2:
            deg = _degseq(q, es)
            c["total_4_2edge" if deg == (1, 1, 1, 1) else "total_4_2star"] += 1
        elif k == 1:
            c["total_4_1edge"] += 1
        else:
            c["total_4_indep"] += 1
    return c


def _degseq(q, es):
    d = dict.fromkeys(q, 0)
    for a, b in es:
        d[a] += 1
        d[b] += 1
    return tuple(sorted(d.values()))


def random_graph(n: int, p: float, seed: int) -> set[tuple[int, int]]:
    rng = np.random.default_rng(seed)
    return {
        (i, j)
        for i in range(n)
        for j in range(i + 1, n)
        if rng.random() < p
    }
