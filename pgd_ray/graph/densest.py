"""Densest-subgraph extraction by greedy threshold peeling.

Bahmani–Kumar–Vassilvitskii (VLDB 2012) MapReduce peeling with
eps = 0.5: each round removes every vertex whose degree *within the
current subgraph* is <= 2(1+eps) * density = 3 * m/|S|, yielding a
1/(2(1+eps)) = 1/3-approximation of the maximum-density subgraph in
O(log n) rounds.  eps = 0.5 is chosen so the removal rule is EXACT
integer arithmetic — survive iff deg_S(v) * |S| > 3 * m_S — which the
DuckDB oracle replays bit-identically (no float thresholds).

The reference engine stops at degree/triangle statistics
(graphlet_core.cpp:877-891); the densest subgraph is the natural
density fixpoint on top of the same degree machinery, expressed
Ray-Data-first:

    repeat:
        deg       <- degree_table(current edges)   # partial+final groupby
        survivors <- deg * |S| > 3 * m             # vectorized Arrow filter
        edges     <- semi_join(edges, survivors)   # src then dst
    until the subgraph is empty

Scale shape: every round is two streamed passes over the edge Dataset
plus one per-vertex hash aggregation; the driver holds one (round, n,
m) triple per round — O(log n) ints.  Vertex survivor sets ride the
same ``semi_join`` used everywhere else (broadcast by default; the
``partitioned`` strategy is the >10^9-vertex path).  Round count is
bounded by log_{1.5} n because each round keeps < 2/3 of the
vertices (Markov on the degree sum).
"""

from __future__ import annotations

from dataclasses import dataclass

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from pgd_ray.graph.degrees import degree_table
from pgd_ray.stages.joins import semi_join


@dataclass(frozen=True)
class PeelRound:
    it: int
    n: int  # |S| — surviving vertices this round
    m: int  # edges within S


def densest_peel(
    eds: ray.data.Dataset,
    max_rounds: int = 64,
    strategy: str = "broadcast",
    concurrency=(1, 16),
) -> list[PeelRound]:
    """Peel ``eds`` (canonical src<dst dedup edges) to empty; return the
    per-round (|S|, m) history, round 0 = the full graph.  The vertex
    universe is the set of edge endpoints (isolated vertices never
    appear in an edge table)."""
    cur = eds
    deg = degree_table(cur).materialize()
    hist = [PeelRound(0, deg.count(), cur.count())]
    it = 0
    while hist[-1].m > 0 and it < max_rounds:
        it += 1
        n_s, m_s = hist[-1].n, hist[-1].m
        def keep(b: pa.Table, lim=3 * m_s, ns=n_s) -> pa.Table:
            return b.filter(pc.greater(
                pc.multiply(b["degree"], pa.scalar(ns, pa.int64())),
                pa.scalar(lim, pa.int64()),
            ))

        surv = deg.map_batches(
            keep, batch_format="pyarrow", num_cpus=1
        ).materialize()
        n_new = surv.count()
        if n_new == 0:
            break
        cur = semi_join(
            semi_join(cur, surv, left_key="src", right_key="v",
                      strategy=strategy, concurrency=concurrency),
            surv, left_key="dst", right_key="v",
            strategy=strategy, concurrency=concurrency,
        ).materialize()
        deg = degree_table(cur).materialize()
        hist.append(PeelRound(it, n_new, cur.count()))
    return hist


def densest_subgraph(
    eds: ray.data.Dataset,
    max_rounds: int = 64,
    strategy: str = "broadcast",
    concurrency=(1, 16),
) -> dict:
    """Best round of the peel by density m/|S| (IEEE double division,
    ties -> earliest round — exactly the oracle's ORDER BY density
    DESC, it ASC).  Returns {best_round, n_sub, m_sub, density}."""
    hist = densest_peel(eds, max_rounds=max_rounds,
                        strategy=strategy, concurrency=concurrency)
    best = hist[0]
    best_d = best.m / best.n if best.n else 0.0
    for r in hist[1:]:
        d = r.m / r.n
        if d > best_d:
            best, best_d = r, d
    return {
        "best_round": best.it,
        "n_sub": best.n,
        "m_sub": best.m,
        "density": best_d,
        "rounds": len(hist),
    }
