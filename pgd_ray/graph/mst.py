"""Maximum/minimum spanning forest via Borůvka's algorithm.

Borůvka rounds: every component selects its best incident cut edge
under the strict total order (w DESC, a ASC, b ASC) — keys are
DISTINCT because canonical (a, b) pairs are unique, so the spanning
forest is UNIQUE and any correct algorithm (the DuckDB oracle unrolls
the same rounds) must produce the identical edge set.  Selected edges
are acyclic (each is some component's unique best cut edge);
components contract by min-label propagation and at least halve per
round, so <= ceil(log2 n) rounds.

Ray shape: the heavy input (per-pair co-occurrence counts) comes from
a distributed groupby (`stages.basket.pair_counts`); the forest kernel
works on the thin weighted edge list — O(m_distinct) driver arrays,
the same contract as the other graph kernels.  At cluster scale each
Borůvka round is a `groupby(component).min(key)` over the distributed
edge list (one aggregate shuffle) and the contraction is the engine's
distributed hash-min CC (`graph/iterative.py` "cc" program) on the
component graph; only the O(#components) label vector crosses rounds.

Reference parity note: nkahmed/PGD has no spanning-tree operator;
this is extension surface (backbone extraction for graph sparsifiers
/ co-occurrence taxonomies).
"""

from __future__ import annotations

import numpy as np
import pandas as pd


def boruvka_forest(
    a: np.ndarray, b: np.ndarray, w: np.ndarray,
    maximum: bool = True, max_iter: int = 64,
) -> np.ndarray:
    """Boolean keep-mask of the unique spanning forest of the weighted
    canonical edge list under the strict key (w desc if maximum else
    asc, then a, then b).  Vertex ids are arbitrary ints."""
    a = np.asarray(a, dtype=np.int64)
    b = np.asarray(b, dtype=np.int64)
    w = np.asarray(w, dtype=np.int64)
    m = len(a)
    keep = np.zeros(m, dtype=bool)
    if m == 0:
        return keep
    verts, inv = np.unique(np.concatenate([a, b]), return_inverse=True)
    n = len(verts)
    da, db = inv[:m], inv[m:]
    wkey = -w if maximum else w
    comp = np.arange(n, dtype=np.int64)
    for _ in range(max_iter):
        ca, cb = comp[da], comp[db]
        alive = np.flatnonzero(ca != cb)
        if not len(alive):
            break
        # each endpoint component nominates its best incident cut edge
        comps2 = np.concatenate([ca[alive], cb[alive]])
        eidx2 = np.concatenate([alive, alive])
        order = np.lexsort((b[eidx2], a[eidx2], wkey[eidx2], comps2))
        sc = comps2[order]
        firsts = np.flatnonzero(np.concatenate(([True], sc[1:] != sc[:-1])))
        chosen = np.unique(eidx2[order[firsts]])
        keep[chosen] = True
        # contract winners: min-label propagation with pointer jumping
        px, py = comp[da[chosen]], comp[db[chosen]]
        lab = np.arange(n, dtype=np.int64)
        while True:
            before = lab.copy()
            np.minimum.at(lab, px, lab[py])
            np.minimum.at(lab, py, lab[px])
            lab = np.minimum(lab, lab[lab])
            if np.array_equal(lab, before):
                break
        comp = lab[comp]
    else:
        if (comp[da] != comp[db]).any():
            raise RuntimeError(f"Borůvka did not converge in {max_iter} rounds")
    return keep


def max_spanning_forest(sf_dir: str) -> pd.DataFrame:
    """Maximum spanning forest of the co-purchase graph weighted by
    basket co-occurrence count — the strongest-link backbone.
    Columns: part_a, part_b, w (canonical part_a < part_b)."""
    from pgd_ray.stages.basket import pair_counts

    pc = pair_counts(sf_dir).to_pandas()
    if pc.empty:
        return pd.DataFrame({"part_a": pd.Series([], dtype=np.int64),
                             "part_b": pd.Series([], dtype=np.int64),
                             "w": pd.Series([], dtype=np.int64)})
    a = pc["part_a"].to_numpy(np.int64)
    b = pc["part_b"].to_numpy(np.int64)
    w = pc["n_both"].to_numpy(np.int64)
    keep = boruvka_forest(a, b, w, maximum=True)
    out = pd.DataFrame({"part_a": a[keep], "part_b": b[keep], "w": w[keep]})
    return out.sort_values(["part_a", "part_b"], ignore_index=True)
