"""Bond-percolation robustness profile: giant-component fraction as
edges are deterministically subsampled at increasing keep-rates.

The classic infrastructure/contagion robustness screen ("how much of
the graph survives random edge failure?"), made reproducible the
engine's usual way: the kept edge set at rate p is a CONTENT-HASH
predicate (the same splitmix-style (src, dst, seed) mix and p·2⁶⁴
threshold as ``graphlets.graphlet_macro_approx``), so it is
partition/retry-invariant and bit-exactly SQL-mirrorable.

Per level: one filtered scan of the canonical edge Dataset → CSR →
the engine's distributed connected components.  Driver state per
level: the label vector (the CC engine's own contract).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_A = np.uint64(0x9E3779B97F4A7C15)
_B = np.uint64(0xBF58476D1CE4E5B9)
_C = np.uint64(0x94D049BB133111EB)


def _edge_hash(src: np.ndarray, dst: np.ndarray, seed: int) -> np.ndarray:
    x = src.astype(np.uint64) * _A + dst.astype(np.uint64) * _B \
        + np.uint64(seed)
    x ^= x >> np.uint64(30)
    x *= _B
    x ^= x >> np.uint64(27)
    x *= _C
    x ^= x >> np.uint64(31)
    return x


def percolation_profile(
    eds: ray.data.Dataset,
    vids: np.ndarray,
    levels=(0.2, 0.4, 0.6, 0.8),
    seed: int = 42,
    n_workers: int = 8,
) -> pd.DataFrame:
    """Columns (p, m_kept, n_active, n_components, giant_frac) — one
    row per keep-rate; components and the giant fraction are over
    ACTIVE vertices (≥ 1 kept edge).  ``eds`` is the canonical
    (src < dst) edge Dataset in RAW ids (the hash predicate is over
    raw values — the SQL-mirrorable contract); ``vids`` the sorted
    raw-id universe for densification."""
    from pgd_ray.graph.csr import build_csr
    from pgd_ray.graph.normalize import densify
    from pgd_ray.graph.iterative import connected_components

    eds = eds.materialize()
    n = len(vids)
    rows = []
    for p in levels:
        thresh = np.uint64(int(p * 2.0 ** 64))

        def keep(t: pa.Table, thresh=thresh) -> pa.Table:
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            return t.filter(pa.array(_edge_hash(s, d, seed) < thresh))

        kept = eds.map_batches(keep, batch_format="pyarrow").materialize()
        m_kept = int(kept.count())
        if m_kept == 0:
            rows.append((float(p), 0, 0, 0, 0.0))
            continue
        csr = build_csr(densify(kept, vids), n=n)
        comp = connected_components(csr, n_workers=n_workers)
        active = csr.degrees() > 0
        n_active = int(active.sum())
        labs = comp[active]
        _, sizes = np.unique(labs, return_counts=True)
        rows.append((float(p), m_kept, n_active, len(sizes),
                     round(float(sizes.max()) / n_active, 9)))
    return pd.DataFrame(rows, columns=["p", "m_kept", "n_active",
                                       "n_components", "giant_frac"])


def attack_profile(
    eds: ray.data.Dataset,
    vids: np.ndarray,
    degrees: np.ndarray,
    fracs=(0.01, 0.05, 0.1, 0.2),
    n_workers: int = 8,
) -> pd.DataFrame:
    """Targeted-attack robustness: remove the top ⌈f·n⌉ vertices by
    (degree DESC, id ASC) and measure what survives — the classic
    complement of random bond percolation (scale-free graphs shrug at
    random failure and shatter under hub attack).  Per level: one
    broadcast-membership edge filter + CSR + distributed CC.  Columns
    (frac, n_removed, m_kept, n_active, n_components, giant_frac);
    giant over ACTIVE surviving vertices."""
    from pgd_ray.graph.csr import build_csr
    from pgd_ray.graph.normalize import densify
    from pgd_ray.graph.iterative import connected_components

    eds = eds.materialize()
    n = len(vids)
    order = np.lexsort((vids, -degrees.astype(np.int64)))
    rows = []
    for f in fracs:
        k = int(np.ceil(f * n))
        # broadcast the removed-id set once (ray.put + per-worker
        # cache) rather than pickling it into every task closure —
        # at 0.2·n ids the closure copy is the expensive path
        removed_ref = ray.put(np.sort(vids[order[:k]]))

        def keep(t: pa.Table, removed_ref=removed_ref) -> pa.Table:
            from pgd_ray.graph.cache import get_cached

            removed = get_cached(removed_ref)
            s = t["src"].to_numpy(zero_copy_only=False)
            d = t["dst"].to_numpy(zero_copy_only=False)
            bad = np.isin(s, removed) | np.isin(d, removed)
            return t.filter(pa.array(~bad))

        kept = eds.map_batches(keep, batch_format="pyarrow").materialize()
        m_kept = int(kept.count())
        if m_kept == 0:
            rows.append((float(f), k, 0, 0, 0, 0.0))
            continue
        csr = build_csr(densify(kept, vids), n=n)
        comp = connected_components(csr, n_workers=n_workers)
        active = csr.degrees() > 0
        n_active = int(active.sum())
        _, sizes = np.unique(comp[active], return_counts=True)
        rows.append((float(f), k, m_kept, n_active, len(sizes),
                     round(float(sizes.max()) / n_active, 9)))
    return pd.DataFrame(rows, columns=["frac", "n_removed", "m_kept",
                                       "n_active", "n_components",
                                       "giant_frac"])
