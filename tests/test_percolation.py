"""Percolation profile vs a brute union-find reference."""

import numpy as np
import pandas as pd
import ray.data

from pgd_ray.graph.percolation import _edge_hash, percolation_profile


def _brute(src, dst, vids, p, seed=42):
    thr = np.uint64(int(p * 2.0 ** 64))
    keep = _edge_hash(src.astype(np.uint64), dst.astype(np.uint64),
                      seed) < thr
    ks, kd = src[keep], dst[keep]
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(ks, kd):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comps = {}
    for v in parent:
        comps.setdefault(find(v), []).append(v)
    active = len(parent)
    return (int(keep.sum()), active, len(comps),
            max((len(c) for c in comps.values()), default=0))


def test_percolation_matches_union_find():
    rng = np.random.default_rng(5)
    n = 300
    iu, ju = np.triu_indices(n, 1)
    keep = rng.random(len(iu)) < 0.02
    src, dst = iu[keep].astype(np.int64), ju[keep].astype(np.int64)
    vids = np.arange(n, dtype=np.int64)
    eds = ray.data.from_pandas(
        pd.DataFrame({"src": src, "dst": dst})).repartition(4)
    out = percolation_profile(eds, vids, levels=(0.3, 0.7), seed=42)
    for i, p in enumerate((0.3, 0.7)):
        m, act, nc, giant = _brute(src, dst, vids, p)
        r = out.iloc[i]
        assert int(r["m_kept"]) == m
        assert int(r["n_active"]) == act
        assert int(r["n_components"]) == nc
        assert abs(r["giant_frac"] - round(giant / act, 9)) < 1e-12
    # monotone: keeping more edges can't shrink the kept set
    assert out["m_kept"].is_monotonic_increasing


def test_attack_profile_union_find_and_monotone():
    from pgd_ray.graph.percolation import attack_profile

    rng = np.random.default_rng(9)
    n = 200
    iu, ju = np.triu_indices(n, 1)
    keep = rng.random(len(iu)) < 0.03
    src, dst = iu[keep].astype(np.int64), ju[keep].astype(np.int64)
    vids = np.arange(n, dtype=np.int64)
    deg = np.bincount(np.concatenate([src, dst]), minlength=n).astype(np.int64)
    eds = ray.data.from_pandas(
        pd.DataFrame({"src": src, "dst": dst})).repartition(4)
    out = attack_profile(eds, vids, deg, fracs=(0.05, 0.25))

    for i, f in enumerate((0.05, 0.25)):
        k = int(np.ceil(f * n))
        order = np.lexsort((vids, -deg))
        removed = set(vids[order[:k]].tolist())
        kept = [(a, b) for a, b in zip(src, dst)
                if a not in removed and b not in removed]
        parent = {}

        def find(x):
            parent.setdefault(x, x)
            while parent[x] != x:
                parent[x] = parent[parent[x]]
                x = parent[x]
            return x

        for a, b in kept:
            ra, rb = find(int(a)), find(int(b))
            if ra != rb:
                parent[max(ra, rb)] = min(ra, rb)
        comps = {}
        for v in parent:
            comps.setdefault(find(v), []).append(v)
        r = out.iloc[i]
        assert int(r["n_removed"]) == k
        assert int(r["m_kept"]) == len(kept)
        assert int(r["n_active"]) == len(parent)
        assert int(r["n_components"]) == len(comps)
        if parent:
            giant = max(len(c) for c in comps.values())
            assert abs(r["giant_frac"]
                       - round(giant / len(parent), 9)) < 1e-12
    # removing more hubs keeps fewer edges
    assert out["m_kept"].is_monotonic_decreasing
