"""entity_groups vs a union-find reference over fuzzy_name_pairs."""

import numpy as np

from pgd_ray.stages.fuzzy import entity_groups, fuzzy_name_pairs

SF = "/root/testdata/sf0.001"


def _union_find(pairs):
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    return {x: find(x) for x in parent}


def test_entity_groups_matches_union_find():
    pairs = fuzzy_name_pairs(SF, max_dist=2)
    out = entity_groups(SF, max_dist=2).to_pandas()
    canon = dict(zip(out["p_name"], out["canonical"]))

    ref = _union_find(list(zip(pairs["name_a"], pairs["name_b"])))
    # every matched name maps to its component's lexicographic min
    for name, root in ref.items():
        comp = sorted(k for k, v in ref.items() if v == root)
        assert canon[name] == comp[0], name
    # unmatched names are their own canonical
    matched = set(ref)
    for name, c in canon.items():
        if name not in matched:
            assert c == name
    # canonical is always <= member (min-of-component contract)
    assert (out["canonical"] <= out["p_name"]).all()
    # pair consistency: matched pairs share a canonical
    for a, b in zip(pairs["name_a"], pairs["name_b"]):
        assert canon[a] == canon[b]
    # vocabulary coverage: one row per distinct name
    assert out["p_name"].is_unique and len(out) == len(canon)
    assert np.int64(len(out)) >= len(matched)
