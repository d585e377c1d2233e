"""Skyline operator vs O(n²) dominance brute force."""

import numpy as np
import pandas as pd
import ray.data

from pgd_ray.stages.skyline import _frontier


def _brute(price, size):
    n = len(price)
    keep = np.ones(n, bool)
    for i in range(n):
        for j in range(n):
            if i != j and price[j] <= price[i] and size[j] >= size[i] \
                    and (price[j] < price[i] or size[j] > size[i]):
                keep[i] = False
                break
    return keep


def test_frontier_matches_brute_random():
    rng = np.random.default_rng(21)
    price = rng.integers(0, 50, 300).astype(float)
    size = rng.integers(0, 50, 300).astype(np.int64)
    assert (_frontier(price, size) == _brute(price, size)).all()


def test_frontier_duplicates_survive_together():
    price = np.array([1.0, 1.0, 2.0])
    size = np.array([5, 5, 1], dtype=np.int64)
    keep = _frontier(price, size)
    assert keep[0] and keep[1] and not keep[2]


def test_skyline_parts_block_merge_consistency():
    # distributed result equals single-pass frontier on the collected
    # table (the union-of-frontiers property)
    import pyarrow.parquet as pq

    from pgd_ray.stages.skyline import skyline_parts

    SF = "/root/testdata/sf0.001"
    out = skyline_parts(SF)
    ref = pq.read_table(f"{SF}/part.parquet",
                        columns=["p_partkey", "p_retailprice",
                                 "p_size"]).to_pandas()
    keep = _frontier(ref["p_retailprice"].to_numpy(float),
                     ref["p_size"].to_numpy(np.int64))
    exp = ref[keep].sort_values("p_partkey", ignore_index=True)
    assert (out["p_partkey"].to_numpy() == exp["p_partkey"].to_numpy()).all()
