import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data as rd

from pgd_ray.stages.bloom import bloom_bits, bloom_semi_join


def test_bloom_has_no_false_negatives(ray_session):
    rng = np.random.default_rng(2)
    keys = rng.choice(10**9, size=2000, replace=False).astype(np.int64)
    build = rd.from_arrow(pa.table({"k": keys}))
    bits = bloom_bits(build, "k")
    from pgd_ray.stages.bloom import _bit_indices
    idx = _bit_indices(keys, 1 << 16, 4).reshape(-1, 4)
    hit = (bits[idx // 64] >> (idx % 64).astype(np.uint64)) & np.uint64(1)
    assert hit.astype(bool).all()  # every build key passes its filter


def test_bloom_semi_join_exact_and_selective(ray_session):
    rng = np.random.default_rng(5)
    build_keys = np.arange(0, 300, 3, dtype=np.int64)  # 100 keys
    probe_keys = rng.integers(0, 100000, 5000).astype(np.int64)
    probe = rd.from_arrow(pa.table({
        "k": probe_keys, "payload": np.arange(5000, dtype=np.int64)}))
    build = rd.from_arrow(pa.table({"bk": build_keys}))

    out = bloom_semi_join(probe, build, key="k", build_key="bk",
                          num_partitions=4).to_pandas()
    want = np.isin(probe_keys, build_keys)
    assert sorted(out["payload"]) == sorted(np.arange(5000)[want])

    # the prefilter is genuinely selective: far fewer than |probe|
    # candidates survive the bits (FP ~ (1 - e^(-k n/m))^k, tiny here)
    bits = bloom_bits(build, "bk")
    from pgd_ray.stages.bloom import _bit_indices
    idx = _bit_indices(probe_keys, 1 << 16, 4).reshape(-1, 4)
    hit = ((bits[idx // 64] >> (idx % 64).astype(np.uint64))
           & np.uint64(1)).astype(bool).all(axis=1)
    assert hit.sum() < 0.05 * len(probe_keys)
    assert (hit | ~want).all()  # no false negatives on the probe side
