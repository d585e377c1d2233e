import numpy as np
import pyarrow as pa
import ray.data as rd

from pgd_ray.stages.kmv import kmv_distinct
from pgd_ray.text.hashing import splitmix64


def _ds(vals, parts=1):
    ds = rd.from_arrow(pa.table({"x": pa.array(vals, pa.int64())}))
    return ds.repartition(parts) if parts > 1 else ds


def test_kmv_exact_below_k():
    vals = list(range(100)) * 3  # 100 distinct, duplicated
    out = kmv_distinct(_ds(vals, parts=5), "x", k=256)
    assert out["k_used"][0] == 100 and out["est_distinct"][0] == 100.0


def test_kmv_estimator_matches_reference_and_partition_invariant():
    rng = np.random.default_rng(4)
    vals = rng.integers(0, 10**12, 20_000)
    h = np.unique(splitmix64(vals.astype(np.int64)))
    kth = h[255]
    want = round(255 * 2.0**64 / float(kth), 6)
    for parts in (1, 9):
        out = kmv_distinct(_ds(vals.tolist(), parts=parts), "x", k=256)
        assert out["k_used"][0] == 256
        assert out["kth_hash"][0] == np.int64(kth >> np.uint64(1))
        assert out["est_distinct"][0] == want
    n_true = len(np.unique(vals))
    # k=256 gives ~6% relative error at 3 sigma
    assert abs(out["est_distinct"][0] - n_true) / n_true < 0.25


def test_kmv_empty():
    out = kmv_distinct(_ds([]), "x", k=16)
    assert out["est_distinct"][0] == 0.0 and out["k_used"][0] == 0


def test_zipf_slope_on_planted_powerlaw():
    from pgd_ray.text.analysis import zipf_slope

    # plant counts ∝ rank^-1 exactly: slope must be ≈ -1
    words = [f"w{chr(97 + i // 26)}{chr(97 + i % 26)}" for i in range(50)]
    texts = []
    for i, w in enumerate(words):
        texts.extend([w] * max(1, 1000 // (i + 1)))
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(len(texts)), pa.int64()),
        "text": pa.array(texts, pa.string()),
    })).repartition(6)
    out = zipf_slope(docs, n=50)
    assert out["n_terms"][0] == 50
    assert abs(out["slope"][0] + 1.0) < 0.02  # floor() quantization


def test_zipf_slope_empty_corpus():
    from pgd_ray.text.analysis import zipf_slope

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([], pa.int64()),
        "text": pa.array([], pa.string())}))
    out = zipf_slope(docs)
    assert out["n_terms"][0] == 0 and np.isnan(out["slope"][0])
