"""TwoNN intrinsic dimension and source shingle overlap checks."""
import numpy as np
import pyarrow as pa
import ray.data

from pgd_ray.stages.vector_stats import intrinsic_dimension
from pgd_ray.text.analysis import source_shingle_overlap


def test_twonn_recovers_plane_dimension():
    # points on a 2-D plane embedded in 8-D: ID ~ 2
    rng = np.random.default_rng(9)
    base = rng.normal(size=(2, 8))
    m = rng.normal(size=(800, 2)) @ base
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(800), pa.int64()),
        "embedding": pa.array(list(m.astype(np.float32))),
    }))
    out = intrinsic_dimension(ds)
    assert out["n_used"].iloc[0] == 800
    assert 1.5 < out["id_mle"].iloc[0] < 2.6


def test_source_overlap_known_shingles():
    docs = ray.data.from_arrow(pa.table({
        "source": pa.array(["a", "a", "b", "c"]),
        "text": pa.array([
            "one two three four five six",       # shingles: 2
            "one two three four five",           # dup of first shingle
            "one two three four five seven",     # shares 1 with a
            "zz yy xx ww vv",                    # disjoint
        ]),
    }))
    out = source_shingle_overlap(docs, k=5)
    row = out[(out.source_a == "a") & (out.source_b == "b")].iloc[0]
    # a: {"one..five", "two..six"}; b: {"one..five", "two..seven"}
    assert row["n_a"] == 2 and row["n_b"] == 2 and row["n_both"] == 1
    assert np.isclose(row["jaccard"], 1 / 3)
    rc = out[(out.source_a == "a") & (out.source_b == "c")].iloc[0]
    assert rc["n_both"] == 0 and rc["jaccard"] == 0.0
    assert len(out) == 3  # 3 source pairs
