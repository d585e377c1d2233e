"""Product quantization: encode correctness vs numpy given the
returned codebooks, plus shape/determinism contracts."""

import numpy as np
import pyarrow.parquet as pq
import pytest

from pgd_ray.stages.quantization import pq_codes
from pgd_ray.util import read_parquet_clean

SF = "/root/testdata/sf0.001"


def test_pq_encode_matches_numpy():
    emb = read_parquet_clean(f"{SF}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
    codes_ds, C = pq_codes(emb, m=4, k=16, iters=3)
    out = codes_ds.to_pandas().sort_values("vec_id", ignore_index=True)

    ref = pq.read_table(f"{SF}/embeddings.parquet",
                        columns=["vec_id", "embedding"]).to_pandas()
    ref = ref.sort_values("vec_id", ignore_index=True)
    X = np.stack(ref["embedding"].to_numpy()).astype(np.float64)
    m, k, sub = C.shape
    assert m == 4 and k == 16 and sub == X.shape[1] // 4
    err = np.zeros(len(X))
    for j in range(m):
        Xj = X[:, j * sub:(j + 1) * sub]
        d2 = ((Xj[:, None, :] - C[j][None, :, :]) ** 2).sum(axis=2)
        a = np.argmin(d2, axis=1)
        assert (out[f"code_{j}"].to_numpy() == a).all()
        assert out[f"code_{j}"].between(0, k - 1).all()
        err += d2[np.arange(len(X)), a]
    assert np.allclose(out["sqerr"].to_numpy(), np.round(err, 6), atol=1e-9)
    assert (out["sqerr"] >= 0).all()
    # compression sanity: the codebook reconstruction beats the
    # trivial 1-centroid-per-subspace codebook (global subspace mean)
    err1 = 0.0
    for j in range(m):
        Xj = X[:, j * sub:(j + 1) * sub]
        err1 += ((Xj - Xj.mean(axis=0)) ** 2).sum(axis=1)
    assert out["sqerr"].mean() < err1.mean()


def test_pq_rejects_indivisible_dims():
    emb = read_parquet_clean(f"{SF}/embeddings.parquet",
                             columns=["vec_id", "embedding"])
    with pytest.raises(ValueError):
        pq_codes(emb, m=7)
