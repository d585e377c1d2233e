"""PCA power iteration: eigh agreement on gapped data, projection."""
import numpy as np
import pyarrow as pa
import ray.data

from pgd_ray.stages.vector_stats import pca_project, pca_top_component


def _ds(m):
    return ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(len(m)), pa.int64()),
        "embedding": pa.array(list(m.astype(np.float32))),
    }))


def test_pca_matches_eigh_on_gapped_cloud():
    rng = np.random.default_rng(7)
    d = 16
    direction = rng.normal(size=d)
    direction /= np.linalg.norm(direction)
    # dominant variance along `direction`, small isotropic noise
    m = (np.outer(rng.normal(scale=5.0, size=400), direction)
         + rng.normal(scale=0.3, size=(400, d)))
    mu, v, lam = pca_top_component(_ds(m), iters=64)
    # the Dataset stores float32 — compare against the quantized cloud
    m32 = m.astype(np.float32).astype(np.float64)
    C = np.cov(m32, rowvar=False, bias=True)
    w_, V_ = np.linalg.eigh(C)
    assert abs(float(v @ V_[:, -1])) > 1 - 1e-9
    assert np.isclose(lam, w_[-1], rtol=1e-7)
    assert np.allclose(mu, m32.mean(axis=0), atol=1e-9)


def test_pca_project_values_and_determinism():
    rng = np.random.default_rng(1)
    m = rng.normal(size=(60, 8))
    ds = _ds(m).materialize()
    mu1, v1, _ = pca_top_component(ds)
    mu2, v2, _ = pca_top_component(ds)
    assert np.array_equal(v1, v2)  # deterministic fixed horizon
    p = pca_project(ds, mu1, v1).to_pandas().sort_values(
        "vec_id", ignore_index=True)
    # float32 storage quantizes the input; compare against the same
    ref = (m.astype(np.float32).astype(np.float64) - mu1) @ v1
    assert np.allclose(p["pc1"].to_numpy(), np.round(ref, 6), atol=1e-6)
