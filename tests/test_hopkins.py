import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

SF = "/root/testdata/sf0.001"


def test_hopkins_matches_oracle():
    import __ray_entry__ as E

    got = E.queries()["hopkins"](SF)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS FROM '{SF}/embeddings.parquet'")
    exp = con.execute(E.oracle_sql()["hopkins"]).df()
    assert got["m"].tolist() == exp["m"].tolist()
    for c in ("sum_u", "sum_w", "hopkins"):
        assert np.allclose(got[c], exp[c], rtol=0, atol=2e-9), c
    assert 0.0 < float(got["hopkins"][0]) < 1.0


def test_hopkins_clustered_beats_uniformish():
    from pgd_ray.stages.vector_stats import hopkins_statistic

    rng = np.random.default_rng(7)
    # tight clusters -> H near 1
    centers = rng.normal(size=(4, 8)) * 10
    pts = np.concatenate([c + rng.normal(size=(60, 8)) * 0.01
                          for c in centers])
    ds = ray.data.from_arrow(pa.table({
        "vec_id": np.arange(len(pts), dtype=np.int64),
        "embedding": pa.array([r for r in pts.astype(np.float32)],
                              pa.list_(pa.float32()))}))
    h_clustered = float(hopkins_statistic(ds, m=15)["hopkins"][0])
    # uniform box -> H near 0.5
    upts = rng.uniform(-1, 1, size=(240, 8))
    uds = ray.data.from_arrow(pa.table({
        "vec_id": np.arange(240, dtype=np.int64),
        "embedding": pa.array([r for r in upts.astype(np.float32)],
                              pa.list_(pa.float32()))}))
    h_uniform = float(hopkins_statistic(uds, m=15)["hopkins"][0])
    assert h_clustered > 0.9
    assert 0.3 < h_uniform < 0.75
    assert h_clustered > h_uniform


def test_hopkins_too_small_corpus():
    from pgd_ray.stages.vector_stats import hopkins_statistic

    ds = ray.data.from_arrow(pa.table({
        "vec_id": np.arange(5, dtype=np.int64),
        "embedding": pa.array([[0.0, 1.0]] * 5, pa.list_(pa.float32()))}))
    out = hopkins_statistic(ds, m=20)
    assert int(out["m"][0]) == 0 and np.isnan(float(out["hopkins"][0]))


def test_hard_negatives_matches_oracle():
    import __ray_entry__ as E

    got = E.queries()["hard_negatives"](SF).reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW embeddings AS FROM '{SF}/embeddings.parquet'")
    exp = con.execute(E.oracle_sql()["hard_negatives"]).df()
    assert len(got) == len(exp) > 0
    for c in ("probe_id", "probe_label", "rank",
              "neighbor_id", "neighbor_label"):
        assert got[c].tolist() == exp[c].tolist(), c
    assert np.allclose(got["dist"], exp["dist"], rtol=0, atol=2e-9)
    # the mined negatives genuinely cross labels
    assert (got["probe_label"] != got["neighbor_label"]).all()


def test_hard_negatives_semantics_tiny():
    from pgd_ray.stages.vector_stats import hard_negatives

    # two tight clusters with different labels: every probe's top
    # negatives are the other cluster, nearest first
    pts = np.concatenate([np.zeros((4, 3)), np.ones((4, 3))])
    pts[4:] += np.arange(4)[:, None] * 0.01
    ds = ray.data.from_arrow(pa.table({
        "vec_id": np.arange(8, dtype=np.int64),
        "embedding": pa.array([r for r in pts.astype(np.float32)],
                              pa.list_(pa.float32())),
        "label": pa.array([0] * 4 + [1] * 4, pa.int32())}))
    out = hard_negatives(ds, m=2, k=3)
    assert (out["probe_label"] != out["neighbor_label"]).all()
    # ranks increase with distance per probe
    for pid, grp in out.groupby("probe_id"):
        d = grp.sort_values("rank")["dist"].to_numpy()
        assert (np.diff(d) >= 0).all()
