"""Round-3 screens: edge clustering coefficient, CUSUM changepoints,
day-of-week seasonality — engine vs DuckDB oracle + closed-form micro
cases."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

SF = "/root/testdata/sf0.001"


def _oracle(name, views):
    import __ray_entry__ as E

    con = duckdb.connect()
    for t in views:
        con.sql(f"CREATE VIEW {t} AS FROM '{SF}/{t}.parquet'")
    return con.execute(E.oracle_sql()[name]).df()


def test_edge_clustering_matches_oracle():
    import __ray_entry__ as E

    got = (E.queries()["edge_clustering"](SF)
           .sort_values(["src", "dst"]).reset_index(drop=True))
    exp = (_oracle("edge_clustering", ["lineitem"])
           .sort_values(["src", "dst"]).reset_index(drop=True))
    assert len(got) == len(exp) > 0
    assert (got["src"].to_numpy() == exp["src"].to_numpy()).all()
    assert (got["triangle"].to_numpy() == exp["triangle"].to_numpy()).all()
    assert np.allclose(got["ecc"], exp["ecc"], atol=2e-9)


def test_edge_clustering_closed_form_k4_pendant():
    from pgd_ray.graph.csr import csr_from_edge_arrays
    from pgd_ray.graph.graphlets import edge_clustering

    # K4 on {0,1,2,3} plus pendant 3-4
    src = np.array([0, 0, 0, 1, 1, 2, 3], np.int64)
    dst = np.array([1, 2, 3, 2, 3, 3, 4], np.int64)
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    csr = csr_from_edge_arrays(src, dst, n=5)
    out = (edge_clustering(ds, csr, concurrency=2).to_pandas()
           .sort_values(["src", "dst"]).reset_index(drop=True))
    # K4 edges not touching 3: deg 3,3 -> (2+1)/2 = 1.5
    k4 = out[(out.src < 3) & (out.dst < 3)]
    assert np.allclose(k4["ecc"], 1.5)
    # edges into 3 (deg 4): min deg 3 -> (2+1)/2 = 1.5 as well
    into3 = out[(out.dst == 3)]
    assert np.allclose(into3["ecc"], 1.5)
    # pendant 3-4: deg(4)=1 -> degenerate, pinned 0.0
    pend = out[(out.src == 3) & (out.dst == 4)]
    assert pend["triangle"].tolist() == [0]
    assert pend["ecc"].tolist() == [0.0]


def test_cusum_matches_oracle_and_flags():
    import __ray_entry__ as E

    got = E.queries()["cusum_daily"](SF).reset_index(drop=True)
    exp = _oracle("cusum_daily", ["events"])
    assert got["day"].tolist() == exp["day"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()
    for c in ("z", "s_pos", "s_neg"):
        assert np.allclose(got[c], exp[c], atol=2e-9), c
    assert got["flagged"].tolist() == exp["flagged"].tolist()
    # recurrence sanity: s_pos never negative, resets bounded
    assert (got["s_pos"] >= 0).all() and (got["s_neg"] >= 0).all()


def test_dow_seasonality_matches_oracle():
    import __ray_entry__ as E

    got = E.queries()["dow_seasonality"](SF).reset_index(drop=True)
    exp = _oracle("dow_seasonality", ["events"])
    assert got["dow"].tolist() == exp["dow"].tolist()
    assert got["n_days"].tolist() == exp["n_days"].tolist()
    assert np.allclose(got["mean_count"], exp["mean_count"], atol=2e-9)
    assert np.allclose(got["seasonal_index"], exp["seasonal_index"],
                       atol=2e-9)
    # indices average (weighted by day counts) to ~1
    w = got["n_days"].to_numpy(np.float64)
    idx = got["seasonal_index"].to_numpy(np.float64)
    assert abs((w * idx).sum() / w.sum() - 1.0) < 1e-6


def test_trending_daily_matches_oracle():
    import __ray_entry__ as E

    got = E.queries()["trending_daily"](SF).reset_index(drop=True)
    exp = _oracle("trending_daily", ["events"])
    for c in got.columns:
        assert got[c].tolist() == exp[c].tolist(), c
    # at most 3 per day, ranks 1..k
    per = got.groupby("day")["rnk"].agg(["count", "min", "max"])
    assert (per["count"] <= 3).all() and (per["min"] == 1).all()
