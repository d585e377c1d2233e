import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

SF = "/root/testdata/sf0.001"


def test_rake_matches_oracle():
    import __ray_entry__ as E

    got = E.queries()["rake_keyphrases"](SF).reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS FROM '{SF}/documents.parquet'")
    exp = con.execute(E.oracle_sql()["rake_keyphrases"]).df()
    assert got["phrase"].tolist() == exp["phrase"].tolist()
    assert got["n_words"].tolist() == exp["n_words"].tolist()
    assert got["freq"].tolist() == exp["freq"].tolist()
    assert np.allclose(got["score"], exp["score"], atol=2e-9)
    assert len(got) > 0


def test_rake_closed_form():
    from pgd_ray.text.rake import rake_keyphrases

    # "red apple" twice, "green apple" once; stopword 'the' splits
    docs = ray.data.from_items([
        {"text": "the red apple and the green apple"},
        {"text": "red apple!"},
    ])
    out = rake_keyphrases(docs, top_k=10)
    # word stats: red f2 d4, apple f3 d6, green f1 d2
    # scores: red 2.0, apple 2.0, green 2.0
    want = {"red apple": (2, 2, 4.0), "green apple": (2, 1, 4.0)}
    got = {r.phrase: (r.n_words, r.freq, r.score)
           for r in out.itertuples()}
    assert got == want


def test_degree_gini_matches_oracle_and_star():
    import __ray_entry__ as E

    got = E.queries()["degree_gini"](SF)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS FROM '{SF}/lineitem.parquet'")
    exp = con.execute(E.oracle_sql()["degree_gini"]).df()
    assert got["n_vertices"].tolist() == exp["n_vertices"].tolist()
    assert np.allclose(got["mean_degree"], exp["mean_degree"], atol=2e-9)
    assert np.allclose(got["gini"], exp["gini"], atol=2e-9)

    from pgd_ray.graph.degrees import degree_gini

    # star K1,5: hub degree 5, five leaves degree 1
    src = np.zeros(5, np.int64)
    dst = np.arange(1, 6, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    out = degree_gini(ds)
    # sorted degrees [1,1,1,1,1,5]: G = 2*(1+2+3+4+5+30)/(6*10) - 7/6
    # engine rounds to 9 — compare at that precision
    assert abs(float(out["gini"][0]) - (2 * 45 / 60 - 7 / 6)) < 1e-9
    # regular graph (triangle): G = 0
    tri = ray.data.from_arrow(pa.table(
        {"src": np.array([0, 0, 1], np.int64),
         "dst": np.array([1, 2, 2], np.int64)}))
    assert float(degree_gini(tri)["gini"][0]) == 0.0
