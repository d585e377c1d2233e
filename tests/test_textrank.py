import duckdb
import numpy as np
import pandas as pd
import ray.data

SF = "/root/testdata/sf0.001"


def test_textrank_matches_duckdb_oracle():
    import __ray_entry__ as E

    got = E.queries()["textrank_keywords"](SF).reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS FROM '{SF}/documents.parquet'")
    exp = con.execute(E.oracle_sql()["textrank_keywords"]).df()
    assert got["word"].tolist() == exp["word"].tolist()
    assert np.allclose(got["score"], exp["score"], atol=2e-9)
    # PageRank mass sums to ~1 over the node set
    assert abs(got["score"].sum() - 1.0) < 1e-6
    assert len(got) > 0


def test_textrank_tiny_ring():
    from pgd_ray.text.textrank import textrank_keywords

    # "a b c a" per doc: vocab {a,b,c}; edges a-b, b-c, c-a — a 3-ring,
    # so all scores equal 1/3 by symmetry
    docs = ray.data.from_items([{"text": "aa bb cc aa"},
                                {"text": "bb cc"}])
    out = textrank_keywords(docs, vocab_size=10)
    assert sorted(out["word"]) == ["aa", "bb", "cc"]
    assert np.allclose(out["score"], 1.0 / 3.0, atol=1e-9)


def test_textrank_empty_and_no_pairs():
    from pgd_ray.text.textrank import textrank_keywords

    out = textrank_keywords(
        ray.data.from_items([{"text": "solo"}]), vocab_size=10)
    # a single token never co-occurs -> no nodes
    assert len(out) == 0
    out2 = textrank_keywords(
        ray.data.from_items([{"text": "123 456"}]), vocab_size=10)
    assert len(out2) == 0
