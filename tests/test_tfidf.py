import math

import numpy as np
import pyarrow as pa
import ray.data as rd

from pgd_ray.text.tfidf import document_frequencies, tfidf_top_terms


def _ds(texts):
    return rd.from_arrow(pa.table({
        "doc_id": np.arange(len(texts), dtype=np.int64), "text": texts}))


def test_document_frequencies():
    ds = _ds(["a b a", "a c", "c c c"])
    got = {r.term: r.df for r in
           document_frequencies(ds).to_pandas().itertuples()}
    assert got == {"a": 2, "b": 1, "c": 2}


def test_tfidf_top_terms_exact():
    ds = _ds(["a b a", "a c", "c c c"])
    out = tfidf_top_terms(ds, k=2).to_pandas()
    d0 = out[out["doc_id"] == 0].reset_index(drop=True)
    # doc 0: b tf=1 idf=ln(3) = 1.0986 beats a tf=2 idf=ln(3/2) = 0.81
    assert d0["term"].tolist() == ["b", "a"]
    assert d0["tf"].tolist() == [1, 2]
    assert abs(d0["tfidf"][0] - round(math.log(3.0), 6)) < 1e-9
    assert abs(d0["tfidf"][1] - round(2 * math.log(3 / 2), 6)) < 1e-9
    # k cap respected everywhere
    assert (out.groupby("doc_id").size() <= 2).all()


def test_tfidf_empty_docs():
    out = tfidf_top_terms(_ds(["", "a a"]), k=3).to_pandas()
    assert set(out["doc_id"]) == {1}


def test_bm25_matches_brute():
    import numpy as np
    import pandas as pd
    import ray.data

    from pgd_ray.text.bm25 import bm25_rank

    docs = pd.DataFrame({
        "doc_id": np.arange(6, dtype=np.int64),
        "text": [
            "apple banana apple cherry",
            "banana banana date",
            "apple apple apple apple",
            "cherry date egg",
            "fig grape",          # no query terms -> excluded
            "apple banana",
        ],
    })
    ds = ray.data.from_pandas(docs)
    out = bm25_rank(ds, ["apple", "banana"], k=4, concurrency=None)
    # brute force
    toks = [t.split() for t in docs["text"]]
    N, dl = len(docs), np.array([len(t) for t in toks])
    avg = dl.sum() / N
    k1, b = 1.2, 0.75
    scores = {}
    for q in ["apple", "banana"]:
        df = sum(q in t for t in toks)
        idf = np.log(1 + (N - df + 0.5) / (df + 0.5))
        for i, t in enumerate(toks):
            tf = t.count(q)
            if tf:
                scores[i] = scores.get(i, 0.0) + (
                    idf * tf * (k1 + 1)
                    / (tf + k1 * (1 - b + b * dl[i] / avg)))
    want = sorted(((round(s, 6), -i) for i, s in scores.items()),
                  reverse=True)[:4]
    want_ids = [-i for _, i in want]
    assert list(out["doc_id"]) == want_ids
    assert list(out["rk"]) == [1, 2, 3, 4]
    got_scores = dict(zip(out["doc_id"], out["score"]))
    for (s, ni) in want:
        assert abs(got_scores[-ni] - s) < 1e-9
    assert 4 not in set(out["doc_id"])  # no-query-term doc excluded
