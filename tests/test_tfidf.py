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
