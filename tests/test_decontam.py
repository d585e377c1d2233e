import numpy as np
import pyarrow as pa
import ray.data as rd

from pgd_ray.text.decontam import contaminated_ngrams, decontaminate


def _ds(texts, ids=None):
    ids = ids if ids is not None else np.arange(len(texts), dtype=np.int64)
    return rd.from_arrow(pa.table({"doc_id": np.asarray(ids, np.int64),
                                   "text": texts}))


def test_contaminated_ngrams_distinct():
    bench = _ds(["a b c d", "b c d e", "a b c d"])
    g = contaminated_ngrams(bench, n=3)
    assert sorted(g) == ["a b c", "b c d", "c d e"]


def test_decontaminate_flags_overlap():
    bench = _ds(["the quick brown fox jumps"], ids=[100])
    docs = _ds([
        "the quick brown fox sleeps",          # shares "the quick brown" etc? n=4: "the quick brown fox" yes
        "a completely different document here",
        "quick brown fox jumps high today",    # shares "quick brown fox jumps"
    ])
    out = decontaminate(docs, bench, n=4).to_pandas().sort_values("doc_id")
    assert out["keep"].tolist() == [False, True, False]
    assert out["n_shared"].tolist() == [1, 0, 1]


def test_decontaminate_short_docs_keep():
    bench = _ds(["a b c d e f g h"])
    docs = _ds(["a b c", ""])  # shorter than n -> no n-grams -> keep
    out = decontaminate(docs, bench, n=8).to_pandas()
    assert out["keep"].all()
    assert (out["n_shared"] == 0).all()


def test_decontaminate_counts_distinct_not_occurrences():
    bench = _ds(["x y z w"])
    docs = _ds(["x y z w x y z w x y z w"])  # same 4-gram repeats
    out = decontaminate(docs, bench, n=4).to_pandas()
    # distinct shared 4-grams: "x y z w" plus rotations present in doc
    # but only those also in bench (just one)
    assert out["n_shared"].tolist() == [1]
