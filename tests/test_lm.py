import math

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data as rd

from pgd_ray.text.lm import bigram_counts, bigram_lm_score


def _docs(texts):
    return rd.from_arrow(pa.table({
        "doc_id": np.arange(len(texts), dtype=np.int64),
        "text": texts,
    }))


def test_bigram_counts_exact():
    ds = _docs(["a b a b c", "b a"])
    got = bigram_counts(ds).to_pandas()
    got = {(r.w1, r.w2): r.c for r in got.itertuples()}
    assert got == {("a", "b"): 2, ("b", "a"): 2, ("b", "c"): 1}


def test_bigram_lm_score_matches_brute():
    texts = ["a b a b c", "b a", "c", ""]
    ds = _docs(texts)
    out = bigram_lm_score(ds).to_pandas().sort_values("doc_id")
    c = {("a", "b"): 2, ("b", "a"): 2, ("b", "c"): 1}
    cf = {"a": 2, "b": 3}
    exp0 = np.mean([math.log(c[p] / cf[p[0]]) for p in
                    [("a", "b"), ("b", "a"), ("a", "b"), ("b", "c")]])
    assert out["n_bigrams"].tolist() == [4, 1, 0, 0]
    assert abs(out["logprob"].iloc[0] - round(exp0, 6)) < 1e-9
    assert out["logprob"].iloc[1] == round(math.log(2 / 3), 6)
    assert out["logprob"].iloc[2] == 0.0 and out["logprob"].iloc[3] == 0.0


def test_bigram_lm_empty_corpus():
    out = bigram_lm_score(_docs(["", ""])).to_pandas()
    assert out["n_bigrams"].tolist() == [0, 0]
    assert out["logprob"].tolist() == [0.0, 0.0]


def test_char_entropy_brute(ray_session):
    import math

    import ray.data as rd

    from pgd_ray.text.entropy import char_entropy

    texts = ["aaaa", "abab", "abcd", ""]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(4)), "text": texts}))
    got = char_entropy(ds).to_pandas().set_index("doc_id")
    from collections import Counter
    for i, t in enumerate(texts):
        if not t:
            want = 0.0
        else:
            c = Counter(t)
            want = -sum(v / len(t) * math.log(v / len(t))
                        for v in c.values())
        assert abs(got.loc[i, "char_entropy"] - want) < 1e-6
        assert got.loc[i, "n_chars"] == len(t)


def test_unigram_cross_entropy_brute(ray_session):
    import math
    import re

    import ray.data as rd

    from pgd_ray.text.lm import unigram_cross_entropy

    texts = ["the cat sat", "the the cat", "dog"]
    ds = rd.from_arrow(pa.table({"doc_id": list(range(3)), "text": texts}))
    got = unigram_cross_entropy(ds).to_pandas().set_index("doc_id")
    from collections import Counter
    uni = Counter(w for t in texts for w in re.findall("[A-Za-z]+", t))
    n = sum(uni.values())
    for i, t in enumerate(texts):
        ws = re.findall("[A-Za-z]+", t)
        want = -sum(math.log(uni[w] / n) for w in ws) / len(ws)
        assert abs(got.loc[i, "cross_entropy"] - want) < 1e-6
