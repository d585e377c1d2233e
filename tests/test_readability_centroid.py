"""Flesch readability and nearest-centroid confusion unit checks."""
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from pgd_ray.stages.clustering import centroid_confusion
from pgd_ray.text.analysis import readability


def test_readability_hand_counts():
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["The cat sat. The dog ran!",
                          "no sentence punctuation here",
                          ""]),
    }))
    out = readability(docs).to_pandas().sort_values(
        "doc_id", ignore_index=True)
    r1 = out.iloc[0]
    assert r1["n_words"] == 6 and r1["n_sentences"] == 2
    # vowel groups: e,a,a,e,o,a -> 6
    assert r1["n_syllables"] == 6
    assert np.isclose(r1["flesch"],
                      206.835 - 1.015 * (6 / 2) - 84.6 * (6 / 6))
    r2 = out.iloc[1]
    assert r2["n_sentences"] == 1  # clamped
    r3 = out.iloc[2]
    assert r3["n_words"] == 0 and np.isclose(r3["flesch"], 206.835)


def test_centroid_confusion_separable_labels():
    rng = np.random.default_rng(2)
    a = rng.normal(loc=[5, 0, 0], scale=0.1, size=(30, 3))
    b = rng.normal(loc=[0, 5, 0], scale=0.1, size=(30, 3))
    emb = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(60), pa.int64()),
        "embedding": pa.array(list(np.vstack([a, b]).astype(np.float32))),
        "label": pa.array([0] * 30 + [1] * 30, pa.int32()),
    }))
    out = centroid_confusion(emb)
    d = {(r.label_true, r.label_pred): r.n for r in out.itertuples()}
    assert d == {(0, 0): 30, (1, 1): 30}  # perfectly separable
