"""BM25 ranking of the corpus against a fixed query term set
(Robertson et al., Okapi BM25; idf per Lucene:
ln(1 + (N - df + 0.5)/(df + 0.5))).

Two streaming passes, same shape as tf-idf (`text/tfidf.py`):
    pass 1 — ONE `map_batches` scan emitting per-batch partials for
             df(t) of the query terms PLUS corpus length totals (a
             sentinel term "" row carries len_sum/n_docs — "" can
             never collide with a real [A-Za-z]+ token); one tiny
             groupby exchange of <= (|q|+1) rows per batch.
    pass 2 — broadcast the |q|-row idf table; score each doc, keep
             the per-batch top-k by (round(score,6) DESC, doc_id);
             driver merges #batches x k rows.

Determinism: ranking on the ROUNDED score kills summation-order float
jitter (<= |q| terms per doc), ties break on doc_id — the same
total-order contract as `grouped_topk`, so the k cutoff is exact and
the DuckDB oracle matches bit-for-bit.  Zero-score docs (no query
term) are excluded.
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum

from pgd_ray.text.tfidf import _explode


def bm25_rank(
    docs: ray.data.Dataset,
    query_terms: list[str],
    k: int = 20,
    k1: float = 1.2,
    b: float = 0.75,
    column: str = "text",
    id_col: str = "doc_id",
    concurrency: int | None = 16,
) -> pd.DataFrame:
    """Top-k docs by BM25 score for ``query_terms``.  Returns
    (id_col, score, rk) with score rounded to 6."""
    terms = list(dict.fromkeys(query_terms))  # dedup, keep order
    tset = np.array(terms, dtype=object)

    def stats_part(bdf: pd.DataFrame) -> pd.DataFrame:
        toks, did = _explode(bdf[column])
        n = len(bdf)
        lsum = int(len(toks))
        out_t, out_df = [""], [0]
        for t in terms:
            hit = did[toks == t]
            out_t.append(t)
            out_df.append(int(np.unique(hit).size))
        return pd.DataFrame({
            "term": pd.Series(out_t, dtype=object),
            "df": pd.Series(out_df, dtype="int64"),
            "len_sum": pd.Series([lsum] + [0] * len(terms), dtype="int64"),
            "n_docs": pd.Series([n] + [0] * len(terms), dtype="int64"),
        })

    agg = (docs.select_columns([id_col, column])
           .map_batches(stats_part, batch_format="pandas",
                        batch_size=4096, concurrency=concurrency)
           .groupby("term")
           .aggregate(Sum("df", alias_name="df"),
                      Sum("len_sum", alias_name="len_sum"),
                      Sum("n_docs", alias_name="n_docs"))
           .to_pandas())
    sent = agg[agg["term"] == ""].iloc[0]
    n_total = float(sent["n_docs"])
    avg_len = float(sent["len_sum"]) / n_total
    dfmap = dict(zip(agg["term"], agg["df"]))
    idf = np.array([np.log(1.0 + (n_total - dfmap.get(t, 0) + 0.5)
                           / (dfmap.get(t, 0) + 0.5)) for t in terms])
    idf_ref = ray.put(idf)

    def score_part(bdf: pd.DataFrame) -> pd.DataFrame:
        iv = ray.get(idf_ref)
        toks, did = _explode(bdf[column])
        dl = np.zeros(len(bdf), dtype=np.int64)
        if len(did):
            np.add.at(dl, did, 1)
        score = np.zeros(len(bdf), dtype=np.float64)
        for ti, t in enumerate(terms):
            tf = np.zeros(len(bdf), dtype=np.int64)
            hit = did[toks == t]
            if len(hit):
                np.add.at(tf, hit, 1)
            has = tf > 0
            score[has] += (iv[ti] * tf[has] * (k1 + 1)
                           / (tf[has] + k1 * (1.0 - b + b * dl[has] / avg_len)))
        out = pd.DataFrame({id_col: bdf[id_col].to_numpy(),
                            "score": np.round(score, 6)})
        out = out[out["score"] > 0]
        return out.sort_values(
            ["score", id_col], ascending=[False, True]).head(k)

    tops = (docs.select_columns([id_col, column])
            .map_batches(score_part, batch_format="pandas",
                         batch_size=4096, concurrency=concurrency)
            .to_pandas())
    tops = tops.sort_values(["score", id_col],
                            ascending=[False, True]).head(k)
    tops = tops.reset_index(drop=True)
    tops["rk"] = np.arange(1, len(tops) + 1, dtype=np.int64)
    return tops
