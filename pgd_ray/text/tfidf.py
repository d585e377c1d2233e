"""TF-IDF top terms per document — the classic sparse feature
extraction (Salton & Buckley 1988), two streaming passes:

    pass 1  — document frequencies df(t) = #docs containing t
              (per-batch DISTINCT (doc, term) partials, one exchange)
    pass 2  — per-doc term counts tf(d, t), scored
              tfidf = tf · ln(N / df)  with the raw document count N;
              each doc keeps its top-k terms by (tfidf DESC, term).

Determinism: integer tf/df and a total (score, term) order make the
top-k cutoff exact — the same contract as ``grouped_topk``.  The df
table is broadcast once (``ray.put``); pass 2 is one ``map_batches``
scan with factorize + segmented reductions (no Python loop over
tokens) and no shuffle.  Scale note: df state is O(vocab); for
open-vocabulary corpora prune to min_df ≥ 2 before broadcasting (the
synthetic corpus' vocab is small enough to keep exact, which the SQL
oracle mirrors).  Tokenizer is ``[A-Za-z]+`` (``analysis.WORD_RE``),
byte-identical between Python re and DuckDB RE2.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Sum

from pgd_ray.text.analysis import WORD_RE

_TOK_RE = re.compile(WORD_RE)

_TFIDF_CACHE: dict = {}


def _df_state(ref):
    key = ref.hex()
    st = _TFIDF_CACHE.get(key)
    if st is None:
        st = ray.get(ref)
        _TFIDF_CACHE.clear()
        _TFIDF_CACHE[key] = st
    return st


def _explode(texts: pd.Series) -> tuple[np.ndarray, np.ndarray]:
    lists = texts.fillna("").str.findall(_TOK_RE)
    lens = lists.str.len().to_numpy(dtype=np.int64)
    if int(lens.sum()) == 0:
        return np.array([], dtype=object), np.array([], dtype=np.int64)
    toks = np.concatenate([np.asarray(l, dtype=object) for l in lists])
    return toks, np.repeat(np.arange(len(lens)), lens)


def _df_partials(b: pd.DataFrame, column: str) -> pd.DataFrame:
    toks, did = _explode(b[column])
    if not len(toks):
        return pd.DataFrame({"term": pd.Series([], dtype=object),
                             "df": pd.Series([], dtype="int64")})
    pairs = pd.DataFrame({"d": did, "t": toks}).drop_duplicates()
    vc = pairs["t"].value_counts(sort=False)
    return pd.DataFrame({"term": vc.index.to_numpy(dtype=object),
                         "df": vc.to_numpy(dtype=np.int64)})


def document_frequencies(
    docs: ray.data.Dataset, column: str = "text", concurrency: int | None = 16
) -> ray.data.Dataset:
    """(term, df) over the corpus — per-batch distinct partials, one
    groupby exchange carrying ≤ batch-vocab rows per batch."""
    return (
        docs.select_columns([column])
        .map_batches(_df_partials, fn_kwargs={"column": column},
                     batch_format="pandas", batch_size=4096,
                     concurrency=concurrency)
        .groupby("term")
        .aggregate(Sum("df", alias_name="df"))
    )


def _score_batch(b: pd.DataFrame, df_ref, n_docs: int, k: int,
                 column: str) -> pd.DataFrame:
    terms, dfs = _df_state(df_ref)
    toks, did = _explode(b[column])
    if not len(toks):
        return pd.DataFrame({"doc_id": pd.Series([], dtype=b["doc_id"].dtype),
                             "term": pd.Series([], dtype=object),
                             "tf": pd.Series([], dtype="int64"),
                             "tfidf": pd.Series([], dtype="float64")})
    g = pd.DataFrame({"d": did, "t": toks}).groupby(["d", "t"], sort=False
                                                    ).size().reset_index()
    g.columns = ["d", "t", "tf"]
    tid = np.searchsorted(terms, g["t"].to_numpy(dtype=object))
    idf = np.log(float(n_docs) / dfs[tid])
    g["tfidf"] = g["tf"].to_numpy(dtype=np.float64) * idf
    # exact per-doc top-k by (tfidf DESC, term ASC): integer tf and a
    # shared idf per term make ties resolvable only through the term
    g = g.sort_values(["d", "tfidf", "t"],
                      ascending=[True, False, True], kind="stable")
    g = g.groupby("d", sort=False).head(k)
    return pd.DataFrame({
        "doc_id": b["doc_id"].to_numpy()[g["d"].to_numpy()],
        "term": g["t"].to_numpy(dtype=object),
        "tf": g["tf"].to_numpy(dtype=np.int64),
        "tfidf": np.round(g["tfidf"].to_numpy(), 6),
    })


def tfidf_top_terms(
    docs: ray.data.Dataset,
    k: int = 5,
    column: str = "text",
    concurrency: int | None = 16,
) -> ray.data.Dataset:
    """(doc_id, term, tf, tfidf): each document's top-k terms by
    (tfidf DESC, term).  Requires doc_id to be unique per row."""
    dfp = document_frequencies(docs, column=column,
                               concurrency=concurrency).to_pandas()
    n_docs = docs.count()
    if dfp.empty:
        terms = np.array([], dtype=object)
        dfs = np.array([], dtype=np.int64)
    else:
        order = np.argsort(dfp["term"].to_numpy(dtype=object))
        terms = dfp["term"].to_numpy(dtype=object)[order]
        dfs = dfp["df"].to_numpy(dtype=np.int64)[order]
    df_ref = ray.put((terms, dfs))
    return docs.select_columns(["doc_id", column]).map_batches(
        _score_batch,
        fn_kwargs={"df_ref": df_ref, "n_docs": int(n_docs), "k": k,
                   "column": column},
        batch_format="pandas", batch_size=4096, concurrency=concurrency,
    )
