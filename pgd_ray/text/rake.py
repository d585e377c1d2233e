"""RAKE keyphrase extraction (Rose et al. 2010): candidate phrases are
maximal runs of consecutive non-stopword tokens; each word scores
deg/freq over the phrase corpus (deg = Σ phrase length over its
occurrences, freq = occurrence count); a phrase scores the sum of its
member-word scores.

Contract (mirrored exactly by the SQL oracle): tokens are ``[a-z]+``
runs of ``lower(text)`` — punctuation vanishes at tokenization, so
adjacency spans it (phrases are delimited by STOPWORDS only; the
classic punctuation-delimiter variant would need a lossier regex
round-trip through RE2).  The stopword list is the fixed module
constant below.

Distribution shape: ONE scan of the corpus emits per-batch partials —
(tok, freq, deg) word rows and (phrase, plen, count) phrase rows in a
tagged union — so the shuffle carries O(per-batch vocab + per-batch
distinct phrases), never token occurrences.  Word scores come back to
the driver (corpus-vocab-sized — the vocab_topk caveat; cap upstream
for 10^9-doc corpora) and decorate the distinct-phrase table as a
broadcast dict; the ordered head is a driver sort over distinct
phrases.  The reference has no text surface (SURVEY.md §2.8)."""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray.data

# fixed contract — keep in lockstep with the oracle_sql() stoplist
STOPWORDS = (
    "the", "a", "an", "and", "or", "of", "to", "in", "on", "for",
    "with", "is", "are", "was", "were", "be", "been", "as", "at",
    "by", "from", "it", "this", "that", "these", "those",
)


class _RakePartials:
    """Per-batch tagged-union partials: kind 0 = word (key=tok,
    a=freq, b=deg), kind 1 = phrase (key=phrase, a=plen, b=count)."""

    def __init__(self):
        self.tok = re.compile(r"[a-z]+")
        self.stop = frozenset(STOPWORDS)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        toks_per_doc = [self.tok.findall(t.lower())
                        for t in b["text"].fillna("")]
        lens = np.fromiter((len(t) for t in toks_per_doc), np.int64,
                           len(toks_per_doc))
        empty = pd.DataFrame({"kind": pd.Series([], dtype=np.int64),
                              "key": pd.Series([], dtype=object),
                              "a": pd.Series([], dtype=np.int64),
                              "b": pd.Series([], dtype=np.int64)})
        if not lens.sum():
            return empty
        flat = np.array([t for ts in toks_per_doc for t in ts], object)
        doc_of = np.repeat(np.arange(len(lens)), lens)
        m = ~pd.Series(flat, dtype=object).isin(self.stop).to_numpy()
        if not m.any():
            return empty
        prev_m = np.concatenate(([False], m[:-1]))
        prev_doc = np.concatenate(([-1], doc_of[:-1]))
        boundary = m & (~prev_m | (prev_doc != doc_of))
        isl = np.cumsum(boundary) - 1  # valid where m
        isl_of_tok = isl[m]
        words = flat[m]
        plen = np.bincount(isl_of_tok)

        wdf = pd.DataFrame({"tok": words, "plen": plen[isl_of_tok]})
        wagg = wdf.groupby("tok", sort=False).agg(
            freq=("plen", "size"), deg=("plen", "sum"))
        phrases = (pd.Series(words, dtype=object)
                   .groupby(isl_of_tok).agg(" ".join))
        pdf = pd.DataFrame({"phrase": phrases.to_numpy(object),
                            "plen": plen.astype(np.int64)})
        pagg = pdf.groupby(["phrase", "plen"], sort=False).size()
        out_w = pd.DataFrame({
            "kind": np.int64(0), "key": wagg.index.to_numpy(object),
            "a": wagg["freq"].to_numpy(np.int64),
            "b": wagg["deg"].to_numpy(np.int64)})
        out_p = pd.DataFrame({
            "kind": np.int64(1),
            "key": pagg.index.get_level_values(0).to_numpy(object),
            "a": pagg.index.get_level_values(1).to_numpy(np.int64),
            "b": pagg.to_numpy(np.int64)})
        return pd.concat([out_w, out_p], ignore_index=True)


def rake_keyphrases(
    docs: ray.data.Dataset,
    top_k: int = 100,
    concurrency=(1, 16),
) -> pd.DataFrame:
    """Top-``top_k`` RAKE keyphrases over the corpus: columns
    (phrase, n_words, freq, score), ordered (score desc, phrase asc);
    score rounded to 9."""
    from ray.data.aggregate import Sum

    partials = docs.select_columns(["text"]).map_batches(
        _RakePartials, batch_format="pandas", batch_size=4096,
        concurrency=concurrency,
    ).materialize()

    words = (
        partials.filter(expr="kind == 0")
        .groupby("key")
        .aggregate(Sum("a", alias_name="freq"), Sum("b", alias_name="deg"))
        .to_pandas()
    )
    if words.empty:
        return pd.DataFrame({"phrase": pd.Series([], dtype=object),
                             "n_words": pd.Series([], dtype=np.int64),
                             "freq": pd.Series([], dtype=np.int64),
                             "score": pd.Series([], dtype=np.float64)})
    wscore = dict(zip(words["key"],
                      words["deg"].to_numpy(np.float64)
                      / words["freq"].to_numpy(np.float64)))

    phr = (
        partials.filter(expr="kind == 1")
        .groupby(["key", "a"])
        .aggregate(Sum("b", alias_name="freq"))
        .to_pandas()
    )
    score = np.array([
        float(np.sum([wscore[w] for w in p.split(" ")]))
        for p in phr["key"]
    ])
    out = pd.DataFrame({"phrase": phr["key"].to_numpy(object),
                        "n_words": phr["a"].to_numpy(np.int64),
                        "freq": phr["freq"].to_numpy(np.int64),
                        "score": np.round(score, 9)})
    return (out.sort_values(["score", "phrase"],
                            ascending=[False, True], ignore_index=True)
            .head(top_k).reset_index(drop=True))
