"""Self-trained bigram language-model quality scoring — the
"perplexity filter" of LLM data pipelines (CCNet's wiki-LM filter,
Gopher's quality signals), with the corpus as its own training set:

    pass 1  — corpus bigram counts  c(w1, w2)  (and their prefix
              marginals cfirst(w1) = Σ_x c(w1, x))
    pass 2  — per-document mean bigram log-likelihood
              score(d) = (1/B) Σ_i ln( c(wᵢ, wᵢ₊₁) / cfirst(wᵢ) )

MLE, no smoothing: every scored bigram was counted in pass 1, so the
ratio is always in (0, 1].  Low scores mark documents whose word
transitions are rare in the corpus — the unigram-independent analogue
of the repetition rules in ``text/analysis.py``.

Execution shape: pass 1 emits per-batch PARTIAL bigram counts (one
groupby-hash inside the task, so the shuffle carries ≤ batch-vocab²
rows per batch, never one row per token occurrence — the
``_TokenCounts`` pattern one order up); ONE groupby(w1, w2) exchange
combines them.  Pass 2 broadcasts the count table (``ray.put`` once,
zero-copy per worker) and scores with searchsorted lookups — no
Python loop over tokens, no second shuffle.

Scale note: the count table is O(realized bigram vocab).  For
open-vocabulary corpora prune to the top-K bigrams + an UNK floor
before broadcasting (the ``vocab_topk`` machinery); the synthetic
corpus' vocab is small enough to keep exact, which is what the SQL
oracle mirrors.  Tokenization is ``[A-Za-z]+`` — byte-identical
between Python re and DuckDB RE2 (see ``text/analysis.WORD_RE``).
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


def _bigram_partials(b: pd.DataFrame, column: str) -> pd.DataFrame:
        lists = b[column].fillna("").str.findall(_TOK_RE)
        lens = lists.str.len().to_numpy(dtype=np.int64)
        if int(lens.sum()) == 0:
            return pd.DataFrame({"w1": pd.Series([], dtype=object),
                                 "w2": pd.Series([], dtype=object),
                                 "c": pd.Series([], dtype="int64")})
        toks = np.concatenate([np.asarray(l, dtype=object) for l in lists])
        did = np.repeat(np.arange(len(lens)), lens)
        ok = did[:-1] == did[1:]  # no cross-document bigrams
        df = pd.DataFrame({"w1": toks[:-1][ok], "w2": toks[1:][ok]})
        g = df.groupby(["w1", "w2"], sort=False).size()
        out = g.reset_index()
        out.columns = ["w1", "w2", "c"]
        out["c"] = out["c"].astype("int64")
        return out


def bigram_counts(
    docs: ray.data.Dataset, column: str = "text", concurrency: int | None = 16
) -> ray.data.Dataset:
    """Corpus bigram count table (w1, w2, c)."""
    return (
        docs.select_columns([column])
        .map_batches(
            _bigram_partials, fn_kwargs={"column": column},
            batch_format="pandas", batch_size=4096, concurrency=concurrency,
        )
        .groupby(["w1", "w2"])
        .aggregate(Sum("c", alias_name="c"))
    )


_LM_CACHE: dict = {}


def _lm_state(ref):
    key = ref.hex()
    st = _LM_CACHE.get(key)
    if st is None:
        st = ray.get(ref)
        _LM_CACHE.clear()
        _LM_CACHE[key] = st
    return st


def _score_batch(b: pd.DataFrame, lm_ref, column: str) -> pd.DataFrame:
    vocab, keys, logp = _lm_state(lm_ref)
    lists = b[column].fillna("").str.findall(_TOK_RE)
    lens = lists.str.len().to_numpy(dtype=np.int64)
    nb = np.maximum(lens - 1, 0)
    score = np.zeros(len(b), dtype=np.float64)
    if int(nb.sum()):
        toks = np.concatenate([np.asarray(l, dtype=object) for l in lists])
        tid = np.searchsorted(vocab, toks)
        did = np.repeat(np.arange(len(lens)), lens)
        ok = did[:-1] == did[1:]
        key = tid[:-1][ok] * np.int64(len(vocab)) + tid[1:][ok]
        lp = logp[np.searchsorted(keys, key)]
        sums = np.zeros(len(b), dtype=np.float64)
        np.add.at(sums, did[:-1][ok], lp)
        score[nb > 0] = sums[nb > 0] / nb[nb > 0]
    return pd.DataFrame({
        "doc_id": b["doc_id"].to_numpy(),
        "n_bigrams": nb,
        "logprob": np.round(score, 6),
    })


def bigram_lm_score(
    docs: ray.data.Dataset, column: str = "text", concurrency: int | None = 16
) -> ray.data.Dataset:
    """Per-document mean bigram log-likelihood under the corpus' own
    bigram MLE.  Columns (doc_id, n_bigrams, logprob); documents with
    fewer than 2 tokens score 0.0.  The corpus is scanned twice
    (counts, then scores) — both streaming."""
    cnt = bigram_counts(docs, column=column, concurrency=concurrency).to_pandas()
    if cnt.empty:
        lm = ray.put((np.array([], dtype=object),
                      np.array([], dtype=np.int64),
                      np.array([], dtype=np.float64)))
    else:
        vocab = np.unique(np.concatenate([
            cnt["w1"].to_numpy(dtype=object), cnt["w2"].to_numpy(dtype=object)
        ]))
        i1 = np.searchsorted(vocab, cnt["w1"].to_numpy(dtype=object))
        i2 = np.searchsorted(vocab, cnt["w2"].to_numpy(dtype=object))
        c = cnt["c"].to_numpy(dtype=np.int64)
        cfirst = np.zeros(len(vocab), dtype=np.int64)
        np.add.at(cfirst, i1, c)
        key = i1 * np.int64(len(vocab)) + i2
        order = np.argsort(key)
        lm = ray.put((
            vocab,
            key[order],
            np.log(c[order] / cfirst[i1[order]].astype(np.float64)),
        ))
    return docs.select_columns(["doc_id", column]).map_batches(
        _score_batch,
        fn_kwargs={"lm_ref": lm, "column": column},
        batch_format="pandas", batch_size=4096, concurrency=concurrency,
    )


def _unigram_partials(b: pd.DataFrame, column: str) -> pd.DataFrame:
    lists = b[column].fillna("").str.findall(_TOK_RE)
    lens = lists.str.len().to_numpy(dtype=np.int64)
    if int(lens.sum()) == 0:
        return pd.DataFrame({"w": pd.Series([], dtype=object),
                             "c": pd.Series([], dtype="int64")})
    toks = np.concatenate([np.asarray(l, dtype=object) for l in lists])
    g = pd.Series(toks).groupby(toks, sort=False).size()
    out = g.reset_index()
    out.columns = ["w", "c"]
    out["c"] = out["c"].astype("int64")
    return out


def unigram_counts(
    docs: ray.data.Dataset, column: str = "text", concurrency: int | None = 16
) -> ray.data.Dataset:
    """Corpus unigram count table (w, c) — per-batch partials, one
    exchange."""
    return (
        docs.select_columns([column])
        .map_batches(
            _unigram_partials, fn_kwargs={"column": column},
            batch_format="pandas", batch_size=4096, concurrency=concurrency,
        )
        .groupby("w")
        .aggregate(Sum("c", alias_name="c"))
    )


def pmi_collocations(
    docs: ray.data.Dataset,
    column: str = "text",
    min_count: int = 5,
    concurrency: int | None = 16,
) -> pd.DataFrame:
    """Collocations by pointwise mutual information (Church & Hanks
    1990): for every bigram with count >= min_count,
    PMI = ln( (c_ab/N_bi) / ((c_a/N_uni)·(c_b/N_uni)) ).  Counting is
    the streaming partial-combine shape of ``bigram_counts``; only the
    >= min_count pairs and the unigram rows for words THEY mention
    reach the driver (O(#frequent pairs)).  Columns
    (w1, w2, n_pair, pmi)."""
    import pyarrow as pa
    import pyarrow.compute as pc_

    bc = bigram_counts(docs, column=column, concurrency=concurrency
                       ).materialize()
    uc = unigram_counts(docs, column=column, concurrency=concurrency
                        ).materialize()
    n_bi = bc.aggregate(Sum("c"))["sum(c)"] or 0
    n_uni = uc.aggregate(Sum("c"))["sum(c)"] or 0
    freq = bc.map_batches(
        lambda t: t.filter(pc_.greater_equal(t["c"], min_count)),
        batch_format="pyarrow",
    ).to_pandas()
    if freq.empty or n_bi == 0 or n_uni == 0:
        return pd.DataFrame({"w1": pd.Series([], dtype=object),
                             "w2": pd.Series([], dtype=object),
                             "n_pair": pd.Series([], dtype=np.int64),
                             "pmi": pd.Series([], dtype=np.float64)})
    needed = set(freq["w1"]) | set(freq["w2"])
    needed_ref = ray.put(needed)

    def in_needed(t: pa.Table, needed_ref) -> pa.Table:
        nd = ray.get(needed_ref) if isinstance(needed_ref, ray.ObjectRef) \
            else needed_ref
        return t.filter(pa.array(
            t["w"].to_pandas().isin(nd).to_numpy()))

    um = uc.map_batches(in_needed, fn_kwargs={"needed_ref": needed_ref},
                        batch_format="pyarrow").to_pandas()
    wmap = um.set_index("w")["c"]
    c = freq["c"].to_numpy(np.float64)
    c1 = freq["w1"].map(wmap).to_numpy(np.float64)
    c2 = freq["w2"].map(wmap).to_numpy(np.float64)
    pmi = np.log((c / float(n_bi)) / ((c1 / float(n_uni)) * (c2 / float(n_uni))))
    return pd.DataFrame({
        "w1": freq["w1"], "w2": freq["w2"],
        "n_pair": freq["c"].astype(np.int64),
        "pmi": np.round(pmi, 6),
    }).sort_values(["w1", "w2"], ignore_index=True)


def unigram_cross_entropy(
    docs: ray.data.Dataset, column: str = "text",
    concurrency: int | None = 16,
) -> ray.data.Dataset:
    """Per-document cross-entropy under the corpus' own unigram MLE:
    H(d) = -(1/|d|) Σ_w ln(c_w / N) — the simplest perplexity-style
    quality filter (bigram_lm_score's order-0 sibling).  Two streaming
    passes: counts (partial-combined), then a broadcast
    (vocab, logp) table scored per batch with searchsorted.  Columns
    (doc_id, n_tokens, cross_entropy); empty docs score 0."""
    cnt = unigram_counts(docs, column=column, concurrency=concurrency
                         ).to_pandas()
    if cnt.empty:
        state = ray.put((np.array([], dtype=object),
                         np.array([], dtype=np.float64)))
    else:
        cnt = cnt.sort_values("w", ignore_index=True)
        n = float(cnt["c"].sum())
        state = ray.put((
            cnt["w"].to_numpy(dtype=object),
            np.log(cnt["c"].to_numpy(np.float64) / n),
        ))

    def score(b: pd.DataFrame, state=state) -> pd.DataFrame:
        vocab, logp = _lm_state(state)
        lists = b[column].fillna("").str.findall(_TOK_RE)
        lens = lists.str.len().to_numpy(dtype=np.int64)
        h = np.zeros(len(b), dtype=np.float64)
        if int(lens.sum()):
            toks = np.concatenate([np.asarray(l, dtype=object)
                                   for l in lists])
            lp = logp[np.searchsorted(vocab, toks)]
            sums = np.zeros(len(b), dtype=np.float64)
            np.add.at(sums, np.repeat(np.arange(len(b)), lens), lp)
            nz = lens > 0
            h[nz] = -sums[nz] / lens[nz]
        return pd.DataFrame({
            "doc_id": b["doc_id"].to_numpy(),
            "n_tokens": lens,
            "cross_entropy": np.round(h, 6) + 0.0,
        })

    return docs.select_columns(["doc_id", column]).map_batches(
        score, batch_format="pandas", batch_size=4096,
        concurrency=concurrency)
