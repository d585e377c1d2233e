"""TextRank keyword extraction: PageRank over the corpus-level word
co-occurrence graph (Mihalcea & Tarau 2004), built entirely from the
engine's own parts.

Pipeline shape (all distributed until the tiny vocab-bounded tail):

1. vocabulary = the ``vocab_size`` most frequent ``[A-Za-z]+`` tokens
   (``text.analysis.vocab_topk``: per-batch partial counts, ONE
   shuffle of distinct (batch, token) rows, ordered head) — the
   frequency filter plays the part of the original paper's POS
   filter and bounds every downstream structure by vocab_size.
2. edges = distinct undirected co-occurrence pairs of ADJACENT tokens
   (window 2) whose endpoints are both in the vocabulary; adjacency
   is evaluated on the full token stream per document (non-vocab
   tokens break adjacency for their neighbors but are not spliced
   out).  Per batch: one vectorized pass (token→id via the C-path
   ``Series.map``, shifted-array bigram mask, per-batch ``np.unique``
   partial dedup) emitting at most vocab_size² candidate rows; the
   global distinct is one ``groupby``.  At 100 TB the shuffle carries
   ≤ vocab_size²/2 distinct rows — independent of corpus size.
3. scores = the engine's distributed PageRank
   (``graph.iterative.pagerank``) on the ≤ vocab_size-node graph,
   driven to its float64 fixpoint so the round-9 scores are stable
   against the oracle's fixed-iteration recursive-CTE mirror (the
   ``pagerank_copurchase`` contract).

Nodes are the vocabulary words that appear in ≥ 1 co-occurrence edge
(isolated vocabulary words carry no rank mass and are dropped, exactly
like the SQL mirror's vertex set, which is derived from the edge
list).  The reference has no text surface (SURVEY.md §2.8); this is a
round-3 training-pipeline addition wiring the signature iterative
kernel to the text stack.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from pgd_ray.text.analysis import WORD_RE, vocab_topk

from pgd_ray.util import bound_cls


class _VocabBigrams:
    """Per-batch co-occurrence partials: emits the batch-local DISTINCT
    (lo, hi) vocab-id pairs of adjacent tokens.  The word→id map is a
    plain dict constructor arg (≤ vocab_size entries, serialized by
    value — no object-store constructor refs, no ray#53727 restart
    hazard)."""

    def __init__(self, word_id: dict):
        self.tok = re.compile(WORD_RE)
        self.word_id = word_id

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        toks_per_doc = [self.tok.findall(t) for t in b["text"].fillna("")]
        lens = np.fromiter((len(t) for t in toks_per_doc), np.int64,
                           len(toks_per_doc))
        if not lens.sum():
            return pd.DataFrame({"lo": pd.Series([], dtype=np.int64),
                                 "hi": pd.Series([], dtype=np.int64)})
        flat = pd.Series(
            [t for ts in toks_per_doc for t in ts], dtype=object)
        ids = flat.map(self.word_id).fillna(-1).to_numpy(np.int64)
        doc_of = np.repeat(np.arange(len(lens)), lens)
        a, bb = ids[:-1], ids[1:]
        keep = (a >= 0) & (bb >= 0) & (a != bb) & (doc_of[:-1] == doc_of[1:])
        lo = np.minimum(a[keep], bb[keep])
        hi = np.maximum(a[keep], bb[keep])
        v = len(self.word_id)
        key = np.unique(lo * np.int64(v) + hi)
        return pd.DataFrame({"lo": key // v, "hi": key % v})


def textrank_keywords(
    docs: ray.data.Dataset,
    vocab_size: int = 200,
    alpha: float = 0.85,
    concurrency=(1, 16),
) -> pd.DataFrame:
    """Corpus-level TextRank: (word, score) for every vocabulary word
    with ≥ 1 adjacent co-occurrence, score = PageRank (damping
    ``alpha``, uniform teleport) on the undirected co-occurrence
    graph, rounded to 9; ordered (score desc, word asc)."""
    from ray.data.aggregate import Count

    from pgd_ray.graph.csr import csr_from_edge_arrays
    from pgd_ray.graph.iterative import pagerank

    vocab = vocab_topk(docs, n=vocab_size).to_pandas()
    empty = pd.DataFrame({"word": pd.Series([], dtype=object),
                          "score": pd.Series([], dtype=np.float64)})
    if vocab.empty:
        return empty
    words = vocab["token"].to_numpy(dtype=object)
    word_id = {w: i for i, w in enumerate(words)}

    pairs = (
        docs.select_columns(["text"])
        .map_batches(bound_cls(_VocabBigrams, word_id=word_id),
                     batch_format="pandas", batch_size=4096,
                     concurrency=concurrency)
        .groupby(["lo", "hi"])
        .aggregate(Count(alias_name="_n"))
        .to_pandas()  # ≤ vocab_size²/2 rows by construction
    )
    if pairs.empty:
        return empty
    lo = pairs["lo"].to_numpy(np.int64)
    hi = pairs["hi"].to_numpy(np.int64)

    # dense-reindex to the words that actually occur in an edge — the
    # SQL mirror's vertex set (derived from the edge list)
    nodes = np.unique(np.concatenate([lo, hi]))
    dense = np.full(len(words), -1, np.int64)
    dense[nodes] = np.arange(len(nodes))
    csr = csr_from_edge_arrays(dense[lo], dense[hi], n=len(nodes))
    pr = pagerank(csr, alpha=alpha, tol=1e-15, max_iter=400)

    out = pd.DataFrame({"word": words[nodes],
                        "score": np.round(pr, 9)})
    return out.sort_values(["score", "word"], ascending=[False, True],
                           ignore_index=True)
