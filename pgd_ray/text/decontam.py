"""Benchmark decontamination — flag training documents that share any
token n-gram with a benchmark/eval set (the GPT-3 appendix-C /
FLAN-style 13-gram rule, here parameterized).  A core hygiene pass of
LLM data pipelines: eval contamination silently inflates benchmark
scores, so candidate documents overlapping the eval set are dropped.

Contract: a document is contaminated iff it contains at least one
token n-gram (tokens = ``[A-Za-z]+``, byte-identical between Python re
and DuckDB RE2) that appears in ANY benchmark document.  Output is
(doc_id, n_shared, keep): the count of DISTINCT shared n-grams and
keep = (n_shared == 0).

Execution shape: pass 1 streams the (small) benchmark set and
collects its distinct n-gram strings to the driver — state ∝ the eval
set, never the corpus; the set is broadcast once (``ray.put``).
Pass 2 is one ``map_batches`` scan over the corpus with a vectorized
shifted-concat n-gram build and a hash-set membership test
(``pd.Index.isin`` — C path).  No shuffle anywhere.

Scale note: for eval sets too large to broadcast whole, hash the
n-grams (splitmix64 of the string) and broadcast the sorted hash
array instead — membership by searchsorted; the string set is kept
here because it is what the SQL oracle can mirror exactly.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import ray
import ray.data

from pgd_ray.text.analysis import WORD_RE

_TOK_RE = re.compile(WORD_RE)

_DC_CACHE: dict = {}


def _bench_set(ref):
    key = ref.hex()
    st = _DC_CACHE.get(key)
    if st is None:
        st = ray.get(ref)
        _DC_CACHE.clear()
        _DC_CACHE[key] = st
    return st


def _doc_ngrams(texts: pd.Series, n: int) -> tuple[np.ndarray, np.ndarray]:
    """(ngram strings, doc index) for every position, vectorized:
    explode tokens once, then n-1 shifted C-level string adds."""
    lists = texts.fillna("").str.findall(_TOK_RE)
    lens = lists.str.len().to_numpy(dtype=np.int64)
    total = int(lens.sum())
    if total < n:
        return np.array([], dtype=object), np.array([], dtype=np.int64)
    toks = np.concatenate([np.asarray(l, dtype=object) for l in lists])
    did = np.repeat(np.arange(len(lens)), lens)
    ok = did[: total - n + 1] == did[n - 1 :]  # n-gram stays in one doc
    g = pd.Series(toks[: total - n + 1], dtype=object)
    for k in range(1, n):
        # pandas C-level string add; the ' ' separator cannot appear
        # inside an [A-Za-z]+ token, so joins are unambiguous
        g = g + " " + pd.Series(toks[k : total - n + 1 + k], dtype=object)
    g = g.to_numpy(dtype=object)
    return g[ok], did[: total - n + 1][ok]


def contaminated_ngrams(
    bench: ray.data.Dataset, n: int = 8, column: str = "text"
) -> np.ndarray:
    """Distinct token n-grams of the benchmark set (driver-side —
    state ∝ eval set size)."""
    grams = []
    for b in bench.select_columns([column]).iter_batches(
        batch_size=4096, batch_format="pandas"
    ):
        g, _ = _doc_ngrams(b[column], n)
        if len(g):
            grams.append(np.unique(g))
    return (np.unique(np.concatenate(grams))
            if grams else np.array([], dtype=object))


def _scan(b: pd.DataFrame, bench_ref, n: int, column: str) -> pd.DataFrame:
    idx = _bench_set(bench_ref)
    g, did = _doc_ngrams(b[column], n)
    shared = np.zeros(len(b), dtype=np.int64)
    if len(g) and len(idx):
        # distinct shared n-grams per doc: unique (doc, gram) pairs
        m = pd.Index(g).isin(idx)
        if m.any():
            df = pd.DataFrame({"d": did[m], "g": g[m]})
            cnt = df.drop_duplicates().groupby("d").size()
            shared[cnt.index.to_numpy()] = cnt.to_numpy()
    return pd.DataFrame({
        "doc_id": b["doc_id"].to_numpy(),
        "n_shared": shared,
        "keep": shared == 0,
    })


def decontaminate(
    docs: ray.data.Dataset,
    bench: ray.data.Dataset,
    n: int = 8,
    column: str = "text",
    concurrency: int | None = 16,
) -> ray.data.Dataset:
    """(doc_id, n_shared, keep) per corpus document against the
    benchmark set's n-grams."""
    grams = contaminated_ngrams(bench, n=n, column=column)
    bench_ref = ray.put(pd.Index(grams))
    return docs.select_columns(["doc_id", column]).map_batches(
        _scan,
        fn_kwargs={"bench_ref": bench_ref, "n": n, "column": column},
        batch_format="pandas", batch_size=4096, concurrency=concurrency,
    )
