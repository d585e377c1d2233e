"""clean_corpus: the canonical LLM-training-data hygiene pipeline as
ONE composed Ray Data flow —

    documents
      → fused per-batch analysis  (language id + quality score + md5)
      → language / quality filter
      → exact-duplicate removal   (keep the min doc_id per md5 group)
      → near-duplicate removal    (MinHash+LSH candidates → exact
                                   Jaccard verify → keep each dup
                                   group's min doc_id)
      → surviving (doc_id, token_count, quality)

Scale posture: the analysis pass is a single actor-pool
``map_batches`` over (doc_id, text) — one corpus scan computes every
per-doc signal.  The exact-dedup exchange is a ``groupby(md5)``
aggregate whose result is ∝ the number of DUPLICATED groups (not the
corpus), broadcast as a drop-set; the near-dup stage is the banded
MinHash pipeline (its shuffle is the band groupby), and its drop-set
is ∝ the number of near-duplicate members.  No stage materializes the
corpus on the driver.

Reference model: PGD has no text stages; this composes the operators
the 100 TB tier adds on top (SURVEY.md §2 round-2 additions), each of
which is independently oracle-checked — the composition is mirrored
end-to-end in ``__ray_entry__.oracle_sql()['clean_corpus']``.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray
import ray.data

from pgd_ray.text.analysis import _LANG_PROFILES, TOKEN_RE, WORD_RE, DIGIT_RE


class _AnalyzeBatch:
    """One fused pass: per-doc language guess, quality score and md5 —
    the three signals every downstream filter needs, from one read of
    the text column (three separate stages would scan it three times)."""

    def __init__(self):
        import re

        self.lang_patterns = {
            lang: r"(?<![a-zA-Z])(?:" + "|".join(sorted(words)) + r")(?![a-zA-Z])"
            for lang, words in _LANG_PROFILES.items()
        }
        # re.ASCII keeps \w identical to the DuckDB oracle's RE2 ASCII
        # \w (and to text.packing._TokCount) on non-ASCII text
        self.token_re = re.compile(TOKEN_RE, re.ASCII)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        text = b["text"].fillna("")
        low = text.str.lower()
        n_chars = text.str.len().astype("int64")
        token_count = text.str.count(self.token_re).astype("int64")
        word_count = text.str.count(WORD_RE).astype("int64")
        digit_count = text.str.count(DIGIT_RE).astype("int64")
        quality = (
            0.4 * np.minimum(n_chars / 200.0, 1.0)
            + 0.5 * (word_count / np.maximum(token_count, 1))
            + 0.1 * (1.0 - digit_count / np.maximum(n_chars, 1))
        ).round(6)
        langs = sorted(self.lang_patterns)
        hits = np.stack(
            [low.str.count(self.lang_patterns[lang]).to_numpy() for lang in langs]
        )
        best = hits.argmax(axis=0)
        best_hits = hits[best, np.arange(hits.shape[1])]
        pred = np.where(best_hits > 0, np.array(langs, dtype=object)[best], "und")
        md5s = [hashlib.md5(t.encode()).hexdigest() for t in text]
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "text": text,
                "lang_pred": pred,
                "token_count": token_count,
                "quality": quality,
                "md5": md5s,
            }
        )


def clean_corpus(
    docs: ray.data.Dataset,
    lang: str = "en",
    quality_min: float = 0.9,
    nd_threshold: float = 0.7,
    concurrency=(1, 16),
) -> pd.DataFrame:
    """Run the full hygiene chain; returns the survivors' (doc_id,
    token_count, quality) as pandas (oracle-compare convenience) —
    ``clean_corpus_ds`` is the Dataset-out contract for composition."""
    out = clean_corpus_ds(docs, lang=lang, quality_min=quality_min,
                          nd_threshold=nd_threshold,
                          concurrency=concurrency).to_pandas()
    if out.empty:  # empty frames come back column-less
        return pd.DataFrame(
            {
                "doc_id": pd.Series([], dtype="int64"),
                "token_count": pd.Series([], dtype="int64"),
                "quality": pd.Series([], dtype="float64"),
            }
        )
    return out.sort_values("doc_id", ignore_index=True)


def clean_corpus_ds(
    docs: ray.data.Dataset,
    lang: str = "en",
    quality_min: float = 0.9,
    nd_threshold: float = 0.7,
    concurrency=(1, 16),
) -> ray.data.Dataset:
    """The hygiene chain with the survivors left DISTRIBUTED: a
    Dataset of (doc_id, token_count, quality) — every kept doc is its
    (exact and near) duplicate group's minimum doc_id."""
    from pgd_ray.text.dedup import candidate_pairs_minhash

    analyzed = docs.select_columns(["doc_id", "text"]).map_batches(
        _AnalyzeBatch,
        batch_format="pandas",
        batch_size=4096,
        concurrency=concurrency,
    )
    filt = analyzed.filter(
        expr=f"lang_pred == '{lang}' and quality >= {quality_min!r}"
    ).materialize()

    # exact dedup: per-md5 min doc_id; only groups with >1 member
    # produce drops, so the broadcast set is ∝ duplicate count
    agg = (
        filt.groupby("md5")
        .aggregate(
            ray.data.aggregate.Min("doc_id", alias_name="keep_id"),
            ray.data.aggregate.Count(alias_name="n"),
        )
        .filter(expr="n > 1")
        .to_pandas()
    )
    keep_of_md5 = (
        dict(zip(agg["md5"], agg["keep_id"])) if len(agg) else {}
    )  # empty frames come back column-less
    keep_ref = ray.put(keep_of_md5)

    def drop_exact(b: pd.DataFrame) -> pd.DataFrame:
        km = ray.get(keep_ref)
        keep_ids = b["md5"].map(km)
        mask = keep_ids.isna() | (keep_ids == b["doc_id"])
        return b[mask]

    survivors = filt.map_batches(drop_exact, batch_format="pandas").materialize()

    # near-dup removal: banded-LSH candidates + exact-Jaccard verify,
    # union-find over the verified pairs (pairs ∝ near-dups, tiny
    # relative to the corpus), drop everything but each root
    pairs = candidate_pairs_minhash(
        survivors.select_columns(["doc_id", "text"]),
        threshold=nd_threshold,
        concurrency=concurrency,
    )
    drop: set[int] = set()
    if len(pairs):
        parent: dict[int, int] = {}

        def find(x: int) -> int:
            while parent.get(x, x) != x:
                parent[x] = parent.get(parent[x], parent[x])
                x = parent[x]
            return x

        for a, b_ in zip(pairs["doc_a"], pairs["doc_b"]):
            ra, rb = find(int(a)), find(int(b_))
            if ra != rb:
                lo, hi = (ra, rb) if ra < rb else (rb, ra)
                parent[hi] = lo
        drop = {x for x in parent if find(x) != x}
    drop_ref = ray.put(drop)

    def drop_neardups(b: pd.DataFrame) -> pd.DataFrame:
        d = ray.get(drop_ref)
        return b[~b["doc_id"].isin(d)] if d else b

    return (
        survivors.map_batches(drop_neardups, batch_format="pandas")
        .select_columns(["doc_id", "token_count", "quality"])
    )
