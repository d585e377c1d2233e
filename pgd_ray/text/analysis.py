"""Text analysis stages: token counting, quality scoring, language ID,
document fingerprinting.

All stages are actor-pool ``map_batches`` over the ``documents`` table:
regexes are compiled once per actor in ``__init__`` (not per batch),
the per-batch body is vectorized pandas string kernels.  Where a stage
is SQL-expressible its formula is mirrored verbatim in
``__ray_entry__.oracle_sql`` (token counts, quality components, md5
fingerprints); the n-gram language heuristic is rows-only checked.
"""

from __future__ import annotations

import hashlib
import re

import numpy as np
import pandas as pd
import ray.data

# mirrored in SQL: regexp_extract_all(text, pattern)
TOKEN_RE = r"\w+|[^\w\s]"  # BPE-ish: words plus standalone punctuation
WORD_RE = r"[A-Za-z]+"
PUNCT_RE = r"[.,;:!?]"
DIGIT_RE = r"[0-9]"

# tiny per-language stopword profiles for the n-gram/stopword heuristic
_LANG_PROFILES = {
    "en": {"the", "and", "of", "to", "a", "in", "is", "that", "it", "for"},
    "de": {"der", "die", "das", "und", "ist", "nicht", "ein", "mit", "zu", "den"},
    "fr": {"le", "la", "les", "et", "est", "un", "une", "des", "que", "pour"},
    "es": {"el", "la", "los", "las", "y", "es", "un", "una", "que", "por"},
}


class TextStats:
    """token_count, word_count, punct_count, digit_count, n_chars and a
    composite quality score in [0,1].  Formulas mirrored in SQL."""

    def __init__(self):
        self.token_re = re.compile(TOKEN_RE, re.ASCII)
        self.word_re = re.compile(WORD_RE)
        self.punct_re = re.compile(PUNCT_RE)
        self.digit_re = re.compile(DIGIT_RE)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        text = b["text"].fillna("")
        n_chars = text.str.len().astype("int64")
        # the COMPILED (re.ASCII) pattern: Python's Unicode \w would
        # diverge from the DuckDB oracle's RE2 ASCII \w on non-ASCII text
        token_count = text.str.count(self.token_re).astype("int64")
        word_count = text.str.count(WORD_RE).astype("int64")
        punct_count = text.str.count(PUNCT_RE).astype("int64")
        digit_count = text.str.count(DIGIT_RE).astype("int64")
        # quality: long enough, mostly words, little digit noise
        len_score = np.minimum(n_chars / 200.0, 1.0)
        word_ratio = word_count / np.maximum(token_count, 1)
        digit_ratio = digit_count / np.maximum(n_chars, 1)
        quality = (0.4 * len_score + 0.5 * word_ratio + 0.1 * (1.0 - digit_ratio)).round(6)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "n_chars": n_chars,
                "token_count": token_count,
                "word_count": word_count,
                "punct_count": punct_count,
                "digit_count": digit_count,
                "quality": quality,
            }
        )


def text_stats(docs: ray.data.Dataset, concurrency=(1, 16)) -> ray.data.Dataset:
    return docs.select_columns(["doc_id", "text"]).map_batches(
        TextStats, batch_format="pandas", batch_size=4096, concurrency=concurrency
    )


class LangId:
    """Stopword-profile language heuristic: the language whose stopword
    set hits the most tokens wins; ties and zero hits → 'und'
    (undetermined).  Deterministic; not SQL-expressible (rows-only
    oracle).

    Vectorized: one compiled alternation regex per language, counted
    with the pandas C string kernel — no per-row token loop.  The
    lookarounds pin matches to MAXIMAL letter runs, so counts equal
    "tokens from findall([a-zA-Z]+) that are in the stopword set"
    exactly (the previous per-row semantics)."""

    def __init__(self):
        self.patterns = {
            lang: r"(?<![a-zA-Z])(?:" + "|".join(sorted(words)) + r")(?![a-zA-Z])"
            for lang, words in _LANG_PROFILES.items()
        }

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        text = b["text"].fillna("").str.lower()
        langs = sorted(self.patterns)
        hits = np.stack([text.str.count(self.patterns[lang]).to_numpy() for lang in langs])
        best = hits.argmax(axis=0)  # ties → first alphabetically (as before)
        best_hits = hits[best, np.arange(hits.shape[1])]
        pred = np.where(best_hits > 0, np.array(langs, dtype=object)[best], "und")
        return pd.DataFrame({"doc_id": b["doc_id"], "lang_pred": pred})


def lang_id(docs: ray.data.Dataset, concurrency=(1, 16)) -> ray.data.Dataset:
    return docs.select_columns(["doc_id", "text"]).map_batches(
        LangId, batch_format="pandas", batch_size=4096, concurrency=concurrency
    )


class Fingerprint:
    """md5 of whitespace-normalized lowercase text (SQL-mirrorable:
    ``md5(lower(regexp_replace(text,'\\s+',' ','g')))``) plus a 64-bit
    polynomial rolling hash over the same normalization."""

    def __init__(self):
        self.ws = re.compile(r"\s+")

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        import pyarrow as pa

        from pgd_ray.text.hashing import arrow_string_bytes, fnv1a_rows

        norm = b["text"].fillna("").str.lower().str.replace(self.ws, " ", regex=True)
        # md5 stays per-row (hashlib has no batch API) — it is the
        # SQL-mirrored column; the fnv64 column is the vectorized
        # row-parallel FNV-1a (bit-identical to the byte loop).
        md5s = [hashlib.md5(t.encode()).hexdigest() for t in norm]
        data, s, e = arrow_string_bytes(pa.array(norm, pa.string()))
        rolls = fnv1a_rows(data, s, e)
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "md5": md5s,
                "fnv64": rolls.view(np.int64),
            }
        )


def fingerprints(docs: ray.data.Dataset, concurrency=(1, 16)) -> ray.data.Dataset:
    return docs.select_columns(["doc_id", "text"]).map_batches(
        Fingerprint, batch_format="pandas", batch_size=4096, concurrency=concurrency
    )


class _Repetition:
    """Gopher-style within-document repetition signals (Rae et al.
    2021 §A1.1, public paper): duplicate-word fraction, top-word
    fraction, duplicate-3-gram fraction.  Fully array-based per batch:
    one C-level findall per row, then factorize/segmented reductions —
    no per-word Python loop.  Mirrored exactly in SQL (parallel-unnest
    positions + self-joins for the 3-grams)."""

    #: keep thresholds (repetition above any of these → drop)
    DUP_WORD, TOP_WORD, DUP_3GRAM = 0.30, 0.20, 0.30

    def __init__(self):
        self.tok = re.compile(WORD_RE)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        import itertools

        lists = b["text"].fillna("").str.findall(self.tok)
        n_words = lists.str.len().to_numpy(dtype=np.int64)
        nb = len(b)
        out = {
            "doc_id": b["doc_id"].to_numpy(),
            "n_words": n_words,
            "dup_word_frac": np.zeros(nb),
            "top_word_frac": np.zeros(nb),
            "dup_3gram_frac": np.zeros(nb),
        }
        total = int(n_words.sum())
        if total:
            doc_idx = np.repeat(np.arange(nb, dtype=np.int64), n_words)
            flat = np.fromiter(
                itertools.chain.from_iterable(lists), dtype=object, count=total
            )
            codes, _ = pd.factorize(flat)
            # (doc, word) pair counts → distinct words + top count per doc
            key = (doc_idx << np.int64(32)) | codes.astype(np.int64)
            uk, cnt = np.unique(key, return_counts=True)
            kd = (uk >> np.int64(32)).astype(np.int64)
            n_distinct = np.bincount(kd, minlength=nb)
            run = np.flatnonzero(np.r_[True, kd[1:] != kd[:-1]])
            top = np.zeros(nb, dtype=np.int64)
            top[kd[run]] = np.maximum.reduceat(cnt, run)
            nz = n_words > 0
            out["dup_word_frac"][nz] = 1.0 - n_distinct[nz] / n_words[nz]
            out["top_word_frac"][nz] = top[nz] / n_words[nz]
            # 3-grams: consecutive in-doc triples (flat is doc-major)
            if total >= 3:
                tri_ok = doc_idx[:-2] == doc_idx[2:]
                if tri_ok.any():
                    g = (flat[:-2] + " " + flat[1:-1] + " " + flat[2:])[tri_ok]
                    gdoc = doc_idx[:-2][tri_ok]
                    gcodes, _ = pd.factorize(g)
                    gkey = (gdoc << np.int64(32)) | gcodes.astype(np.int64)
                    n3 = np.bincount(gdoc, minlength=nb)
                    d3 = np.bincount(
                        (np.unique(gkey) >> np.int64(32)).astype(np.int64),
                        minlength=nb,
                    )
                    z3 = n3 > 0
                    out["dup_3gram_frac"][z3] = 1.0 - d3[z3] / n3[z3]
        df = pd.DataFrame(out)
        for c in ("dup_word_frac", "top_word_frac", "dup_3gram_frac"):
            df[c] = df[c].round(6)
        df["keep"] = (
            (df["dup_word_frac"] <= self.DUP_WORD)
            & (df["top_word_frac"] <= self.TOP_WORD)
            & (df["dup_3gram_frac"] <= self.DUP_3GRAM)
        )
        return df


def repetition_stats(docs: ray.data.Dataset, concurrency=(1, 16)) -> ray.data.Dataset:
    """Per-doc repetition signals + keep flag (thresholds on the
    class).  Columns (doc_id, n_words, dup_word_frac, top_word_frac,
    dup_3gram_frac, keep)."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        _Repetition, batch_format="pandas", batch_size=4096,
        concurrency=concurrency,
    )


class _TokenCounts:
    """Per-batch partial token counts: findall + np.unique inside the
    batch, so the downstream ``groupby("token").sum`` shuffles at most
    (vocab-per-batch) rows per batch, never one row per token
    occurrence.  Pattern ``[A-Za-z]+`` is byte-identical between
    Python re and DuckDB's RE2 (no case folding, maximal munch)."""

    def __init__(self):
        self.tok = re.compile(WORD_RE)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        # one C-level findall over the joined batch ("\n" cannot occur
        # inside an [A-Za-z]+ token, so joining never merges tokens)
        toks = self.tok.findall("\n".join(b["text"].fillna("")))
        if not toks:
            return pd.DataFrame(
                {"token": pd.Series([], dtype=object),
                 "n": pd.Series([], dtype="int64")}
            )
        # hash-based counting over object strings: a fixed-width numpy
        # 'U' array would inflate every element to the LONGEST token's
        # width (one pathological letter-run × 1M tokens = GBs)
        vc = pd.Series(toks, dtype=object).value_counts(sort=False)
        return pd.DataFrame(
            {"token": vc.index.to_numpy(dtype=object),
             "n": vc.to_numpy(dtype=np.int64)}
        )


def vocab_topk(
    docs: ray.data.Dataset, n: int = 100, concurrency=(1, 16)
) -> ray.data.Dataset:
    """Top ``n`` ``[A-Za-z]+`` tokens by total occurrence count across
    the corpus (ties → token asc).  Partial per-batch counts →
    ``groupby("token")`` sum → distributed sort → limit: the shuffle
    carries one row per distinct (batch, token), and the final
    ordered head streams.  Columns (token, n_total)."""
    from ray.data.aggregate import Sum

    partial = docs.select_columns(["text"]).map_batches(
        _TokenCounts, batch_format="pandas", batch_size=4096, concurrency=concurrency
    )
    totals = partial.groupby("token").aggregate(Sum("n", alias_name="n_total"))
    return totals.sort(["n_total", "token"], descending=[True, False]).limit(n)


def zipf_slope(
    docs: ray.data.Dataset, n: int = 100, concurrency=(1, 16)
) -> pd.DataFrame:
    """Zipf rank-frequency exponent: the OLS slope of ln(count) on
    ln(rank) over the corpus's top-``n`` vocabulary (rank 1 = most
    frequent; ties -> token asc, the ``vocab_topk`` order).  Natural
    text sits near -1.  One distributed vocab pass (the vocab_topk
    shuffle); the regression is a closed form over n driver rows.
    Returns a single row (n_terms, slope, intercept)."""
    top = vocab_topk(docs, n=n, concurrency=concurrency).to_pandas()
    if top.empty:
        return pd.DataFrame({"n_terms": [np.int64(0)],
                             "slope": [np.nan], "intercept": [np.nan]})
    x = np.log(np.arange(1, len(top) + 1, dtype=np.float64))
    y = np.log(top["n_total"].to_numpy(dtype=np.float64))
    xm, ym = x.mean(), y.mean()
    slope = ((x - xm) * (y - ym)).sum() / ((x - xm) ** 2).sum()
    return pd.DataFrame({"n_terms": [np.int64(len(top))],
                         "slope": [round(float(slope), 6)],
                         "intercept": [round(float(ym - slope * xm), 6)]})


class Readability:
    """Flesch reading-ease per document from three exact regex-run
    counts (words = [A-Za-z]+ runs, sentences = [.!?]+ runs clamped to
    >= 1, syllable proxy = vowel-group runs): 206.835 - 1.015·w/s -
    84.6·syl/w.  Integer counts are exact on both sides of the SQL
    mirror, the score is the identical IEEE-double expression.
    Patterns compile once per actor; counting is the pandas C string
    kernel."""

    def __init__(self):
        import re

        self.words = re.compile(r"[A-Za-z]+", re.ASCII)
        self.sents = re.compile(r"[.!?]+", re.ASCII)
        self.syls = re.compile(r"[aeiouyAEIOUY]+", re.ASCII)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        text = b["text"].fillna("")
        w = text.str.count(self.words).to_numpy(np.float64)
        s = np.maximum(text.str.count(self.sents).to_numpy(np.float64), 1.0)
        y = text.str.count(self.syls).to_numpy(np.float64)
        wc = np.maximum(w, 1.0)  # empty docs: score defined, counts 0
        score = 206.835 - 1.015 * (w / s) - 84.6 * (y / wc)
        return pd.DataFrame({
            "doc_id": b["doc_id"],
            "n_words": w.astype(np.int64),
            "n_sentences": s.astype(np.int64),
            "n_syllables": y.astype(np.int64),
            "flesch": np.round(score, 6),
        })


def readability(docs: ray.data.Dataset, concurrency=(1, 16)) -> ray.data.Dataset:
    """Per-doc Flesch reading ease — (doc_id, n_words, n_sentences,
    n_syllables, flesch)."""
    return docs.select_columns(["doc_id", "text"]).map_batches(
        Readability, batch_format="pandas", batch_size=4096,
        concurrency=concurrency)


def source_shingle_overlap(
    docs: ray.data.Dataset, k: int = 5,
) -> pd.DataFrame:
    """Cross-source contamination matrix: Jaccard overlap of the
    k-word-shingle sets of every source pair.  Shingles use the exact
    ``string_split(trim(text), ' ')`` word semantics of segment_dedup
    (empties kept), sliding window of k.  Two hash aggregations, no
    join: distinct (source, shingle) pairs reduce once, then a
    per-shingle source BITMASK (sources indexed into <= 63 bits)
    reduces again and per-batch popcount partials produce the pair
    counts — nothing pairwise ever shuffles.  Columns (source_a,
    source_b, n_a, n_b, n_both, jaccard)."""
    from ray.data.aggregate import Count, Sum

    srcs = sorted(
        docs.select_columns(["source"]).unique("source"))
    if len(srcs) > 63:
        raise ValueError("source bitmask supports <= 63 sources")
    sidx = {s: i for i, s in enumerate(srcs)}
    sref = ray.put(sidx)

    def shingles(b: pd.DataFrame) -> pd.DataFrame:
        out_s, out_g = [], []
        for src, text in zip(b["source"], b["text"].fillna("")):
            words = text.strip().split(" ")
            n = len(words) - (k - 1)
            if n <= 0:
                continue
            seen = {" ".join(words[i:i + k]) for i in range(n)}
            out_s.extend([src] * len(seen))
            out_g.extend(seen)
        return pd.DataFrame({"source": out_s, "sh": out_g})

    dis = (
        docs.select_columns(["source", "text"])
        .map_batches(shingles, batch_format="pandas")
        .groupby(["source", "sh"])
        .aggregate(Count())
        .select_columns(["source", "sh"])
    )

    def to_bit(b: pd.DataFrame) -> pd.DataFrame:
        si = ray.get(sref) if isinstance(sref, ray.ObjectRef) else sref
        return pd.DataFrame({
            "sh": b["sh"],
            "bit": b["source"].map(si).to_numpy(np.int64),
        })

    masks = (
        dis.map_batches(to_bit, batch_format="pandas")
        .map_batches(lambda b: pd.DataFrame(
            {"sh": b["sh"], "m": np.left_shift(np.int64(1), b["bit"])}),
            batch_format="pandas")
        .groupby("sh")
        .aggregate(Sum("m", alias_name="mask"))
    )
    ns = len(srcs)

    def pair_partial(b: pd.DataFrame) -> pd.DataFrame:
        m = b["mask"].to_numpy(np.int64)
        rows = []
        for i in range(ns):
            bi = (m >> i) & 1
            ni = int(bi.sum())
            if ni:
                rows.append((i, i, ni))
            for j in range(i + 1, ns):
                nb = int((bi & ((m >> j) & 1)).sum())
                if nb:
                    rows.append((i, j, nb))
        return pd.DataFrame(rows, columns=["i", "j", "n"]).astype(np.int64)

    pc = (
        masks.map_batches(pair_partial, batch_format="pandas")
        .groupby(["i", "j"])
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    single = {int(r.i): int(r.n) for r in pc[pc.i == pc.j].itertuples()}
    both = {(int(r.i), int(r.j)): int(r.n)
            for r in pc[pc.i < pc.j].itertuples()}
    rows = []
    for i in range(ns):
        for j in range(i + 1, ns):
            na, nb_ = single.get(i, 0), single.get(j, 0)
            nb = both.get((i, j), 0)
            un = na + nb_ - nb
            rows.append((srcs[i], srcs[j], na, nb_, nb,
                         round(nb / un, 6) if un else 0.0))
    return pd.DataFrame(rows, columns=[
        "source_a", "source_b", "n_a", "n_b", "n_both", "jaccard"]).astype(
        {"n_a": np.int64, "n_b": np.int64, "n_both": np.int64})


def lang_confusion(docs: ray.data.Dataset,
                   num_partitions: int = 8) -> pd.DataFrame:
    """Confusion matrix of the declared ``lang`` column vs the
    stopword-heuristic prediction — the detector-evaluation screen.
    One LangId actor pass + ONE native hash join on doc_id + a tiny
    (lang, lang_pred) count aggregation; output is O(#langs²) rows
    (lang, lang_pred, n), ordered."""
    from ray.data.aggregate import Count

    pred = lang_id(docs).materialize()
    truth = docs.select_columns(["doc_id", "lang"]).materialize()
    j = truth.repartition(num_partitions).materialize().join(
        pred.repartition(num_partitions).materialize(),
        "inner", num_partitions,
        on=("doc_id",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )
    out = (j.groupby(["lang", "lang_pred"]).aggregate(Count(alias_name="n"))
           .to_pandas().sort_values(["lang", "lang_pred"],
                                    ignore_index=True))
    out["n"] = out["n"].astype(np.int64)
    return out


def hapax_stats(docs: ray.data.Dataset, concurrency=(1, 16)) -> pd.DataFrame:
    """Hapax-legomena profile of the corpus vocabulary: how much of
    the ``[A-Za-z]+`` vocabulary occurs exactly once / twice — the
    classic lexical-richness / OCR-noise screen (a hapax fraction far
    from ~0.4-0.6 flags boilerplate or shattered tokenization).

    One distributed vocab pass (the ``vocab_topk`` partial-counts
    shuffle) → a ≤ #distinct-counts histogram fold (second tiny
    groupby) — the driver sees O(#distinct frequencies) rows, never
    the vocabulary.  One row: (vocab_size, n_tokens, n_hapax, n_dis,
    hapax_frac, dis_frac), fractions over the vocabulary, round 9."""
    from ray.data.aggregate import Count, Sum

    partial = docs.select_columns(["text"]).map_batches(
        _TokenCounts, batch_format="pandas", batch_size=4096,
        concurrency=concurrency)
    totals = partial.groupby("token").aggregate(Sum("n", alias_name="c"))
    hist = (totals.groupby("c").aggregate(Count(alias_name="v"))
            .to_pandas())
    if hist.empty:
        return pd.DataFrame({"vocab_size": [np.int64(0)],
                             "n_tokens": [np.int64(0)],
                             "n_hapax": [np.int64(0)],
                             "n_dis": [np.int64(0)],
                             "hapax_frac": [0.0], "dis_frac": [0.0]})
    c = hist["c"].to_numpy(np.int64)
    v = hist["v"].to_numpy(np.int64)
    vocab = int(v.sum())
    tokens = int((c * v).sum())
    h1 = int(v[c == 1].sum())
    h2 = int(v[c == 2].sum())
    return pd.DataFrame({"vocab_size": [np.int64(vocab)],
                         "n_tokens": [np.int64(tokens)],
                         "n_hapax": [np.int64(h1)],
                         "n_dis": [np.int64(h2)],
                         "hapax_frac": [round(h1 / vocab, 9)],
                         "dis_frac": [round(h2 / vocab, 9)]})


# default lexicon for the screen: mild profanity/spam markers — the
# mechanism is the point; production swaps in its own list.
SCREEN_LEXICON = ("click", "free", "winner", "prize", "buy",
                  "subscribe", "offer", "deal")


def lexicon_screen(docs: ray.data.Dataset, lexicon=SCREEN_LEXICON,
                   max_frac: float = 0.05,
                   concurrency=(1, 16)) -> ray.data.Dataset:
    """Blocklist screen: per-doc count of lexicon-word tokens
    (maximal [A-Za-z]+ runs, case-insensitive) and the keep rule
    ``hits / max(word_count, 1) <= max_frac`` — the spam/boilerplate
    filter shape every corpus pipeline carries (swap the default
    marketing-word list for a real blocklist in production).  One
    stateless pass, pandas C string kernels (the LangId alternation
    trick — no per-row token loop).  Columns (doc_id, n_words,
    n_hits, hit_frac, keep)."""
    pattern = (r"(?<![a-zA-Z])(?:" + "|".join(sorted(set(lexicon)))
               + r")(?![a-zA-Z])")

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        text = b["text"].fillna("").str.lower()
        words = text.str.count(r"[a-z]+").astype("int64")
        hits = text.str.count(pattern).astype("int64")
        frac = hits / np.maximum(words, 1)
        return pd.DataFrame({
            "doc_id": b["doc_id"],
            "n_words": words,
            "n_hits": hits,
            "hit_frac": np.round(frac, 9),
            "keep": frac <= max_frac,
        })

    return docs.select_columns(["doc_id", "text"]).map_batches(
        fn, batch_format="pandas", batch_size=4096,
        concurrency=concurrency[1] if isinstance(concurrency, tuple)
        else concurrency)


def vocab_coverage(docs: ray.data.Dataset, ks=(10, 100, 1000),
                   concurrency=(1, 16)) -> pd.DataFrame:
    """Vocabulary coverage curve: what fraction of the corpus's token
    OCCURRENCES do the top-k vocabulary entries cover — the
    tokenizer-budget planning number (a top-1k coverage near 1 means
    a small vocab suffices; low coverage means a long tail).  One
    distributed vocab pass (the vocab_topk shuffle) + one ordered head
    of max(ks) rows + one total-count scalar.  Columns (k, n_top,
    covered, total, coverage round 9); n_top ≤ k when the vocabulary
    is smaller."""
    from ray.data.aggregate import Sum

    partial = docs.select_columns(["text"]).map_batches(
        _TokenCounts, batch_format="pandas", batch_size=4096,
        concurrency=concurrency)
    totals = (partial.groupby("token")
              .aggregate(Sum("n", alias_name="c")).materialize())
    total = int(totals.aggregate(Sum("c"))["sum(c)"] or 0)
    top = (totals.sort(["c", "token"], descending=[True, False])
           .limit(max(ks)).to_pandas())
    cum = np.cumsum(top["c"].to_numpy(np.int64)) if len(top) else \
        np.array([], np.int64)
    rows = []
    for k in ks:
        n_top = min(k, len(cum))
        covered = int(cum[n_top - 1]) if n_top else 0
        rows.append((np.int64(k), np.int64(n_top), np.int64(covered),
                     np.int64(total),
                     round(covered / total, 9) if total else 0.0))
    return pd.DataFrame(rows, columns=["k", "n_top", "covered",
                                       "total", "coverage"])


def term_dispersion(docs: ray.data.Dataset, n: int = 50,
                    concurrency=(1, 16)) -> pd.DataFrame:
    """Term burstiness for the top-``n`` vocabulary by collection
    frequency: cf (total occurrences), df (distinct docs containing),
    and cf/df — Church-Gale burstiness (content words clump, function
    words spread).  One pass emits per-batch (token, cf-partial) AND
    per-batch-distinct (token, doc) pairs (the two-step-distinct
    pattern, hot-token safe) → two hash aggregations → ordered head.
    Columns (token, cf, df, burstiness round 6), ordered (cf DESC,
    token)."""
    from ray.data.aggregate import Count, Sum

    partial = docs.select_columns(["text"]).map_batches(
        _TokenCounts, batch_format="pandas", batch_size=4096,
        concurrency=concurrency)
    cf = partial.groupby("token").aggregate(Sum("n", alias_name="cf"))

    tok_re = re.compile(WORD_RE)

    def doc_pairs(b: pd.DataFrame) -> pd.DataFrame:
        # one C-level findall per doc, distinct within doc
        lists = b["text"].fillna("").map(tok_re.findall)
        lens, dids, toks = [], [], []
        for did, ts in zip(b["doc_id"], lists):
            u = set(ts)
            dids.extend([did] * len(u))
            toks.extend(u)
        return pd.DataFrame({"doc_id": np.asarray(dids, dtype=np.int64),
                             "token": np.asarray(toks, dtype=object)}) \
            if toks else pd.DataFrame(
                {"doc_id": pd.Series([], dtype=np.int64),
                 "token": pd.Series([], dtype=object)})

    df_counts = (docs.select_columns(["doc_id", "text"])
                 .map_batches(doc_pairs, batch_format="pandas",
                              batch_size=4096, concurrency=16)
                 .groupby(["doc_id", "token"]).aggregate(Count())
                 .groupby("token").aggregate(Count(alias_name="df")))

    top = (cf.sort(["cf", "token"], descending=[True, False])
           .limit(n).to_pandas())
    dfp = df_counts.to_pandas()
    out = top.merge(dfp, on="token", how="left")
    out["cf"] = out["cf"].astype(np.int64)
    out["df"] = out["df"].astype(np.int64)
    out["burstiness"] = np.round(out["cf"] / out["df"], 6)
    return out[["token", "cf", "df", "burstiness"]]
