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
        token_count = text.str.count(TOKEN_RE).astype("int64")
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
    oracle)."""

    def __init__(self):
        self.word_re = re.compile(r"[a-zA-Z]+")
        self.profiles = {k: frozenset(v) for k, v in _LANG_PROFILES.items()}

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        langs = []
        for t in b["text"].fillna(""):
            toks = self.word_re.findall(t.lower())
            best, best_hits = "und", 0
            for lang in sorted(self.profiles):
                hits = sum(1 for w in toks if w in self.profiles[lang])
                if hits > best_hits:
                    best, best_hits = lang, hits
            langs.append(best)
        return pd.DataFrame({"doc_id": b["doc_id"], "lang_pred": langs})


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
        md5s, rolls = [], []
        for t in b["text"].fillna(""):
            norm = self.ws.sub(" ", t.lower())
            md5s.append(hashlib.md5(norm.encode()).hexdigest())
            h = np.uint64(1469598103934665603)  # FNV-1a 64
            for byte in norm.encode():
                h = np.uint64((int(h) ^ byte) * 1099511628211 & 0xFFFFFFFFFFFFFFFF)
            rolls.append(int(h))
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "md5": md5s,
                "fnv64": np.array(rolls, dtype=np.uint64).astype(np.int64),
            }
        )


def fingerprints(docs: ray.data.Dataset, concurrency=(1, 16)) -> ray.data.Dataset:
    return docs.select_columns(["doc_id", "text"]).map_batches(
        Fingerprint, batch_format="pandas", batch_size=4096, concurrency=concurrency
    )
