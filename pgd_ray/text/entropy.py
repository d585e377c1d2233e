"""Per-document lexical diversity: unigram Shannon entropy, Simpson
index and type-token ratio.

Quality filters for LLM corpora routinely cut on lexical diversity
(low-entropy documents are boilerplate/keyword stuffing; Gopher's
repetition rules in ``text.analysis`` catch the n-gram version, this
catches the distributional one).  All three statistics are a pure
function of each document's token histogram, so the stage is one
streamed ``map_batches`` — no shuffle, state-free tasks.

Token rule: ASCII ``\\w+`` lowercase — the same contract as
``text.packing._TokCount`` / the DuckDB oracles (RE2 ASCII classes).
Entropy uses natural log; ties/rounding live in the oracle's ROUND.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

_TOK = re.compile(r"\w+", re.ASCII)


def _doc_stats(text: str) -> tuple[int, int, float, float]:
    toks = _TOK.findall((text or "").lower())
    n = len(toks)
    if n == 0:
        return 0, 0, 0.0, 0.0
    _, counts = np.unique(np.asarray(toks, dtype=object), return_counts=True)
    p = counts / n
    ent = float(-(p * np.log(p)).sum())
    # simpson = Σc²/n²: exact integer numerator, ONE float division —
    # same expression as the SQL mirror (a float Σ(c/n)² is summation-
    # order-dependent and straddled the digit-6 boundary at sf0.1)
    simpson = float(int((counts.astype(np.int64) ** 2).sum())
                    / (float(n) * float(n)))
    return n, len(counts), ent, simpson


def lexical_diversity(
    docs: ray.data.Dataset,
    text_col: str = "text",
    id_col: str = "doc_id",
    batch_size: int = 1024,
) -> ray.data.Dataset:
    """(doc_id, n_tokens, n_types, entropy, simpson, ttr) per doc —
    ttr = n_types / n_tokens (0 for empty docs)."""

    def fn(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False)
        rows = [_doc_stats(x) for x in t[text_col].to_pylist()]
        n = np.array([r[0] for r in rows], np.int64)
        ty = np.array([r[1] for r in rows], np.int64)
        return pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "n_tokens": pa.array(n, pa.int64()),
            "n_types": pa.array(ty, pa.int64()),
            "entropy": pa.array([r[2] for r in rows], pa.float64()),
            "simpson": pa.array([r[3] for r in rows], pa.float64()),
            "ttr": pa.array(
                np.where(n > 0, ty / np.maximum(n, 1), 0.0), pa.float64()),
        })

    return docs.select_columns([id_col, text_col]).map_batches(
        fn, batch_format="pyarrow", batch_size=batch_size)


def char_entropy(
    docs: ray.data.Dataset, column: str = "text", id_col: str = "doc_id"
) -> ray.data.Dataset:
    """Per-document Shannon entropy of the byte distribution — the
    cheap randomness screen that flags base64 blobs / binary-in-text
    (entropy near 8·ln2) and degenerate repetition (near 0).  Pure
    map stage: each batch bincounts (doc, byte) keys in one vectorized
    pass; nothing leaves the worker but one row per document.
    Columns (doc_id, n_chars, char_entropy)."""

    def fn(t: pa.Table) -> pa.Table:
        texts = t[column].to_pylist()
        ids = t[id_col].to_numpy(zero_copy_only=False)
        lens = np.array([len(x or "") for x in texts], dtype=np.int64)
        ent = np.zeros(len(texts), dtype=np.float64)
        if lens.sum():
            buf = np.frombuffer("".join(x or "" for x in texts)
                                .encode("latin-1"), dtype=np.uint8)
            did = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
            keys = did * np.int64(256) + buf
            uk, cnt = np.unique(keys, return_counts=True)
            kd = uk // 256
            c = cnt.astype(np.float64)
            # H = ln(len) - (1/len)·Σ c·ln c  (exact algebraic form)
            s = np.zeros(len(texts), dtype=np.float64)
            np.add.at(s, kd, c * np.log(c))
            nz = lens > 0
            ent[nz] = np.log(lens[nz].astype(np.float64)) - s[nz] / lens[nz]
        return pa.table({
            "doc_id": ids,
            "n_chars": lens,
            "char_entropy": np.round(ent, 6) + 0.0,
        })

    return docs.select_columns([id_col, column]).map_batches(
        fn, batch_format="pyarrow")
