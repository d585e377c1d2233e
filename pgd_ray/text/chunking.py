"""Overlapping token-window chunking for RAG / context-length prep.

Splits each document into fixed-size token windows with a configurable
overlap — the standard retrieval-corpus preprocessing step (no
reference counterpart; SURVEY.md §2.8).  The chunk rule is chosen to
be exactly SQL-mirrorable: with ``stride = chunk_tokens - overlap``,
document ``d`` with ``n`` tokens yields ``ceil(n / stride)`` chunks,
chunk ``i`` covering tokens ``[i*stride, min(i*stride + chunk_tokens,
n))``; chunk text is the token slice joined by single spaces
(whitespace-normalized, like DuckDB's
``array_to_string(list_slice(regexp_extract_all(...)))``).

Tokenization is the repo-wide ``TOKEN_RE`` ASCII contract
(text.analysis / text.packing), so token counts agree with every
other text stage.

Scale shape: one stateless ``map_batches`` pass, no shuffle; each
batch expands independently (flat_map-style fan-out inside the batch,
cumsum/repeat index math).  The join-per-chunk is O(total tokens) —
the same cost class as emitting the chunk text at all.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from pgd_ray.text.analysis import TOKEN_RE

from pgd_ray.util import bound_cls

_OUT = ("doc_id", "chunk_idx", "start_tok", "n_tokens", "chunk_text")


def _empty() -> pa.Table:
    return pa.table({
        "doc_id": pa.array([], pa.int64()),
        "chunk_idx": pa.array([], pa.int64()),
        "start_tok": pa.array([], pa.int64()),
        "n_tokens": pa.array([], pa.int64()),
        "chunk_text": pa.array([], pa.string()),
    })


class _Chunker:
    def __init__(self, chunk_tokens: int, overlap: int):
        self.chunk = chunk_tokens
        self.stride = chunk_tokens - overlap
        self.tok = re.compile(TOKEN_RE, re.ASCII)

    def __call__(self, b: pd.DataFrame) -> pa.Table:
        if not len(b):
            return _empty()
        toks = b["text"].fillna("").str.findall(self.tok)
        n = toks.str.len().to_numpy(dtype=np.int64)
        counts = -(-n // self.stride)  # ceil; 0 chunks for empty docs
        total = int(counts.sum())
        if total == 0:
            return _empty()
        doc = np.repeat(b["doc_id"].to_numpy(), counts)
        first = np.concatenate(([0], np.cumsum(counts[:-1])))
        idx = np.arange(total, dtype=np.int64) - np.repeat(first, counts)
        start = idx * self.stride
        end = np.minimum(start + self.chunk, np.repeat(n, counts))
        tlists = np.repeat(toks.to_numpy(), counts)
        text = [" ".join(t[s:e])
                for t, s, e in zip(tlists, start, end)]
        return pa.table({
            "doc_id": pa.array(doc, pa.int64()),
            "chunk_idx": pa.array(idx, pa.int64()),
            "start_tok": pa.array(start, pa.int64()),
            "n_tokens": pa.array(end - start, pa.int64()),
            "chunk_text": pa.array(text, pa.string()),
        })


def chunk_documents(
    docs: ray.data.Dataset,
    chunk_tokens: int = 256,
    overlap: int = 32,
    concurrency=(1, 16),
    batch_size: int = 2048,
) -> ray.data.Dataset:
    """Columns (doc_id, chunk_idx, start_tok, n_tokens, chunk_text)."""
    if chunk_tokens <= 0 or overlap < 0 or overlap >= chunk_tokens:
        raise ValueError("need chunk_tokens > 0 and 0 <= overlap < chunk_tokens")
    return docs.select_columns(["doc_id", "text"]).map_batches(
        bound_cls(_Chunker, chunk_tokens=chunk_tokens, overlap=overlap),
        batch_format="pandas", batch_size=batch_size,
        concurrency=concurrency,
    )
