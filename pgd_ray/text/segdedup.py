"""Exact segment-level deduplication (C4 / RefinedWeb-style span dedup).

Documents are cut into ALIGNED fixed-width word windows ("segments" of
``seg_words`` tokens, last one ragged); a segment that appears anywhere
earlier in the corpus — in (doc_id, seg_idx) order — is dropped, and
each document is rebuilt from its surviving segments.  This is the
span-granular sibling of ``text.dedup.exact_dedup`` (whole-document
hashing): near-duplicate documents that share long verbatim runs lose
exactly the repeated spans while unique edits survive.

Distribution shape (100-TB ready):
  1. explode — one streamed ``map_batches`` pass; only (segment,
     packed position) rows enter the exchange, each segment exactly
     once per occurrence.
  2. first-occurrence — ``groupby(segment).aggregate(Min(pos))``: the
     winning occurrence IS the group row, so no join-back shuffle is
     needed (the aggregate output already carries the text).
  3. rebuild — one global sort by (doc_id, seg_idx), then the
     sorted-block + boundary-fragment stitch used by the other ordered
     stages (stages/windows.py, stages/topn.py): interior documents
     concatenate fully inside their block; only the first/last
     document of each block ships to the driver (O(#blocks · doc)
     rows, never the corpus).

Positions pack as ``doc_id * 2^20 + seg_idx`` (exact int64 up to
2^43 docs / 2^20 segments per doc — both asserted), which makes the
first-occurrence rule a single integer MIN that the DuckDB oracle
replays bit-identically.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min

_SEG_SHIFT = 20
_SEG_MASK = (1 << _SEG_SHIFT) - 1


def explode_segments(
    docs: ray.data.Dataset,
    seg_words: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """(seg, pos) rows — ``pos = doc_id << 20 | seg_idx``.  The split is
    ``trim(text)`` on single spaces (DuckDB ``string_split`` parity),
    segments joined back with single spaces; empty segments (empty
    docs) are dropped."""

    def ex(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"seg": pa.array([], pa.string()),
                             "pos": pa.array([], pa.int64())})
        ids = t[id_col].to_numpy(zero_copy_only=False)
        assert ids.max() < (1 << (63 - _SEG_SHIFT)), "doc_id overflows pack"
        segs: list[str] = []
        pos: list[int] = []
        for did, txt in zip(ids, t[text_col].to_pylist()):
            words = (txt or "").strip().split(" ")
            base = int(did) << _SEG_SHIFT
            n_seg = (len(words) + seg_words - 1) // seg_words
            assert n_seg <= _SEG_MASK + 1, "seg_idx overflows pack"
            for i in range(n_seg):
                s = " ".join(words[i * seg_words:(i + 1) * seg_words])
                if s:
                    segs.append(s)
                    pos.append(base | i)
        return pa.table({"seg": pa.array(segs, pa.string()),
                         "pos": pa.array(pos, pa.int64())})

    return docs.map_batches(ex, batch_format="pyarrow")


def dedup_segments(
    docs: ray.data.Dataset,
    seg_words: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """First occurrence of every distinct segment, as a Dataset with
    (doc_id, seg_idx, seg) — the aggregate row already carries the
    text, so survivors need no join back to the exploded table."""
    first = (
        explode_segments(docs, seg_words, text_col, id_col)
        .groupby("seg")
        .aggregate(Min("pos", alias_name="pos"))
    )

    def decode(t: pa.Table) -> pa.Table:
        p = t["pos"].to_numpy(zero_copy_only=False)
        return pa.table({
            "doc_id": pa.array(p >> _SEG_SHIFT, pa.int64()),
            "seg_idx": pa.array(p & _SEG_MASK, pa.int64()),
            "seg": t["seg"],
        })

    return first.map_batches(decode, batch_format="pyarrow")


def _concat_runs(did: np.ndarray, seg: np.ndarray, sel: np.ndarray):
    """Per-doc ' '-joins over a (doc_id, seg_idx)-sorted slice."""
    if not sel.any():
        return np.array([], np.int64), [], np.array([], np.int64)
    d, s = did[sel], seg[sel]
    ids, starts = np.unique(d, return_index=True)
    ends = np.append(starts[1:], len(d))
    texts = [" ".join(s[a:b]) for a, b in zip(starts, ends)]
    return ids.astype(np.int64), texts, (ends - starts).astype(np.int64)


def rebuild_docs(survivors: ray.data.Dataset) -> ray.data.Dataset:
    """(doc_id, text_dedup, n_segs) from the surviving segments —
    global sort + in-block concat; only first/last-doc rows of each
    block reach the driver for stitching.  Documents whose every
    segment was dropped do not appear."""
    srt = survivors.sort(["doc_id", "seg_idx"]).materialize()

    def interior(t: pa.Table) -> pa.Table:
        empty = pa.table({"doc_id": pa.array([], pa.int64()),
                          "text_dedup": pa.array([], pa.string()),
                          "n_segs": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        seg = np.asarray(t["seg"].to_pylist(), dtype=object)
        ids, texts, ns = _concat_runs(
            did, seg, (did != did[0]) & (did != did[-1]))
        return pa.table({"doc_id": pa.array(ids, pa.int64()),
                         "text_dedup": pa.array(texts, pa.string()),
                         "n_segs": pa.array(ns, pa.int64())})

    def boundary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        did = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array((did == did[0]) | (did == did[-1])))

    out = srt.map_batches(interior, batch_format="pyarrow", batch_size=None)
    bdf = srt.map_batches(
        boundary, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if len(bdf):
        bdf = bdf.sort_values(["doc_id", "seg_idx"], kind="stable")
        ids, texts, ns = _concat_runs(
            bdf["doc_id"].to_numpy(),
            bdf["seg"].to_numpy(),
            np.ones(len(bdf), dtype=bool),
        )
        out = out.union(ray.data.from_arrow(pa.table({
            "doc_id": pa.array(ids, pa.int64()),
            "text_dedup": pa.array(texts, pa.string()),
            "n_segs": pa.array(ns, pa.int64()),
        })))
    return out


def segment_dedup_docs(
    docs: ray.data.Dataset,
    seg_words: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> ray.data.Dataset:
    """End-to-end: explode -> first-occurrence -> rebuild."""
    return rebuild_docs(dedup_segments(docs, seg_words, text_col, id_col))
