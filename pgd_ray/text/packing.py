"""Sequence packing for LLM pretraining: GPT-style "concatenate the
corpus in a canonical order and cut every ``pack_len`` tokens".

The assignment each doc needs — its global token offset — is a
DISTRIBUTED PREFIX SUM, done with the repo's sorted-block pattern:

1. vectorized per-doc token counts (same ``TOKEN_RE`` contract as
   ``text.analysis.TextStats``, so the SQL mirror is the same
   ``regexp_extract_all`` expression);
2. one sort by doc_id (the canonical order) — the only shuffle;
3. each sorted block reports (min doc_id, token total): the driver
   orders the O(#blocks) summaries and assigns each block its
   cumulative start offset;
4. a second pass over the same materialized blocks computes the local
   cumulative sum plus the block offset — fully vectorized, no state
   crosses workers beyond the tiny offset map.

Output per doc: global token start, the pack (chunk of ``pack_len``
tokens) its first token lands in, and the offset inside that pack.
Docs may straddle packs (exactly like pretraining token streams); a
consumer slices accordingly.  The whole rule is one SQL window sum,
so the driver oracle checks it end to end.
"""

from __future__ import annotations

import re

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from pgd_ray.text.analysis import TOKEN_RE


class _TokCount:
    def __init__(self):
        self.tok = re.compile(TOKEN_RE, re.ASCII)

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        return pd.DataFrame(
            {
                "doc_id": b["doc_id"],
                "n_tokens": b["text"].fillna("").str.count(self.tok).astype("int64"),
            }
        )


def pack_assignments(
    docs: ray.data.Dataset,
    pack_len: int = 1024,
    concurrency=(1, 16),
) -> ray.data.Dataset:
    """Columns (doc_id, n_tokens, start_tok, pack_id, pack_offset),
    where start_tok is the doc's global token offset under doc_id
    order, pack_id = start_tok // pack_len and pack_offset =
    start_tok % pack_len."""
    if pack_len <= 0:
        raise ValueError("pack_len must be positive")
    counted = docs.select_columns(["doc_id", "text"]).map_batches(
        _TokCount, batch_format="pandas", batch_size=4096,
        concurrency=concurrency,
    )
    srt = counted.sort("doc_id").materialize()

    def summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"min_doc": pa.array([], pa.int64()),
                             "max_doc": pa.array([], pa.int64()),
                             "total": pa.array([], pa.int64()),
                             "has_dup": pa.array([], pa.bool_())})
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        return pa.table({"min_doc": [int(d[0])], "max_doc": [int(d[-1])],
                         "total": [int(n.sum())],
                         "has_dup": [bool((d[1:] == d[:-1]).any())]})

    sm = srt.map_batches(
        summary, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if sm.empty:  # empty corpus → empty (possibly column-less) frame
        return srt.map_batches(
            lambda t: pa.table({c: pa.array([], pa.int64()) for c in
                                ("doc_id", "n_tokens", "start_tok",
                                 "pack_id", "pack_offset")}),
            batch_format="pyarrow",
        )
    sm = sm.sort_values("min_doc", ignore_index=True)
    totals = sm["total"].to_numpy()
    block_start = dict(
        zip(sm["min_doc"], np.concatenate(([0], np.cumsum(totals[:-1]))))
    )
    # blocks are keyed by their min doc_id, so duplicate doc_ids would
    # silently corrupt start_tok — enforce the unique-doc_id contract
    # completely: sorted input makes duplicates adjacent, so they show
    # up either inside one block (has_dup) or as non-strictly-
    # increasing block boundaries (min_doc[i] <= max_doc[i-1]).
    mins = sm["min_doc"].to_numpy()
    maxs = sm["max_doc"].to_numpy()
    if bool(sm["has_dup"].any()) or bool((mins[1:] <= maxs[:-1]).any()):
        raise ValueError(
            "pack_assignments requires globally unique doc_ids"
        )

    def assign(t: pa.Table, block_start=block_start) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in
                             ("doc_id", "n_tokens", "start_tok",
                              "pack_id", "pack_offset")})
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        n = t["n_tokens"].to_numpy(zero_copy_only=False)
        start = block_start[int(d[0])] + np.concatenate(
            ([0], np.cumsum(n[:-1]))
        )
        return pa.table(
            {
                "doc_id": d,
                "n_tokens": n,
                "start_tok": start,
                "pack_id": start // pack_len,
                "pack_offset": start % pack_len,
            }
        )

    return srt.map_batches(assign, batch_format="pyarrow", batch_size=None)
