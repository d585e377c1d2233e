"""curate_corpus: the END-TO-END training-data curation pipeline as
one composed, Dataset-out Ray Data flow —

    documents
      → clean_corpus_ds        (language/quality filter, exact +
                                MinHash near-dup removal)
      → decontamination filter (drop docs sharing any token 8-gram
                                with the benchmark slice)
      → sequence packing       (global token offsets under doc_id
                                order → pack_id / pack_offset)

Output: one row per SURVIVING training document —
(doc_id, token_count, quality, start_tok, pack_id, pack_offset) —
ready to drive a packed-sequence writer.

Scale posture: every constituent keeps its own contract (drop-sets ∝
duplicate/contaminated counts broadcast once; survivors never touch
the driver); the packing prefix reuses the sorted-block + O(#blocks)
offset walk from ``text.packing`` over the survivors' token counts.
Each constituent is independently oracle-checked; the composition is
mirrored end-to-end in ``oracle_sql()['curate_corpus']``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from pgd_ray.pipelines.clean_corpus import clean_corpus_ds
from pgd_ray.text.decontam import decontaminate


def curate_corpus(
    docs: ray.data.Dataset,
    bench: ray.data.Dataset,
    lang: str = "en",
    quality_min: float = 0.9,
    nd_threshold: float = 0.7,
    ngram: int = 8,
    pack_len: int = 1024,
    concurrency=(1, 16),
) -> ray.data.Dataset:
    surv = clean_corpus_ds(
        docs, lang=lang, quality_min=quality_min,
        nd_threshold=nd_threshold, concurrency=concurrency,
    ).materialize()

    # contaminated drop-set: ∝ docs overlapping the benchmark — small
    # by construction; collected once and broadcast
    dec = decontaminate(docs, bench, n=ngram, concurrency=None)
    bad: set[int] = set()
    for b in dec.iter_batches(batch_size=None, batch_format="pyarrow"):
        ns = b["n_shared"].to_numpy(zero_copy_only=False)
        bad.update(b["doc_id"].to_numpy(zero_copy_only=False)[ns > 0].tolist())
    bad_ref = ray.put(bad)

    def drop_contaminated(t: pa.Table) -> pa.Table:
        d = ray.get(bad_ref)
        if not d:
            return t
        ids = t["doc_id"].to_numpy(zero_copy_only=False)
        return t.filter(pa.array(~np.isin(ids, np.fromiter(d, np.int64))))

    kept = surv.map_batches(
        drop_contaminated, batch_format="pyarrow").materialize()

    # distributed prefix sum of token_count under doc_id order — the
    # text.packing sorted-block pattern: one summary row per block,
    # O(#blocks) driver walk, per-block vectorized assignment
    srt = kept.sort("doc_id").materialize()

    def summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"min_doc": pa.array([], pa.int64()),
                             "total": pa.array([], pa.int64())})
        return pa.table({
            "min_doc": pa.array(
                [int(t["doc_id"][0].as_py())], pa.int64()),
            "total": pa.array(
                [int(t["token_count"].to_numpy(
                    zero_copy_only=False).sum())], pa.int64()),
        })

    sm = srt.map_batches(
        summary, batch_format="pyarrow", batch_size=None).to_pandas()
    if sm.empty:
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([], pa.int64()),
            "token_count": pa.array([], pa.int64()),
            "quality": pa.array([], pa.float64()),
            "start_tok": pa.array([], pa.int64()),
            "pack_id": pa.array([], pa.int64()),
            "pack_offset": pa.array([], pa.int64()),
        }))
    sm = sm.sort_values("min_doc", ignore_index=True)
    totals = sm["total"].to_numpy()
    block_start = dict(zip(
        sm["min_doc"], np.concatenate(([0], np.cumsum(totals[:-1])))))
    if len(block_start) != len(sm):
        raise ValueError("curate_corpus requires globally unique doc_ids")

    def assign(t: pa.Table, block_start=block_start) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in
                             ("doc_id", "token_count", "quality",
                              "start_tok", "pack_id", "pack_offset")})
        d = t["doc_id"].to_numpy(zero_copy_only=False)
        n = t["token_count"].to_numpy(zero_copy_only=False)
        start = block_start[int(d[0])] + np.concatenate(
            ([0], np.cumsum(n[:-1])))
        return pa.table({
            "doc_id": pa.array(d, pa.int64()),
            "token_count": pa.array(n, pa.int64()),
            "quality": t["quality"],
            "start_tok": pa.array(start, pa.int64()),
            "pack_id": pa.array(start // pack_len, pa.int64()),
            "pack_offset": pa.array(start % pack_len, pa.int64()),
        })

    return srt.map_batches(assign, batch_format="pyarrow", batch_size=None)
