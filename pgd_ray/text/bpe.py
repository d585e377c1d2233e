"""Byte-pair statistics over the document corpus — the counting
kernel of a BPE tokenizer-training round (Sennrich et al. 2016: each
merge step picks the most frequent adjacent symbol pair).

One pass, fully vectorized: each batch concatenates its documents
with a 0xFF separator byte (documents are ASCII by corpus contract —
asserted), reads the buffer as uint8, forms the 16-bit code
``a*256 + b`` for every adjacent position, and bincounts into a
65 536-cell partial.  Partials are <= 65 536 rows regardless of input
size, so the shuffle is O(#blocks · distinct pairs) and the driver
only ever sees the merged 65 536-cell table — this is the
combine-before-shuffle shape that survives 100 TB.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Sum

from pgd_ray.util import read_parquet_clean

_SEP = 0xFF


def byte_pair_counts(sf_dir: str, top: int = 32) -> pd.DataFrame:
    """Top-``top`` adjacent byte pairs corpus-wide, ties broken by
    pair string ascending — columns (pair, n)."""
    docs = read_parquet_clean(f"{sf_dir}/documents.parquet",
                              columns=["text"])

    def partial(t: pa.Table) -> pa.Table:
        texts = t["text"].to_pylist()
        if not texts:
            return pa.table({"code": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        buf = "\xff".join(texts).encode("latin-1")
        a = np.frombuffer(buf, dtype=np.uint8)
        if (a[a != _SEP] >= 128).any():
            raise ValueError("byte_pair_counts expects ASCII documents")
        if len(a) < 2:
            return pa.table({"code": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        lo, hi = a[:-1].astype(np.int64), a[1:].astype(np.int64)
        m = (lo != _SEP) & (hi != _SEP)
        cnt = np.bincount((lo[m] << 8) | hi[m], minlength=1 << 16)
        nz = np.flatnonzero(cnt)
        return pa.table({"code": nz.astype(np.int64), "n": cnt[nz]})

    merged = (
        docs.map_batches(partial, batch_format="pyarrow")
        .groupby("code")
        .aggregate(Sum("n", alias_name="n"))
        .to_pandas()
    )
    if merged.empty:
        return pd.DataFrame({"pair": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64)})
    merged = merged.sort_values(["n", "code"], ascending=[False, True],
                                ignore_index=True).head(top)
    codes = merged["code"].to_numpy(np.int64)
    return pd.DataFrame({
        "pair": [chr(c >> 8) + chr(c & 0xFF) for c in codes],
        "n": merged["n"].astype(np.int64).to_numpy(),
    })
