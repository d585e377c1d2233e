"""KMV (k-minimum-values / bottom-k) distinct-count sketch.

The third sketch family next to HLL (``stages/cardinality.py``) and
Count-Min (``stages/cms.py``): keep the k smallest splitmix64 hash
values ever seen; the estimator is (k-1) / R(h_k) where R is the k-th
minimum rescaled to (0, 1) (Bar-Yossef et al. 2002).  Unlike HLL the
sketch supports DELETE-free set operations with exact bounds and its
merge is a trivial k-way min-merge.

Distribution: each batch emits its local bottom-k (int64-safe shifted
hashes never leave the worker unsorted); the driver merges
#blocks × k values — the topk_cosine shape, no shuffle.  Everything
up to the final division is integer-exact, so the SQL mirror is
bit-identical through the k-th minimum.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from pgd_ray.text.hashing import splitmix64

_TWO64 = float(2**64)


def kmv_distinct(
    ds: ray.data.Dataset,
    col: str,
    k: int = 256,
    batch_size: int = 1 << 18,
) -> pd.DataFrame:
    """Single row (k_used, kth_hash, est_distinct) — est is exact
    count when fewer than k distinct hashes exist.  ``col`` must be an
    integer column (hash strings upstream)."""

    def bottomk(t: pa.Table) -> pa.Table:
        v = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        h = np.unique(splitmix64(v))  # sorted ascending
        h = h[:k]
        return pa.table({"h": pa.array(h.astype(np.int64), pa.int64())})

    hs: list[np.ndarray] = []
    for b in ds.select_columns([col]).map_batches(
            bottomk, batch_format="pyarrow", batch_size=batch_size
    ).iter_batches(batch_size=None, batch_format="pyarrow"):
        hs.append(b["h"].to_numpy(zero_copy_only=False))
    if not hs:
        return pd.DataFrame({"k_used": [np.int64(0)],
                             "kth_hash": [np.int64(0)],
                             "est_distinct": [0.0]})
    merged = np.unique(np.concatenate(hs).view(np.uint64))
    if len(merged) < k:  # saw fewer than k distinct: exact
        return pd.DataFrame({"k_used": [np.int64(len(merged))],
                             "kth_hash": [np.int64(0)],
                             "est_distinct": [float(len(merged))]})
    kth = merged[k - 1]
    est = (k - 1) * _TWO64 / float(kth)
    return pd.DataFrame({"k_used": [np.int64(k)],
                         "kth_hash": [np.int64(kth >> np.uint64(1))],
                         "est_distinct": [round(est, 6)]})
