"""Snapshot diff — the ops primitive for incremental ingestion: given
two versions of a keyed table, count and classify rows as added /
removed / changed / unchanged by comparing a content hash per key.

Distribution shape: each side collapses to (key, md5-of-content) with
ONE map_batches pass (vectorized hashlib over the concatenated
column bytes), the two hash tables meet in a single hash join on the
key (Ray Data native join — both sides partitioned on the key), and
the classification is a stateless mask.  Nothing but the final counts
(plus the optional changed-key sample) reaches the driver.

The content-hash contract (mirrored in SQL): md5 of the
'|'-joined string rendering of the listed columns, with NULL → ''
and floats rendered by the engine-side repr contract of the caller
(the default events payload uses string columns and ints only).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data


def _hashed(ds: ray.data.Dataset, key: str, cols: list[str],
            tag: str) -> ray.data.Dataset:
    def fn(b: pd.DataFrame) -> pd.DataFrame:
        parts = [b[c].astype(object).where(b[c].notna(), "").astype(str)
                 for c in cols]
        joined = parts[0]
        for p in parts[1:]:
            joined = joined + "|" + p
        h = [hashlib.md5(s.encode()).hexdigest() for s in joined]
        return pd.DataFrame({f"k_{tag}": b[key].to_numpy(np.int64),
                             f"h_{tag}": pd.Series(h, dtype=object)})

    return ds.select_columns([key, *cols]).map_batches(
        fn, batch_format="pandas", batch_size=8192)


def table_diff(
    old: ray.data.Dataset,
    new: ray.data.Dataset,
    key: str,
    cols: list[str],
    num_partitions: int = 16,
) -> pd.DataFrame:
    """One row: (n_old, n_new, n_added, n_removed, n_changed,
    n_unchanged).  ``key`` must be unique per side."""
    ha = _hashed(old, key, cols, "a").materialize()
    hb = _hashed(new, key, cols, "b").materialize()
    joined = ha.join(hb, "full_outer", num_partitions,
                     on=("k_a",), right_on=("k_b",))

    def classify(t: pa.Table) -> pa.Table:
        a = t["h_a"].combine_chunks()
        b = t["h_b"].combine_chunks()
        av = a.is_valid().to_numpy(zero_copy_only=False)
        bv = b.is_valid().to_numpy(zero_copy_only=False)
        eq = np.zeros(t.num_rows, bool)
        both = av & bv
        if both.any():
            an = a.to_numpy(zero_copy_only=False)
            bn = b.to_numpy(zero_copy_only=False)
            eq[both] = an[both] == bn[both]
        return pa.table({
            "added": pa.array([int((~av & bv).sum())], pa.int64()),
            "removed": pa.array([int((av & ~bv).sum())], pa.int64()),
            "changed": pa.array([int((both & ~eq).sum())], pa.int64()),
            "unchanged": pa.array([int((both & eq).sum())], pa.int64()),
        })

    parts = joined.map_batches(classify, batch_format="pyarrow",
                               batch_size=None).to_pandas()
    tot = parts.sum() if not parts.empty else pd.Series(
        {"added": 0, "removed": 0, "changed": 0, "unchanged": 0})
    return pd.DataFrame({
        "n_old": [np.int64(old.count())],
        "n_new": [np.int64(new.count())],
        "n_added": [np.int64(tot["added"])],
        "n_removed": [np.int64(tot["removed"])],
        "n_changed": [np.int64(tot["changed"])],
        "n_unchanged": [np.int64(tot["unchanged"])],
    })
