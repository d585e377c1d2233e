"""Deterministic content-hash sampling.

At 100 TB you never sample with an RNG: a content-hash predicate is
reproducible across reruns/retries, partition-invariant, and cheap to
mirror in SQL for audits.  ``sample_by_hash`` keeps a row iff the
first 16 bits of ``md5(text)`` fall below a threshold — rate
granularity 1/65536, bit-exactly mirrored by DuckDB's
``substr(md5(text), 1, 4) < '<hex>'`` (fixed-width lowercase hex
compares lexicographically = numerically).  md5 is the SQL-anchored
choice (same contract as ``text.analysis.Fingerprint``); the
engine-native vectorized samplers (splitmix64 content hashes, e.g.
``graph.graphlets.graphlet_macro_approx``) are preferred where no SQL
mirror is required.

The reference has no sampling operator (SURVEY.md §2.8); this is a
round-2 training-pipeline addition.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data


class _HashSample:
    def __init__(self, threshold_16bit: int, column: str):
        if not 0 <= threshold_16bit <= 0x10000:
            raise ValueError("threshold must be in [0, 65536]")
        # 0x10000 would format as the 5-char '10000' and break the
        # fixed-width lexicographic compare — it means "keep all"
        self.thr_hex = (
            None if threshold_16bit == 0x10000 else format(threshold_16bit, "04x")
        )
        self.column = column

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        # NULL text is dropped (not hashed as "") — matching the SQL
        # mirror, where md5(NULL) IS NULL fails any comparison.
        valid = b[self.column].notna().to_numpy()
        b = b[valid]
        h4 = np.array(
            [hashlib.md5(t.encode()).hexdigest()[:4] for t in b[self.column]],
            dtype=object,
        )
        if self.thr_hex is None:  # threshold 0x10000 → keep everything
            mask = np.ones(len(b), dtype=bool)
        else:
            mask = np.asarray(h4 < self.thr_hex, dtype=bool)
        out = b[mask].copy()
        out["h4"] = h4[mask]
        return out


def sample_by_hash(
    docs: ray.data.Dataset,
    threshold_16bit: int = 0x4000,
    column: str = "text",
    concurrency=(1, 16),
) -> ray.data.Dataset:
    """Keep rows where ``int(md5(column)[:4], 16) < threshold_16bit``
    (default 0x4000 → a deterministic 25 % sample).  Adds the ``h4``
    hex prefix column for auditability."""
    return docs.map_batches(
        _HashSample,
        fn_constructor_args=(threshold_16bit, column),
        batch_format="pandas",
        batch_size=4096,
        concurrency=concurrency,
    )
