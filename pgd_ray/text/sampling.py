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


class _StratifiedSample:
    """Per-group rates: rebalancing a training corpus (e.g. by
    language or source) with the same reproducible hash predicate.
    The rate map is tiny and ships once per actor."""

    def __init__(self, rates: dict, group_col: str, column: str,
                 default_16bit: int):
        self.thr = {
            g: (None if t == 0x10000 else format(t, "04x"))
            for g, t in rates.items()
        }
        self.default = (
            None if default_16bit == 0x10000 else format(default_16bit, "04x")
        )
        self.group_col, self.column = group_col, column

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[self.column].notna()]
        h4 = np.array(
            [hashlib.md5(t.encode()).hexdigest()[:4] for t in b[self.column]],
            dtype=object,
        )
        thr = b[self.group_col].map(lambda g: self.thr.get(g, self.default))
        keep_all = thr.isna().to_numpy()  # None threshold = keep everything
        mask = keep_all.copy()
        sel = ~keep_all
        mask[sel] = h4[sel] < thr.to_numpy(dtype=object)[sel]
        out = b[mask].copy()
        out["h4"] = h4[mask]
        return out


def stratified_sample(
    docs: ray.data.Dataset,
    group_col: str,
    rates_16bit: dict,
    default_16bit: int = 0x10000,
    column: str = "text",
    concurrency=(1, 16),
) -> ray.data.Dataset:
    """Deterministic per-group sampling: a row in group g survives iff
    ``int(md5(column)[:4], 16) < rates_16bit.get(g, default)``.
    Groups absent from the map keep the default rate (0x10000 = keep
    all).  Same SQL-auditable predicate as ``sample_by_hash``."""
    for t in list(rates_16bit.values()) + [default_16bit]:
        if not 0 <= t <= 0x10000:
            raise ValueError("rates must be in [0, 65536]")
    return docs.map_batches(
        _StratifiedSample,
        fn_constructor_args=(rates_16bit, group_col, column, default_16bit),
        batch_format="pandas",
        batch_size=4096,
        concurrency=concurrency,
    )


class _Md5Col:
    def __init__(self, column: str):
        self.column = column

    def __call__(self, b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[self.column].notna()].copy()
        b["md5"] = [hashlib.md5(t.encode()).hexdigest() for t in b[self.column]]
        return b


def cap_per_group(
    docs: ray.data.Dataset,
    group_col: str,
    n: int,
    id_col: str,
    column: str = "text",
    concurrency=(1, 16),
) -> ray.data.Dataset:
    """At most ``n`` rows per group, chosen DETERMINISTICALLY — the
    kept subset is the n smallest by (md5(column), id_col), i.e. a
    uniform reproducible draw, not "first n seen" (which would depend
    on scan order).  The heavy lifting is ``stages.topn.grouped_topk``
    (sorted blocks + O(n · #blocks) boundary stitch); rows gain
    ``md5`` and ``rnk`` columns.  Classic corpus-balancing cap:
    "no source may contribute more than n documents"."""
    from pgd_ray.stages.topn import grouped_topk

    hashed = docs.map_batches(
        _Md5Col,
        fn_constructor_args=(column,),
        batch_format="pandas",
        batch_size=4096,
        concurrency=concurrency,
    )
    return grouped_topk(
        hashed, group_col, ["md5", id_col], [False, False], k=n
    )
