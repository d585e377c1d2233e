"""Exact per-key distinct counts at scale.

``COUNT(DISTINCT v) GROUP BY k`` done naively ships every (k, v)
occurrence to one reducer per key — hot keys melt.  The scale-safe
shape is two hash aggregations: dedup (k, v) pairs first (combiners
shrink each batch to its distinct pairs before the exchange), then
count rows per key.  Both stages are plain Ray Data ``groupby``s —
no value set is ever held in one place.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count


def grouped_distinct_count(
    ds: ray.data.Dataset, key_col: str, val_col: str, alias: str = "n_distinct"
) -> ray.data.Dataset:
    """Exact number of distinct non-NULL ``val_col`` values per
    ``key_col`` (NULL values are excluded, matching SQL
    ``COUNT(DISTINCT ...)``).  Columns (key_col, alias)."""

    def _valid(t: pa.Table) -> pa.Table:
        return t.filter(t[val_col].combine_chunks().is_valid())

    pairs = (
        ds.select_columns([key_col, val_col])
        .map_batches(_valid, batch_format="pyarrow")
        .groupby([key_col, val_col])
        .aggregate(Count(alias_name="_n"))
        .select_columns([key_col, val_col])
    )
    return pairs.groupby(key_col).aggregate(Count(alias_name=alias))


def distinct_rows(ds: ray.data.Dataset, cols: list[str]) -> ray.data.Dataset:
    """High-cardinality SELECT DISTINCT as a first-class operator.

    Ray's hash ``groupby().aggregate()`` is the wrong tool once the
    key cardinality approaches the row count (measured 638 s for a
    30M-row two-key dedup vs ~10 s for the sort — see BASELINE.md):
    this is the engine's sort-based path — one global sort on
    ``cols``, vectorized adjacent-row dedup per block, and an
    O(#blocks) first/last-row summary so a value straddling a block
    boundary is kept exactly once (the flagged block drops its
    already-deduped first row).  Returns a Dataset of the distinct
    rows."""
    srt = ds.select_columns(cols).sort(cols).materialize()

    def summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({f"f_{c}": pa.array([], t.schema.field(c).type)
                             for c in cols}
                            | {f"l_{c}": pa.array([], t.schema.field(c).type)
                               for c in cols})
        out = {}
        for c in cols:
            col = t[c]
            out[f"f_{c}"] = [col[0].as_py()]
            out[f"l_{c}"] = [col[t.num_rows - 1].as_py()]
        return pa.table(out)

    sm = srt.map_batches(summary, batch_format="pyarrow",
                         batch_size=None).to_pandas()
    drop_first = set()
    if len(sm) and f"f_{cols[0]}" in sm.columns:
        sm = sm.sort_values([f"f_{c}" for c in cols], ignore_index=True)
        for i in range(1, len(sm)):
            first_i = tuple(sm.loc[i, f"f_{c}"] for c in cols)
            last_prev = tuple(sm.loc[i - 1, f"l_{c}"] for c in cols)
            if first_i == last_prev:
                drop_first.add(first_i)

    def block_dedup(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return t
        arrs = [t[c].to_numpy(zero_copy_only=False) for c in cols]
        keep = np.zeros(t.num_rows, dtype=bool)
        keep[0] = True
        neq = np.zeros(t.num_rows - 1, dtype=bool)
        for a in arrs:
            neq |= a[1:] != a[:-1]
        keep[1:] = neq
        if tuple(a[0] for a in arrs) in drop_first:
            keep[0] = False
        return t.filter(pa.array(keep))

    return srt.map_batches(block_dedup, batch_format="pyarrow",
                           batch_size=None)
