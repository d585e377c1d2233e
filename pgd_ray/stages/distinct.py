"""Exact per-key distinct counts at scale.

``COUNT(DISTINCT v) GROUP BY k`` done naively ships every (k, v)
occurrence to one reducer per key — hot keys melt.  The scale-safe
shape is two hash aggregations: dedup (k, v) pairs first (combiners
shrink each batch to its distinct pairs before the exchange), then
count rows per key.  Both stages are plain Ray Data ``groupby``s —
no value set is ever held in one place.
"""

from __future__ import annotations

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
