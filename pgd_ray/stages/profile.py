"""Generic table profiler — the first query anyone runs on an
unfamiliar table: per column, row count, NULL count and exact distinct
count.

Distribution shape: null counts come from ONE pass of per-batch
partials (a #cols-row table per batch); each distinct count is the
hot-key-safe two-step hash aggregation from ``stages.distinct``
(dedup pairs first, then count) — one shuffle per column, each
carrying only the column's distinct values.  Timestamps profile by
their epoch-µs identity; doubles by bit pattern (NaN ≠ NaN in SQL
DISTINCT too — both sides count NaN as one value via the null-safe
grouping of GROUP BY).

The reference has no relational surface (SURVEY.md §2.8); this is the
data-quality audit an ingestion pipeline runs before anything else."""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum


def table_profile(ds: ray.data.Dataset, cols: list[str]) -> pd.DataFrame:
    """Columns (column, n_rows, n_null, n_distinct), one row per
    profiled column, ordered by the input ``cols`` order."""

    def null_partial(t: pa.Table) -> pa.Table:
        names, nr, nn = [], [], []
        for c in cols:
            a = t[c].combine_chunks()
            names.append(c)
            nr.append(t.num_rows)
            nn.append(a.null_count)
        return pa.table({"column": pa.array(names, pa.string()),
                         "nr": pa.array(nr, pa.int64()),
                         "nn": pa.array(nn, pa.int64())})

    nulls = (
        ds.map_batches(null_partial, batch_format="pyarrow")
        .groupby("column")
        .aggregate(Sum("nr", alias_name="n_rows"),
                   Sum("nn", alias_name="n_null"))
        .to_pandas()
        .set_index("column")
    )

    distincts = {}
    for c in cols:
        def valid(t: pa.Table, c=c) -> pa.Table:
            a = t[c].combine_chunks()
            out = t.select([c]).filter(a.is_valid())
            if pa.types.is_timestamp(out[c].type):
                out = pa.table({c: out[c].cast(pa.int64())})
            return out

        pairs = (
            ds.select_columns([c])
            .map_batches(valid, batch_format="pyarrow")
            .groupby(c)
            .aggregate(Count(alias_name="_n"))
        )
        distincts[c] = int(pairs.count())

    return pd.DataFrame({
        "column": pd.Series(cols, dtype=object),
        "n_rows": [np.int64(nulls.loc[c, "n_rows"]) for c in cols],
        "n_null": [np.int64(nulls.loc[c, "n_null"]) for c in cols],
        "n_distinct": [np.int64(distincts[c]) for c in cols],
    })
