"""Per-dimension moments over an embedding (``list<float>``) column.

The standard first look at an embedding table (feature drift, dead
dimensions, normalization checks) — computed as distributed partial
moments: each batch stacks its vectors into one (rows × d) float64
matrix and emits d rows of (dim, n, sum, sumsq, min, max); a
``groupby(dim)`` reduces #batches × d tiny rows; a final vectorized
pass turns them into mean/std.  Nothing proportional to the table
ever leaves the workers.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Max, Min, Sum


def embedding_dim_stats(
    ds: ray.data.Dataset, col: str = "embedding"
) -> ray.data.Dataset:
    """Columns (dim, n, mean, std, vmin, vmax), one row per vector
    dimension; std is the population std (E[x²] − mean², matching the
    engine's univar convention)."""

    def partial(t: pa.Table) -> pa.Table:
        c = t[col].combine_chunks()
        if len(c) == 0:
            return pa.table({
                "dim": pa.array([], pa.int64()), "n": pa.array([], pa.int64()),
                "s": pa.array([], pa.float64()), "ss": pa.array([], pa.float64()),
                "mn": pa.array([], pa.float64()), "mx": pa.array([], pa.float64()),
            })
        flat = c.flatten().to_numpy(zero_copy_only=False).astype(np.float64)
        d = len(c[0])
        m = flat.reshape(-1, d)
        return pa.table(
            {
                "dim": np.arange(d, dtype=np.int64),
                "n": np.full(d, m.shape[0], dtype=np.int64),
                "s": m.sum(axis=0),
                "ss": (m * m).sum(axis=0),
                "mn": m.min(axis=0),
                "mx": m.max(axis=0),
            }
        )

    agg = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("dim")
        .aggregate(
            Sum("n", alias_name="n"), Sum("s", alias_name="s"),
            Sum("ss", alias_name="ss"), Min("mn", alias_name="vmin"),
            Max("mx", alias_name="vmax"),
        )
    )

    def finalize(t: pa.Table) -> pa.Table:
        df = t.to_pandas()
        mean = df["s"] / df["n"]
        var = np.maximum(df["ss"] / df["n"] - mean * mean, 0.0)
        return pa.table(
            {
                "dim": df["dim"].astype("int64"),
                "n": df["n"].astype("int64"),
                "mean": mean.round(6),
                "std": np.sqrt(var).round(6),
                "vmin": df["vmin"].round(6),
                "vmax": df["vmax"].round(6),
            }
        )

    return agg.map_batches(finalize, batch_format="pyarrow")
