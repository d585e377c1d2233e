"""Robust (median/MAD) per-group outlier screening.

The standard robust alternative to z-scores for heavy-tailed metric
columns: per group, center = exact median, scale = exact median
absolute deviation (MAD), outlier = |x - med| > thresh * MAD.  Both
medians come from `stages.quantiles.grouped_quantiles` (shared-pass
histogram refinement — no sort, no map_groups), so the whole operator
is three streamed passes over the column:

  1. grouped p50 of the raw value,
  2. grouped p50 of |value - med(group)| (median broadcast as a tiny
     dict, batch lookup via the pandas C-path map),
  3. one counting pass for the flags.

The comparison |x - med| > thresh * MAD is the identical IEEE-double
expression in the engine and the SQL oracle, so the counts are exact,
not tolerance-matched.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import ray
import ray.data
from ray.data.aggregate import Count, Sum

from pgd_ray.stages.quantiles import grouped_quantiles


def mad_outliers(
    ds: ray.data.Dataset, key: str, col: str, thresh: float = 3.0,
) -> pd.DataFrame:
    """Per-group (key, med, mad, n, n_outliers) with the engine's exact
    rank-(floor(q*(n-1))) median rule.  NULL/NaN values are excluded
    (SQL aggregate semantics, inherited from grouped_quantiles)."""
    med = grouped_quantiles(ds, key, col, [0.5])
    if med.empty or key not in med.columns:
        return pd.DataFrame({key: pd.Series([], dtype=object),
                             "med": pd.Series([], dtype=np.float64),
                             "mad": pd.Series([], dtype=np.float64),
                             "n": pd.Series([], dtype=np.int64),
                             "n_outliers": pd.Series([], dtype=np.int64)})
    med_map = dict(zip(med[key], med["value"]))
    med_ref = ray.put(med_map)

    def absdev(b: pd.DataFrame) -> pd.DataFrame:
        mm = ray.get(med_ref) if isinstance(med_ref, ray.ObjectRef) else med_ref
        m = b[key].map(mm).to_numpy(np.float64)
        return pd.DataFrame({key: b[key],
                             "absdev": np.abs(b[col].to_numpy(np.float64) - m)})

    dev = ds.select_columns([key, col]).map_batches(absdev, batch_format="pandas")
    mad = grouped_quantiles(dev, key, "absdev", [0.5])
    mad_map = dict(zip(mad[key], mad["value"]))
    mad_ref = ray.put((med_map, mad_map, float(thresh)))

    def flag(b: pd.DataFrame) -> pd.DataFrame:
        mm, sm, th = ray.get(mad_ref) if isinstance(mad_ref, ray.ObjectRef) \
            else mad_ref
        x = b[col].to_numpy(np.float64)
        m = b[key].map(mm).to_numpy(np.float64)
        s = b[key].map(sm).to_numpy(np.float64)
        keep = ~np.isnan(x)
        return pd.DataFrame({
            key: b[key][keep],
            "is_out": (np.abs(x - m) > th * s)[keep].astype(np.int64),
        })

    agg = (
        ds.select_columns([key, col])
        .map_batches(flag, batch_format="pandas")
        .groupby(key)
        .aggregate(Count(alias_name="n"), Sum("is_out", alias_name="n_outliers"))
        .to_pandas()
    )
    out = agg.merge(med[[key, "value"]].rename(columns={"value": "med"}), on=key)
    out = out.merge(mad[[key, "value"]].rename(columns={"value": "mad"}), on=key)
    out["n"] = out["n"].astype(np.int64)
    out["n_outliers"] = out["n_outliers"].astype(np.int64)
    return out[[key, "med", "mad", "n", "n_outliers"]].sort_values(
        key, ignore_index=True)
