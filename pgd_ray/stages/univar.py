"""Univariate stats over a micro-count column (SURVEY.md A5,
graphlet_univar_stats.h:75-108).

Moment stats (mean/var/std/min/max) are distributed partial+final
aggregates; quantiles use the reference's exact index rule
(med_idx = floor(n/2), Q1 = arr[med_idx - floor(n/4)],
Q3 = arr[med_idx + floor(n/4)], even-n median averaged), selected by
rank through ``stages.quantiles.exact_ranks`` — histogram-refinement
order statistics with NO global sort.  The index rule stays the
contract."""

from __future__ import annotations

import numpy as np
import ray.data
from ray.data.aggregate import Max, Min, Sum


def univar_stats(ds: ray.data.Dataset, col: str) -> dict:
    def moments(b):
        import pyarrow as pa

        v = b[col].to_numpy(zero_copy_only=False).astype(np.float64)
        return pa.table(
            {
                "s": [float(v.sum())],
                "ss": [float((v * v).sum())],
                "mn": [float(v.min()) if len(v) else np.inf],
                "mx": [float(v.max()) if len(v) else -np.inf],
                "n": [len(v)],
            }
        )

    agg = ds.map_batches(moments, batch_format="pyarrow").aggregate(
        Sum("s", alias_name="s"), Sum("ss", alias_name="ss"),
        Min("mn", alias_name="mn"), Max("mx", alias_name="mx"),
        Sum("n", alias_name="n"),
    )
    n = int(agg["n"] or 0)
    if n == 0:
        return {k: 0.0 for k in ("n", "mean", "variance", "std", "min", "max",
                                 "median", "q1", "q3", "iqr")}
    mean = agg["s"] / n
    # reference semantics: population variance E[x²] − mean²
    variance = agg["ss"] / n - mean * mean
    out = {
        "n": n,
        "mean": mean,
        "variance": variance,
        "std": float(np.sqrt(max(variance, 0.0))),
        "min": agg["mn"],
        "max": agg["mx"],
    }
    # exact quantiles by the reference's index rule, selected by rank
    # via the histogram-refinement engine (no global sort)
    from pgd_ray.stages.quantiles import exact_ranks

    med_idx = n // 2
    q_idx = n // 4
    want = sorted({med_idx - 1, med_idx, med_idx - q_idx, med_idx + q_idx})
    want = [i for i in want if 0 <= i < n]
    raw, _ = exact_ranks(ds, col, lambda _n: want)
    got = {i: float(v) for i, v in raw.items()}
    median = got.get(med_idx, 0.0)
    if n % 2 == 0 and med_idx - 1 in got:
        median = (got[med_idx - 1] + got[med_idx]) / 2
    out["median"] = median
    out["q1"] = got.get(med_idx - q_idx, 0.0)
    out["q3"] = got.get(med_idx + q_idx, 0.0)
    out["iqr"] = out["q3"] - out["q1"]
    return out
