"""Grouped closed-form OLS over the event stream.

slope/intercept of value ~ time per event_type from the five
classical sums (n, Σx, Σy, Σxy, Σx²) — per-batch partials, one
<= |types|-row exchange, closed form on the driver.

Numerical posture: raw epoch-microsecond x (~1e15) would make
n·Σx² − (Σx)² catastrophically cancel in float64, so x is centered by
the corpus' EXACT integer min(ts) and expressed in days.  The oracle
mirrors the same explicit-sums formula (NOT regr_slope, whose
streaming kernel sums in a different order) on the same centered x,
so engine and SQL agree to 1e-6 by construction.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Min, Sum

from pgd_ray.util import read_parquet_clean

_DAY_US = 86_400_000_000.0


def grouped_ols(sf_dir: str) -> pd.DataFrame:
    """Per-type OLS of value against time-in-days — columns
    (event_type, n, slope, intercept)."""
    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    ).materialize()

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({"us": (t["ts"].to_numpy(zero_copy_only=False)
                                .astype("datetime64[us]").astype(np.int64))})

    t0 = ev.map_batches(to_us, batch_format="pyarrow").aggregate(Min("us"))
    t0 = t0["min(us)"]
    if t0 is None:
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "n": pd.Series([], dtype=np.int64),
                             "slope": pd.Series([], dtype=np.float64),
                             "intercept": pd.Series([], dtype=np.float64)})

    def partial(t: pa.Table) -> pa.Table:
        us = (t["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        x = (us - t0).astype(np.float64) / _DAY_US
        y = t["value"].to_numpy(zero_copy_only=False).astype(np.float64)
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas(),
                           "n": np.int64(1), "sx": x, "sy": y,
                           "sxy": x * y, "sxx": x * x})
        g = df.groupby("event_type", sort=False).agg(
            n=("n", "sum"), sx=("sx", "sum"), sy=("sy", "sum"),
            sxy=("sxy", "sum"), sxx=("sxx", "sum")).reset_index()
        return pa.Table.from_pandas(g, preserve_index=False)

    agg = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("n", alias_name="n"), Sum("sx", alias_name="sx"),
                   Sum("sy", alias_name="sy"), Sum("sxy", alias_name="sxy"),
                   Sum("sxx", alias_name="sxx"))
        .to_pandas()
    )
    n = agg["n"].to_numpy(np.float64)
    sx = agg["sx"].to_numpy(np.float64)
    sy = agg["sy"].to_numpy(np.float64)
    sxy = agg["sxy"].to_numpy(np.float64)
    sxx = agg["sxx"].to_numpy(np.float64)
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    intercept = (sy - slope * sx) / n
    return pd.DataFrame({
        "event_type": agg["event_type"],
        "n": agg["n"].astype(np.int64),
        "slope": np.round(slope, 6),
        "intercept": np.round(intercept, 6),
    }).sort_values("event_type", ignore_index=True)


def anova_value_by_type(sf_dir: str) -> pd.DataFrame:
    """One-way ANOVA F-statistic of ``value`` across event types —
    the "does this grouping matter at all?" screen next to the χ²
    (independence) and OLS (trend) stages.  F = (SSB/(k−1)) /
    (SSW/(n−k)) from one distributed (type, n, Σv, Σv²) moment pass.
    One row (k, n, f_stat round 6)."""
    from ray.data.aggregate import Count, Sum

    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_type", "value"])

    def moments(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        return pa.table({"event_type": t["event_type"],
                         "v": v, "v2": v * v})

    g = (ev.map_batches(moments, batch_format="pyarrow")
         .groupby("event_type")
         .aggregate(Count(alias_name="n"),
                    Sum("v", alias_name="s1"),
                    Sum("v2", alias_name="s2"))
         .to_pandas())
    k = len(g)
    n = int(g["n"].sum())
    s1 = g["s1"].to_numpy(np.float64)
    s2 = g["s2"].to_numpy(np.float64)
    ng = g["n"].to_numpy(np.float64)
    grand = s1.sum() / n
    ssb = float((ng * (s1 / ng - grand) ** 2).sum())
    ssw = float((s2 - s1 * s1 / ng).sum())
    f = (ssb / (k - 1)) / (ssw / (n - k)) if k > 1 and n > k and ssw > 0 \
        else 0.0
    return pd.DataFrame({"k": [np.int64(k)], "n": [np.int64(n)],
                         "f_stat": [round(f, 6)]})
