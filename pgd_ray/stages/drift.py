"""Distribution-drift monitors over the event stream: Population
Stability Index (PSI) and the exact two-sample Kolmogorov–Smirnov
statistic between the first and second halves of the event-time range.

Both are the screens a training-data pipeline runs between corpus
snapshots ("did the feature distribution move?").  Physical plans:

* ``psi_value`` — one aggregate pass for (ts range, value range), one
  streamed pass emitting ≤ 2·nbins partial counter rows per batch
  (side × fixed equal-width bin), O(nbins · #blocks) driver combine.
  Nothing ∝ rows ever reaches the driver.  Laplace-smoothed
  proportions (c+1)/(N+nbins) keep empty bins finite — and make the
  formula a closed form DuckDB mirrors bit-for-bit.

* ``ks_value`` — exact D = max_v |F1(v) − F2(v)|: per-batch (value,
  side) combiner partials → ONE global groupby(value) (the CDF must
  be evaluated at complete tie groups, so equal values are unified
  before any cumulative sum) → one sort by value → the repo's
  distributed prefix-sum pattern (per-block (c0, c1) totals,
  O(#blocks) driver offsets, second vectorized pass computing the
  per-block max diff).  The driver sees #blocks summary rows, never
  the distinct-value table.

The event-time midpoint split is the same integer-µs contract as
``__ray_entry__._event_halves`` (mid = lo + (hi − lo) // 2; first
half = tu < mid), so the SQL mirrors are bit-identical.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Max, Min, Sum

from pgd_ray.util import read_parquet_clean


def _ts_mid_and_value_range(ev: ray.data.Dataset):
    """One aggregate pass: ((min,max) epoch-µs ts, (min,max) value)."""
    agg = ev.map_batches(
        lambda t: pa.table({
            "tu": t["ts"].cast(pa.timestamp("us")).cast(pa.int64()),
            "value": t["value"],
        }),
        batch_format="pyarrow",
    ).aggregate(Min("tu"), Max("tu"), Min("value"), Max("value"))
    lo_t, hi_t = int(agg["min(tu)"]), int(agg["max(tu)"])
    return lo_t + (hi_t - lo_t) // 2, float(agg["min(value)"]), \
        float(agg["max(value)"])


def psi_value(sf_dir: str, nbins: int = 10) -> pd.DataFrame:
    """PSI of ``events.value`` between the two event-time halves over
    ``nbins`` equal-width bins spanning the GLOBAL value range (the
    production contract: the baseline snapshot fixes the bin edges).
    Columns (bin, n_first, n_second, p_first, p_second, contrib, psi);
    p are Laplace-smoothed (c+1)/(N+nbins), contrib =
    (p1−p2)·ln(p1/p2), psi = Σ contrib (repeated per row — the SQL
    window-sum mirror).  All ``nbins`` bins are present."""
    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "value"]).materialize()
    mid, lo_v, hi_v = _ts_mid_and_value_range(ev)
    w = (hi_v - lo_v) / float(nbins)

    def partials(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        tu = (t["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        ok = ~np.isnan(v)
        v, tu = v[ok], tu[ok]
        if w > 0:
            bins = np.minimum(np.floor((v - lo_v) / w).astype(np.int64),
                              nbins - 1)
        else:
            bins = np.zeros(len(v), dtype=np.int64)
        side = (tu >= mid).astype(np.int64)
        c = np.bincount(side * nbins + bins, minlength=2 * nbins)
        return pa.table({
            "side": np.repeat(np.array([0, 1], dtype=np.int64), nbins),
            "bin": np.tile(np.arange(nbins, dtype=np.int64), 2),
            "cnt": c,
        })

    parts = ev.map_batches(
        partials, batch_format="pyarrow").to_pandas()
    cnt = parts.groupby(["side", "bin"])["cnt"].sum()
    c0 = np.array([int(cnt.get((0, b), 0)) for b in range(nbins)],
                  dtype=np.int64)
    c1 = np.array([int(cnt.get((1, b), 0)) for b in range(nbins)],
                  dtype=np.int64)
    n0, n1 = int(c0.sum()), int(c1.sum())
    p0 = (c0 + 1.0) / (n0 + float(nbins))
    p1 = (c1 + 1.0) / (n1 + float(nbins))
    contrib = (p0 - p1) * np.log(p0 / p1)
    return pd.DataFrame({
        "bin": np.arange(nbins, dtype=np.int64),
        "n_first": c0,
        "n_second": c1,
        "p_first": np.round(p0, 9),
        "p_second": np.round(p1, 9),
        "contrib": np.round(contrib, 9),
        "psi": np.round(np.full(nbins, contrib.sum()), 9),
    })


def ks_value(sf_dir: str) -> pd.DataFrame:
    """Exact two-sample KS statistic for ``events.value`` between the
    event-time halves.  One row: (d_stat, at_value, n_first,
    n_second) — at_value is the SMALLEST distinct value achieving the
    max CDF gap (ties broken low, mirroring MIN ... WHERE diff=max)."""
    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "value"])
    agg = ev.map_batches(
        lambda t: pa.table(
            {"tu": t["ts"].cast(pa.timestamp("us")).cast(pa.int64())}),
        batch_format="pyarrow",
    ).aggregate(Min("tu"), Max("tu"))
    lo_t, hi_t = int(agg["min(tu)"]), int(agg["max(tu)"])
    mid = lo_t + (hi_t - lo_t) // 2

    def tag(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        tu = (t["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        ok = ~np.isnan(v)
        v, tu = v[ok], tu[ok]
        first = tu < mid
        # per-batch combiner: collapse duplicate values locally
        df = pd.DataFrame({"value": v,
                           "c0": first.astype(np.int64),
                           "c1": (~first).astype(np.int64)})
        g = df.groupby("value", as_index=False, sort=False).sum()
        return pa.table({"value": g["value"].to_numpy(),
                         "c0": g["c0"].to_numpy(),
                         "c1": g["c1"].to_numpy()})

    grouped = (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("value")
        .aggregate(Sum("c0", alias_name="c0"), Sum("c1", alias_name="c1"))
    )
    srt = grouped.sort("value").materialize()

    def summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"key": pa.array([], pa.float64()),
                             "t0": pa.array([], pa.int64()),
                             "t1": pa.array([], pa.int64())})
        return pa.table({
            "key": [float(t["value"][0].as_py())],
            "t0": [int(t["c0"].to_numpy(zero_copy_only=False).sum())],
            "t1": [int(t["c1"].to_numpy(zero_copy_only=False).sum())],
        })

    sm = srt.map_batches(summary, batch_format="pyarrow",
                         batch_size=None).to_pandas()
    if sm.empty:
        raise ValueError("ks_value: no non-null values")
    sm = sm.sort_values("key", ignore_index=True)
    n0, n1 = int(sm["t0"].sum()), int(sm["t1"].sum())
    if n0 == 0 or n1 == 0:
        raise ValueError("ks_value: one time half has no values")
    off0 = dict(zip(sm["key"],
                    np.concatenate(([0], np.cumsum(sm["t0"].to_numpy()[:-1])))))
    off1 = dict(zip(sm["key"],
                    np.concatenate(([0], np.cumsum(sm["t1"].to_numpy()[:-1])))))
    if len(off0) != len(sm):  # groupby guarantees distinct block keys
        raise AssertionError("duplicate sorted-block keys after groupby")

    def block_max(t: pa.Table) -> pa.Table:
        empty = pa.table({"diff": pa.array([], pa.float64()),
                          "at_value": pa.array([], pa.float64())})
        if t.num_rows == 0:
            return empty
        v = t["value"].to_numpy(zero_copy_only=False)
        a = t["c0"].to_numpy(zero_copy_only=False)
        b = t["c1"].to_numpy(zero_copy_only=False)
        cum0 = off0[float(v[0])] + np.cumsum(a)
        cum1 = off1[float(v[0])] + np.cumsum(b)
        diff = np.abs(cum0 / float(n0) - cum1 / float(n1))
        i = int(np.argmax(diff))  # first occurrence = smallest value
        return pa.table({"diff": [float(diff[i])],
                         "at_value": [float(v[i])]})

    bm = srt.map_batches(block_max, batch_format="pyarrow",
                         batch_size=None).to_pandas()
    d = float(bm["diff"].max())
    at = float(bm.loc[bm["diff"] == d, "at_value"].min())
    return pd.DataFrame({"d_stat": [round(d, 9)], "at_value": [at],
                         "n_first": [np.int64(n0)],
                         "n_second": [np.int64(n1)]})


def w1_value(sf_dir: str) -> pd.DataFrame:
    """Exact 1-Wasserstein (earth-mover) distance between the two
    event-time halves of ``events.value`` — the drift magnitude KS's
    max-gap cannot express: W₁ = ∫|F₁−F₂| dx = Σ over sorted distinct
    values of |F₁(v)−F₂(v)|·(v_next − v).

    Same physical plan as ``ks_value`` (groupby(value) → sort →
    distributed prefix sums) with one extra stitched datum: each
    block's last row needs the NEXT block's first value, carried
    through the O(#blocks) driver summary (the global last row's term
    is 0 — the integral ends).  One row: (w1, n_first, n_second)."""
    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "value"])
    agg = ev.map_batches(
        lambda t: pa.table(
            {"tu": t["ts"].cast(pa.timestamp("us")).cast(pa.int64())}),
        batch_format="pyarrow",
    ).aggregate(Min("tu"), Max("tu"))
    lo_t, hi_t = int(agg["min(tu)"]), int(agg["max(tu)"])
    mid = lo_t + (hi_t - lo_t) // 2

    def tag(t: pa.Table) -> pa.Table:
        v = t["value"].to_numpy(zero_copy_only=False)
        tu = (t["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        ok = ~np.isnan(v)
        v, tu = v[ok], tu[ok]
        first = tu < mid
        df = pd.DataFrame({"value": v,
                           "c0": first.astype(np.int64),
                           "c1": (~first).astype(np.int64)})
        g = df.groupby("value", as_index=False, sort=False).sum()
        return pa.table({"value": g["value"].to_numpy(),
                         "c0": g["c0"].to_numpy(),
                         "c1": g["c1"].to_numpy()})

    grouped = (
        ev.map_batches(tag, batch_format="pyarrow")
        .groupby("value")
        .aggregate(Sum("c0", alias_name="c0"), Sum("c1", alias_name="c1"))
    )
    srt = grouped.sort("value").materialize()

    def summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"key": pa.array([], pa.float64()),
                             "t0": pa.array([], pa.int64()),
                             "t1": pa.array([], pa.int64())})
        return pa.table({
            "key": [float(t["value"][0].as_py())],
            "t0": [int(t["c0"].to_numpy(zero_copy_only=False).sum())],
            "t1": [int(t["c1"].to_numpy(zero_copy_only=False).sum())],
        })

    sm = srt.map_batches(summary, batch_format="pyarrow",
                         batch_size=None).to_pandas()
    if sm.empty:
        raise ValueError("w1_value: no non-null values")
    sm = sm.sort_values("key", ignore_index=True)
    n0, n1 = int(sm["t0"].sum()), int(sm["t1"].sum())
    if n0 == 0 or n1 == 0:
        raise ValueError("w1_value: one time half has no values")
    off0 = dict(zip(sm["key"],
                    np.concatenate(([0], np.cumsum(sm["t0"].to_numpy()[:-1])))))
    off1 = dict(zip(sm["key"],
                    np.concatenate(([0], np.cumsum(sm["t1"].to_numpy()[:-1])))))
    keys = sm["key"].to_numpy()
    # next block's first value, keyed by this block's first value
    nxt = {float(keys[i]): float(keys[i + 1]) for i in range(len(keys) - 1)}

    def block_sum(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"s": pa.array([], pa.float64())})
        v = t["value"].to_numpy(zero_copy_only=False)
        a = t["c0"].to_numpy(zero_copy_only=False)
        b = t["c1"].to_numpy(zero_copy_only=False)
        cum0 = off0[float(v[0])] + np.cumsum(a)
        cum1 = off1[float(v[0])] + np.cumsum(b)
        diff = np.abs(cum0 / float(n0) - cum1 / float(n1))
        nv = nxt.get(float(v[0]))
        if nv is None:
            gaps = np.concatenate((v[1:], [v[-1]])) - v  # last term 0
        else:
            gaps = np.concatenate((v[1:], [nv])) - v
        return pa.table({"s": [float((diff * gaps).sum())]})

    bs = srt.map_batches(block_sum, batch_format="pyarrow",
                         batch_size=None).to_pandas()
    return pd.DataFrame({"w1": [round(float(bs["s"].sum()), 9)],
                         "n_first": [np.int64(n0)],
                         "n_second": [np.int64(n1)]})
