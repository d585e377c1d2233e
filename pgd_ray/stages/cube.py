"""Multi-level (ROLLUP) aggregation and wide pivot over the event
stream.

* ``rollup_counts`` — the OLAP ROLLUP lattice (event_type, day) >
  (event_type) > () computed WITHOUT re-scanning the input per level:
  one distributed base aggregate at the finest grain, then each
  coarser level folds the base cube (|types| x |days| rows, tiny) —
  the standard rollup-from-base optimization; at 100 TB the raw table
  is read once.
* ``pivot_counts`` — long-to-wide conditional aggregation: per-batch
  crosstab partials (one int64 column per type) combined by a single
  hash aggregation on user_id.  The column vocabulary is derived from
  a distinct scan first (types are a small set by assumption — a
  web-scale pivot needs a bounded column side, asserted here).

NULL-free contract: rollup subtotal rows use the sentinels
event_type = '(all)' and day = -1 rather than SQL NULLs, so the Arrow
schema stays non-nullable and hash-comparable.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum

from pgd_ray.util import read_parquet_clean

_DAY_US = 86_400_000_000


def rollup_counts(sf_dir: str, exact_cents: bool = False) -> pd.DataFrame:
    """Event counts and value sums at (event_type, day), (event_type)
    and () grains — columns (event_type, day, n, value_sum).
    ``exact_cents=True`` sums int64 cents (see tumbling_counts)."""
    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def keyed(t: pa.Table) -> pa.Table:
        day = (t["ts"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").astype(np.int64)) // _DAY_US
        if exact_cents:
            # money contract: sum int64 cents (combine-order-free)
            v = np.rint(t["value"].to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64)
            vcol = pa.array(v, pa.int64())
        else:
            vcol = t["value"]
        return pa.table({"event_type": t["event_type"], "day": day,
                         "m": vcol})

    base = (
        ev.map_batches(keyed, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Count(alias_name="n"), Sum("m", alias_name="m"))
        .to_pandas()
    )
    if base.empty:
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "day": pd.Series([], dtype=np.int64),
                             "n": pd.Series([], dtype=np.int64),
                             "value_sum": pd.Series([], dtype=np.float64)})
    lvl1 = base.groupby("event_type", as_index=False).agg(
        n=("n", "sum"), m=("m", "sum"))
    lvl1["day"] = np.int64(-1)
    lvl0 = pd.DataFrame({"event_type": ["(all)"], "day": np.int64(-1),
                         "n": [base["n"].sum()],
                         "m": [base["m"].sum()]})
    out = pd.concat([base, lvl1, lvl0], ignore_index=True)
    out["n"] = out["n"].astype(np.int64)
    out["day"] = out["day"].astype(np.int64)
    from pgd_ray.util import round_half_away

    m = out.pop("m").to_numpy(np.float64)
    out["value_sum"] = round_half_away(
        m / 100.0 if exact_cents else m, 6)
    return out.sort_values(["event_type", "day"], ignore_index=True)


def pivot_counts(sf_dir: str) -> pd.DataFrame:
    """Per-user wide counts: one ``n_<type>`` int64 column per event
    type plus ``n_total`` — columns (user_id, n_<t>..., n_total)."""
    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    ).materialize()
    vocab = sorted(
        r["event_type"]
        for r in ev.groupby("event_type").aggregate(Count()).take_all()
    )
    cols = [f"n_{t}" for t in vocab]

    def partial(t: pa.Table) -> pa.Table:
        df = pd.DataFrame({"u": t["user_id"].to_numpy(zero_copy_only=False),
                           "e": t["event_type"].to_pandas()})
        ct = pd.crosstab(df["u"], df["e"]).reindex(columns=vocab,
                                                   fill_value=0)
        out = {"user_id": ct.index.to_numpy(np.int64)}
        for t_, c in zip(vocab, cols):
            out[c] = ct[t_].to_numpy(np.int64)
        return pa.table(out)

    agg = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(*[Sum(c, alias_name=c) for c in cols])
        .to_pandas()
    )
    for c in cols:
        agg[c] = agg[c].astype(np.int64)
    agg["n_total"] = agg[cols].sum(axis=1).astype(np.int64)
    return agg.sort_values("user_id", ignore_index=True)


def json_props_stats(sf_dir: str) -> pd.DataFrame:
    """Semi-structured column extraction + profile: pull the integer
    field ``k`` out of the JSON ``props`` string and aggregate per
    event type.  Extraction is a vectorized C-regex fast path for the
    corpus' flat single-field shape (a general engine would batch
    through a real JSON kernel; same stage signature) — never a
    Python json.loads per row.  Two-level distinct counting like
    ``window_distinct_users``.  Columns (event_type, n, k_sum,
    k_distinct, k_mean)."""
    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_type", "props"]
    ).materialize()

    def extract(t: pa.Table) -> pa.Table:
        k = (t["props"].to_pandas()
             .str.extract(r'"k"\s*:\s*(-?\d+)', expand=False)
             .astype("int64"))
        return pa.table({"event_type": t["event_type"],
                         "k": k.to_numpy(np.int64)})

    kd = ev.map_batches(extract, batch_format="pyarrow").materialize()
    base = (
        kd.groupby("event_type")
        .aggregate(Count(alias_name="n"), Sum("k", alias_name="k_sum"))
        .to_pandas()
    )
    dist = (
        kd.groupby(["event_type", "k"]).aggregate(Count())
        .select_columns(["event_type"])
        .groupby("event_type").aggregate(Count(alias_name="k_distinct"))
        .to_pandas()
    )
    out = base.merge(dist, on="event_type")
    out["n"] = out["n"].astype(np.int64)
    out["k_sum"] = out["k_sum"].astype(np.int64)
    out["k_distinct"] = out["k_distinct"].astype(np.int64)
    out["k_mean"] = (out["k_sum"] / out["n"]).round(6)
    return out.sort_values("event_type", ignore_index=True)


def cube_counts(sf_dir: str, exact_cents: bool = False) -> pd.DataFrame:
    """Full CUBE over (event_type, day-of-week): counts and value
    sums at ALL four grains — (type, dow), (type), (dow), () — the
    GROUP BY CUBE completion of ``rollup_counts``.  One distributed
    base aggregation at the finest grain (O(#types × 7) rows reach
    the driver); coarser grains fold the base frame.  Rolled-up
    levels use the rollup sentinels ('(all)' / -1); dow 0 = Monday
    (the dow_seasonality convention).  Columns (event_type, dow, n,
    value_sum round 6)."""
    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def keyed(t: pa.Table) -> pa.Table:
        day = (t["ts"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").astype(np.int64)) // _DAY_US
        if exact_cents:
            v = np.rint(t["value"].to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64)
            vcol = pa.array(v, pa.int64())
        else:
            vcol = t["value"]
        return pa.table({"event_type": t["event_type"],
                         "dow": (day + 4) % 7,
                         "m": vcol})

    base = (
        ev.map_batches(keyed, batch_format="pyarrow")
        .groupby(["event_type", "dow"])
        .aggregate(Count(alias_name="n"), Sum("m", alias_name="m"))
        .to_pandas()
    )
    if base.empty:
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "dow": pd.Series([], dtype=np.int64),
                             "n": pd.Series([], dtype=np.int64),
                             "value_sum": pd.Series([], dtype=np.float64)})
    by_type = base.groupby("event_type", as_index=False).agg(
        n=("n", "sum"), m=("m", "sum"))
    by_type["dow"] = np.int64(-1)
    by_dow = base.groupby("dow", as_index=False).agg(
        n=("n", "sum"), m=("m", "sum"))
    by_dow["event_type"] = "(all)"
    grand = pd.DataFrame({"event_type": ["(all)"], "dow": np.int64(-1),
                          "n": [base["n"].sum()],
                          "m": [base["m"].sum()]})
    out = pd.concat([base, by_type, by_dow, grand], ignore_index=True)
    out["dow"] = out["dow"].astype(np.int64)
    out["n"] = out["n"].astype(np.int64)
    from pgd_ray.util import round_half_away

    m = out.pop("m").to_numpy(np.float64)
    out["value_sum"] = round_half_away(
        m / 100.0 if exact_cents else m, 6)
    return out[["event_type", "dow", "n", "value_sum"]].sort_values(
        ["event_type", "dow"], ignore_index=True)
