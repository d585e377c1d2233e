"""Ordered-funnel analysis over an event stream: how many users
complete step 1, then step 2 strictly after their step-1 time, and so
on (the standard product-analytics funnel with "first touch" step
times).

Scale shape: one filtered `map_batches` scan per step.  Step k
broadcasts the step-(k-1) per-user completion times once via
`ray.put` (sorted user array + times; lookups are searchsorted, no
Python loop) and emits per-batch (user, min_ts) partials; the
`groupby(user).min` exchange carries at most one row per (user,
batch).  Per-user state is O(completing users) — the funnel shrinks
every step; for a first step matching most of the corpus, swap the
broadcast for the hash-partitioned join in `stages/joins.py` (same
contract as its hot-key note).
"""
from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Min


def funnel_counts(
    events: ray.data.Dataset,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> pd.DataFrame:
    """Per-step completing-user counts for the ordered ``steps``
    funnel (strict: each step's event must be strictly later than the
    user's previous-step time).  Returns (step, event_type, users)."""
    if not steps:
        return pd.DataFrame({"step": pd.Series([], dtype="int64"),
                             "event_type": pd.Series([], dtype=object),
                             "users": pd.Series([], dtype="int64")})
    ds = events.select_columns([user_col, type_col, ts_col])
    prev_ref = None
    rows = []
    for i, step_type in enumerate(steps):

        def part(b: pa.Table, st=step_type, pref=prev_ref) -> pa.Table:
            m = pa.compute.equal(b[type_col], st)
            t = b.filter(m)
            u = t[user_col].to_numpy(zero_copy_only=False)
            ts = t[ts_col].to_numpy(zero_copy_only=False)
            if pref is not None:
                pu, pt = ray.get(pref)
                if len(pu) == 0:
                    u = u[:0]
                    ts = ts[:0]
                else:
                    pos = np.clip(np.searchsorted(pu, u), 0, len(pu) - 1)
                    ok = (pu[pos] == u) & (ts > pt[pos])
                    u, ts = u[ok], ts[ok]
            if len(u) == 0:
                return pa.table({user_col: pa.array([], pa.int64()),
                                 "t": pa.array([], pa.timestamp("us"))})
            order = np.lexsort((ts, u))
            u, ts = u[order], ts[order]
            first = np.concatenate([[True], u[1:] != u[:-1]])
            return pa.table({user_col: u[first].astype(np.int64),
                             "t": ts[first]})

        agg = (ds.map_batches(part, batch_format="pyarrow")
               .groupby(user_col)
               .aggregate(Min("t", alias_name="t"))
               .to_pandas())
        if user_col not in agg.columns:  # all-empty step: schema lost
            agg = pd.DataFrame({user_col: np.array([], np.int64),
                                "t": np.array([], "datetime64[us]")})
        agg = agg.sort_values(user_col)
        prev_ref = ray.put((agg[user_col].to_numpy(),
                            agg["t"].to_numpy()))
        rows.append({"step": np.int64(i + 1), "event_type": step_type,
                     "users": np.int64(len(agg))})
    return pd.DataFrame(rows)
