"""Cohort retention over the ``events`` stream.

Classic growth-analytics matrix: each user is assigned to the cohort
of their first active week; ``users[cohort_week, week_offset]`` counts
the distinct users of that cohort active ``week_offset`` weeks later.

Scale shape (no reference counterpart — SURVEY.md §2.8 lists
event-stream analytics as absent from PGD):

1. per-batch partial distinct of (user, week) pairs — a combiner that
   collapses each batch before anything is shuffled (a user's events
   within a week are usually adjacent, so this removes most volume);
2. ONE hash aggregation for the global distinct (user, week) set;
3. per-user cohort week = ``groupby(user).min(week)`` — a second hash
   aggregation over the already-deduped pairs (≤ #users × #weeks
   rows, not #events);
4. a distributed hash join pairs × cohort on user (broadcast would
   cap at driver memory for billions of users), then one final
   (cohort, offset) count aggregation — counts are distinct-user
   counts by construction because step 2 deduped.

Driver never materializes users or events; every step is a Dataset.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Min

WEEK_US = 604_800_000_000


def _us(col: pa.ChunkedArray) -> np.ndarray:
    a = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    if pa.types.is_timestamp(a.type):
        a = a.cast(pa.timestamp("us")).cast(pa.int64())
    return a.to_numpy(zero_copy_only=False).astype(np.int64)


def cohort_retention(
    events: ray.data.Dataset,
    week_us: int = WEEK_US,
    num_partitions: int = 8,
    concurrency: int = 16,
) -> ray.data.Dataset:
    """Columns (cohort_week, week_offset, users): distinct users of
    cohort ``cohort_week`` (their first active week, in units of
    ``week_us`` since epoch) active again ``week_offset`` weeks in."""
    if week_us <= 0:
        raise ValueError("week_us must be positive")

    def pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "wk": pa.array([], pa.int64())})
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        wk = _us(t["ts"]) // week_us
        df = pd.DataFrame({"user_id": u, "wk": wk}).drop_duplicates()
        return pa.Table.from_pandas(df, preserve_index=False)

    uw = (
        events.select_columns(["user_id", "ts"])
        .map_batches(pairs, batch_format="pyarrow", batch_size=65536,
                     concurrency=int(concurrency))
        .groupby(["user_id", "wk"]).aggregate(Count(alias_name="_c"))
        .drop_columns(["_c"])
        .materialize()
    )
    # materialize: the groupby's aggregator pool must be gone before
    # the join pool spawns (two live pools can reserve every CPU and
    # deadlock upstream tasks — see ray-data pitfalls note)
    cohort = uw.groupby("user_id").aggregate(
        Min("wk", alias_name="cw")).materialize()
    # second barrier: the join's aggregator pool must drain before the
    # final Aggregate shuffle spawns its own, or the two pools starve
    # each other on small clusters
    joined = uw.join(
        cohort, "inner", num_partitions,
        on=("user_id",), right_on=("user_id",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    ).materialize()

    def offs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"cohort_week": pa.array([], pa.int64()),
                             "week_offset": pa.array([], pa.int64())})
        cw = t["cw"].to_numpy(zero_copy_only=False).astype(np.int64)
        wk = t["wk"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table({"cohort_week": cw, "week_offset": wk - cw})

    out = (
        joined.map_batches(offs, batch_format="pyarrow")
        .groupby(["cohort_week", "week_offset"])
        .aggregate(Count(alias_name="users"))
    )
    return out


def kaplan_meier(sf_dir: str, churn_days: int = 7) -> pd.DataFrame:
    """Kaplan–Meier survival curve of user lifetime (days between a
    user's first and last event).  A user whose last event is more
    than ``churn_days`` before the corpus end is an observed CHURN
    (event=1); later last-events are right-censored (the corpus ended
    before we could see them churn) — the textbook estimator growth
    analytics runs on activity data.

    Distribution: one tiny global-max pass + one per-user (Min, Max)
    hash aggregation + one (duration, event) count aggregation — the
    driver sees O(#distinct durations) rows and runs the inherently
    sequential product recurrence over them.  Columns (dur_days,
    n_risk, n_events, n_censored, survival), survival rounded 9;
    events precede censoring at tied times (standard convention —
    censored users still count in that time's risk set)."""
    from ray.data.aggregate import Max, Sum

    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["user_id", "ts"]).materialize()

    def keyed(t: pa.Table) -> pa.Table:
        return pa.table({"user_id": t["user_id"],
                         "tu": t["ts"].cast(pa.timestamp("us"))
                        .cast(pa.int64())})

    tus = ev.map_batches(keyed, batch_format="pyarrow")
    end = int(tus.aggregate(Max("tu"))["max(tu)"])
    per_user = (
        tus.groupby("user_id")
        .aggregate(Min("tu", alias_name="t0"), Max("tu", alias_name="t1"))
    )

    day_us = 86_400_000_000

    def dur_ev(t: pa.Table) -> pa.Table:
        t0 = t["t0"].to_numpy(zero_copy_only=False)
        t1 = t["t1"].to_numpy(zero_copy_only=False)
        dur = (t1 - t0) // day_us
        evt = ((end - t1) > churn_days * day_us).astype(np.int64)
        return pa.table({"dur": dur, "d": evt, "c": 1 - evt})

    g = (
        per_user.map_batches(dur_ev, batch_format="pyarrow")
        .groupby("dur")
        .aggregate(Sum("d", alias_name="d"), Sum("c", alias_name="c"))
        .to_pandas()
    )
    g = g.sort_values("dur", ignore_index=True)
    d = g["d"].to_numpy(np.int64)
    c = g["c"].to_numpy(np.int64)
    total = int((d + c).sum())
    ahead = np.concatenate(([0], np.cumsum(d + c)[:-1]))
    n_risk = total - ahead
    s = 1.0
    surv = np.empty(len(g))
    for i in range(len(g)):
        s = s * (1.0 - float(d[i]) / float(n_risk[i]))
        surv[i] = s
    return pd.DataFrame({"dur_days": g["dur"].to_numpy(np.int64),
                         "n_risk": n_risk.astype(np.int64),
                         "n_events": d,
                         "n_censored": c,
                         "survival": np.round(surv, 9)})
