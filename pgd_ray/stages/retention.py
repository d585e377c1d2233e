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
