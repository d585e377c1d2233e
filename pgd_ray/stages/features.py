"""Per-entity activity features (RFM-style) from the event stream.

The standard feature-engineering reduction for user modeling:
recency / frequency / monetary plus breadth, in ONE distributed hash
aggregation — per-batch partials would buy nothing here because the
native aggregate already combines per-block, and the output is one
row per user.  Distinct event-type breadth rides the same two-level
exact-distinct pattern as ``stages.distinct`` (dedup shuffle on the
(user, type) pair, then a count per user) — at 100 TB that pair
space is the true cost and is hash-partitioned, never collected.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Max, Mean, Min, Sum


def user_activity_features(sf_dir: str) -> ray.data.Dataset:
    """(user_id, n_events, n_types, first_us, last_us, span_us,
    total_value, mean_value) per user."""
    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["user_id", "ts", "event_type", "value"],
    )

    def to_us(t: pa.Table) -> pa.Table:
        us = t["ts"].to_numpy(zero_copy_only=False).astype(
            "datetime64[us]").astype(np.int64)
        # value is integer CENTS stored as double: sum the exact int64
        # cents, not floats — float partial sums are combine-ORDER-
        # dependent and at a digit-6 rounding boundary the engine and
        # the SQL oracle landed on opposite sides (seen at sf0.01)
        cents = np.rint(t["value"].to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64)
        return pa.table({"user_id": t["user_id"],
                         "ts_us": pa.array(us, pa.int64()),
                         "cents": pa.array(cents, pa.int64())})

    base = (
        ev.map_batches(to_us, batch_format="pyarrow")
        .groupby("user_id")
        .aggregate(
            Count(alias_name="n_events"),
            Min("ts_us", alias_name="first_us"),
            Max("ts_us", alias_name="last_us"),
            Sum("cents", alias_name="total_cents"),
        )
    )
    types = (
        ev.select_columns(["user_id", "event_type"])
        .groupby(["user_id", "event_type"])
        .aggregate(Count(alias_name="_n"))
        .groupby("user_id")
        .aggregate(Count(alias_name="n_types"))
    )

    # both sides are one-row-per-user aggregates: a small hash join.
    # groupby outputs carry EMPTY zero-schema blocks ("RefBundle with
    # a different schema" warning) that crash the join's pyarrow
    # finalize with "no match for key field" — repartition coalesces
    # them into uniform-schema blocks first
    base = base.repartition(8).materialize()
    types = types.repartition(8).materialize()
    joined = base.join(
        types, "inner", 8,
        on=("user_id",), right_on=("user_id",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )

    def finish(t: pa.Table) -> pa.Table:
        first = t["first_us"].to_numpy(zero_copy_only=False)
        last = t["last_us"].to_numpy(zero_copy_only=False)
        cents = t["total_cents"].to_numpy(zero_copy_only=False
                                          ).astype(np.float64)
        n = t["n_events"].to_numpy(zero_copy_only=False
                                   ).astype(np.float64)
        return pa.table({
            "user_id": t["user_id"],
            "n_events": t["n_events"],
            "n_types": t["n_types"],
            "first_us": pa.array(first, pa.int64()),
            "last_us": pa.array(last, pa.int64()),
            "span_us": pa.array(last - first, pa.int64()),
            # same expression shapes as the SQL mirror: exact int →
            # one IEEE division each → deterministic equality
            "total_value": pa.array(cents / 100.0, pa.float64()),
            "mean_value": pa.array(cents / (100.0 * n), pa.float64()),
        })

    return joined.map_batches(finish, batch_format="pyarrow")
