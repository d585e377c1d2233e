"""Per-group top-k (heavy hitters) without ``map_groups``.

The reference engine is batch-only (SURVEY.md §2.8), but a
training-data pipeline constantly needs "top k items per key by
count" (vocab pruning, per-user/source caps, skew diagnostics).  A
per-group Python callable (``groupby().map_groups``) costs one
interpreter call per key — untenable at 10^9 keys — so this is built
from the same sorted-block + boundary-fragment pattern as
``sessionize`` / the transcript rank derivation:

1. one distributed multi-key sort (group asc, rank keys per spec);
2. per-block vectorized rank assignment — every group fully interior
   to a block gets its exact global rank locally;
3. only the ≤ 2 groups that touch a block edge are re-ranked on the
   driver, and their rows are pre-cut to block-local rank ≤ k first —
   O(k · #blocks) driver work even when one hot key spans every block
   — then unioned back as a dataset.

Result stays a (streaming) ``ray.data.Dataset``; the driver never
holds more than the boundary fragments.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count


def grouped_topk(
    ds: ray.data.Dataset,
    group_col: str,
    order_cols: list[str],
    descending: list[bool],
    k: int,
    rank_col: str = "rnk",
) -> ray.data.Dataset:
    """Keep the top ``k`` rows per ``group_col`` under the total order
    ``order_cols``/``descending`` (include a tie-breaker column so the
    order is total — ranks are deterministic only then).  Adds a
    1-based ``rank_col``."""
    srt = ds.sort(
        [group_col, *order_cols], descending=[False, *descending]
    ).materialize()
    schema = srt.schema() or ds.schema()
    if srt.count() == 0:
        if schema is None:
            return srt
        empty = pa.schema(
            list(zip(schema.names, schema.types)) + [(rank_col, pa.int64())]
        ).empty_table()
        return ray.data.from_arrow(empty)
    cols = list(schema.names)

    def block_rank(t: pa.Table) -> pa.Table:
        n = t.num_rows
        if n == 0:
            return t.append_column(rank_col, pa.array([], pa.int64())).append_column(
                "__boundary", pa.array([], pa.bool_())
            )
        g = t[group_col].to_numpy(zero_copy_only=False)
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = g[1:] != g[:-1]
        starts = np.flatnonzero(new)
        runs = np.diff(np.append(starts, n))
        rank = np.arange(n, dtype=np.int64) - np.repeat(starts, runs) + 1
        boundary = np.repeat((g[starts] == g[0]) | (g[starts] == g[-1]), runs)
        t = t.append_column(rank_col, pa.array(rank)).append_column(
            "__boundary", pa.array(boundary)
        )
        # Keep only block-local rank <= k EVERYWHERE, including
        # boundary groups: a row in the global top-k of its group has
        # all globally-prior group rows either in the same block
        # (local rank < its own <= k) or in earlier blocks, so its
        # LOCAL rank never exceeds its global rank.  This caps what
        # boundary groups ship to the driver at k rows per block —
        # a hot key spanning many blocks costs O(k * #blocks), never
        # O(group_size).  The driver re-rank stays exact: for a true
        # top-k row every globally-prior group row survives the local
        # filter, so its recomputed rank equals its global rank; rows
        # outside the top-k can only be UNDER-counted and are cut by
        # the final rank <= k.
        return t.filter(pa.array(rank <= k))

    flagged = srt.map_batches(
        block_rank, batch_format="pyarrow", batch_size=None
    ).materialize()

    import pyarrow.compute as pc

    def keep_interior(t: pa.Table) -> pa.Table:
        mask = pc.and_(
            pc.invert(t["__boundary"].combine_chunks()),
            pc.less_equal(t[rank_col].combine_chunks(), k),
        )
        return t.filter(mask).drop_columns(["__boundary"])

    interior = flagged.map_batches(keep_interior, batch_format="pyarrow")

    bdf = (
        flagged.map_batches(
            lambda t: t.filter(t["__boundary"].combine_chunks()),
            batch_format="pyarrow",
        )
        .to_pandas()
        .drop(columns=["__boundary", rank_col])
    )
    if not len(bdf):
        return interior
    bdf = bdf.sort_values(
        [group_col, *order_cols],
        ascending=[True] + [not d for d in descending],
        kind="stable",
        ignore_index=True,
    )
    bdf[rank_col] = (bdf.groupby(group_col).cumcount() + 1).astype("int64")
    bdf = bdf[bdf[rank_col] <= k]
    bnd = ray.data.from_arrow(
        pa.Table.from_pandas(
            bdf[cols + [rank_col]].reset_index(drop=True), preserve_index=False
        )
    )
    return interior.union(bnd)


def heavy_hitters(sf_dir: str, k: int = 3) -> ray.data.Dataset:
    """Top ``k`` event types per user by event count (ties → event_type
    asc).  Columns (user_id, event_type, n_events, rnk)."""
    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["user_id", "event_type"]
    )
    counts = ev.groupby(["user_id", "event_type"]).aggregate(
        Count(alias_name="n_events")
    )
    return grouped_topk(
        counts,
        group_col="user_id",
        order_cols=["n_events", "event_type"],
        descending=[True, False],
        k=k,
    )
