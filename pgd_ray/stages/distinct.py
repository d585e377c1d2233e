"""Exact per-key distinct counts at scale.

``COUNT(DISTINCT v) GROUP BY k`` done naively ships every (k, v)
occurrence to one reducer per key — hot keys melt.  The scale-safe
shape is two hash aggregations: dedup (k, v) pairs first (combiners
shrink each batch to its distinct pairs before the exchange), then
count rows per key.  Both stages are plain Ray Data ``groupby``s —
no value set is ever held in one place.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count


def grouped_distinct_count(
    ds: ray.data.Dataset, key_col: str, val_col: str, alias: str = "n_distinct"
) -> ray.data.Dataset:
    """Exact number of distinct non-NULL ``val_col`` values per
    ``key_col`` (NULL values are excluded, matching SQL
    ``COUNT(DISTINCT ...)``).  Columns (key_col, alias)."""

    def _valid(t: pa.Table) -> pa.Table:
        return t.filter(t[val_col].combine_chunks().is_valid())

    pairs = (
        ds.select_columns([key_col, val_col])
        .map_batches(_valid, batch_format="pyarrow")
        .groupby([key_col, val_col])
        .aggregate(Count(alias_name="_n"))
        .select_columns([key_col, val_col])
    )
    return pairs.groupby(key_col).aggregate(Count(alias_name=alias))


def dedup_sorted_blocks(
    srt: ray.data.Dataset, cols: list[str]
) -> ray.data.Dataset:
    """Adjacent-row dedup over a Dataset already globally sorted by
    ``cols``, correct across block boundaries.

    The boundary stitch is keyed by **block position**, not by row
    value: each physical block's drop-my-first-row decision is made by
    comparing its first row against the *physically previous*
    non-empty block's last row, in block order.  (An earlier version
    keyed the decision by the first-row VALUE applied to any block
    whose first row matched — which silently dropped a distinct value
    when a duplicate run exactly filled a whole block, and depended on
    an unstable re-sort of the summaries.  See ADVICE r3.)

    Driver state is O(#blocks) boundary tuples; each block is deduped
    remotely (one Ray task per block), so nothing row-scale lands on
    the driver.  ``srt`` must be materialized (it is, post-sort)."""
    refs = srt.to_arrow_refs()
    if not refs:
        return srt

    @ray.remote
    def _bounds(t):
        t = pa.Table.from_batches(t.to_batches(), schema=t.schema) \
            if not isinstance(t, pa.Table) else t
        if t.num_rows == 0:
            return None
        return (tuple(t[c][0].as_py() for c in cols),
                tuple(t[c][t.num_rows - 1].as_py() for c in cols))

    sums = ray.get([_bounds.remote(r) for r in refs])
    # drop empty blocks outright: zero-row sort outputs can carry a
    # schema-less table, and unioning those with typed blocks trips
    # Ray's schema unification downstream
    keep_refs, drop = [], []
    prev_last = None
    for r, s in zip(refs, sums):
        if s is None:
            continue
        first, last = s
        keep_refs.append(r)
        drop.append(prev_last is not None and first == prev_last)
        prev_last = last
    if not keep_refs:
        return srt
    refs = keep_refs

    @ray.remote
    def _dedup(t, drop_first: bool):
        if t.num_rows == 0:
            return t
        arrs = [t[c].to_numpy(zero_copy_only=False) for c in cols]
        keep = np.zeros(t.num_rows, dtype=bool)
        keep[0] = not drop_first
        if t.num_rows > 1:
            neq = np.zeros(t.num_rows - 1, dtype=bool)
            for a in arrs:
                neq |= a[1:] != a[:-1]
            keep[1:] = neq
        return t.filter(pa.array(keep))

    out = [_dedup.remote(r, d) for r, d in zip(refs, drop)]
    return ray.data.from_arrow_refs(out)


def count_sorted_blocks(
    srt: ray.data.Dataset, cols: list[str], alias: str = "n"
) -> ray.data.Dataset:
    """Per-key row counts over a Dataset already globally sorted by
    ``cols`` — the sort-path replacement for a high-cardinality hash
    ``groupby().aggregate(Count)`` (the 638 s-vs-10 s BASELINE.md
    rule, same family as ``dedup_sorted_blocks``).

    Each block reduces its key runs vectorized (one Ray task per
    block); runs that touch a block edge — the first and last run of
    every block, whose key may continue into a neighbor — are routed
    to the driver and re-summed there, O(#blocks) rows.  Interior runs
    are complete by construction (globally sorted input), so no key is
    counted twice.  Returns a Dataset with columns ``cols + [alias]``
    (unsorted block order, like any Ray aggregate)."""
    refs = srt.to_arrow_refs()

    @ray.remote(num_returns=3)
    def _runs(t):
        # zero-row sort outputs can carry a schema-less table (same
        # hazard dedup_sorted_blocks documents) — flag such blocks so
        # the driver can drop their refs without pulling any table
        if t.num_rows == 0:
            return None, None, False
        empty = t.select(cols).slice(0, 0).append_column(
            alias, pa.array([], pa.int64()))
        arrs = [t[c].to_numpy(zero_copy_only=False) for c in cols]
        neq = np.zeros(t.num_rows - 1, dtype=bool)
        for a in arrs:
            neq |= a[1:] != a[:-1]
        starts = np.concatenate(([0], np.flatnonzero(neq) + 1))
        ends = np.concatenate((starts[1:], [t.num_rows]))
        n = (ends - starts).astype(np.int64)
        key_tbl = t.select(cols).take(pa.array(starts))
        full = key_tbl.append_column(alias, pa.array(n, pa.int64()))
        if len(starts) <= 2:
            return empty, full, True  # every run touches an edge
        interior = full.slice(1, len(starts) - 2)
        edge = pa.concat_tables([full.slice(0, 1),
                                 full.slice(len(starts) - 1, 1)])
        return interior, edge, True

    if not refs:
        return srt
    out = [_runs.remote(r) for r in refs]
    flags = ray.get([o[2] for o in out])
    edge_tbls = ray.get([o[1] for o, f in zip(out, flags) if f])
    # interior tables stay in plasma — the driver keeps refs only
    interior_refs = [o[0] for o, f in zip(out, flags) if f]
    nonempty = [e for e in edge_tbls if e.num_rows]
    if not interior_refs:
        return srt  # every block empty: srt is already the answer
    parts = [ray.data.from_arrow_refs(interior_refs)]
    if nonempty:
        edges = pa.concat_tables(nonempty)
        edf = edges.to_pandas().groupby(cols, sort=False, dropna=False)[
            alias].sum().reset_index()
        edf[alias] = edf[alias].astype(np.int64)
        parts.append(ray.data.from_arrow(
            pa.Table.from_pandas(edf, preserve_index=False)
            .cast(edges.schema)))
    return parts[0] if len(parts) == 1 else parts[0].union(parts[1])


def distinct_rows(ds: ray.data.Dataset, cols: list[str]) -> ray.data.Dataset:
    """High-cardinality SELECT DISTINCT as a first-class operator.

    Ray's hash ``groupby().aggregate()`` is the wrong tool once the
    key cardinality approaches the row count (measured 638 s for a
    30M-row two-key dedup vs ~10 s for the sort — see BASELINE.md):
    this is the engine's sort-based path — one global sort on
    ``cols``, vectorized adjacent-row dedup per block, stitched across
    block boundaries by block position (``dedup_sorted_blocks``).
    Returns a Dataset of the distinct rows."""
    srt = ds.select_columns(cols).sort(cols).materialize()
    return dedup_sorted_blocks(srt, cols)
