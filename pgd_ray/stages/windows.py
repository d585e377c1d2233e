"""Event-stream windowing over the ``events`` table.

The reference is pure batch (SURVEY.md §2.8 — no streaming/windows),
but a transcript pipeline at scale needs event-time sessionization and
tumbling windows; both are expressed Ray-Data-first as vectorized
per-block transforms over the globally time-sorted stream:

* ``tumbling_counts`` — fixed windows = pure hash aggregation
  (``floor(ts/size)`` key), SQL-mirrorable.
* ``sessionize`` — per-user sessions split at inactivity gaps.  Uses
  the same sorted-block + boundary-fragment pattern as the transcript
  rank derivation: one global sort, per-block vectorized session
  assignment, driver-side stitching of users that straddle blocks
  (O(#blocks) work).  SQL-mirrorable with window functions.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Sum


def tumbling_counts(sf_dir: str, window_us: int = 3_600_000_000) -> ray.data.Dataset:
    """Events per (event_type, hour window): columns
    (event_type, window_start, n_events, sum_value)."""
    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def keyed(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        win = ts // window_us * window_us
        return pa.table(
            {
                "event_type": t["event_type"],
                "window_start": win,
                "value": t["value"],
            }
        )

    return (
        ev.map_batches(keyed, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )


def hopping_counts(
    sf_dir: str,
    window_us: int = 3_600_000_000,
    hop_us: int = 900_000_000,
) -> ray.data.Dataset:
    """Overlapping (hopping/sliding) windows: size ``window_us``
    advancing by ``hop_us`` (must divide the size).  Each event lands
    in ``window_us // hop_us`` windows; the expansion is a vectorized
    per-batch repeat (no shuffle grows beyond the tumbling case by more
    than that constant factor), then one hash aggregation — the same
    scale shape as ``tumbling_counts``.  Columns
    (event_type, window_start, n_events, sum_value)."""
    from pgd_ray.util import read_parquet_clean

    if window_us % hop_us:
        raise ValueError("hop_us must divide window_us")
    k = window_us // hop_us

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def keyed(t: pa.Table) -> pa.Table:
        n = t.num_rows
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        base = ts // hop_us
        win = (np.repeat(base, k) - np.tile(np.arange(k, dtype=np.int64), n)) * hop_us
        row_idx = pa.array(np.repeat(np.arange(n, dtype=np.int64), k))
        return pa.table(
            {
                "event_type": t["event_type"].take(row_idx),
                "window_start": win,
                "value": t["value"].take(row_idx),
            }
        )

    return (
        ev.map_batches(keyed, batch_format="pyarrow")
        .groupby(["event_type", "window_start"])
        .aggregate(Count(alias_name="n_events"), Sum("value", alias_name="sum_value"))
    )


def cooccurrence_pairs(
    sf_dir: str, window_us: int = 300_000_000
) -> ray.data.Dataset:
    """Windowed self-join: unordered pairs of events of the SAME user
    within ``window_us`` of each other, counted by the (lexically
    sorted) event-type pair.  Columns (type_a, type_b, n_pairs).

    Distributed with the sessionize block pattern: one global sort by
    (user_id, ts, event_id); every block expands its interior users'
    pairs vectorized (per-row window ends via searchsorted, capped at
    the user segment end); the ≤ 2 users touching each block edge are
    paired on the driver from their raw rows (O(#blocks · user_rows)).
    Pair expansion is Σ window occupancy — bounded by window density,
    never all-pairs."""
    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id",
                                             "event_type"]
    )
    srt = ev.sort(["user_id", "ts", "event_id"]).materialize()

    def _pairs_arrays(uid, ts, et):
        """Vectorized pair expansion over (user, ts)-sorted arrays:
        partial-count DataFrame (type_a, type_b, n)."""
        n = len(uid)
        if n == 0:
            return None
        new_u = np.empty(n, dtype=bool)
        new_u[0] = True
        new_u[1:] = uid[1:] != uid[:-1]
        bounds = np.flatnonzero(new_u)
        ends = np.append(bounds[1:], n)
        runs = ends - bounds
        # ts is sorted only WITHIN user segments; build a per-segment
        # composite key (segment stride > max in-segment offset + W)
        # so one global searchsorted answers every row's window end
        # without ever crossing into the next user
        seg_id = np.cumsum(new_u) - 1
        rel = ts - np.repeat(ts[bounds], runs)
        stride = int(rel.max()) + window_us + 1
        if len(bounds) * stride < 2**62:
            key = seg_id * stride + rel
            hi = np.searchsorted(key, key + window_us, side="right")
        else:  # pathological span × segment count: per-segment exact
            hi = np.empty(n, dtype=np.int64)
            for s, e in zip(bounds, ends):
                hi[s:e] = s + np.searchsorted(
                    ts[s:e], ts[s:e] + window_us, side="right"
                )
        cnt = hi - np.arange(n) - 1
        total = int(cnt.sum())
        if total == 0:
            return None
        left = np.repeat(np.arange(n), cnt)
        right = (
            np.arange(total)
            - np.repeat(np.concatenate(([0], np.cumsum(cnt[:-1]))), cnt)
            + left + 1
        )
        ta, tb = et[left], et[right]
        swap = ta > tb
        return (
            pd.DataFrame({"type_a": np.where(swap, tb, ta),
                          "type_b": np.where(swap, ta, tb)})
            .groupby(["type_a", "type_b"], sort=False)
            .size()
            .reset_index(name="n")
        )

    def block_pairs(t: pa.Table) -> pa.Table:
        empty = pa.table({"type_a": pa.array([], pa.string()),
                          "type_b": pa.array([], pa.string()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        interior = (uid != uid[0]) & (uid != uid[-1])
        d = _pairs_arrays(uid[interior], ts[interior], et[interior])
        if d is None or d.empty:
            return empty
        return pa.table({"type_a": d["type_a"].to_numpy(dtype=object),
                         "type_b": d["type_b"].to_numpy(dtype=object),
                         "n": d["n"].to_numpy(dtype=np.int64)})

    def boundary_rows(t: pa.Table) -> pa.Table:
        cols = ["event_id", "ts", "user_id", "event_type"]
        if t.num_rows == 0:
            return t.select(cols)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        keep = (uid == uid[0]) | (uid == uid[-1])
        return t.select(cols).filter(pa.array(keep))

    interior_counts = srt.map_batches(
        block_pairs, batch_format="pyarrow", batch_size=None
    )
    bdf = (
        srt.map_batches(boundary_rows, batch_format="pyarrow", batch_size=None)
        .to_pandas()
        .sort_values(["user_id", "ts", "event_id"], kind="stable")
    )
    d = (
        _pairs_arrays(
            bdf["user_id"].to_numpy(),
            bdf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
            bdf["event_type"].to_numpy(),
        )
        if len(bdf)
        else None
    )
    if d is not None and len(d):
        bnd = ray.data.from_arrow(
            pa.table({"type_a": d["type_a"].to_numpy(dtype=object),
                      "type_b": d["type_b"].to_numpy(dtype=object),
                      "n": d["n"].to_numpy(dtype=np.int64)})
        )
        interior_counts = interior_counts.union(bnd)
    return (
        interior_counts.groupby(["type_a", "type_b"])
        .aggregate(Sum("n", alias_name="n_pairs"))
    )


def sessionize(sf_dir: str, gap_us: int = 1_800_000_000) -> pd.DataFrame:
    """Per-user sessions split at gaps > ``gap_us``.  Returns one row
    per session: (user_id, session_idx, n_events, start_ts, end_ts)
    with session_idx 0-based in time order.

    Distributed: sort by (user_id, ts, event_id) → per-block vectorized
    gap detection → sessions fully inside a block are emitted there;
    each block's boundary-user fragments are collapsed to (start, end,
    count, internal session pattern) summaries and stitched on the
    driver (≤ 2 fragments per block)."""
    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    srt = ev.sort(["user_id", "ts", "event_id"]).materialize()

    def block_sessions(t: pa.Table) -> pa.Table:
        cols = {
            "user_id": pa.array([], pa.int64()),
            "start_ts": pa.array([], pa.int64()),
            "end_ts": pa.array([], pa.int64()),
            "n_events": pa.array([], pa.int64()),
            "boundary": pa.array([], pa.bool_()),
        }
        if t.num_rows == 0:
            return pa.table(cols)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        n = len(uid)
        new_sess = np.empty(n, dtype=bool)
        new_sess[0] = True
        new_sess[1:] = (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] > gap_us)
        sess_id = np.cumsum(new_sess) - 1
        starts = np.flatnonzero(new_sess)
        ends = np.append(starts[1:], n) - 1
        boundary = (uid[starts] == uid[0]) | (uid[starts] == uid[-1])
        return pa.table(
            {
                "user_id": uid[starts].astype(np.int64),
                "start_ts": ts[starts],
                "end_ts": ts[ends],
                "n_events": (ends - starts + 1).astype(np.int64),
                "boundary": boundary,
            }
        )

    raw = srt.map_batches(block_sessions, batch_format="pyarrow", batch_size=None).to_pandas()
    interior = raw[~raw["boundary"]]
    # stitch boundary-user session fragments on the driver: fragments
    # are themselves gap-consistent runs, so merging = re-running the
    # gap rule over the fragment list per user (tiny)
    b = raw[raw["boundary"]].sort_values(["user_id", "start_ts"], kind="stable")
    merged = []
    for uid, g in b.groupby("user_id", sort=False):
        cur = None
        for r in g.itertuples(index=False):
            if cur is not None and r.start_ts - cur["end_ts"] <= gap_us:
                cur["end_ts"] = max(cur["end_ts"], r.end_ts)
                cur["n_events"] += r.n_events
            else:
                if cur is not None:
                    merged.append(cur)
                cur = {"user_id": uid, "start_ts": r.start_ts,
                       "end_ts": r.end_ts, "n_events": r.n_events}
        if cur is not None:
            merged.append(cur)
    out = pd.concat(
        [interior[["user_id", "start_ts", "end_ts", "n_events"]],
         pd.DataFrame(merged, columns=["user_id", "start_ts", "end_ts", "n_events"])],
        ignore_index=True,
    ).sort_values(["user_id", "start_ts"], ignore_index=True)
    out["session_idx"] = out.groupby("user_id").cumcount()
    return out[["user_id", "session_idx", "start_ts", "end_ts", "n_events"]]
