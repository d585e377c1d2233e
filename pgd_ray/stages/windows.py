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


def _cents_to_sum_value(t: pa.Table) -> pa.Table:
    """Replace an exact int64 ``sum_cents`` column with the float
    ``sum_value`` the public schema promises (one division; SQL
    half-away rounding at 6)."""
    from pgd_ray.util import round_half_away

    cols = {c: t[c] for c in t.column_names if c != "sum_cents"}
    cols["sum_value"] = pa.array(
        round_half_away(t["sum_cents"].to_numpy(zero_copy_only=False)
                        .astype(np.float64) / 100.0, 6), pa.float64())
    return pa.table(cols)


def tumbling_counts(sf_dir: str, window_us: int = 3_600_000_000,
                    exact_cents: bool = False) -> ray.data.Dataset:
    """Events per (event_type, hour window): columns
    (event_type, window_start, n_events, sum_value).

    ``exact_cents=True`` declares the value column an exact 2-decimal
    (money) column: sums run over int64 cents, making the result
    independent of float combine order (the q7/q9 boundary class).
    Off by default — generic value columns must not be quantized."""
    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type", "value"]
    )

    def keyed(t: pa.Table) -> pa.Table:
        ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        win = ts // window_us * window_us
        if exact_cents:
            v = np.rint(t["value"].to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64)
            vcol = pa.array(v, pa.int64())
        else:
            vcol = t["value"]
        return pa.table(
            {
                "event_type": t["event_type"],
                "window_start": win,
                ("cents" if exact_cents else "value"): vcol,
            }
        )

    agg = ev.map_batches(keyed, batch_format="pyarrow").groupby(
        ["event_type", "window_start"])
    if exact_cents:
        return agg.aggregate(
            Count(alias_name="n_events"),
            Sum("cents", alias_name="sum_cents"),
        ).map_batches(_cents_to_sum_value, batch_format="pyarrow")
    return agg.aggregate(Count(alias_name="n_events"),
                         Sum("value", alias_name="sum_value"))


def hopping_counts(
    sf_dir: str,
    window_us: int = 3_600_000_000,
    hop_us: int = 900_000_000,
    exact_cents: bool = False,
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
        if exact_cents:
            v = np.rint(t["value"].to_numpy(zero_copy_only=False)
                        * 100.0).astype(np.int64)
            vcol = pa.array(np.repeat(v, k), pa.int64())
        else:
            vcol = t["value"].take(row_idx)
        return pa.table(
            {
                "event_type": t["event_type"].take(row_idx),
                "window_start": win,
                ("cents" if exact_cents else "value"): vcol,
            }
        )

    agg = ev.map_batches(keyed, batch_format="pyarrow").groupby(
        ["event_type", "window_start"])
    if exact_cents:
        return agg.aggregate(
            Count(alias_name="n_events"),
            Sum("cents", alias_name="sum_cents"),
        ).map_batches(_cents_to_sum_value, batch_format="pyarrow")
    return agg.aggregate(Count(alias_name="n_events"),
                         Sum("value", alias_name="sum_value"))


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


_SESSION_COLS = ("user_id", "session_idx", "start_ts", "end_ts", "n_events")


def _session_arrays(t: pa.Table, gap_us: int):
    """Vectorized gap rule over one sorted block → per-session
    (user, start_ts, end_ts, n_events) arrays, in (user, start) order."""
    uid = t["user_id"].to_numpy(zero_copy_only=False)
    ts = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
    n = len(uid)
    new_sess = np.empty(n, dtype=bool)
    new_sess[0] = True
    new_sess[1:] = (uid[1:] != uid[:-1]) | (ts[1:] - ts[:-1] > gap_us)
    starts = np.flatnonzero(new_sess)
    ends = np.append(starts[1:], n) - 1
    return (uid[starts].astype(np.int64), ts[starts], ts[ends],
            (ends - starts + 1).astype(np.int64), uid, ts)


def _empty_sessions() -> pa.Table:
    return pa.table({c: pa.array([], pa.int64()) for c in _SESSION_COLS})


def sessionize(sf_dir: str, gap_us: int = 1_800_000_000) -> ray.data.Dataset:
    """Per-user sessions split at gaps > ``gap_us``: one row per
    session, (user_id, session_idx, start_ts, end_ts, n_events) with
    session_idx 0-based in time order — returned as a DATASET.

    Scale shape (the packing-style sorted-block prefix pattern): one
    global sort, then two passes over the same materialized blocks.
    Pass 1 collapses each block to ONE summary row (its first/last
    session + per-boundary-user counts); the driver walks the
    O(#blocks) summaries to decide, per block, whether its first/last
    session is continued across the boundary and what session_idx its
    first user starts at.  Pass 2 re-derives sessions per block fully
    vectorized, drops the ≤ 2 boundary sessions the driver stitched,
    and assigns indices locally.  Driver state and data: O(#blocks)
    rows — never the session table (session count ∝ events)."""
    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"]
    )
    srt = ev.sort(["user_id", "ts", "event_id"]).materialize()

    def summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in (
                "key_u", "key_ts", "key_eid", "fu", "first_start", "first_end",
                "first_n", "fu_nsess", "lu", "last_start", "last_end", "last_n",
                "lu_nsess", "k")})
        su, ss, se, sn, uid, ts = _session_arrays(t, gap_us)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        return pa.table({
            "key_u": [int(uid[0])], "key_ts": [int(ts[0])], "key_eid": [int(eid[0])],
            "fu": [int(su[0])], "first_start": [int(ss[0])],
            "first_end": [int(se[0])], "first_n": [int(sn[0])],
            "fu_nsess": [int((su == su[0]).sum())],
            "lu": [int(su[-1])], "last_start": [int(ss[-1])],
            "last_end": [int(se[-1])], "last_n": [int(sn[-1])],
            "lu_nsess": [int((su == su[-1]).sum())], "k": [len(su)],
        })

    sm = srt.map_batches(summary, batch_format="pyarrow", batch_size=None).to_pandas()
    if sm.empty:
        return ray.data.from_arrow(_empty_sessions())
    sm = sm.sort_values(["key_u", "key_ts", "key_eid"], ignore_index=True)

    # driver walk: O(#blocks).  ``cur`` is the one open cross-block
    # chain (sessions are contiguous per user under the sort, so at
    # most one session can be straddling at any time).
    params: dict = {}
    merged: list[dict] = []
    cur: dict | None = None
    next_idx: dict = {}
    rows = list(sm.itertuples(index=False))
    for i, b in enumerate(rows):
        key = (b.key_u, b.key_ts, b.key_eid)
        merge_first = (
            cur is not None and cur["user_id"] == b.fu
            and b.first_start - cur["end_ts"] <= gap_us
        )
        if merge_first:
            cur["end_ts"] = int(b.first_end)
            cur["n_events"] += int(b.first_n)
        nxt = rows[i + 1] if i + 1 < len(rows) else None
        chain_last = (
            nxt is not None and nxt.fu == b.lu
            and nxt.first_start - b.last_end <= gap_us
        )
        if merge_first and b.k == 1:
            params[key] = (True, True, 0)
            if not chain_last:  # chain ends inside this block
                merged.append(cur)
                next_idx = {cur["user_id"]: cur["session_idx"] + 1}
                cur = None
            continue
        if cur is not None:  # chain closed (it absorbed S_0 if merging)
            merged.append(cur)
            next_idx = {cur["user_id"]: cur["session_idx"] + 1}
            cur = None
        base = next_idx.get(b.fu, 0)
        emitted_fu = (
            b.fu_nsess - (1 if merge_first else 0)
            - (1 if (b.lu == b.fu and chain_last) else 0)
        )
        params[key] = (merge_first, chain_last, base)
        after = (
            base + emitted_fu if b.lu == b.fu
            else b.lu_nsess - (1 if chain_last else 0)
        )
        if chain_last:
            cur = {"user_id": int(b.lu), "session_idx": int(after),
                   "start_ts": int(b.last_start), "end_ts": int(b.last_end),
                   "n_events": int(b.last_n)}
        next_idx = {int(b.lu): int(after)}
    if cur is not None:
        merged.append(cur)

    def emit(t: pa.Table, params=params) -> pa.Table:
        if t.num_rows == 0:
            return _empty_sessions()
        su, ss, se, sn, uid, ts = _session_arrays(t, gap_us)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        drop_first, drop_last, base = params[(int(uid[0]), int(ts[0]), int(eid[0]))]
        keep = np.ones(len(su), dtype=bool)
        if drop_first:
            keep[0] = False
        if drop_last:
            keep[-1] = False
        u, s0, s1, ne = su[keep], ss[keep], se[keep], sn[keep]
        if not len(u):
            return _empty_sessions()
        gs = np.flatnonzero(np.concatenate(([True], u[1:] != u[:-1])))
        rank = np.arange(len(u)) - np.repeat(gs, np.diff(np.append(gs, len(u))))
        idx = rank + np.where(u == su[0], base, 0)
        return pa.table({
            "user_id": u, "session_idx": idx.astype(np.int64),
            "start_ts": s0, "end_ts": s1, "n_events": ne,
        })

    out = srt.map_batches(emit, batch_format="pyarrow", batch_size=None)
    if merged:
        chain_tbl = pa.table({
            c: pa.array([m[c] for m in merged], pa.int64()) for c in _SESSION_COLS
        })
        out = out.union(ray.data.from_arrow(chain_tbl))
    return out


def window_functions(
    ds: ray.data.Dataset,
    key: str,
    order: str,
    value: str,
) -> ray.data.Dataset:
    """Per-key SQL window functions over ``order``:  ``row_number``
    (1-based), ``cum_sum`` (running sum of ``value`` including the
    current row) and ``lag_value`` (previous ``value`` in the key, 0.0
    for each key's first row) — the `PARTITION BY key ORDER BY order`
    trio Ray Data has no native operator for.

    Scale shape (the packing-style sorted-block prefix pattern,
    text/packing.py): ONE global sort on (key, order), then a
    summary pass that collapses each block to one row — (block
    identity, head-key prefix count/sum, tail-key suffix count/sum,
    last value).  The driver walks the O(#blocks) summaries carrying
    the one key that can straddle a boundary (keys are contiguous
    under the sort) and hands each block its carry-in (row offset, sum
    offset, previous value).  A second pass over the SAME materialized
    blocks assigns all three columns fully vectorized.  Driver state:
    O(#blocks) — never the event table.

    Contract: (key, order) pairs are globally unique (the sort is then
    total, so cum_sum order matches the SQL mirror bit-for-bit);
    violations that straddle a block boundary raise."""
    srt = ds.select_columns([key, order, value]).sort([key, order]).materialize()
    cols = (key, order, value, "row_number", "cum_sum", "lag_value")

    def _arrays(t: pa.Table):
        k = t[key].to_numpy(zero_copy_only=False)
        o = t[order].to_numpy(zero_copy_only=False)
        v = t[value].to_numpy(zero_copy_only=False).astype(np.float64)
        return k, o, v

    def summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in (
                "bk", "bo", "hk", "hcnt", "tk", "tcnt")} |
                {c: pa.array([], pa.float64()) for c in ("hsum", "tsum", "tval")})
        k, o, v = _arrays(t)
        hn = int((k == k[0]).sum()) if k[0] == k[-1] else int(
            np.argmax(k != k[0]))
        tn = int((k == k[-1]).sum()) if k[0] == k[-1] else int(
            np.argmax(k[::-1] != k[-1]))
        return pa.table({
            "bk": [int(k[0])], "bo": [int(o[0])],
            "hk": [int(k[0])], "hcnt": [hn], "hsum": [float(v[:hn].sum())],
            "tk": [int(k[-1])], "tcnt": [tn], "tsum": [float(v[-tn:].sum())],
            "tval": [float(v[-1])],
        })

    sm = srt.map_batches(summary, batch_format="pyarrow", batch_size=None
                         ).to_pandas()
    if sm.empty:
        return ray.data.from_arrow(pa.table(
            {c: pa.array([], pa.float64() if c in ("cum_sum", "lag_value")
                         else pa.int64()) for c in cols}))
    sm = sm.sort_values(["bk", "bo"], ignore_index=True)
    if sm.duplicated(["bk", "bo"]).any():
        raise ValueError(
            "window_functions requires globally unique (key, order) pairs "
            "(duplicates straddle a sorted-block boundary)")
    offsets: dict = {}
    carry = None  # (key, cnt, sum, last_val) of the open boundary key
    for b in sm.itertuples(index=False):
        if carry is not None and carry[0] == b.hk:
            offsets[(b.bk, b.bo)] = (carry[1], carry[2], carry[3])
            if b.hk == b.tk:  # single-key block: extend the chain
                carry = (b.tk, carry[1] + b.tcnt, carry[2] + b.tsum, b.tval)
                continue
        else:
            offsets[(b.bk, b.bo)] = (0, 0.0, None)
            if b.hk == b.tk:
                carry = (b.tk, b.tcnt, b.tsum, b.tval)
                continue
        carry = (b.tk, b.tcnt, b.tsum, b.tval)

    def assign(t: pa.Table, offsets=offsets) -> pa.Table:
        if t.num_rows == 0:
            return pa.table(
                {c: pa.array([], pa.float64() if c in ("cum_sum", "lag_value")
                             else pa.int64()) for c in cols})
        k, o, v = _arrays(t)
        cnt_off, sum_off, prev_val = offsets[(int(k[0]), int(o[0]))]
        seg = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        seg_of = np.repeat(np.arange(len(seg)), np.diff(np.append(seg, len(k))))
        pos = np.arange(len(k), dtype=np.int64)
        rn = pos - seg[seg_of] + 1
        cs = np.cumsum(v)
        cs = cs - np.where(seg[seg_of] > 0, cs[seg[seg_of] - 1], 0.0)
        lag = np.concatenate(([0.0], v[:-1]))
        lag[seg] = 0.0
        first = seg_of == 0
        rn = rn + np.where(first, cnt_off, 0)
        cs = cs + np.where(first, sum_off, 0.0)
        if prev_val is not None:
            lag[0] = prev_val
        return pa.table({
            key: k, order: o, value: v,
            "row_number": rn.astype(np.int64),
            "cum_sum": np.round(cs, 6),
            "lag_value": lag,
        })

    return srt.map_batches(assign, batch_format="pyarrow", batch_size=None)


def rolling_aggregate(
    ds: ray.data.Dataset,
    key: str,
    order: str,
    value: str,
    window: int = 5,
) -> ray.data.Dataset:
    """Per-key ROWS-window aggregates over ``order``: ``roll_sum`` /
    ``roll_cnt`` / ``roll_mean`` of the last ``window`` rows (current
    row included) — SQL's ``ROWS BETWEEN window-1 PRECEDING AND
    CURRENT ROW``.

    Same sorted-block shape as ``window_functions``, with a richer
    carry: a block whose head key continues from the previous block
    needs that key's last ``window-1`` VALUES as prefix context (plus
    the running row count for short-window sizing), so each block
    summary carries its tail key's trailing values (≤ window-1
    floats) and the driver walk threads them — O(#blocks · window)
    driver state.  Same unique-(key, order) contract."""
    if window <= 0:
        raise ValueError("window must be positive")
    w1 = window - 1
    srt = ds.select_columns([key, order, value]).sort([key, order]).materialize()
    cols = (key, order, value, "roll_sum", "roll_cnt", "roll_mean")

    def _empty() -> pa.Table:
        return pa.table({c: pa.array(
            [], pa.float64() if c in (value, "roll_sum", "roll_mean")
            else pa.int64()) for c in cols})

    def summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "bk": pa.array([], pa.int64()), "bo": pa.array([], pa.int64()),
                "hk": pa.array([], pa.int64()), "hcnt": pa.array([], pa.int64()),
                "tk": pa.array([], pa.int64()), "tcnt": pa.array([], pa.int64()),
                "tvals": pa.array([], pa.list_(pa.float64()))})
        k = t[key].to_numpy(zero_copy_only=False)
        o = t[order].to_numpy(zero_copy_only=False)
        v = t[value].to_numpy(zero_copy_only=False).astype(np.float64)
        hn = int((k == k[0]).sum()) if k[0] == k[-1] else int(np.argmax(k != k[0]))
        tn = int((k == k[-1]).sum()) if k[0] == k[-1] else int(
            np.argmax(k[::-1] != k[-1]))
        tv = v[-min(tn, w1):].tolist() if w1 else []
        return pa.table({
            "bk": [int(k[0])], "bo": [int(o[0])],
            "hk": [int(k[0])], "hcnt": [hn],
            "tk": [int(k[-1])], "tcnt": [tn],
            "tvals": pa.array([tv], pa.list_(pa.float64())),
        })

    sm = srt.map_batches(summary, batch_format="pyarrow", batch_size=None
                         ).to_pandas()
    if sm.empty:
        return ray.data.from_arrow(_empty())
    sm = sm.sort_values(["bk", "bo"], ignore_index=True)
    if sm.duplicated(["bk", "bo"]).any():
        raise ValueError(
            "rolling_aggregate requires globally unique (key, order) pairs")
    ctx: dict = {}
    carry = None  # (key, running_cnt, trailing values list)
    for b in sm.itertuples(index=False):
        tvals = list(b.tvals)
        if carry is not None and carry[0] == b.hk:
            ctx[(b.bk, b.bo)] = (carry[1], list(carry[2]))
            if b.hk == b.tk:
                vals = (list(carry[2]) + tvals)[-w1:] if w1 else []
                carry = (b.tk, carry[1] + b.tcnt, vals)
                continue
        else:
            ctx[(b.bk, b.bo)] = (0, [])
            if b.hk == b.tk:
                carry = (b.tk, b.tcnt, tvals)
                continue
        carry = (b.tk, b.tcnt, tvals)

    def assign(t: pa.Table, ctx=ctx) -> pa.Table:
        if t.num_rows == 0:
            return _empty()
        k = t[key].to_numpy(zero_copy_only=False)
        o = t[order].to_numpy(zero_copy_only=False)
        v = t[value].to_numpy(zero_copy_only=False).astype(np.float64)
        cnt_off, pre = ctx[(int(k[0]), int(o[0]))]
        pre = np.asarray(pre, dtype=np.float64)
        seg = np.flatnonzero(np.concatenate(([True], k[1:] != k[:-1])))
        seg_of = np.repeat(np.arange(len(seg)), np.diff(np.append(seg, len(k))))
        pos = np.arange(len(k), dtype=np.int64)
        rn = pos - seg[seg_of] + 1 + np.where(seg_of == 0, cnt_off, 0)
        # rolling sum via cumsum over [prefix-context | values], reset
        # at key changes: zero the context for non-head segments by
        # masking window starts to the segment start
        ext = np.concatenate((pre, v))
        cs = np.concatenate(([0.0], np.cumsum(ext)))
        ipos = pos + len(pre)  # row i sits at ext[ipos]
        # window start in ext coords: max(segment start (head segment
        # may dip into the context), ipos - window + 1)
        seg_start_ext = np.where(seg_of == 0,
                                 len(pre) - np.minimum(len(pre), np.int64(w1)),
                                 seg[seg_of] + len(pre))
        lo = np.maximum(ipos - np.int64(w1), seg_start_ext)
        roll = cs[ipos + 1] - cs[lo]
        cnt = np.minimum(rn, np.int64(window))
        return pa.table({
            key: k, order: o, value: v,
            "roll_sum": np.round(roll, 6),
            "roll_cnt": cnt.astype(np.int64),
            "roll_mean": np.round(roll / cnt, 6),
        })

    return srt.map_batches(assign, batch_format="pyarrow", batch_size=None)


def transition_counts(sf_dir: str) -> ray.data.Dataset:
    """Markov transition bigrams: per user, event types of consecutive
    events in (ts, event_id) order, counted corpus-wide — columns
    (type_from, type_to, n_trans).

    Same sorted-block shape as ``cooccurrence_pairs`` but with only
    the ADJACENT pair per row: interior users pair fully inside their
    block (one vectorized shift-compare); the ≤ 2 users touching each
    block edge ship their raw rows to the driver (O(#blocks ·
    user_rows)), so no transition is ever double-counted or lost at a
    boundary."""
    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    srt = ev.sort(["user_id", "ts", "event_id"]).materialize()

    def _trans(uid: np.ndarray, et: np.ndarray) -> pd.DataFrame | None:
        if len(uid) < 2:
            return None
        m = uid[1:] == uid[:-1]
        if not m.any():
            return None
        return (
            pd.DataFrame({"type_from": et[:-1][m], "type_to": et[1:][m]})
            .groupby(["type_from", "type_to"], sort=False)
            .size()
            .reset_index(name="n")
        )

    def _table(d: pd.DataFrame | None) -> pa.Table:
        if d is None or d.empty:
            return pa.table({"type_from": pa.array([], pa.string()),
                             "type_to": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.table({"type_from": d["type_from"].to_numpy(dtype=object),
                         "type_to": d["type_to"].to_numpy(dtype=object),
                         "n": d["n"].to_numpy(dtype=np.int64)})

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _table(None)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        interior = (uid != uid[0]) & (uid != uid[-1])
        return _table(_trans(uid[interior], et[interior]))

    def boundary(t: pa.Table) -> pa.Table:
        cols = ["event_id", "ts", "user_id", "event_type"]
        if t.num_rows == 0:
            return t.select(cols)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.select(cols).filter(
            pa.array((uid == uid[0]) | (uid == uid[-1])))

    interior_counts = srt.map_batches(
        block, batch_format="pyarrow", batch_size=None)
    bdf = srt.map_batches(
        boundary, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if len(bdf):
        bdf = bdf.sort_values(["user_id", "ts", "event_id"], kind="stable")
        d = _trans(bdf["user_id"].to_numpy(), bdf["event_type"].to_numpy())
        if d is not None and len(d):
            interior_counts = interior_counts.union(
                ray.data.from_arrow(_table(d)))
    return interior_counts.groupby(["type_from", "type_to"]).aggregate(
        Sum("n", alias_name="n_trans"))


def trigram_counts(sf_dir: str) -> ray.data.Dataset:
    """Ordered event-type trigrams per user ((t0, t1, t2) of three
    consecutive events in (ts, event_id) order), counted corpus-wide —
    columns (type_a, type_b, type_c, n_trigrams).  Same sorted-block +
    boundary-user stitch as ``transition_counts`` with a double
    shift-compare."""
    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    srt = ev.sort(["user_id", "ts", "event_id"]).materialize()

    def _tri(uid: np.ndarray, et: np.ndarray) -> pd.DataFrame | None:
        if len(uid) < 3:
            return None
        m = (uid[2:] == uid[1:-1]) & (uid[1:-1] == uid[:-2])
        if not m.any():
            return None
        return (
            pd.DataFrame({"type_a": et[:-2][m], "type_b": et[1:-1][m],
                          "type_c": et[2:][m]})
            .groupby(["type_a", "type_b", "type_c"], sort=False)
            .size()
            .reset_index(name="n")
        )

    def _table(d: pd.DataFrame | None) -> pa.Table:
        if d is None or d.empty:
            return pa.table({"type_a": pa.array([], pa.string()),
                             "type_b": pa.array([], pa.string()),
                             "type_c": pa.array([], pa.string()),
                             "n": pa.array([], pa.int64())})
        return pa.table({
            "type_a": d["type_a"].to_numpy(dtype=object),
            "type_b": d["type_b"].to_numpy(dtype=object),
            "type_c": d["type_c"].to_numpy(dtype=object),
            "n": d["n"].to_numpy(dtype=np.int64)})

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _table(None)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        interior = (uid != uid[0]) & (uid != uid[-1])
        return _table(_tri(uid[interior], et[interior]))

    def boundary(t: pa.Table) -> pa.Table:
        cols = ["event_id", "ts", "user_id", "event_type"]
        if t.num_rows == 0:
            return t.select(cols)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.select(cols).filter(
            pa.array((uid == uid[0]) | (uid == uid[-1])))

    interior_counts = srt.map_batches(
        block, batch_format="pyarrow", batch_size=None)
    bdf = srt.map_batches(
        boundary, batch_format="pyarrow", batch_size=None
    ).to_pandas()
    if len(bdf):
        bdf = bdf.sort_values(["user_id", "ts", "event_id"], kind="stable")
        d = _tri(bdf["user_id"].to_numpy(), bdf["event_type"].to_numpy())
        if d is not None and len(d):
            interior_counts = interior_counts.union(
                ray.data.from_arrow(_table(d)))
    return interior_counts.groupby(["type_a", "type_b", "type_c"]).aggregate(
        Sum("n", alias_name="n_trigrams"))


def inter_event_gaps(sf_dir: str) -> pd.DataFrame:
    """Per-event-type inter-arrival statistics: for every consecutive
    same-user event pair in (ts, event_id) order, the gap is credited
    to the LATER event's type; output (event_type, n_gaps,
    mean_gap_us, max_gap_us).

    Same sorted-block + boundary-stitch shape as ``transition_counts``:
    interior users reduce to per-type (sum, max, count) partials inside
    their block — integer-exact int64 sums — and only the <= 2 users
    touching each block edge ship raw rows to the driver, so no gap is
    double-counted or lost.  The final exchange is a <= |types|-row
    groupby."""
    from ray.data.aggregate import Max

    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id",
                                             "event_type"],
    )
    srt = ev.sort(["user_id", "ts", "event_id"]).materialize()

    def _gaps(uid, ts_us, et) -> pd.DataFrame | None:
        if len(uid) < 2:
            return None
        m = uid[1:] == uid[:-1]
        if not m.any():
            return None
        g = (ts_us[1:] - ts_us[:-1])[m]
        return (
            pd.DataFrame({"event_type": et[1:][m], "g": g})
            .groupby("event_type", sort=False)["g"]
            .agg(gsum="sum", gmax="max", n="size")
            .reset_index()
        )

    def _table(d: pd.DataFrame | None) -> pa.Table:
        if d is None or d.empty:
            return pa.table({"event_type": pa.array([], pa.string()),
                             "gsum": pa.array([], pa.int64()),
                             "gmax": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        return pa.table({
            "event_type": d["event_type"].to_numpy(dtype=object),
            "gsum": d["gsum"].to_numpy(np.int64),
            "gmax": d["gmax"].to_numpy(np.int64),
            "n": d["n"].to_numpy(np.int64)})

    def _ts_us(t: pa.Table) -> np.ndarray:
        return (t["ts"].to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").astype(np.int64))

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _table(None)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        interior = (uid != uid[0]) & (uid != uid[-1])
        return _table(_gaps(
            uid[interior], _ts_us(t)[interior],
            t["event_type"].to_numpy(zero_copy_only=False)[interior]))

    def boundary(t: pa.Table) -> pa.Table:
        cols = ["event_id", "ts", "user_id", "event_type"]
        if t.num_rows == 0:
            return t.select(cols)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.select(cols).filter(
            pa.array((uid == uid[0]) | (uid == uid[-1])))

    parts = srt.map_batches(block, batch_format="pyarrow", batch_size=None)
    bdf = srt.map_batches(
        boundary, batch_format="pyarrow", batch_size=None).to_pandas()
    if len(bdf):
        bdf = bdf.sort_values(["user_id", "ts", "event_id"], kind="stable")
        d = _gaps(bdf["user_id"].to_numpy(),
                  bdf["ts"].to_numpy().astype("datetime64[us]").astype(np.int64),
                  bdf["event_type"].to_numpy())
        if d is not None and len(d):
            parts = parts.union(ray.data.from_arrow(_table(d)))
    agg = parts.groupby("event_type").aggregate(
        Sum("gsum", alias_name="gsum"),
        Max("gmax", alias_name="max_gap_us"),
        Sum("n", alias_name="n_gaps"),
    ).to_pandas()
    if agg.empty:
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "n_gaps": pd.Series([], dtype=np.int64),
                             "mean_gap_us": pd.Series([], dtype=np.float64),
                             "max_gap_us": pd.Series([], dtype=np.int64)})
    return pd.DataFrame({
        "event_type": agg["event_type"],
        "n_gaps": agg["n_gaps"].astype(np.int64),
        "mean_gap_us": np.round(
            agg["gsum"].to_numpy(np.float64) / agg["n_gaps"].to_numpy(np.float64), 6),
        "max_gap_us": agg["max_gap_us"].astype(np.int64),
    }).sort_values("event_type", ignore_index=True)


def decayed_counts(
    sf_dir: str, tau_us: float = 604_800_000_000.0
) -> pd.DataFrame:
    """Exponentially-decayed event counts per type, evaluated at the
    corpus horizon T = max(ts): Σ exp(-(T - ts)/τ) — the streaming
    half-life counter every freshness-weighted dashboard runs, here as
    two streaming passes (max, then per-batch partial decayed sums;
    the second exchange is <= |types| rows).  Columns (event_type,
    decayed_n)."""
    from ray.data.aggregate import Max

    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    ).materialize()

    def to_us(t: pa.Table) -> pa.Table:
        return pa.table({"us": (t["ts"].to_numpy(zero_copy_only=False)
                                .astype("datetime64[us]").astype(np.int64))})

    mx = ev.map_batches(to_us, batch_format="pyarrow").aggregate(Max("us"))
    t_max = mx["max(us)"]
    if t_max is None:
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "decayed_n": pd.Series([], dtype=np.float64)})

    def partial(t: pa.Table) -> pa.Table:
        us = (t["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        w = np.exp(-((t_max - us).astype(np.float64)) / tau_us)
        df = pd.DataFrame({"event_type": t["event_type"].to_pandas(),
                           "w": w})
        g = df.groupby("event_type", sort=False)["w"].sum().reset_index()
        return pa.table({"event_type": g["event_type"].to_numpy(object),
                         "w": g["w"].to_numpy(np.float64)})

    agg = (
        ev.map_batches(partial, batch_format="pyarrow")
        .groupby("event_type")
        .aggregate(Sum("w", alias_name="decayed_n"))
        .to_pandas()
    )
    agg["decayed_n"] = agg["decayed_n"].round(6)
    return agg.sort_values("event_type", ignore_index=True)


def window_distinct_users(
    sf_dir: str, window_us: int = 3_600_000_000
) -> pd.DataFrame:
    """Exact distinct users per tumbling window — the two-level hash
    aggregation (dedup (window, user) first, then count rows per
    window); both exchanges are hash aggs, no per-group Python.
    Columns (window_start_us, n_users)."""
    from ray.data.aggregate import Count

    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "user_id"]
    )

    def keyed(t: pa.Table) -> pa.Table:
        us = (t["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        return pa.table({"window_start_us": (us // window_us) * window_us,
                         "user_id": t["user_id"]})

    dedup = (
        ev.map_batches(keyed, batch_format="pyarrow")
        .groupby(["window_start_us", "user_id"])
        .aggregate(Count())
        .select_columns(["window_start_us"])
    )
    out = (
        dedup.groupby("window_start_us")
        .aggregate(Count(alias_name="n_users"))
        .to_pandas()
    )
    out["n_users"] = out["n_users"].astype(np.int64)
    return out.sort_values("window_start_us", ignore_index=True)


def event_islands(sf_dir: str) -> pd.DataFrame:
    """Gaps-and-islands per user over event_id: an island is a maximal
    run of consecutive ids — the classic sequence-integrity profile
    (missing-id detection, ingestion-gap audit).  Sorted blocks with
    the transition_counts boundary contract: interior users reduce
    inside their block, the <= 2 edge users per block recompute from
    raw rows on the driver.  Columns (user_id, n_islands,
    max_island)."""
    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "user_id"]
    )
    srt = ev.sort(["user_id", "event_id"]).materialize()

    def _islands(uid: np.ndarray, eid: np.ndarray) -> pd.DataFrame | None:
        if len(uid) == 0:
            return None
        new_run = np.concatenate(([True], (uid[1:] != uid[:-1])
                                  | (eid[1:] != eid[:-1] + 1)))
        run_id = np.cumsum(new_run) - 1
        run_u = uid[new_run]
        run_len = np.bincount(run_id)
        return (
            pd.DataFrame({"user_id": run_u, "len": run_len})
            .groupby("user_id", sort=False)["len"]
            .agg(n_islands="size", max_island="max")
            .reset_index()
        )

    def _table(d: pd.DataFrame | None) -> pa.Table:
        if d is None or d.empty:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n_islands": pa.array([], pa.int64()),
                             "max_island": pa.array([], pa.int64())})
        return pa.table({
            "user_id": d["user_id"].to_numpy(np.int64),
            "n_islands": d["n_islands"].to_numpy(np.int64),
            "max_island": d["max_island"].to_numpy(np.int64)})

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _table(None)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        interior = (uid != uid[0]) & (uid != uid[-1])
        return _table(_islands(
            uid[interior],
            t["event_id"].to_numpy(zero_copy_only=False)[interior]))

    def boundary(t: pa.Table) -> pa.Table:
        cols = ["event_id", "user_id"]
        if t.num_rows == 0:
            return t.select(cols)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.select(cols).filter(
            pa.array((uid == uid[0]) | (uid == uid[-1])))

    parts = srt.map_batches(block, batch_format="pyarrow",
                            batch_size=None).to_pandas()
    bdf = srt.map_batches(
        boundary, batch_format="pyarrow", batch_size=None).to_pandas()
    if len(bdf):
        bdf = bdf.sort_values(["user_id", "event_id"], kind="stable")
        d = _islands(bdf["user_id"].to_numpy(), bdf["event_id"].to_numpy())
        if d is not None and len(d):
            parts = pd.concat([parts, d], ignore_index=True)
    if parts.empty:
        return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                             "n_islands": pd.Series([], dtype=np.int64),
                             "max_island": pd.Series([], dtype=np.int64)})
    out = parts.groupby("user_id", as_index=False).agg(
        n_islands=("n_islands", "sum"), max_island=("max_island", "max"))
    for c in ("user_id", "n_islands", "max_island"):
        out[c] = out[c].astype(np.int64)
    return out.sort_values("user_id", ignore_index=True)


def ewma_daily(sf_dir: str, alpha: float = 0.3) -> pd.DataFrame:
    """EWMA-smoothed daily event counts per type: one distributed
    (type, day) aggregation, then the inherently-sequential smoothing
    recurrence ewma_t = α·x_t + (1-α)·ewma_{t-1} (seed = first day)
    runs per type over the <= #days aggregate rows on the driver —
    the smoothing is O(days), never O(events), and missing days are
    skipped (observed-day recurrence, stated contract).  Columns
    (event_type, day, n, ewma)."""
    from ray.data.aggregate import Count

    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["ts", "event_type"]
    )

    def keyed(t: pa.Table) -> pa.Table:
        day = (t["ts"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").astype(np.int64)) // 86_400_000_000
        return pa.table({"event_type": t["event_type"], "day": day})

    daily = (
        ev.map_batches(keyed, batch_format="pyarrow")
        .groupby(["event_type", "day"])
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    if daily.empty:
        return pd.DataFrame({"event_type": pd.Series([], dtype=object),
                             "day": pd.Series([], dtype=np.int64),
                             "n": pd.Series([], dtype=np.int64),
                             "ewma": pd.Series([], dtype=np.float64)})
    daily = daily.sort_values(["event_type", "day"], ignore_index=True)
    out = []
    for _, g in daily.groupby("event_type", sort=False):
        x = g["n"].to_numpy(np.float64)
        e = np.empty(len(x))
        e[0] = x[0]
        for i in range(1, len(x)):
            e[i] = alpha * x[i] + (1.0 - alpha) * e[i - 1]
        from pgd_ray.util import round_half_away

        out.append(g.assign(ewma=round_half_away(e, 6)))
    res = pd.concat(out, ignore_index=True)
    res["day"] = res["day"].astype(np.int64)
    res["n"] = res["n"].astype(np.int64)
    return res


def holt_daily(sf_dir: str, alpha: float = 0.5,
               beta: float = 0.3) -> pd.DataFrame:
    """Holt linear-trend (double exponential) smoothing of the TOTAL
    daily event count — the level+trend capacity-forecast screen that
    EWMA (level only) cannot express.  Same physical plan as
    ``ewma_daily``: one distributed day aggregation (O(days) rows
    reach the driver), then the inherently-sequential recurrence over
    observed days:

        t=1:  level=x₁, trend=0, fitted=x₁
        t>1:  fitted = l+b (one-step forecast BEFORE seeing x_t)
              l' = α·x_t + (1−α)·(l+b)
              b' = β·(l'−l) + (1−β)·b

    Columns (day, n, level, trend, fitted) rounded to 6 — the float
    op order is pinned so the recursive-CTE mirror is bit-identical."""
    from ray.data.aggregate import Count

    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts"])

    def keyed(t: pa.Table) -> pa.Table:
        day = (t["ts"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").astype(np.int64)) // 86_400_000_000
        return pa.table({"day": day})

    daily = (
        ev.map_batches(keyed, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    if daily.empty:
        return pd.DataFrame({"day": pd.Series([], dtype=np.int64),
                             "n": pd.Series([], dtype=np.int64),
                             "level": pd.Series([], dtype=np.float64),
                             "trend": pd.Series([], dtype=np.float64),
                             "fitted": pd.Series([], dtype=np.float64)})
    daily = daily.sort_values("day", ignore_index=True)
    x = daily["n"].to_numpy(np.float64)
    lv = np.empty(len(x))
    tr = np.empty(len(x))
    ft = np.empty(len(x))
    lv[0], tr[0], ft[0] = x[0], 0.0, x[0]
    for i in range(1, len(x)):
        ft[i] = lv[i - 1] + tr[i - 1]
        lv[i] = alpha * x[i] + (1.0 - alpha) * (lv[i - 1] + tr[i - 1])
        tr[i] = beta * (lv[i] - lv[i - 1]) + (1.0 - beta) * tr[i - 1]
    return pd.DataFrame({"day": daily["day"].astype(np.int64),
                         "n": daily["n"].astype(np.int64),
                         "level": np.round(lv, 6),
                         "trend": np.round(tr, 6),
                         "fitted": np.round(ft, 6)})


def acf_daily(sf_dir: str, max_lag: int = 7) -> pd.DataFrame:
    """Autocorrelation of the daily total event count at lags
    1..max_lag — the burstiness / weekly-seasonality screen.  One
    distributed day aggregation (O(days) rows leave the workers), then
    the textbook estimator r_k = Σ(x_t-x̄)(x_{t+k}-x̄) / Σ(x_t-x̄)²
    over the OBSERVED-day sequence (rows ordered by day; the sequence
    index, not calendar arithmetic, drives the lag — the ewma_daily
    contract).  Columns (lag, acf)."""
    from ray.data.aggregate import Count

    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts"])

    def keyed(t: pa.Table) -> pa.Table:
        day = (t["ts"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").astype(np.int64)) // 86_400_000_000
        return pa.table({"day": day})

    daily = (
        ev.map_batches(keyed, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
    )
    x = daily.sort_values("day")["n"].to_numpy(np.float64)
    lags = np.arange(1, max_lag + 1, dtype=np.int64)
    if len(x) < 2:
        return pd.DataFrame({"lag": lags,
                             "acf": np.full(len(lags), np.nan)})
    c = x - x.mean()
    denom = float((c * c).sum())
    acf = np.array([
        float((c[:-k] * c[k:]).sum()) / denom if k < len(x) else np.nan
        for k in lags])
    return pd.DataFrame({"lag": lags, "acf": np.round(acf, 9)})


def type_runs(sf_dir: str) -> pd.DataFrame:
    """Per-user change tracking (the SCD-2 screen): number of maximal
    runs of consecutive equal event_type in (ts, event_id) order, plus
    n_events and the mean run length.  Same sorted-block + boundary-
    user stitch as ``transition_counts`` — interior change points
    count inside their block, the <= 2 edge users per block resolve on
    the driver — then one per-user sum; the driver holds O(#users)
    aggregate rows.  Columns (user_id, n_events, n_runs, avg_run_len).
    """
    from ray.data.aggregate import Count, Sum

    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type"],
    )
    srt = ev.sort(["user_id", "ts", "event_id"]).materialize()

    def _chg(uid: np.ndarray, et: np.ndarray) -> pd.DataFrame | None:
        if len(uid) < 2:
            return None
        m = uid[1:] == uid[:-1]
        if not m.any():
            return None
        return (
            pd.DataFrame({"user_id": uid[1:][m],
                          "c": (et[1:][m] != et[:-1][m]).astype(np.int64)})
            .groupby("user_id", sort=False)["c"].sum().reset_index()
        )

    def _table(d: pd.DataFrame | None) -> pa.Table:
        if d is None or d.empty:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "c": pa.array([], pa.int64())})
        return pa.table({"user_id": d["user_id"].to_numpy(np.int64),
                         "c": d["c"].to_numpy(np.int64)})

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _table(None)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        et = t["event_type"].to_numpy(zero_copy_only=False)
        interior = (uid != uid[0]) & (uid != uid[-1])
        return _table(_chg(uid[interior], et[interior]))

    def boundary(t: pa.Table) -> pa.Table:
        cols = ["event_id", "ts", "user_id", "event_type"]
        if t.num_rows == 0:
            return t.select(cols)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.select(cols).filter(
            pa.array((uid == uid[0]) | (uid == uid[-1])))

    chg = srt.map_batches(block, batch_format="pyarrow", batch_size=None)
    bdf = srt.map_batches(
        boundary, batch_format="pyarrow", batch_size=None).to_pandas()
    if len(bdf):
        bdf = bdf.sort_values(["user_id", "ts", "event_id"], kind="stable")
        d = _chg(bdf["user_id"].to_numpy(), bdf["event_type"].to_numpy())
        if d is not None and len(d):
            chg = chg.union(ray.data.from_arrow(_table(d)))
    changes = chg.groupby("user_id").aggregate(
        Sum("c", alias_name="n_changes")).to_pandas()
    counts = (
        ev.groupby("user_id").aggregate(Count(alias_name="n_events"))
        .to_pandas()
    )
    out = counts.merge(changes, on="user_id", how="left")
    out["n_changes"] = out["n_changes"].fillna(0).astype(np.int64)
    out["n_runs"] = out["n_changes"] + 1
    out["n_events"] = out["n_events"].astype(np.int64)
    out["avg_run_len"] = np.round(
        out["n_events"].to_numpy(np.float64)
        / out["n_runs"].to_numpy(np.float64), 6)
    return out[["user_id", "n_events", "n_runs", "avg_run_len"]].sort_values(
        "user_id", ignore_index=True)


def _daily_counts(sf_dir: str) -> pd.DataFrame:
    """Distributed day aggregation shared by the daily-series screens:
    O(days) rows leave the workers (the acf_daily contract)."""
    from ray.data.aggregate import Count

    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(f"{sf_dir}/events.parquet", columns=["ts"])

    def keyed(t: pa.Table) -> pa.Table:
        day = (t["ts"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").astype(np.int64)) // 86_400_000_000
        return pa.table({"day": day})

    return (
        ev.map_batches(keyed, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Count(alias_name="n"))
        .to_pandas()
        .sort_values("day", ignore_index=True)
    )


def cusum_daily(sf_dir: str, k: float = 0.5, h: float = 4.0) -> pd.DataFrame:
    """Two-sided CUSUM changepoint screen over the standardized daily
    event count: z_t = (x_t - x̄)/s (population s, ddof 0), then
    s⁺_t = max(0, s⁺_{t-1} + z_t - k) and s⁻_t = max(0, s⁻_{t-1} -
    z_t - k); a day is flagged when either side exceeds ``h``.  One
    distributed day aggregation; the recurrence is the O(days) driver
    tail (days ≪ events by construction — the acf_daily shape).
    Columns (day, n, z, s_pos, s_neg, flagged)."""
    daily = _daily_counts(sf_dir)
    x = daily["n"].to_numpy(np.float64)
    if len(x) == 0:
        return pd.DataFrame({
            "day": pd.Series([], dtype=np.int64),
            "n": pd.Series([], dtype=np.int64),
            "z": pd.Series([], dtype=np.float64),
            "s_pos": pd.Series([], dtype=np.float64),
            "s_neg": pd.Series([], dtype=np.float64),
            "flagged": pd.Series([], dtype=np.int64)})
    sd = float(x.std())  # ddof=0; constant series -> z = 0 everywhere
    z = (x - x.mean()) / sd if sd > 0 else np.zeros(len(x))
    s_pos = np.zeros(len(x))
    s_neg = np.zeros(len(x))
    sp = sn = 0.0
    for i in range(len(x)):
        sp = max(0.0, sp + z[i] - k)
        sn = max(0.0, sn - z[i] - k)
        s_pos[i], s_neg[i] = sp, sn
    return pd.DataFrame({
        "day": daily["day"].to_numpy(np.int64),
        "n": daily["n"].to_numpy(np.int64),
        "z": np.round(z, 9),
        "s_pos": np.round(s_pos, 9),
        "s_neg": np.round(s_neg, 9),
        "flagged": ((s_pos > h) | (s_neg > h)).astype(np.int64)})


def dow_seasonality(sf_dir: str) -> pd.DataFrame:
    """Day-of-week seasonality profile of the daily event count:
    per-dow mean daily count and its ratio to the overall mean daily
    count (the seasonal index; 1.0 = flat).  dow = (epoch_day + 4) %
    7 (0 = Monday — 1970-01-01 was a Thursday).  Same O(days) driver
    tail over the distributed day aggregation.  Columns
    (dow, n_days, mean_count, seasonal_index), ordered by dow."""
    daily = _daily_counts(sf_dir)
    if daily.empty:
        return pd.DataFrame({
            "dow": pd.Series([], dtype=np.int64),
            "n_days": pd.Series([], dtype=np.int64),
            "mean_count": pd.Series([], dtype=np.float64),
            "seasonal_index": pd.Series([], dtype=np.float64)})
    day = daily["day"].to_numpy(np.int64)
    n = daily["n"].to_numpy(np.float64)
    dow = (day + 4) % 7
    overall = float(n.mean())
    rows = []
    for d in np.unique(dow):
        m = dow == d
        mc = float(n[m].mean())
        rows.append((int(d), int(m.sum()), round(mc, 9),
                     round(mc / overall, 9)))
    return pd.DataFrame(rows, columns=["dow", "n_days", "mean_count",
                                       "seasonal_index"])


def global_ntile(
    ds: ray.data.Dataset,
    order_col: str,
    tiebreak: str,
    k: int,
    out_col: str = "ntile",
) -> ray.data.Dataset:
    """SQL ``NTILE(k) OVER (ORDER BY order_col, tiebreak)`` as a
    distributed program: one global sort, per-block (count, first-key)
    summaries, O(#blocks) driver offsets, then a second stateless pass
    assigns rank = block_offset + position and the exact NTILE bucket
    (first n%k buckets take ceil(n/k) rows).  ``tiebreak`` must be
    unique — it identifies each sorted block by its first row.  Adds
    ``out_col`` (1-based bucket)."""
    srt = ds.sort([order_col, tiebreak]).materialize()

    def summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({
                "first_ord": t[order_col].combine_chunks().slice(0, 0),
                "first_tb": pa.array([], pa.int64()),
                "cnt": pa.array([], pa.int64())})
        tb = t[tiebreak].to_numpy(zero_copy_only=False)
        return pa.table({
            # native dtype — a float cast could collapse distinct
            # order values and mis-order the block offsets
            "first_ord": t[order_col].combine_chunks().slice(0, 1),
            "first_tb": pa.array([int(tb[0])], pa.int64()),
            "cnt": pa.array([t.num_rows], pa.int64())})

    sm = (srt.map_batches(summary, batch_format="pyarrow",
                          batch_size=None).to_pandas())
    if sm.empty:
        return srt
    # blocks are re-ordered by their FIRST row's sort key — never by
    # Dataset block arrival order (which is not contractual)
    sm = sm.sort_values(["first_ord", "first_tb"], ignore_index=True)
    n = int(sm["cnt"].sum())
    if len(sm["first_tb"].unique()) != len(sm):
        raise ValueError("global_ntile requires a unique tiebreak column")
    offs = np.concatenate(([0], np.cumsum(sm["cnt"].to_numpy())[:-1]))
    off_by_first = dict(zip(sm["first_tb"].astype(np.int64), offs.astype(int)))
    q, r = divmod(n, k)

    def assign(t: pa.Table, off_by_first=off_by_first, q=q, r=r) -> pa.Table:
        if t.num_rows == 0:
            return t.append_column(out_col, pa.array([], pa.int64()))
        tb = t[tiebreak].to_numpy(zero_copy_only=False)
        rank0 = off_by_first[int(tb[0])] + np.arange(t.num_rows)
        if q == 0:
            bucket = rank0  # n < k: row i lands in bucket i
        else:
            head = r * (q + 1)
            bucket = np.where(
                rank0 < head, rank0 // (q + 1),
                r + (np.maximum(rank0 - head, 0) // q))
        return t.append_column(out_col, pa.array(bucket + 1, pa.int64()))

    return srt.map_batches(assign, batch_format="pyarrow", batch_size=None)


def ccf_daily(sf_dir: str, type_x: str = "view",
              type_y: str = "purchase", max_lag: int = 7) -> pd.DataFrame:
    """Cross-correlation of two event types' daily counts at lags
    -max_lag..max_lag — the lead-lag screen ("do views lead
    purchases?").  r_k = Σ(x_t−x̄)(y_{t+k}−ȳ) / √(Σ(x−x̄)²·Σ(y−ȳ)²)
    over the union of observed days for the two types (a day missing
    one type counts 0 for it), ordered by day; the SEQUENCE index
    drives the lag (the acf_daily contract).  One distributed
    (day, side) aggregation — O(days) rows reach the driver.
    Columns (lag, ccf)."""
    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])

    def keyed(t: pa.Table) -> pa.Table:
        et = t["event_type"].to_numpy(zero_copy_only=False)
        m = (et == type_x) | (et == type_y)
        day = (t["ts"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").astype(np.int64))[m] // 86_400_000_000
        isx = (et[m] == type_x).astype(np.int64)
        return pa.table({"day": day, "x": isx, "y": 1 - isx})

    daily = (
        ev.map_batches(keyed, batch_format="pyarrow")
        .groupby("day")
        .aggregate(Sum("x", alias_name="x"), Sum("y", alias_name="y"))
        .to_pandas()
    )
    lags = np.arange(-max_lag, max_lag + 1, dtype=np.int64)
    if len(daily) < 2:
        return pd.DataFrame({"lag": lags,
                             "ccf": np.full(len(lags), np.nan)})
    daily = daily.sort_values("day", ignore_index=True)
    x = daily["x"].to_numpy(np.float64)
    y = daily["y"].to_numpy(np.float64)
    cx = x - x.mean()
    cy = y - y.mean()
    den = float(np.sqrt((cx * cx).sum() * (cy * cy).sum()))
    out = []
    n = len(x)
    for k in lags:
        if k >= 0:
            num = float((cx[:n - k] * cy[k:]).sum()) if k < n else np.nan
        else:
            num = float((cx[-k:] * cy[:n + k]).sum()) if -k < n else np.nan
        out.append(round(num / den, 9) if den > 0 and not np.isnan(num)
                   else np.nan)
    return pd.DataFrame({"lag": lags, "ccf": np.array(out)})


def window_functions2(
    ds: ray.data.Dataset,
    key: str,
    order: str,
    value: str,
) -> ray.data.Dataset:
    """Second wave of per-key SQL window functions over ``order``:
    ``percent_rank`` ((rn−1)/(cnt−1), 0.0 for single-row keys),
    ``first_value`` and ``last_value`` (full-partition frame — the
    explicit ROWS UNBOUNDED PRECEDING/FOLLOWING frame, NOT SQL's
    default running last_value).  Composes on ``window_functions``
    (which supplies row_number via the sorted-block prefix pattern);
    the per-key count and the boundary values come from ONE hash
    aggregation + one filtered pass, broadcast as O(#keys) lookup
    maps.  Same global-uniqueness contract on (key, order)."""
    from ray.data.aggregate import Count, Max, Min

    base = window_functions(ds, key=key, order=order, value=value)

    stats = (
        ds.select_columns([key, order])
        .groupby(key)
        .aggregate(Count(alias_name="cnt"),
                   Min(order, alias_name="o_min"),
                   Max(order, alias_name="o_max"))
        .to_pandas()
    )
    cnt_map = dict(zip(stats[key], stats["cnt"].astype(int)))
    min_map = dict(zip(stats[key], stats["o_min"]))
    max_map = dict(zip(stats[key], stats["o_max"]))

    def boundary_vals(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False)
        o = t[order].to_numpy(zero_copy_only=False)
        v = t[value].to_numpy(zero_copy_only=False).astype(np.float64)
        mn = np.array([min_map.get(x) for x in k])
        mx = np.array([max_map.get(x) for x in k])
        first = o == mn
        last = o == mx
        m = first | last
        return pa.table({
            "k": k[m], "is_first": first[m], "v": v[m],
        })

    bv = ds.select_columns([key, order, value]).map_batches(
        boundary_vals, batch_format="pyarrow").to_pandas()
    first_map = dict(zip(bv.loc[bv["is_first"], "k"],
                         bv.loc[bv["is_first"], "v"]))
    last_map = dict(zip(bv.loc[~bv["is_first"], "k"],
                        bv.loc[~bv["is_first"], "v"]))
    # a single-row key is both its first and last row (is_first wins
    # the mask) — patch last_map from first_map for those keys
    for kk, cc in cnt_map.items():
        if cc == 1:
            last_map[kk] = first_map[kk]

    def decorate(t: pa.Table) -> pa.Table:
        k = t[key].to_numpy(zero_copy_only=False)
        rn = t["row_number"].to_numpy(zero_copy_only=False)
        cnt = np.array([cnt_map[x] for x in k], dtype=np.int64)
        pr = np.where(cnt > 1, (rn - 1) / np.maximum(cnt - 1, 1), 0.0)
        return pa.table({
            key: k,
            order: t[order],
            value: t[value],
            "row_number": rn,
            "percent_rank": np.round(pr, 9),
            "first_value": np.array([first_map[x] for x in k]),
            "last_value": np.array([last_map[x] for x in k]),
        })

    return base.map_batches(decorate, batch_format="pyarrow")


def user_burstiness(sf_dir: str) -> pd.DataFrame:
    """Per-user burstiness of inter-event gaps (Barabási's
    B = (σ−μ)/(σ+μ), population σ): −1 = perfectly regular, 0 =
    Poisson, →1 = extremely bursty.  Gaps in SECONDS as float64 (µs²
    would overflow int64; second-scale squares stay inside float64's
    exact-integer range for this corpus' spans).

    Same sorted-block + boundary-stitch shape as ``inter_event_gaps``
    but keyed per USER: interior users reduce to (n, Σg, Σg²)
    partials in their block; the ≤ 2 block-edge users ship raw rows.
    Output (user_id, n_gaps, mean_gap_s, burstiness) for users with
    ≥ 2 gaps — O(#users) rows, the query's own output size."""
    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet", columns=["event_id", "ts", "user_id"],
    )
    srt = ev.sort(["user_id", "ts", "event_id"]).materialize()

    def _moments(uid, tu) -> pd.DataFrame | None:
        if len(uid) < 2:
            return None
        m = uid[1:] == uid[:-1]
        if not m.any():
            return None
        # s1 is summed as EXACT integer µs: float partial sums are
        # combine-order-dependent, and at a digit-6 rounding boundary
        # the engine and the SQL oracle landed on opposite sides
        # (mean_gap_s, sf0.01).  s2 (µs² would overflow int64) stays
        # float with the per-element seconds conversion both sides
        # compute identically.
        gus = (tu[1:] - tu[:-1])[m]
        gs = gus.astype(np.float64) / 1e6
        return (pd.DataFrame({"user_id": uid[1:][m], "gus": gus,
                              "g2": gs * gs})
                .groupby("user_id", sort=False)
                .agg(n=("gus", "size"), s1us=("gus", "sum"),
                     s2=("g2", "sum"))
                .reset_index())

    def _tbl(d) -> pa.Table:
        if d is None or d.empty:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64()),
                             "s1us": pa.array([], pa.int64()),
                             "s2": pa.array([], pa.float64())})
        return pa.table({"user_id": d["user_id"].to_numpy(np.int64),
                         "n": d["n"].to_numpy(np.int64),
                         "s1us": d["s1us"].to_numpy(np.int64),
                         "s2": d["s2"].to_numpy(np.float64)})

    def _tu(t: pa.Table) -> np.ndarray:
        return (t["ts"].to_numpy(zero_copy_only=False)
                .astype("datetime64[us]").astype(np.int64))

    def block(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return _tbl(None)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        interior = (uid != uid[0]) & (uid != uid[-1])
        return _tbl(_moments(uid[interior], _tu(t)[interior]))

    def boundary(t: pa.Table) -> pa.Table:
        cols = ["event_id", "ts", "user_id"]
        if t.num_rows == 0:
            return t.select(cols)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        return t.select(cols).filter(
            pa.array((uid == uid[0]) | (uid == uid[-1])))

    parts = srt.map_batches(block, batch_format="pyarrow",
                            batch_size=None).to_pandas()
    bdf = srt.map_batches(boundary, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    if len(bdf):
        bdf = bdf.sort_values(["user_id", "ts", "event_id"], kind="stable")
        uid = bdf["user_id"].to_numpy(np.int64)
        tu = (bdf["ts"].astype("datetime64[us]").astype(np.int64)
              .to_numpy())
        d = _moments(uid, tu)
        if d is not None and len(d):
            parts = pd.concat([parts, d.rename(columns={})], ignore_index=True)
    if parts.empty:
        return pd.DataFrame({"user_id": pd.Series([], dtype=np.int64),
                             "n_gaps": pd.Series([], dtype=np.int64),
                             "mean_gap_s": pd.Series([], dtype=np.float64),
                             "burstiness": pd.Series([], dtype=np.float64)})
    agg = parts.groupby("user_id", as_index=False).agg(
        n=("n", "sum"), s1us=("s1us", "sum"), s2=("s2", "sum"))
    agg = agg[agg["n"] >= 2]
    n = agg["n"].to_numpy(np.float64)
    # exact µs total → one division chain, identical to the SQL mirror
    mu = agg["s1us"].to_numpy(np.float64) / n / 1e6
    var = np.maximum(agg["s2"].to_numpy() / n - mu * mu, 0.0)
    sig = np.sqrt(var)
    b = (sig - mu) / (sig + mu)
    from pgd_ray.util import round_half_away

    # SQL ROUND ties half away from zero (half-even ties mismatch the
    # oracle by exactly 1e-6; observed on mean_gap_s at sf0.01)
    return pd.DataFrame({"user_id": agg["user_id"].to_numpy(np.int64),
                         "n_gaps": agg["n"].to_numpy(np.int64),
                         "mean_gap_s": round_half_away(mu, 6),
                         "burstiness": round_half_away(b, 6)}).sort_values(
        "user_id", ignore_index=True)


def peak_concurrency(sf_dir: str, gap_us: int = 1_800_000_000) -> pd.DataFrame:
    """Peak number of CONCURRENT sessions (closed intervals
    [start_ts, end_ts] from ``sessionize``) and the earliest time the
    peak is reached — the capacity-planning sweep.

    Distributed max-prefix: sessions → (+1 at start, −1 at end+1)
    delta rows → one sort by (t, +1-before-−1) → per-block (sum,
    max-prefix, time of first local max); the driver combines the
    O(#blocks) summaries (global peak = max over blocks of block
    offset + local max-prefix; earliest block achieving it supplies
    the time).  One row (n_sessions, peak, peak_at_us)."""
    sess = sessionize(sf_dir, gap_us=gap_us).materialize()
    n_sessions = int(sess.count())
    if n_sessions == 0:
        return pd.DataFrame({"n_sessions": [np.int64(0)],
                             "peak": [np.int64(0)],
                             "peak_at_us": [np.int64(-1)]})

    def deltas(t: pa.Table) -> pa.Table:
        s = t["start_ts"].to_numpy(zero_copy_only=False)
        e = t["end_ts"].to_numpy(zero_copy_only=False)
        u = t["user_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        ix = t["session_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        sid = u * (np.int64(1) << np.int64(22)) + ix  # unique tiebreak
        return pa.table({
            "t": np.concatenate([s, e + 1]).astype(np.int64),
            "dl": np.concatenate([np.ones(len(s), np.int64),
                                  -np.ones(len(e), np.int64)]),
            # sort helpers: −1 (exclusive end) rows BEFORE +1 rows at
            # equal t — the standard convention for end events at
            # end+1, else a session starting exactly at a prior
            # session's end+1 is transiently double-counted and the
            # peak overstated (ADVICE r3); sid makes the total order
            # unique so block summaries re-sort deterministically
            "o": np.concatenate([np.ones(len(s), np.int64),
                                 np.zeros(len(e), np.int64)]),
            "sid": np.concatenate([sid, sid]),
        })

    srt = (sess.map_batches(deltas, batch_format="pyarrow")
           .sort(["t", "o", "sid"]).materialize())

    def block_prefix(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"t0": pa.array([], pa.int64()),
                             "o0": pa.array([], pa.int64()),
                             "sid0": pa.array([], pa.int64()),
                             "s": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64()),
                             "mx_at": pa.array([], pa.int64())})
        tt = t["t"].to_numpy(zero_copy_only=False)
        dl = t["dl"].to_numpy(zero_copy_only=False)
        oo = t["o"].to_numpy(zero_copy_only=False)
        ss = t["sid"].to_numpy(zero_copy_only=False)
        run = np.cumsum(dl)
        i = int(np.argmax(run))  # first local max
        return pa.table({"t0": [int(tt[0])], "o0": [int(oo[0])],
                         "sid0": [int(ss[0])], "s": [int(dl.sum())],
                         "mx": [int(run[i])], "mx_at": [int(tt[i])]})

    sm = (srt.map_batches(block_prefix, batch_format="pyarrow",
                          batch_size=None).to_pandas()
          .sort_values(["t0", "o0", "sid0"], ignore_index=True))
    offsets = np.concatenate(([0], np.cumsum(sm["s"].to_numpy()[:-1])))
    totals = offsets + sm["mx"].to_numpy()
    peak = int(totals.max())
    first = int(np.argmax(totals == peak))
    return pd.DataFrame({"n_sessions": [np.int64(n_sessions)],
                         "peak": [np.int64(peak)],
                         "peak_at_us": [np.int64(sm.loc[first, "mx_at"])]})


def lateness_profile(sf_dir: str) -> pd.DataFrame:
    """Out-of-order-ness profile of the event stream: treating
    ``event_id`` as ARRIVAL order, an event's lateness is
    max(event time seen so far) − its own event time — the number a
    streaming pipeline needs to pick its watermark delay.  Output:
    per log2-second lateness bucket (bucket −1 = on-time/new-max),
    the event count and the running share, plus p99-style coverage
    readable off the cumulative column.

    Distributed prefix-max (the packing pattern): one sort by
    event_id, per-block (first id, max ts) summaries, O(#blocks)
    driver offsets (prefix max of block maxima), second vectorized
    pass computing each event's lateness against its block's carry-in
    — then a ≤ 64-bucket histogram fold.  Columns (bucket, n,
    cum_frac round 9)."""
    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["event_id", "ts"])
    srt = ev.sort("event_id").materialize()

    def summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"first_id": pa.array([], pa.int64()),
                             "mx": pa.array([], pa.int64())})
        ts = (t["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        return pa.table({
            "first_id": [int(t["event_id"][0].as_py())],
            "mx": [int(ts.max())]})

    sm = srt.map_batches(summary, batch_format="pyarrow",
                         batch_size=None).to_pandas()
    sm = sm.sort_values("first_id", ignore_index=True)
    # sentinel −2^62: below any epoch-µs yet far from int64 min, so
    # sentinel − ts cannot wrap positive
    carry = np.concatenate(
        ([-(np.int64(1) << np.int64(62))],
         np.maximum.accumulate(sm["mx"].to_numpy())[:-1]))
    carry_map = dict(zip(sm["first_id"].astype(int), carry))

    def bucketize(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        ts = (t["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        prefix = np.maximum.accumulate(
            np.concatenate(([carry_map[int(eid[0])]], ts))[:-1])
        late_us = prefix - ts
        onb = late_us <= 0
        sec = np.maximum(late_us // 1_000_000, 1)
        bucket = np.where(onb, -1,
                          np.floor(np.log2(sec)).astype(np.int64))
        c = np.bincount(bucket + 1, minlength=66)
        nz = np.flatnonzero(c)
        return pa.table({"bucket": (nz - 1).astype(np.int64),
                         "n": c[nz].astype(np.int64)})

    parts = srt.map_batches(bucketize, batch_format="pyarrow",
                            batch_size=None).to_pandas()
    agg = parts.groupby("bucket", as_index=False)["n"].sum() \
        .sort_values("bucket", ignore_index=True)
    total = int(agg["n"].sum())
    cum = np.cumsum(agg["n"].to_numpy())
    return pd.DataFrame({"bucket": agg["bucket"].astype(np.int64),
                         "n": agg["n"].astype(np.int64),
                         "cum_frac": np.round(cum / total, 9)})


def type_daily_corr(sf_dir: str) -> pd.DataFrame:
    """Pearson correlation matrix of the event types' DAILY count
    series (the co-movement screen ccf_daily gives for one pair at
    lag 0, here for every pair): series aligned on the union of
    observed days, missing (type, day) = 0.  One distributed
    (type, day) aggregation → O(#types × #days) driver moments.
    Columns (type_a, type_b, r round 9), pairs a < b."""
    from ray.data.aggregate import Count

    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(f"{sf_dir}/events.parquet",
                            columns=["ts", "event_type"])

    def keyed(t: pa.Table) -> pa.Table:
        day = (t["ts"].to_numpy(zero_copy_only=False)
               .astype("datetime64[us]").astype(np.int64)) // 86_400_000_000
        return pa.table({"event_type": t["event_type"], "day": day})

    daily = (ev.map_batches(keyed, batch_format="pyarrow")
             .groupby(["event_type", "day"])
             .aggregate(Count(alias_name="n")).to_pandas())
    piv = daily.pivot_table(index="day", columns="event_type",
                            values="n", aggfunc="sum").fillna(0.0)
    piv = piv.sort_index()
    types = sorted(piv.columns)
    rows = []
    for i, a in enumerate(types):
        x = piv[a].to_numpy(np.float64)
        cx = x - x.mean()
        for b in types[i + 1:]:
            y = piv[b].to_numpy(np.float64)
            cy = y - y.mean()
            den = float(np.sqrt((cx * cx).sum() * (cy * cy).sum()))
            r = float((cx * cy).sum()) / den if den > 0 else 0.0
            rows.append((a, b, round(r, 9)))
    return pd.DataFrame(rows, columns=["type_a", "type_b", "r"])
