"""Keyed temporal joins: as-of join and range (interval) join.

Neither exists in the reference (pure batch graph engine — SURVEY §2)
nor as a Ray Data primitive, but both are staples of event/transcript
feature pipelines at scale ("attach the latest order as of each event",
"all shipments within a window of the order date").  Expressed
Ray-Data-first:

* ``asof_join`` — for every left row, the right row with the same key
  and the greatest right-time <= left-time.  Two strategies:

  - ``broadcast`` (default): the right side's probe structure is built
    once, ``ray.put`` once, and every ``map_batches`` task over the
    left side probes it with vectorized ``searchsorted`` — ZERO
    shuffles of the (large) left side.  Right for the common
    dimension-table case; the stage callable captures only the
    ObjectRef (the payload is fetched once per worker in ``__init__``).
  - ``partitioned``: both sides are hash-partitioned on the key (one
    shuffle of a tagged union), and each partition runs the same
    vectorized probe.  Right for 100-TB-left x large-right, where the
    right side cannot live in one broadcast object.

* ``range_join`` — all (left, right) pairs with equal key and
  right-time within ``[left_time - before_us, left_time + after_us]``.
  Same two strategies; the per-batch/per-partition match is two
  ``searchsorted`` probes per left row against a
  ``dense_key * (T+1) + time_rank`` int64 composite, and pair
  expansion is a cumsum/repeat — output-linear, never a per-key Python
  loop and never a per-partition cross join.

Determinism: as-of ties (several right rows sharing the maximal
right-time for a key) are broken by the minimal ``tiebreak`` column —
the probe sorts right rows by (composite asc, tiebreak asc), so the
first row of the winning composite run is the answer.  This matches
the SQL oracle's
``row_number() OVER (... ORDER BY rt DESC, tiebreak ASC) = 1``.

Scale notes (100 TB): the broadcast path never moves the left side and
holds ONE probe per worker process.  The partitioned path's single
all-to-all is on the hash of the join key; a pathologically hot key
concentrates in one partition — inherent to keyed temporal joins
(every row of a key must co-locate).  Mitigations: raise
``num_partitions`` so the other keys spread, or split the hot key's
right rows out and broadcast them.

All timestamps are normalized to int64 microseconds in the output
(matching the repo-wide convention, e.g. ``stages.windows``).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

_GOLDEN = np.uint64(0x9E3779B97F4A7C15)


def _hash_part(key: np.ndarray, num_partitions: int) -> np.ndarray:
    """Stable multiplicative hash -> partition id (not raw modulo,
    which would keep sequential-key locality and skew partitions)."""
    h = (key.astype(np.uint64, copy=False) * _GOLDEN) >> np.uint64(17)
    return (h % np.uint64(num_partitions)).astype(np.int64)


def _us_col(col: pa.ChunkedArray | pa.Array) -> pa.Array:
    """timestamp[...] or integer column -> int64 microseconds Array."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_timestamp(t):
        return col.cast(pa.timestamp("us")).view(pa.int64())
    return col.cast(pa.int64())


def _us_np(col) -> np.ndarray:
    return _us_col(col).to_numpy(zero_copy_only=False)


class _Probe:
    """Right-side probe structure shared by both joins.

    Right rows are sorted by ``composite = dense_key * (T+1) + rank(t)``
    then ``tiebreak`` — composite range queries become two global
    ``searchsorted`` calls, and the min-tiebreak row is first in every
    equal-composite run.  ``payload`` columns stay Arrow (typed takes,
    no object-dtype round trips).
    """

    def __init__(self, rk: np.ndarray, rt: np.ndarray, tb: np.ndarray,
                 payload: dict[str, pa.Array]):
        self.uk = np.unique(rk)
        self.ut = np.unique(rt)
        self.stride = np.int64(len(self.ut) + 1)
        comp = (np.searchsorted(self.uk, rk).astype(np.int64) * self.stride
                + np.searchsorted(self.ut, rt).astype(np.int64))
        order = np.lexsort((tb, comp))
        self.comp = comp[order]
        take = pa.array(order, pa.int64())
        self.payload = {
            c: (v.combine_chunks() if isinstance(v, pa.ChunkedArray) else v).take(take)
            for c, v in payload.items()
        }

    def _key_ranks(self, lk: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        kd = np.searchsorted(self.uk, lk)
        valid = kd < len(self.uk)
        valid &= self.uk[np.minimum(kd, len(self.uk) - 1)] == lk
        return kd.astype(np.int64), valid

    def asof(self, lk: np.ndarray, lt: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """(right_row_index, matched_mask): latest right row per left
        row with equal key and rt <= lt; min tiebreak on rt ties."""
        if not len(self.comp):
            return np.zeros(len(lk), np.int64), np.zeros(len(lk), bool)
        kd, valid = self._key_ranks(lk)
        max_rank = np.searchsorted(self.ut, lt, side="right") - 1
        cq = kd * self.stride + np.maximum(max_rank, 0)
        hi = np.searchsorted(self.comp, cq, side="right")
        cstar = self.comp[np.maximum(hi, 1) - 1]
        matched = valid & (max_rank >= 0) & (hi > 0) & (cstar >= kd * self.stride)
        idx = np.searchsorted(self.comp, cstar, side="left")
        return idx, matched

    def range(self, lk: np.ndarray, lo_t: np.ndarray, hi_t: np.ndarray
              ) -> tuple[np.ndarray, np.ndarray]:
        """(left_row_index_repeated, right_row_index) pairs with equal
        key and rt in [lo_t, hi_t] — output-linear expansion."""
        if not len(self.comp):
            z = np.array([], np.int64)
            return z, z
        kd, valid = self._key_ranks(lk)
        lo_rank = np.searchsorted(self.ut, lo_t, side="left")
        hi_rank = np.searchsorted(self.ut, hi_t, side="right")  # exclusive
        base = kd * self.stride
        lo = np.searchsorted(self.comp, base + lo_rank, side="left")
        hi = np.searchsorted(self.comp, base + np.maximum(hi_rank - 1, 0),
                             side="right")
        counts = np.where(valid & (hi_rank > lo_rank), hi - lo, 0)
        total = int(counts.sum())
        left_idx = np.repeat(np.arange(len(lk), dtype=np.int64), counts)
        cum = np.concatenate(([0], np.cumsum(counts)))
        offs = np.arange(total, dtype=np.int64) - np.repeat(cum[:-1], counts)
        right_idx = np.repeat(lo, counts) + offs
        return left_idx, right_idx


def _build_probe(right: ray.data.Dataset, right_key: str, right_time: str,
                 tiebreak: str, right_cols: list[str]) -> _Probe:
    """Assemble the probe from the right Dataset by concatenating Arrow
    batches (one linear pass; the right side is the SMALL side here)."""
    cols = list(dict.fromkeys([right_key, right_time, tiebreak] + right_cols))
    parts = [b for b in right.select_columns(cols).iter_batches(
        batch_size=1 << 20, batch_format="pyarrow") if b.num_rows]
    if parts:
        tbl = pa.concat_tables(parts)
    else:
        # typed empty probe from the right schema: the how='left' null
        # columns must keep their true types even when right is empty
        sch = right.schema()
        types = dict(zip(sch.names, sch.types)) if sch is not None else {}
        tbl = pa.table(
            {c: pa.array([], types.get(c, pa.int64())) for c in cols}
        )
    rk = tbl[right_key].to_numpy(zero_copy_only=False).astype(np.int64)
    rt = _us_np(tbl[right_time])
    tb = tbl[tiebreak].to_numpy(zero_copy_only=False)
    payload: dict[str, pa.Array] = {c: tbl[c] for c in right_cols}
    payload["__rt__"] = pa.array(rt, pa.int64())
    return _Probe(rk, rt, tb, payload)


def _take_left(t: pa.Table, names: list[str], left_time: str,
               sel: pa.Array | None) -> dict[str, pa.Array]:
    out = {}
    for name in names:
        col = _us_col(t[name]) if name == left_time else t[name]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        out[name] = col.take(sel) if sel is not None else col
    return out


def _take_right(probe: _Probe, right_cols: list[str], right_time_as: str | None,
                idx: np.ndarray, matched: np.ndarray | None) -> dict[str, pa.Array]:
    """Arrow ``take`` with null indices yields nulls — exactly the
    unmatched-row semantics the ``how='left'`` path needs."""
    take = pa.array(idx, pa.int64(),
                    mask=None if matched is None else ~matched)
    out = {}
    for c in right_cols:
        out[c] = probe.payload[c].take(take)
    if right_time_as:
        out[right_time_as] = probe.payload["__rt__"].take(take)
    return out


def _check_collisions(left_names, right_cols: list[str],
                      right_time_as: str | None) -> None:
    """Output columns are left ∪ right payload: a name collision would
    silently overwrite the left column — reject it at entry."""
    seen = set(left_names)
    dup = [c for c in right_cols if c in seen]
    if len(set(right_cols)) != len(right_cols):
        dup += [c for c in set(right_cols) if right_cols.count(c) > 1]
    if right_time_as and (right_time_as in seen or right_time_as in right_cols):
        dup.append(right_time_as)
    if dup:
        raise ValueError(
            f"join output name collision: {sorted(set(dup))!r} — rename via "
            "right_time_as / distinct right_cols"
        )


def asof_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    tiebreak: str,
    right_cols: list[str],
    right_time_as: str | None = None,
    how: str = "inner",
    strategy: str = "broadcast",
    num_partitions: int = 64,
    concurrency=(1, 16),
) -> ray.data.Dataset:
    """As-of join: each left row picks the right row with equal key and
    the greatest ``right_time <= left_time`` (ties -> min ``tiebreak``).

    Output = all left columns (``left_time`` as int64 us) +
    ``right_cols`` (+ the matched right time as ``right_time_as``).
    ``how='inner'`` drops unmatched left rows; ``'left'`` keeps them
    with typed nulls.
    """
    if how not in ("inner", "left"):
        raise ValueError(f"how must be 'inner' or 'left', got {how!r}")
    _check_collisions(left.schema().names, right_cols, right_time_as)
    if strategy == "broadcast":
        probe_ref = ray.put(_build_probe(right, right_key, right_time,
                                         tiebreak, right_cols))
        lnames = list(left.schema().names)

        class _AsofBatch:
            def __init__(self):
                self.probe = ray.get(probe_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                lk = t[left_key].to_numpy(zero_copy_only=False).astype(np.int64)
                lt = _us_np(t[left_time])
                idx, matched = self.probe.asof(lk, lt)
                if how == "inner":
                    sel = pa.array(np.flatnonzero(matched), pa.int64())
                    cols = _take_left(t, lnames, left_time, sel)
                    cols.update(_take_right(self.probe, right_cols,
                                            right_time_as,
                                            idx[matched], None))
                else:
                    cols = _take_left(t, lnames, left_time, None)
                    cols.update(_take_right(self.probe, right_cols,
                                            right_time_as, idx, matched))
                return pa.table(cols)

        return left.map_batches(_AsofBatch, batch_format="pyarrow",
                                batch_size=65536, concurrency=concurrency)
    if strategy != "partitioned":
        raise ValueError(f"unknown strategy {strategy!r}")
    return _partitioned_join(
        left, right, mode="asof",
        left_key=left_key, right_key=right_key, left_time=left_time,
        right_time=right_time, tiebreak=tiebreak, right_cols=right_cols,
        right_time_as=right_time_as, how=how, num_partitions=num_partitions,
    )


def range_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    before_us: int,
    after_us: int,
    left_cols: list[str],
    right_cols: list[str],
    right_time_as: str | None = None,
    strategy: str = "broadcast",
    num_partitions: int = 64,
    concurrency=(1, 16),
) -> ray.data.Dataset:
    """Interval join: all (left, right) pairs with equal key and
    ``right_time`` in ``[left_time - before_us, left_time + after_us]``
    (inclusive).  Output columns = ``left_cols`` (``left_time`` as
    int64 us if included) + ``right_cols`` (+ ``right_time_as``)."""
    _check_collisions(left_cols, right_cols, right_time_as)
    if strategy == "broadcast":
        probe_ref = ray.put(_build_probe(right, right_key, right_time,
                                         right_key, right_cols))

        class _RangeBatch:
            def __init__(self):
                self.probe = ray.get(probe_ref)

            def __call__(self, t: pa.Table) -> pa.Table:
                lk = t[left_key].to_numpy(zero_copy_only=False).astype(np.int64)
                lt = _us_np(t[left_time])
                li, ri = self.probe.range(lk, lt - before_us, lt + after_us)
                cols = _take_left(t, left_cols, left_time,
                                  pa.array(li, pa.int64()))
                cols.update(_take_right(self.probe, right_cols,
                                        right_time_as, ri, None))
                return pa.table(cols)

        return left.map_batches(_RangeBatch, batch_format="pyarrow",
                                batch_size=65536, concurrency=concurrency)
    if strategy != "partitioned":
        raise ValueError(f"unknown strategy {strategy!r}")
    return _partitioned_join(
        left, right, mode="range",
        left_key=left_key, right_key=right_key, left_time=left_time,
        right_time=right_time, tiebreak=right_key, right_cols=right_cols,
        right_time_as=right_time_as, how="inner",
        num_partitions=num_partitions,
        before_us=before_us, after_us=after_us, left_cols=left_cols,
    )


# ---------------------------------------------------------------------------
# partitioned strategy: tagged union -> ONE hash shuffle -> per-partition probe
# ---------------------------------------------------------------------------

def _partitioned_join(
    left: ray.data.Dataset, right: ray.data.Dataset, *, mode: str,
    left_key: str, right_key: str, left_time: str, right_time: str,
    tiebreak: str, right_cols: list[str], right_time_as: str | None,
    how: str, num_partitions: int,
    before_us: int = 0, after_us: int = 0,
    left_cols: list[str] | None = None,
) -> ray.data.Dataset:
    """Both sides tagged and unioned into one canonical-schema Dataset,
    then ``groupby('part').map_groups`` — one vectorized Python call
    per PARTITION (O(num_partitions) calls total, never per key) runs
    the same probe inside each partition.  Column types are made
    explicit on both branches so the union schema is stable and nulls
    never degrade to pandas object/float dtypes.
    """
    lnames = list(left.schema().names)
    out_left = lnames if mode == "asof" else list(left_cols or lnames)
    rpay = list(dict.fromkeys([tiebreak] + right_cols))

    lbase = left.schema().base_schema
    rbase = right.schema().base_schema
    ltypes = {c: (pa.int64() if c == left_time else lbase.field(c).type)
              for c in lnames}
    rtypes = {c: rbase.field(c).type for c in rpay}

    def tag_left(t: pa.Table) -> pa.Table:
        n = t.num_rows
        lk = t[left_key].to_numpy(zero_copy_only=False).astype(np.int64)
        cols: dict[str, pa.Array] = {
            "part": pa.array(_hash_part(lk, num_partitions)),
            "side": pa.array(np.ones(n, np.int8)),
            "k": pa.array(lk),
            "t": _us_col(t[left_time]),
        }
        for c in lnames:
            col = _us_col(t[c]) if c == left_time else t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[f"l_{c}"] = col
        for c in rpay:
            cols[f"r_{c}"] = pa.nulls(n, rtypes[c])
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        n = t.num_rows
        rk = t[right_key].to_numpy(zero_copy_only=False).astype(np.int64)
        cols: dict[str, pa.Array] = {
            "part": pa.array(_hash_part(rk, num_partitions)),
            "side": pa.array(np.zeros(n, np.int8)),
            "k": pa.array(rk),
            "t": _us_col(t[right_time]),
        }
        for c in lnames:
            cols[f"l_{c}"] = pa.nulls(n, ltypes[c])
        for c in rpay:
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[f"r_{c}"] = col
        return pa.table(cols)

    union = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.select_columns(list(dict.fromkeys([right_key, right_time] + rpay)))
        .map_batches(tag_right, batch_format="pyarrow")
    )

    out_names = (out_left + right_cols
                 + ([right_time_as] if right_time_as else []))
    out_types = {**{c: ltypes[c] for c in out_left},
                 **{c: rtypes[c] for c in right_cols}}
    if right_time_as:
        out_types[right_time_as] = pa.int64()

    def per_part(t: pa.Table) -> pa.Table:
        side = t["side"].to_numpy(zero_copy_only=False)
        lsel = pa.array(np.flatnonzero(side == 1), pa.int64())
        rsel = pa.array(np.flatnonzero(side == 0), pa.int64())
        nl = len(lsel)
        if nl == 0:
            return pa.table({c: pa.nulls(0, out_types[c]) for c in out_names})
        lk = t["k"].take(lsel).to_numpy(zero_copy_only=False)
        ltm = t["t"].take(lsel).to_numpy(zero_copy_only=False)
        rk = t["k"].take(rsel).to_numpy(zero_copy_only=False)
        rtm = t["t"].take(rsel).to_numpy(zero_copy_only=False)
        tb = t[f"r_{tiebreak}"].take(rsel).to_numpy(zero_copy_only=False)
        payload = {c: t[f"r_{c}"].combine_chunks().take(rsel)
                   if isinstance(t[f"r_{c}"], pa.ChunkedArray)
                   else t[f"r_{c}"].take(rsel) for c in right_cols}
        payload["__rt__"] = pa.array(rtm, pa.int64())
        probe = _Probe(rk.astype(np.int64), rtm, tb, payload)
        cols: dict[str, pa.Array] = {}
        if mode == "asof":
            idx, matched = probe.asof(lk.astype(np.int64), ltm)
            if how == "inner":
                keep = pa.array(np.flatnonzero(matched), pa.int64())
                for c in out_left:
                    cols[c] = t[f"l_{c}"].take(lsel).take(keep)
                cols.update(_take_right(probe, right_cols, right_time_as,
                                        idx[matched], None))
            else:
                for c in out_left:
                    cols[c] = t[f"l_{c}"].take(lsel)
                cols.update(_take_right(probe, right_cols, right_time_as,
                                        idx, matched))
        else:
            li, ri = probe.range(lk.astype(np.int64),
                                 ltm - before_us, ltm + after_us)
            take_l = pa.array(li, pa.int64())
            for c in out_left:
                cols[c] = t[f"l_{c}"].take(lsel).take(take_l)
            cols.update(_take_right(probe, right_cols, right_time_as,
                                    ri, None))
        out = pa.table(cols)
        if out.num_rows == 0:
            return pa.table({c: pa.nulls(0, out_types[c]) for c in out_names})
        return out

    return union.groupby("part").map_groups(per_part, batch_format="pyarrow")


# --------------------------------------------------------------------
# semi / anti joins (EXISTS / NOT EXISTS)
# --------------------------------------------------------------------

def _distinct_keys_array(right: ray.data.Dataset, right_key: str) -> np.ndarray:
    """Sorted distinct right-side keys, collected as ONE int64 array:
    per-batch np.unique partials stream to the driver, which holds
    only the distinct-key set (the small side by contract)."""
    parts = [
        np.unique(b[right_key].to_numpy(zero_copy_only=False).astype(np.int64))
        for b in right.select_columns([right_key]).iter_batches(
            batch_size=1 << 20, batch_format="pyarrow")
        if b.num_rows
    ]
    if not parts:
        return np.array([], dtype=np.int64)
    return np.unique(np.concatenate(parts))


_KEYS_CACHE: dict = {}


def _key_filter(t: pa.Table, keys_ref, key: str,
                keep_matching: bool) -> pa.Table:
    """Task stage (no actor, no constructor args in the object store —
    the ray#53727 restart hazard): the broadcast sorted key set is
    fetched once per worker PROCESS via a module cache, then each left
    batch is filtered with a vectorized searchsorted membership test."""
    ck = keys_ref.hex() if isinstance(keys_ref, ray.ObjectRef) else None
    keys = _KEYS_CACHE.get(ck)
    if keys is None:
        keys = ray.get(keys_ref) if ck is not None else keys_ref
        if ck is not None:
            _KEYS_CACHE.clear()
            _KEYS_CACHE[ck] = keys
    if t.num_rows == 0:
        return t
    k = t[key].to_numpy(zero_copy_only=False).astype(np.int64)
    if len(keys):
        pos = np.searchsorted(keys, k)
        pos[pos == len(keys)] = 0
        hit = keys[pos] == k
    else:
        hit = np.zeros(len(k), dtype=bool)
    return t.filter(pa.array(hit if keep_matching else ~hit))


def _semi_anti(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    left_key: str,
    right_key: str,
    keep_matching: bool,
    strategy: str,
    num_partitions: int,
    concurrency,
) -> ray.data.Dataset:
    if strategy == "broadcast":
        keys = _distinct_keys_array(right, right_key)
        ref = ray.put(keys)
        cap = concurrency[-1] if isinstance(
            concurrency, (tuple, list)) else concurrency
        return left.map_batches(
            _key_filter, batch_format="pyarrow", batch_size=65536,
            concurrency=cap,
            fn_kwargs={"keys_ref": ref, "key": left_key,
                       "keep_matching": keep_matching},
        )
    if strategy != "partitioned":
        raise ValueError(f"unknown strategy {strategy!r}")
    # same tagged-union shape as _partitioned_join: both sides hashed
    # on the key into ONE canonical-schema union (right contributes
    # only per-batch-deduped keys), one shuffle, then a vectorized
    # membership probe per PARTITION — O(num_partitions) Python calls,
    # no driver hop, and the right side never needs to fit anywhere
    # whole.
    lnames = list(left.schema().names)
    lbase = left.schema().base_schema
    ltypes = {c: lbase.field(c).type for c in lnames}

    def tag_left(t: pa.Table) -> pa.Table:
        lk = t[left_key].to_numpy(zero_copy_only=False).astype(np.int64)
        cols: dict[str, pa.Array] = {
            "part": pa.array(_hash_part(lk, num_partitions)),
            "side": pa.array(np.ones(t.num_rows, np.int8)),
            "k": pa.array(lk),
        }
        for c in lnames:
            col = t[c]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            cols[f"l_{c}"] = col
        return pa.table(cols)

    def tag_right(t: pa.Table) -> pa.Table:
        rk = np.unique(
            t[right_key].to_numpy(zero_copy_only=False).astype(np.int64))
        cols: dict[str, pa.Array] = {
            "part": pa.array(_hash_part(rk, num_partitions)),
            "side": pa.array(np.zeros(len(rk), np.int8)),
            "k": pa.array(rk),
        }
        for c in lnames:
            cols[f"l_{c}"] = pa.nulls(len(rk), ltypes[c])
        return pa.table(cols)

    union = left.map_batches(tag_left, batch_format="pyarrow").union(
        right.select_columns([right_key]).map_batches(
            tag_right, batch_format="pyarrow")
    )

    def per_part(t: pa.Table) -> pa.Table:
        side = t["side"].to_numpy(zero_copy_only=False)
        k = t["k"].to_numpy(zero_copy_only=False)
        keys = np.unique(k[side == 0])
        lrows = np.flatnonzero(side == 1)
        lk = k[lrows]
        if len(keys):
            pos = np.searchsorted(keys, lk)
            pos[pos == len(keys)] = 0
            hit = keys[pos] == lk
        else:
            hit = np.zeros(len(lk), dtype=bool)
        keep = pa.array(lrows[hit if keep_matching else ~hit], pa.int64())
        return pa.table({c: t[f"l_{c}"].take(keep) for c in lnames})

    return union.groupby("part").map_groups(per_part, batch_format="pyarrow")


def semi_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    left_key: str,
    right_key: str,
    strategy: str = "broadcast",
    num_partitions: int = 8,
    concurrency=(1, 16),
) -> ray.data.Dataset:
    """SQL ``EXISTS``: left rows whose ``left_key`` appears in the
    right side's ``right_key`` — left columns only, no fan-out.

    ``broadcast`` ships ONE sorted distinct-key array (``ray.put``
    once, fetched once per worker) and never shuffles the left side;
    ``partitioned`` keeps the right side distributed (distinct-key
    hash agg → hash join), for right sides too big to broadcast."""
    return _semi_anti(left, right, left_key, right_key, True,
                      strategy, num_partitions, concurrency)


def anti_join(
    left: ray.data.Dataset,
    right: ray.data.Dataset,
    *,
    left_key: str,
    right_key: str,
    strategy: str = "broadcast",
    num_partitions: int = 8,
    concurrency=(1, 16),
) -> ray.data.Dataset:
    """SQL ``NOT EXISTS``: left rows whose ``left_key`` does NOT appear
    in the right side — same two strategies as ``semi_join``."""
    return _semi_anti(left, right, left_key, right_key, False,
                      strategy, num_partitions, concurrency)
