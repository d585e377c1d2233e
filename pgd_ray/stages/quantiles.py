"""Distributed EXACT quantiles without a global sort.

``stages.univar`` walks a fully sorted column (fine for micro-count
tables); at 100 TB a global sort of one column is an all-to-all
shuffle that exists only to read back a handful of ranks.  This
module selects exact order statistics with histogram refinement
instead:

1. one aggregate pass → (n, min, max); target rank per quantile is
   ``floor(q * (n-1))`` (0-based over the sorted column — mirrored in
   SQL as ``row_number() - 1``).
2. per round, ONE streaming ``map_batches`` pass computes, for every
   still-unresolved value interval, a fixed-width histogram plus the
   per-bin true (vmin, vmax); a ``groupby((interval, bin))`` sum
   reduces ≤ bins × #intervals rows to the driver.
3. each rank walks into its bin: the new interval is that bin's
   [vmin, vmax] (actual values, tighter than the bin edges), the rank
   offset grows by the mass below the bin.  A bin with vmin == vmax
   IS the answer.  Since an interval's min and max always land in
   different bins, the candidate count strictly decreases — guaranteed
   termination with no equal-value pathologies.
4. an interval whose count ≤ ``fetch_cap`` is fetched outright
   (vectorized filter → driver sort of a bounded array).

Rounds needed ≈ log_bins(n / fetch_cap): 2 passes cover 10^13 rows at
the defaults.  The reference has no quantile operator beyond the
univar index rule (graphlet_univar_stats.h:75-108); this is the scale
path promised in ``stages/univar.py``.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


def exact_quantiles(
    ds: ray.data.Dataset,
    col: str,
    qs: list[float],
    bins: int = 2048,
    fetch_cap: int = 1 << 21,
) -> pd.DataFrame:
    """Exact value at 0-based sorted rank ``floor(q * (n-1))`` for each
    q over the NON-NULL values (NULL/NaN rows are excluded, matching
    SQL aggregate semantics).  Returns columns (q, value), one row per
    input quantile.

    Integer columns run a fully integer refinement path (exact integer
    bin edges; unit-width bins once an interval narrows to ≤ bins
    values) so the result is exact for the whole int64 range — e.g.
    epoch-microsecond timestamps ≥ 2^53 that float64 would round.
    Float columns refine on float64 linspace edges."""
    resolved, n = exact_ranks(
        ds, col, lambda n: {int(np.floor(q * (n - 1))) for q in qs},
        bins=bins, fetch_cap=fetch_cap,
    )
    if n == 0:
        return pd.DataFrame({"q": pd.Series(qs, dtype=float),
                             "value": pd.Series([np.nan] * len(qs))})
    return pd.DataFrame(
        {"q": pd.Series(qs, dtype=float),
         "value": [resolved[int(np.floor(q * (n - 1)))] for q in qs]}
    )


def percentile_cont(
    ds: ray.data.Dataset,
    col: str,
    qs: list[float],
    bins: int = 2048,
    fetch_cap: int = 1 << 21,
) -> pd.DataFrame:
    """ANSI ``PERCENTILE_CONT`` (= numpy 'linear', DuckDB
    ``quantile_cont``): linear interpolation at ``h = q·(n-1)`` between
    the exact order statistics at floor(h) and ceil(h).  Both ranks
    come out of ONE histogram-refinement run (`exact_ranks`), so the
    interpolated family costs the same streamed passes as the
    rank-rule family — still no global sort.  Returns (q, value) with
    value rounded to 6 decimals (the engine↔SQL float contract)."""
    def ranks(n):
        r = set()
        for q in qs:
            h = q * (n - 1)
            r.add(int(np.floor(h)))
            r.add(int(np.ceil(h)))
        return r

    resolved, n = exact_ranks(ds, col, ranks, bins=bins, fetch_cap=fetch_cap)
    if n == 0:
        return pd.DataFrame({"q": pd.Series(qs, dtype=float),
                             "value": pd.Series([np.nan] * len(qs))})
    vals = []
    for q in qs:
        h = q * (n - 1)
        lo, hi = int(np.floor(h)), int(np.ceil(h))
        vlo, vhi = float(resolved[lo]), float(resolved[hi])
        vals.append(round(vlo + (h - lo) * (vhi - vlo), 6))
    return pd.DataFrame({"q": pd.Series(qs, dtype=float),
                         "value": pd.Series(vals, dtype=float)})


def exact_ranks(
    ds: ray.data.Dataset,
    col: str,
    rank_fn,
    bins: int = 2048,
    fetch_cap: int = 1 << 21,
) -> tuple[dict, int]:
    """Exact order statistics at arbitrary 0-based sorted ranks.
    ``rank_fn(n)`` receives the non-null count and returns the wanted
    ranks (each in [0, n)).  Returns ({rank: value}, n) — the engine
    behind ``exact_quantiles``, also used by ``stages.univar`` for its
    index-rule quantiles."""
    import pyarrow.compute as pc

    def _valid(t: pa.Table) -> pa.Table:
        c = t[col].combine_chunks()
        mask = c.is_valid()
        if pa.types.is_floating(c.type):
            mask = pc.and_(mask, pc.invert(pc.is_nan(c)))
        return t.filter(mask)

    ds = (
        ds.select_columns([col])
        .map_batches(_valid, batch_format="pyarrow")
        .materialize()
    )
    agg = ds.aggregate(
        Min(col, alias_name="mn"), Max(col, alias_name="mx"),
        Count(alias_name="n"),
    )
    sch = ds.schema()
    is_int = sch is not None and pa.types.is_integer(
        sch.types[sch.names.index(col)]
    )
    dt = np.int64 if is_int else np.float64
    cast = int if is_int else float
    n = int(agg["n"] or 0)
    if n == 0:
        return {}, 0
    lo0, hi0 = cast(agg["mn"]), cast(agg["mx"])
    if is_int and hi0 >= np.iinfo(np.int64).max - 1:
        # the unit-bin path needs the half-open edge hi+1 in int64
        raise NotImplementedError(
            "exact_quantiles: integer columns reaching int64 max are not "
            "supported (edge array would overflow)"
        )

    def _edges(lo, hi) -> np.ndarray:
        if not is_int:
            return np.linspace(lo, hi, bins + 1)
        if hi - lo + 1 <= bins:
            # unit-width bins: every distinct value gets its own bin,
            # so each bin resolves (vmin == vmax) this round
            return np.arange(lo, hi + 2, dtype=np.int64)
        # exact integer edges in arbitrary precision (hi - lo can
        # exceed what (hi-lo)*j fits in int64), strictly increasing
        # because hi - lo >= bins
        return np.array(
            [lo + (hi - lo) * j // bins for j in range(bins + 1)],
            dtype=np.int64,
        )

    # state per unresolved rank: value interval + mass strictly below it
    ranks = sorted(rank_fn(n))
    if any(not 0 <= r < n for r in ranks):
        raise ValueError(f"ranks must be in [0, {n})")
    state = {r: {"lo": lo0, "hi": hi0, "below": 0, "cnt": n} for r in ranks}
    resolved: dict[int, float] = {}

    while len(resolved) < len(ranks):
        live = {r: s for r, s in state.items() if r not in resolved}
        # group ranks sharing an interval so each pass hits each
        # interval once
        intervals: dict[tuple, dict] = {}
        for r, s in live.items():
            key = (s["lo"], s["hi"])
            intervals.setdefault(key, {"ranks": [], **s})["ranks"].append(r)
        fetch = {k: v for k, v in intervals.items() if v["cnt"] <= fetch_cap}
        narrow = {k: v for k, v in intervals.items() if v["cnt"] > fetch_cap}

        # NOTE: a round with both fetch and narrow intervals scans the
        # materialized column twice (once per pass kind).  Rounds are
        # ~log_bins(n/cap) and the scan is a single pruned column, so
        # this stays cheaper than unifying the two output schemas.
        if fetch:
            f_iv = list(fetch.keys())

            def grab(t: pa.Table, f_iv=f_iv, dt=dt) -> pa.Table:
                v = t[col].to_numpy(zero_copy_only=False).astype(dt)
                iid, val = [], []
                for i, (lo, hi) in enumerate(f_iv):
                    sel = v[(v >= lo) & (v <= hi)]
                    iid.append(np.full(len(sel), i, dtype=np.int64))
                    val.append(sel)
                return pa.table({"iid": np.concatenate(iid),
                                 "val": np.concatenate(val)})

            got = ds.map_batches(grab, batch_format="pyarrow").to_pandas()
            for i, (key, iv) in enumerate(fetch.items()):
                vals = np.sort(got.loc[got["iid"] == i, "val"].to_numpy())
                for r in iv["ranks"]:
                    resolved[r] = cast(vals[r - iv["below"]])

        if narrow:
            n_iv = [(lo, hi, _edges(lo, hi)) for lo, hi in narrow.keys()]

            def hist(t: pa.Table, n_iv=n_iv, dt=dt) -> pa.Table:
                v = t[col].to_numpy(zero_copy_only=False).astype(dt)
                out = {"iid": [], "bin": [], "cnt": [], "vmin": [], "vmax": []}
                for i, (lo, hi, edges) in enumerate(n_iv):
                    sel = v[(v >= lo) & (v <= hi)]
                    if not len(sel):
                        continue
                    b = np.clip(
                        np.searchsorted(edges, sel, side="right") - 1,
                        0, len(edges) - 2,
                    )
                    order = np.argsort(b, kind="stable")
                    bs, ss = b[order], sel[order]
                    ub, start = np.unique(bs, return_index=True)
                    end = np.append(start[1:], len(bs))
                    out["iid"].append(np.full(len(ub), i, dtype=np.int64))
                    out["bin"].append(ub.astype(np.int64))
                    out["cnt"].append((end - start).astype(np.int64))
                    out["vmin"].append(np.minimum.reduceat(ss, start))
                    out["vmax"].append(np.maximum.reduceat(ss, start))
                if not out["iid"]:
                    vt = pa.int64() if is_int else pa.float64()
                    return pa.table({k: pa.array([], pa.int64() if k in
                                     ("iid", "bin", "cnt") else vt)
                                     for k in out})
                return pa.table({k: np.concatenate(a) for k, a in out.items()})

            hdf = (
                ds.map_batches(hist, batch_format="pyarrow")
                .groupby(["iid", "bin"])
                .aggregate(Sum("cnt", alias_name="cnt"),
                           Min("vmin", alias_name="vmin"),
                           Max("vmax", alias_name="vmax"))
                .to_pandas()
                .sort_values(["iid", "bin"], ignore_index=True)
            )
            for i, (key, iv) in enumerate(narrow.items()):
                g = hdf[hdf["iid"] == i]
                cum = np.concatenate(([0], np.cumsum(g["cnt"].to_numpy())))
                for r in iv["ranks"]:
                    # rank within this interval
                    ri = r - iv["below"]
                    j = int(np.searchsorted(cum, ri, side="right") - 1)
                    row = g.iloc[j]
                    if row["vmin"] == row["vmax"]:
                        resolved[r] = cast(row["vmin"])
                    else:
                        state[r] = {"lo": cast(row["vmin"]),
                                    "hi": cast(row["vmax"]),
                                    "below": iv["below"] + int(cum[j]),
                                    "cnt": int(row["cnt"])}

    return resolved, n


def grouped_quantiles(
    ds: ray.data.Dataset,
    key: str,
    col: str,
    qs: list[float],
    bins: int = 1024,
    fetch_cap: int = 1 << 20,
) -> pd.DataFrame:
    """Per-group EXACT quantiles — value at 0-based sorted rank
    ``floor(q * (n_g - 1))`` within each group — without any global or
    per-group sort.  Returns (key, q, value), one row per (group, q).

    Same histogram-refinement scheme as ``exact_ranks`` but the
    interval state is keyed by (group, rank) and ONE streamed pass per
    round serves every group's live intervals (each batch bins its
    rows per live interval).  The per-round reduce is ≤ #intervals ×
    bins rows; per-batch work is a python loop over live intervals
    with vectorized selection inside — fine for dimension-like key
    cardinalities (event types, languages, sources); for millions of
    groups, factorize keys into the bin key instead (one segmented
    bincount), the documented upgrade path.

    Float columns only (NaN/NULL excluded, SQL aggregate semantics).
    """
    import pyarrow.compute as pc

    def _valid(t: pa.Table) -> pa.Table:
        c = t[col].combine_chunks()
        mask = pc.and_(c.is_valid(), pc.invert(pc.is_nan(c)))
        return t.select([key, col]).filter(mask)

    ds = ds.map_batches(_valid, batch_format="pyarrow").materialize()
    base = (
        ds.groupby(key)
        .aggregate(Min(col, alias_name="mn"), Max(col, alias_name="mx"),
                   Count(alias_name="n"))
        .to_pandas()
    )
    # state per (group, rank): value interval + mass strictly below
    state: dict = {}
    for _, row in base.iterrows():
        g, n = row[key], int(row["n"])
        for q in qs:
            r = int(np.floor(q * (n - 1)))
            state[(g, q)] = {"rank": r, "lo": float(row["mn"]),
                             "hi": float(row["mx"]), "below": 0, "cnt": n}
    resolved: dict = {}

    while len(resolved) < len(state):
        live: dict = {}
        for sk, s in state.items():
            if sk in resolved:
                continue
            ik = (sk[0], s["lo"], s["hi"])
            live.setdefault(ik, {"ranks": [], **s})["ranks"].append(sk)
        fetch = [(k, v) for k, v in live.items() if v["cnt"] <= fetch_cap]
        narrow = [(k, v) for k, v in live.items() if v["cnt"] > fetch_cap]

        if fetch:
            f_iv = [k for k, _ in fetch]

            def grab(t: pa.Table, f_iv=f_iv) -> pa.Table:
                grp = t[key].to_numpy(zero_copy_only=False)
                v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
                iid, val = [], []
                for i, (g, lo, hi) in enumerate(f_iv):
                    sel = v[(grp == g) & (v >= lo) & (v <= hi)]
                    iid.append(np.full(len(sel), i, np.int64))
                    val.append(sel)
                return pa.table({"iid": np.concatenate(iid),
                                 "val": np.concatenate(val)})

            got = ds.map_batches(grab, batch_format="pyarrow").to_pandas()
            for i, (ik, iv) in enumerate(fetch):
                vals = np.sort(got.loc[got["iid"] == i, "val"].to_numpy())
                for sk in iv["ranks"]:
                    resolved[sk] = float(vals[state[sk]["rank"] - iv["below"]])

        if narrow:
            n_iv = [(g, lo, hi, np.linspace(lo, hi, bins + 1))
                    for (g, lo, hi), _ in narrow]

            def hist(t: pa.Table, n_iv=n_iv) -> pa.Table:
                grp = t[key].to_numpy(zero_copy_only=False)
                v = t[col].to_numpy(zero_copy_only=False).astype(np.float64)
                out = {"iid": [], "bin": [], "cnt": [], "vmin": [], "vmax": []}
                for i, (g, lo, hi, edges) in enumerate(n_iv):
                    sel = v[(grp == g) & (v >= lo) & (v <= hi)]
                    if not len(sel):
                        continue
                    b = np.clip(np.searchsorted(edges, sel, side="right") - 1,
                                0, len(edges) - 2)
                    order = np.argsort(b, kind="stable")
                    bs, ss = b[order], sel[order]
                    ub, start = np.unique(bs, return_index=True)
                    end = np.append(start[1:], len(bs))
                    out["iid"].append(np.full(len(ub), i, np.int64))
                    out["bin"].append(ub.astype(np.int64))
                    out["cnt"].append((end - start).astype(np.int64))
                    out["vmin"].append(np.minimum.reduceat(ss, start))
                    out["vmax"].append(np.maximum.reduceat(ss, start))
                if not out["iid"]:
                    return pa.table({k: pa.array([], pa.int64() if k in
                                     ("iid", "bin", "cnt") else pa.float64())
                                     for k in out})
                return pa.table({k: np.concatenate(a) for k, a in out.items()})

            hdf = (
                ds.map_batches(hist, batch_format="pyarrow")
                .groupby(["iid", "bin"])
                .aggregate(Sum("cnt", alias_name="cnt"),
                           Min("vmin", alias_name="vmin"),
                           Max("vmax", alias_name="vmax"))
                .to_pandas()
                .sort_values(["iid", "bin"], ignore_index=True)
            )
            for i, (ik, iv) in enumerate(narrow):
                g_rows = hdf[hdf["iid"] == i]
                cum = np.concatenate(([0], np.cumsum(g_rows["cnt"].to_numpy())))
                for sk in iv["ranks"]:
                    ri = state[sk]["rank"] - iv["below"]
                    j = int(np.searchsorted(cum, ri, side="right") - 1)
                    row = g_rows.iloc[j]
                    if row["vmin"] == row["vmax"]:
                        resolved[sk] = float(row["vmin"])
                    else:
                        state[sk] = {"rank": state[sk]["rank"],
                                     "lo": float(row["vmin"]),
                                     "hi": float(row["vmax"]),
                                     "below": iv["below"] + int(cum[j]),
                                     "cnt": int(row["cnt"])}

    rows = [{"key": g, "q": q, "value": resolved[(g, q)]}
            for (g, q) in sorted(resolved, key=lambda sk: (sk[0], sk[1]))]
    out = pd.DataFrame(rows, columns=["key", "q", "value"])
    return out.rename(columns={"key": key})
