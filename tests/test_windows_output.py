import json

import numpy as np
import pyarrow as pa
import ray.data as rd

from pgd_ray.stages.windows import sessionize, tumbling_counts

SF = "/root/testdata/sf0.001"


def test_sessionize_matches_pandas_reference():
    import pandas as pd
    import pyarrow.parquet as pq

    ours = sessionize(SF)
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    ev = ev.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
    rows = []
    for uid, g in ev.groupby("user_id"):
        ts = g["ts_us"].to_numpy()
        new = np.concatenate(([True], np.diff(ts) > 1_800_000_000))
        sid = np.cumsum(new) - 1
        for s in range(sid.max() + 1):
            sel = ts[sid == s]
            rows.append((uid, s, sel[0], sel[-1], len(sel)))
    ref = pd.DataFrame(rows, columns=["user_id", "session_idx", "start_ts", "end_ts", "n_events"])
    a = ours.to_pandas().sort_values(["user_id", "session_idx"], ignore_index=True)
    b = ref.sort_values(["user_id", "session_idx"], ignore_index=True)
    assert a[list(b.columns)].equals(b.astype(a.dtypes.to_dict()))


def _sessions_reference(ev, gap_us=1_800_000_000):
    import pandas as pd

    ev = ev.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
    rows = []
    for uid, g in ev.groupby("user_id"):
        ts = g["ts_us"].to_numpy()
        new = np.concatenate(([True], np.diff(ts) > gap_us))
        sid = np.cumsum(new) - 1
        for s in range(sid.max() + 1):
            sel = ts[sid == s]
            rows.append((uid, s, sel[0], sel[-1], len(sel)))
    return pd.DataFrame(
        rows, columns=["user_id", "session_idx", "start_ts", "end_ts", "n_events"]
    )


def _write_events(tmp_path, uid, ts_us, shards=6):
    import pandas as pd
    import pyarrow.parquet as pq

    d = tmp_path / "sess_in"
    d.mkdir(exist_ok=True)
    eid = np.arange(len(uid), dtype=np.int64)
    bounds = np.linspace(0, len(uid), shards + 1).astype(int)
    for i in range(shards):
        t = pa.table({
            "event_id": eid[bounds[i]:bounds[i + 1]],
            "user_id": uid[bounds[i]:bounds[i + 1]].astype(np.int64),
            "ts": pd.to_datetime(ts_us[bounds[i]:bounds[i + 1]], unit="us"),
        })
        pq.write_table(t, d / f"events_{i}.parquet")
    # sessionize reads <dir>/events.parquet: point a dir at the shards
    import os
    os.rename(d, tmp_path / "events.parquet_dir")
    os.makedirs(tmp_path / "sfdir", exist_ok=True)
    os.symlink(tmp_path / "events.parquet_dir", tmp_path / "sfdir" / "events.parquet")
    return str(tmp_path / "sfdir")


def test_sessionize_chains_across_many_blocks(tmp_path):
    """Adversarial multi-block layout: one hub user whose single
    session spans several sorted blocks (every block boundary merges),
    plus users with many sessions around it — the streaming stitch
    must match the pandas reference exactly, including session_idx."""
    import pandas as pd

    rng = np.random.default_rng(5)
    uids, tss = [], []
    GAP = 1_800_000_000
    # user 50: 600 events 10 min apart -> ONE session spanning blocks
    uids += [50] * 600
    tss += (np.arange(600, dtype=np.int64) * 600_000_000).tolist()
    # user 10/90: alternating short sessions (gap > 30 min between them)
    for u in (10, 90):
        base = 10**15 if u == 90 else 0
        for s in range(40):
            start = base + s * 10 * GAP
            k = int(rng.integers(1, 5))
            uids += [u] * k
            tss += (start + np.arange(k) * 1000).tolist()
    # a few singleton users
    for u in range(20, 40):
        uids.append(u)
        tss.append(int(rng.integers(0, 10**12)))
    uid = np.array(uids, dtype=np.int64)
    ts_us = np.array(tss, dtype=np.int64)
    # shuffle so file shards interleave users (the sort does the work)
    perm = rng.permutation(len(uid))
    sf = _write_events(tmp_path, uid[perm], ts_us[perm], shards=8)

    out = sessionize(sf).to_pandas().sort_values(
        ["user_id", "session_idx"], ignore_index=True
    )
    # event_id only tie-breaks identical (user, ts) rows — absent here
    ref = _sessions_reference(
        pd.DataFrame({"user_id": uid, "ts_us": ts_us,
                      "event_id": np.arange(len(uid))})
    ).sort_values(["user_id", "session_idx"], ignore_index=True)
    a = out[["user_id", "session_idx", "start_ts", "end_ts", "n_events"]]
    assert a.equals(ref.astype(a.dtypes.to_dict()))
    assert (out[out.user_id == 50].n_events == 600).all()


def test_sessionize_driver_holds_only_block_summaries(tmp_path, monkeypatch):
    """Scale contract: building the session Dataset pulls O(#blocks)
    summary rows to the driver — never the session table."""
    import ray.data.dataset as dsmod

    rng = np.random.default_rng(7)
    n = 20_000
    uid = rng.integers(0, 500, n).astype(np.int64)
    ts_us = rng.integers(0, 10**13, n).astype(np.int64)
    sf = _write_events(tmp_path, uid, ts_us, shards=10)

    pulled = []
    orig = dsmod.Dataset.iter_internal_ref_bundles

    def counting(self, *a, **kw):
        for bundle in orig(self, *a, **kw):
            rows = bundle.num_rows()
            pulled.append(rows if rows is not None else 0)
            yield bundle

    monkeypatch.setattr(dsmod.Dataset, "iter_internal_ref_bundles", counting)
    ds = sessionize(sf)
    assert sum(pulled) <= 64, pulled  # summaries only (#blocks rows)
    # the result itself is far larger than what the driver saw
    assert ds.count() > 5_000


def test_tumbling_counts_total():
    out = tumbling_counts(SF).to_pandas()
    assert out["n_events"].sum() == 1000


def test_macro_approx_full_fraction_is_exact():
    from pgd_ray.graph.csr import csr_from_edge_arrays
    from pgd_ray.graph.graphlets import graphlet_macro, graphlet_macro_approx

    src = np.array([0, 0, 0, 1, 1, 2])
    dst = np.array([1, 2, 3, 2, 3, 3])
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    csr = csr_from_edge_arrays(src, dst, n=4)
    exact = graphlet_macro(ds, csr, concurrency=(1, 2))
    approx = graphlet_macro_approx(ds, csr, fraction=1.0, concurrency=(1, 2))
    assert approx.counts == exact.counts


def test_write_partitioned_resumable(tmp_path):
    from pgd_ray.state.output import completed_partitions, write_partitioned

    ds = rd.from_arrow(pa.table({"x": np.arange(100)}))
    e1 = write_partitioned(ds, tmp_path, "shard0")
    assert e1["rows"] == 100
    assert completed_partitions(tmp_path) == {"shard0"}
    # second call skips the work (manifest hit)
    e2 = write_partitioned(ds, tmp_path, "shard0")
    assert e2 == json.loads((tmp_path / "partition=shard0" / "_SUCCESS").read_text())
    write_partitioned(ds, tmp_path, "shard1")
    assert completed_partitions(tmp_path) == {"shard0", "shard1"}


def test_cli_end_to_end(tmp_path):
    from pgd_ray.__main__ import main

    macro = tmp_path / "macro.txt"
    micro = tmp_path / "micro.csv"
    pr = tmp_path / "pr.parquet"
    rc = main(["-f", "/root/reference/data/4-clique.txt",
               "--macro", str(macro), "--micro", str(micro),
               "--pagerank", str(pr), "-w", "2",
               "-o", "degree", "--neigh-ordering", "degree"])
    assert rc == 0
    assert "total_4_clique = 1" in macro.read_text()
    assert len(micro.read_text().strip().splitlines()) == 7
    import pandas as pd

    prdf = pd.read_parquet(pr)
    assert abs(prdf["pagerank"].sum() - 1.0) < 1e-9
    assert sorted(prdf["v"]) == [1, 2, 3, 4]


def _wf_reference(k, o, v):
    import pandas as pd

    df = pd.DataFrame({"k": k, "o": o, "v": v}).sort_values(
        ["k", "o"], ignore_index=True)
    g = df.groupby("k")["v"]
    return pd.DataFrame({
        "k": df["k"], "o": df["o"], "v": df["v"],
        "row_number": g.cumcount() + 1,
        "cum_sum": np.round(g.cumsum(), 6),
        "lag_value": g.shift(1).fillna(0.0),
    })


def test_window_functions_straddling_keys_many_blocks():
    from pgd_ray.stages.windows import window_functions

    rng = np.random.default_rng(5)
    n = 400
    # few keys over many tiny blocks -> every key straddles boundaries
    k = np.sort(rng.integers(0, 5, n)).astype(np.int64)
    o = np.arange(n, dtype=np.int64)
    v = np.round(rng.random(n) * 100, 2)
    ds = rd.from_arrow(pa.table({"k": k, "o": o, "v": v})).repartition(37)
    out = window_functions(ds, "k", "o", "v").to_pandas()
    out = out.sort_values(["k", "o"], ignore_index=True)
    ref = _wf_reference(k, o, v)
    for c in ("row_number", "cum_sum", "lag_value"):
        assert np.allclose(out[c], ref[c], atol=1e-9), c
    assert (out["k"].to_numpy() == ref["k"].to_numpy()).all()


def test_window_functions_single_key_spanning_all_blocks():
    from pgd_ray.stages.windows import window_functions

    n = 100
    ds = rd.from_arrow(pa.table({
        "k": np.zeros(n, np.int64), "o": np.arange(n, dtype=np.int64),
        "v": np.ones(n),
    })).repartition(11)
    out = window_functions(ds, "k", "o", "v").to_pandas().sort_values(
        "o", ignore_index=True)
    assert (out["row_number"].to_numpy() == np.arange(1, n + 1)).all()
    assert np.allclose(out["cum_sum"], np.arange(1.0, n + 1))
    assert out["lag_value"].iloc[0] == 0.0
    assert np.allclose(out["lag_value"].iloc[1:], 1.0)


def test_window_functions_duplicates_and_empty():
    from pgd_ray.stages.windows import window_functions

    # all-identical (key, order) pairs: Ray's sort collapses them into
    # one output block, so the boundary-straddle guard stays silent and
    # the in-block sequential semantics apply
    dup = rd.from_arrow(pa.table({
        "k": np.zeros(64, np.int64), "o": np.zeros(64, np.int64),
        "v": np.ones(64),
    })).repartition(8)
    out = window_functions(dup, "k", "o", "v").to_pandas().sort_values(
        "row_number", ignore_index=True)
    assert (out["row_number"].to_numpy() == np.arange(1, 65)).all()
    assert np.allclose(out["cum_sum"], np.arange(1.0, 65.0))
    empty = rd.from_arrow(pa.table({
        "k": pa.array([], pa.int64()), "o": pa.array([], pa.int64()),
        "v": pa.array([], pa.float64())}))
    assert window_functions(empty, "k", "o", "v").count() == 0


def _roll_reference(k, o, v, w):
    import pandas as pd

    df = pd.DataFrame({"k": k, "o": o, "v": v}).sort_values(
        ["k", "o"], ignore_index=True)
    g = df.groupby("k")["v"].rolling(w, min_periods=1)
    return pd.DataFrame({
        "k": df["k"], "o": df["o"],
        "roll_sum": np.round(g.sum().to_numpy(), 6),
        "roll_cnt": g.count().to_numpy().astype(np.int64),
        "roll_mean": np.round(g.mean().to_numpy(), 6),
    })


def test_rolling_aggregate_straddles_blocks():
    from pgd_ray.stages.windows import rolling_aggregate

    rng = np.random.default_rng(9)
    n = 300
    k = np.sort(rng.integers(0, 4, n)).astype(np.int64)
    o = np.arange(n, dtype=np.int64)
    v = np.round(rng.random(n) * 50, 2)
    ds = rd.from_arrow(pa.table({"k": k, "o": o, "v": v})).repartition(29)
    out = rolling_aggregate(ds, "k", "o", "v", window=7).to_pandas()
    out = out.sort_values(["k", "o"], ignore_index=True)
    ref = _roll_reference(k, o, v, 7)
    for c in ("roll_sum", "roll_cnt", "roll_mean"):
        assert np.allclose(out[c], ref[c], atol=1e-6), c


def test_rolling_aggregate_window_one_and_long_key():
    from pgd_ray.stages.windows import rolling_aggregate

    n = 64
    ds = rd.from_arrow(pa.table({
        "k": np.zeros(n, np.int64), "o": np.arange(n, dtype=np.int64),
        "v": np.arange(n, dtype=np.float64)})).repartition(9)
    one = rolling_aggregate(ds, "k", "o", "v", window=1).to_pandas(
        ).sort_values("o", ignore_index=True)
    assert np.allclose(one["roll_sum"], np.arange(n))
    assert (one["roll_cnt"] == 1).all()
    # window longer than any block: carry must thread values across
    # several consecutive single-key blocks
    big = rolling_aggregate(ds, "k", "o", "v", window=30).to_pandas(
        ).sort_values("o", ignore_index=True)
    ref = _roll_reference(np.zeros(n, np.int64), np.arange(n),
                          np.arange(n, dtype=np.float64), 30)
    assert np.allclose(big["roll_sum"], ref["roll_sum"])
    assert (big["roll_cnt"].to_numpy() == ref["roll_cnt"].to_numpy()).all()


def _write_typed_events(tmp_path, uid, ts_us, etype, shards=8):
    import os

    import pandas as pd
    import pyarrow.parquet as pq

    d = tmp_path / "trans_in"
    d.mkdir(exist_ok=True)
    eid = np.arange(len(uid), dtype=np.int64)
    bounds = np.linspace(0, len(uid), shards + 1).astype(int)
    for i in range(shards):
        sl = slice(bounds[i], bounds[i + 1])
        t = pa.table({
            "event_id": eid[sl],
            "user_id": uid[sl].astype(np.int64),
            "ts": pd.to_datetime(ts_us[sl], unit="us"),
            "event_type": pa.array(list(etype[sl]), pa.string()),
        })
        pq.write_table(t, d / f"events_{i}.parquet")
    os.rename(d, tmp_path / "events.parquet_dir")
    os.makedirs(tmp_path / "sfdir", exist_ok=True)
    os.symlink(tmp_path / "events.parquet_dir",
               tmp_path / "sfdir" / "events.parquet")
    return str(tmp_path / "sfdir")


def test_transition_counts_matches_pandas(tmp_path):
    import pandas as pd

    from pgd_ray.stages.windows import transition_counts

    rng = np.random.default_rng(9)
    n = 400
    uid = rng.integers(0, 12, n)
    ts_us = rng.integers(0, 10**9, n)
    etype = rng.choice(np.array(["a", "b", "c", "d", "e"]), n)
    sf = _write_typed_events(tmp_path, uid, ts_us, etype, shards=8)

    got = transition_counts(sf).to_pandas().sort_values(
        ["type_from", "type_to"], ignore_index=True)

    df = pd.DataFrame({"user_id": uid, "ts": ts_us, "event_id": range(n),
                       "event_type": etype}).sort_values(
        ["user_id", "ts", "event_id"], ignore_index=True)
    m = df["user_id"].to_numpy()[1:] == df["user_id"].to_numpy()[:-1]
    ref = (
        pd.DataFrame({
            "type_from": df["event_type"].to_numpy()[:-1][m],
            "type_to": df["event_type"].to_numpy()[1:][m],
        })
        .groupby(["type_from", "type_to"]).size()
        .reset_index(name="n_trans")
        .sort_values(["type_from", "type_to"], ignore_index=True)
    )
    assert got["type_from"].tolist() == ref["type_from"].tolist()
    assert got["type_to"].tolist() == ref["type_to"].tolist()
    assert got["n_trans"].astype(int).tolist() == ref["n_trans"].tolist()


def test_trigram_counts_matches_pandas(tmp_path):
    import pandas as pd

    from pgd_ray.stages.windows import trigram_counts

    rng = np.random.default_rng(21)
    n = 400
    uid = rng.integers(0, 9, n)
    ts_us = rng.integers(0, 10**9, n)
    etype = rng.choice(np.array(["a", "b", "c"]), n)
    sf = _write_typed_events(tmp_path, uid, ts_us, etype, shards=8)

    got = trigram_counts(sf).to_pandas().sort_values(
        ["type_a", "type_b", "type_c"], ignore_index=True)

    df = pd.DataFrame({"user_id": uid, "ts": ts_us, "event_id": range(n),
                       "event_type": etype}).sort_values(
        ["user_id", "ts", "event_id"], ignore_index=True)
    u = df["user_id"].to_numpy()
    e = df["event_type"].to_numpy()
    m = (u[2:] == u[1:-1]) & (u[1:-1] == u[:-2])
    ref = (
        pd.DataFrame({"type_a": e[:-2][m], "type_b": e[1:-1][m],
                      "type_c": e[2:][m]})
        .groupby(["type_a", "type_b", "type_c"]).size()
        .reset_index(name="n_trigrams")
        .sort_values(["type_a", "type_b", "type_c"], ignore_index=True)
    )
    assert got[["type_a", "type_b", "type_c"]].values.tolist() == \
        ref[["type_a", "type_b", "type_c"]].values.tolist()
    assert got["n_trigrams"].astype(int).tolist() == ref["n_trigrams"].tolist()


def test_window_functions2_matches_pandas():
    import numpy as np
    import pandas as pd
    import ray.data

    from pgd_ray.stages.windows import window_functions2

    rng = np.random.default_rng(7)
    n = 500
    df = pd.DataFrame({
        "user_id": rng.integers(0, 40, n),
        "event_id": np.arange(n, dtype=np.int64),
        "value": np.round(rng.normal(size=n), 3),
    })
    # ensure at least one single-row key
    df.loc[n - 1, "user_id"] = 999
    ds = ray.data.from_pandas(df).repartition(8)
    out = (window_functions2(ds, "user_id", "event_id", "value")
           .to_pandas().sort_values(["user_id", "event_id"],
                                    ignore_index=True))
    ref = df.sort_values(["user_id", "event_id"], ignore_index=True)
    g = ref.groupby("user_id")
    ref["row_number"] = g.cumcount() + 1
    cnt = g["event_id"].transform("count")
    ref["percent_rank"] = np.where(
        cnt > 1, (ref["row_number"] - 1) / np.maximum(cnt - 1, 1), 0.0
    ).round(9)
    ref["first_value"] = g["value"].transform("first")
    ref["last_value"] = g["value"].transform("last")
    for c in ("row_number",):
        assert (out[c].to_numpy() == ref[c].to_numpy()).all()
    for c in ("percent_rank", "first_value", "last_value"):
        assert np.allclose(out[c], ref[c], atol=1e-9), c
    # single-row key: pr 0, first == last == its value
    one = out[out["user_id"] == 999]
    assert len(one) == 1
    assert one["percent_rank"].iloc[0] == 0.0
    assert one["first_value"].iloc[0] == one["last_value"].iloc[0]


def test_peak_concurrency_matches_brute():
    import numpy as np
    import pyarrow.parquet as pq

    from pgd_ray.stages.windows import peak_concurrency, sessionize

    SF = "/root/testdata/sf0.001"
    sess = sessionize(SF).to_pandas()
    # brute sweep
    pts = []
    for s, e in zip(sess["start_ts"], sess["end_ts"]):
        pts.append((int(s), 0, 1))
        pts.append((int(e) + 1, 1, -1))
    pts.sort()
    run = peak = 0
    peak_at = None
    for t, _, d in pts:
        run += d
        if run > peak:
            peak, peak_at = run, t
    out = peak_concurrency(SF)
    assert int(out["n_sessions"].iloc[0]) == len(sess)
    assert int(out["peak"].iloc[0]) == peak
    assert int(out["peak_at_us"].iloc[0]) == peak_at


def test_lateness_profile_matches_brute():
    import numpy as np
    import pyarrow.parquet as pq

    from pgd_ray.stages.windows import lateness_profile

    SF = "/root/testdata/sf0.001"
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "ts"]).to_pandas()
    ev = ev.sort_values("event_id", ignore_index=True)
    tu = ev["ts"].astype("datetime64[us]").astype(np.int64).to_numpy()
    buckets = {}
    mx = None
    for t in tu:
        if mx is None or mx - t <= 0:
            b = -1
        else:
            sec = max((mx - t) // 1_000_000, 1)
            b = int(np.floor(np.log2(sec)))
        buckets[b] = buckets.get(b, 0) + 1
        mx = t if mx is None else max(mx, t)
    out = lateness_profile(SF)
    assert dict(zip(out["bucket"], out["n"])) == buckets
    assert abs(out["cum_frac"].iloc[-1] - 1.0) < 1e-9


def test_peak_concurrency_exclusive_end_tie_order(tmp_path):
    """Regression (ADVICE r3): a session starting exactly at a prior
    session's end+1 µs must NOT be transiently counted together with
    it — −1 deltas process before +1 at equal t.  Two users whose
    sessions abut this way have true peak 1, not 2."""
    import numpy as np
    import pandas as pd
    import pyarrow as pa
    import pyarrow.parquet as pq

    from pgd_ray.stages.windows import peak_concurrency

    gap = 1_000_000  # 1 s session gap
    # user 1: events at t=0 and t=10 µs → session [0, 10]
    # user 2: single event at t=11 µs → session [11, 11] = end+1 of u1
    ts = pd.to_datetime([0, 10, 11], unit="us")
    df = pd.DataFrame({
        "event_id": np.arange(3, dtype=np.int64),
        "ts": ts,
        "user_id": np.array([1, 1, 2], dtype=np.int64),
        "event_type": ["a"] * 3,
        "value": [0.0] * 3,
        "props": ["{}"] * 3,
    })
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   str(tmp_path / "events.parquet"))
    out = peak_concurrency(str(tmp_path), gap_us=gap)
    assert int(out["n_sessions"][0]) == 2
    assert int(out["peak"][0]) == 1
    assert int(out["peak_at_us"][0]) == 0
