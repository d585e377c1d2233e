"""Drift monitors: PSI + exact two-sample KS vs brute-force pandas
references on the real sf0.001 events table."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from pgd_ray.stages.drift import ks_value, psi_value

SF = "/root/testdata/sf0.001"


def _halves():
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "value"]).to_pandas()
    tu = ev["ts"].astype("datetime64[us]").astype(np.int64)
    mid = int(tu.min()) + (int(tu.max()) - int(tu.min())) // 2
    v = ev["value"].to_numpy()
    ok = ~np.isnan(v)
    return v[ok & (tu < mid).to_numpy()], v[ok & (tu >= mid).to_numpy()]


def test_psi_matches_brute():
    a, b = _halves()
    allv = np.concatenate([a, b])
    lo, hi = allv.min(), allv.max()
    w = (hi - lo) / 10.0
    bins_a = np.minimum(np.floor((a - lo) / w).astype(int), 9)
    bins_b = np.minimum(np.floor((b - lo) / w).astype(int), 9)
    c0 = np.bincount(bins_a, minlength=10)
    c1 = np.bincount(bins_b, minlength=10)
    p0 = (c0 + 1.0) / (len(a) + 10.0)
    p1 = (c1 + 1.0) / (len(b) + 10.0)
    expect = float(((p0 - p1) * np.log(p0 / p1)).sum())

    out = psi_value(SF, nbins=10)
    assert len(out) == 10
    assert (out["n_first"].to_numpy() == c0).all()
    assert (out["n_second"].to_numpy() == c1).all()
    assert abs(float(out["psi"].iloc[0]) - expect) < 1e-9
    # psi equals the sum of per-bin contribs, and is >= 0 up to fp noise
    assert abs(float(out["contrib"].sum()) - float(out["psi"].iloc[0])) < 1e-6
    assert float(out["psi"].iloc[0]) >= -1e-12


def test_ks_matches_scipy_style_brute():
    a, b = _halves()
    # brute: evaluate |F1 - F2| at every distinct pooled value
    vals = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(np.sort(a), vals, side="right") / len(a)
    f2 = np.searchsorted(np.sort(b), vals, side="right") / len(b)
    diff = np.abs(f1 - f2)
    d = diff.max()
    at = vals[np.argmax(diff)]  # first occurrence = smallest value

    out = ks_value(SF)
    assert len(out) == 1
    assert abs(float(out["d_stat"].iloc[0]) - d) < 1e-9
    assert abs(float(out["at_value"].iloc[0]) - at) < 1e-12
    assert int(out["n_first"].iloc[0]) == len(a)
    assert int(out["n_second"].iloc[0]) == len(b)


def test_ks_identical_distribution_is_zero_on_self_split():
    # sanity bound: D in [0, 1]
    out = ks_value(SF)
    assert 0.0 <= float(out["d_stat"].iloc[0]) <= 1.0


def test_user_burstiness_matches_brute():
    import pandas as pd

    from pgd_ray.stages.windows import user_burstiness

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_id", "ts", "user_id"]).to_pandas()
    ev["tu"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    ev = ev.sort_values(["user_id", "tu", "event_id"], kind="stable")
    out = user_burstiness(SF).set_index("user_id")
    for uid, g in ev.groupby("user_id"):
        gs = np.diff(g["tu"].to_numpy()) / 1e6
        if len(gs) < 2:
            assert uid not in out.index
            continue
        mu = gs.mean()
        sig = gs.std()  # population
        b = (sig - mu) / (sig + mu)
        r = out.loc[uid]
        assert int(r["n_gaps"]) == len(gs)
        assert abs(r["mean_gap_s"] - round(mu, 6)) < 1e-5
        assert abs(r["burstiness"] - b) < 1e-5
    # bounds
    assert out["burstiness"].between(-1, 1).all()


def test_w1_matches_scipy_style_brute():
    from pgd_ray.stages.drift import w1_value

    a, b = _halves()
    # brute: integral of |F1-F2| over the pooled support
    vals = np.unique(np.concatenate([a, b]))
    f1 = np.searchsorted(np.sort(a), vals, side="right") / len(a)
    f2 = np.searchsorted(np.sort(b), vals, side="right") / len(b)
    w1 = float((np.abs(f1 - f2)[:-1] * np.diff(vals)).sum())

    out = w1_value(SF)
    assert abs(float(out["w1"].iloc[0]) - w1) < 1e-8
    assert int(out["n_first"].iloc[0]) == len(a)
    assert int(out["n_second"].iloc[0]) == len(b)
    # W1 >= 0 and bounded by the support width
    assert 0 <= out["w1"].iloc[0] <= vals[-1] - vals[0]
