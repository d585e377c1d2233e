"""Holt daily smoothing vs a hand recursion on the real sf0.001 day
counts."""

import numpy as np
import pandas as pd
import pyarrow.parquet as pq

from pgd_ray.stages.windows import holt_daily

SF = "/root/testdata/sf0.001"


def test_holt_matches_hand_recursion():
    ev = pq.read_table(f"{SF}/events.parquet", columns=["ts"]).to_pandas()
    day = (ev["ts"].astype("datetime64[us]").astype(np.int64)
           // 86_400_000_000)
    daily = day.value_counts().sort_index()
    x = daily.to_numpy(np.float64)
    a, bta = 0.5, 0.3
    l, b = x[0], 0.0
    lv, tr, ft = [l], [b], [x[0]]
    for xi in x[1:]:
        f = l + b
        l2 = a * xi + (1.0 - a) * (l + b)
        b = bta * (l2 - l) + (1.0 - bta) * b
        l = l2
        lv.append(l); tr.append(b); ft.append(f)

    out = holt_daily(SF, alpha=0.5, beta=0.3)
    assert (out["day"].to_numpy() == daily.index.to_numpy()).all()
    assert (out["n"].to_numpy() == daily.to_numpy()).all()
    assert np.allclose(out["level"], np.round(lv, 6), atol=1e-9)
    assert np.allclose(out["trend"], np.round(tr, 6), atol=1e-9)
    assert np.allclose(out["fitted"], np.round(ft, 6), atol=1e-9)
    # one-step forecast contract: fitted_t = level_{t-1} + trend_{t-1}
    recon = out["level"].to_numpy()[:-1] + out["trend"].to_numpy()[:-1]
    assert np.allclose(out["fitted"].to_numpy()[1:], recon, atol=1e-5)


def test_ccf_matches_brute_and_symmetry():
    from pgd_ray.stages.windows import ccf_daily
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "event_type"]).to_pandas()
    day = (ev["ts"].astype("datetime64[us]").astype(np.int64)
           // 86_400_000_000)
    ev = ev.assign(day=day)
    ev = ev[ev["event_type"].isin(["view", "purchase"])]
    piv = ev.pivot_table(index="day", columns="event_type",
                         values="ts", aggfunc="count").fillna(0)
    x = piv["view"].to_numpy(float)
    y = piv["purchase"].to_numpy(float)
    cx, cy = x - x.mean(), y - y.mean()
    den = np.sqrt((cx ** 2).sum() * (cy ** 2).sum())
    out = ccf_daily(SF).set_index("lag")["ccf"]
    n = len(x)
    for k in [-3, 0, 2, 7]:
        if k >= 0:
            num = (cx[:n - k] * cy[k:]).sum()
        else:
            num = (cx[-k:] * cy[:n + k]).sum()
        assert abs(out[k] - round(num / den, 9)) < 1e-9
    # symmetry: ccf_{x,y}(k) == ccf_{y,x}(-k)
    rev = ccf_daily(SF, type_x="purchase", type_y="view").set_index("lag")["ccf"]
    for k in [-5, -1, 0, 4]:
        assert abs(out[k] - rev[-k]) < 1e-9
    assert (out.abs() <= 1.0 + 1e-9).all()


def test_type_daily_corr_matches_pandas():
    from pgd_ray.stages.windows import type_daily_corr

    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["ts", "event_type"]).to_pandas()
    ev["day"] = (ev["ts"].astype("datetime64[us]").astype(np.int64)
                 // 86_400_000_000)
    piv = (ev.groupby(["day", "event_type"]).size().unstack(fill_value=0)
           .sort_index())
    out = type_daily_corr(SF).set_index(["type_a", "type_b"])
    types = sorted(piv.columns)
    for i, a in enumerate(types):
        for b in types[i + 1:]:
            ref = piv[a].astype(float).corr(piv[b].astype(float))
            assert abs(out.loc[(a, b), "r"] - ref) < 1e-9
    assert out["r"].between(-1, 1).all()
