"""Kaplan–Meier churn curve vs a brute product-limit reference."""

import numpy as np
import pyarrow.parquet as pq

from pgd_ray.stages.retention import kaplan_meier

SF = "/root/testdata/sf0.001"


def test_km_matches_brute():
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["user_id", "ts"]).to_pandas()
    tu = ev["ts"].astype("datetime64[us]").astype(np.int64)
    ev = ev.assign(tu=tu)
    g = ev.groupby("user_id")["tu"].agg(["min", "max"])
    end = int(tu.max())
    day = 86_400_000_000
    dur = ((g["max"] - g["min"]) // day).to_numpy(np.int64)
    event = ((end - g["max"]) > 7 * day).to_numpy()

    out = kaplan_meier(SF, churn_days=7)
    # brute product-limit
    s = 1.0
    total = len(dur)
    for i, t in enumerate(out["dur_days"]):
        at_risk = int((dur >= t).sum())
        d = int(((dur == t) & event).sum())
        c = int(((dur == t) & ~event).sum())
        assert int(out["n_risk"].iloc[i]) == at_risk
        assert int(out["n_events"].iloc[i]) == d
        assert int(out["n_censored"].iloc[i]) == c
        s = s * (1.0 - d / at_risk)
        assert abs(out["survival"].iloc[i] - round(s, 9)) < 1e-9
    # survival is monotone nonincreasing in [0, 1]
    sv = out["survival"].to_numpy()
    assert (np.diff(sv) <= 1e-12).all()
    assert sv[0] <= 1.0 and sv[-1] >= 0.0
    # risk-set conservation: first row's risk set is everyone
    assert int(out["n_risk"].iloc[0]) == total
    assert int((out["n_events"] + out["n_censored"]).sum()) == total
