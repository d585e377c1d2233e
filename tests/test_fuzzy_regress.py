import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def test_levenshtein_matches_reference():
    from pgd_ray.stages.fuzzy import levenshtein

    cases = [("", "", 0), ("a", "", 1), ("", "abc", 3),
             ("kitten", "sitting", 3), ("flaw", "lawn", 2),
             ("cold widget", "bold widget", 1),
             ("abc", "abc", 0), ("abc", "acb", 2)]
    for a, b, d in cases:
        assert levenshtein(a, b) == d, (a, b)
        assert levenshtein(b, a) == d


def _sfdir(tmp_path, **tables):
    import os

    os.makedirs(tmp_path / "sfdir", exist_ok=True)
    for name, df in tables.items():
        pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                       tmp_path / "sfdir" / f"{name}.parquet")
    return str(tmp_path / "sfdir")


def test_fuzzy_name_pairs_blocked_and_verified(tmp_path, ray_session):
    from pgd_ray.stages.fuzzy import fuzzy_name_pairs

    names = ["red bolt", "red bolt", "bed bolt", "red colt",
             "green widget", "greet widget", "blue rod"]
    part = pd.DataFrame({"p_partkey": range(len(names)), "p_name": names})
    sf = _sfdir(tmp_path, part=part)
    got = fuzzy_name_pairs(sf, max_dist=2)
    # NOTE "bed bolt" vs "red colt" (dist 2) shares NO token — the
    # blocking contract intentionally excludes it
    want = {("bed bolt", "red bolt", 1), ("red bolt", "red colt", 1),
            ("green widget", "greet widget", 1)}
    assert {(r.name_a, r.name_b, r.dist) for r in got.itertuples()} == want


def test_event_islands_matches_pandas(tmp_path):
    from pgd_ray.stages.windows import event_islands

    rng = np.random.default_rng(17)
    n = 400
    eid = rng.choice(1200, size=n, replace=False)
    eid.sort()
    uid = rng.integers(0, 9, n)
    ev = pd.DataFrame({"event_id": eid.astype(np.int64),
                       "user_id": uid.astype(np.int64),
                       "ts": pd.to_datetime(eid, unit="s"),
                       "event_type": "x", "value": 1.0})
    sf = _sfdir(tmp_path, events=ev)
    got = event_islands(sf).set_index("user_id")

    df = ev.sort_values(["user_id", "event_id"])
    grp = df["event_id"] - df.groupby("user_id").cumcount()
    isl = df.assign(g=grp).groupby(["user_id", "g"]).size()
    ref = isl.groupby("user_id").agg(["size", "max"])
    assert got["n_islands"].to_dict() == ref["size"].to_dict()
    assert got["max_island"].to_dict() == ref["max"].to_dict()


def test_grouped_ols_matches_polyfit(tmp_path):
    from pgd_ray.stages.regress import grouped_ols

    rng = np.random.default_rng(23)
    n = 300
    ts_us = np.sort(rng.integers(0, 40 * 86_400_000_000, n))
    et = rng.choice(np.array(["a", "b"]), n)
    x_days = (ts_us - ts_us.min()) / 86_400_000_000.0
    y = 0.5 * x_days + rng.normal(0, 0.1, n)
    ev = pd.DataFrame({"event_id": np.arange(n),
                       "ts": pd.to_datetime(ts_us, unit="us"),
                       "user_id": np.zeros(n, np.int64),
                       "event_type": et, "value": y})
    sf = _sfdir(tmp_path, events=ev)
    got = grouped_ols(sf).set_index("event_type")
    for t in ["a", "b"]:
        m = et == t
        sl, ic = np.polyfit(x_days[m], y[m], 1)
        assert abs(got.loc[t, "slope"] - sl) < 1e-5
        assert abs(got.loc[t, "intercept"] - ic) < 1e-5
        assert int(got.loc[t, "n"]) == int(m.sum())


def test_anova_matches_scipy_formula():
    import numpy as np
    import pyarrow.parquet as pq

    from pgd_ray.stages.regress import anova_value_by_type

    SF = "/root/testdata/sf0.001"
    ev = pq.read_table(f"{SF}/events.parquet",
                       columns=["event_type", "value"]).to_pandas()
    groups = [g["value"].to_numpy(float)
              for _, g in ev.groupby("event_type")]
    k = len(groups)
    n = sum(len(g) for g in groups)
    grand = np.concatenate(groups).mean()
    ssb = sum(len(g) * (g.mean() - grand) ** 2 for g in groups)
    ssw = sum(((g - g.mean()) ** 2).sum() for g in groups)
    f = (ssb / (k - 1)) / (ssw / (n - k))
    out = anova_value_by_type(SF)
    assert int(out["k"].iloc[0]) == k and int(out["n"].iloc[0]) == n
    assert abs(out["f_stat"].iloc[0] - f) < 1e-4 * max(1, abs(f))
    assert out["f_stat"].iloc[0] >= 0
