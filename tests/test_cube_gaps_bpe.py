import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from tests.test_windows_output import _write_typed_events


def test_inter_event_gaps_matches_pandas(tmp_path):
    from pgd_ray.stages.windows import inter_event_gaps

    rng = np.random.default_rng(21)
    n = 500
    uid = rng.integers(0, 10, n)
    ts_us = rng.integers(0, 10**9, n)
    etype = rng.choice(np.array(["a", "b", "c"]), n)
    sf = _write_typed_events(tmp_path, uid, ts_us, etype, shards=8)

    got = inter_event_gaps(sf)

    df = pd.DataFrame({"user_id": uid, "ts": ts_us, "event_id": range(n),
                       "event_type": etype}).sort_values(
        ["user_id", "ts", "event_id"], ignore_index=True)
    m = df["user_id"].to_numpy()[1:] == df["user_id"].to_numpy()[:-1]
    g = (df["ts"].to_numpy()[1:] - df["ts"].to_numpy()[:-1])[m]
    ref = (
        pd.DataFrame({"event_type": df["event_type"].to_numpy()[1:][m],
                      "g": g})
        .groupby("event_type")["g"]
        .agg(n_gaps="size", mean_gap_us="mean", max_gap_us="max")
        .reset_index()
    )
    assert got["event_type"].tolist() == ref["event_type"].tolist()
    assert got["n_gaps"].tolist() == ref["n_gaps"].tolist()
    assert got["max_gap_us"].tolist() == ref["max_gap_us"].tolist()
    assert np.allclose(got["mean_gap_us"], ref["mean_gap_us"], atol=1e-6)


def _write_events_dir(tmp_path, df):
    import os

    os.makedirs(tmp_path / "sfdir", exist_ok=True)
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   tmp_path / "sfdir" / "events.parquet")
    return str(tmp_path / "sfdir")


def test_rollup_and_pivot_match_pandas(tmp_path):
    from pgd_ray.stages.cube import pivot_counts, rollup_counts

    rng = np.random.default_rng(5)
    n = 300
    df = pd.DataFrame({
        "event_id": np.arange(n),
        "user_id": rng.integers(0, 8, n),
        "event_type": rng.choice(np.array(["x", "y", "z"]), n),
        "ts": pd.to_datetime(rng.integers(0, 5 * 86_400_000_000, n),
                             unit="us"),
        "value": rng.random(n),
    })
    sf = _write_events_dir(tmp_path, df)

    roll = rollup_counts(sf)
    day = (df["ts"].astype("int64") // 1000 // 86_400_000_000).to_numpy()
    base = df.assign(day=day).groupby(["event_type", "day"]).agg(
        n=("value", "size"), value_sum=("value", "sum")).reset_index()
    assert len(roll) == len(base) + df["event_type"].nunique() + 1
    tot = roll[roll["event_type"] == "(all)"]
    assert tot["n"].iloc[0] == n
    assert abs(tot["value_sum"].iloc[0] - df["value"].sum()) < 1e-6
    sub = roll[(roll["event_type"] == "x") & (roll["day"] == -1)]
    assert sub["n"].iloc[0] == (df["event_type"] == "x").sum()

    piv = pivot_counts(sf)
    ref = pd.crosstab(df["user_id"], df["event_type"])
    for t in ["x", "y", "z"]:
        got = piv.set_index("user_id")[f"n_{t}"]
        assert got.equals(ref[t].astype(np.int64).rename(f"n_{t}"))
    assert (piv[["n_x", "n_y", "n_z"]].sum(axis=1) == piv["n_total"]).all()


def test_byte_pair_counts_matches_brute(tmp_path):
    import os

    from pgd_ray.text.bpe import byte_pair_counts

    texts = ["abcabcab", "the cat sat", "aa", "z"]
    os.makedirs(tmp_path / "sfdir", exist_ok=True)
    pq.write_table(
        pa.table({"doc_id": list(range(len(texts))), "text": texts}),
        tmp_path / "sfdir" / "documents.parquet")
    got = byte_pair_counts(str(tmp_path / "sfdir"), top=10)
    from collections import Counter
    c = Counter()
    for t in texts:
        c.update(t[i:i + 2] for i in range(len(t) - 1))
    ref = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert list(zip(got["pair"], got["n"])) == ref


def test_byte_pair_counts_rejects_non_ascii(tmp_path):
    import os

    from pgd_ray.text.bpe import byte_pair_counts

    os.makedirs(tmp_path / "sfdir", exist_ok=True)
    pq.write_table(pa.table({"text": ["café"]}),
                   tmp_path / "sfdir" / "documents.parquet")
    with pytest.raises(Exception):
        byte_pair_counts(str(tmp_path / "sfdir"))


def test_ewma_daily_matches_recurrence(tmp_path):
    from pgd_ray.stages.windows import ewma_daily

    rng = np.random.default_rng(31)
    n = 250
    ts_us = rng.integers(0, 10 * 86_400_000_000, n)
    ev = pd.DataFrame({"event_id": np.arange(n),
                       "ts": pd.to_datetime(ts_us, unit="us"),
                       "user_id": np.zeros(n, np.int64),
                       "event_type": rng.choice(np.array(["a", "b"]), n),
                       "value": 1.0})
    sf = _write_events_dir(tmp_path, ev)
    got = ewma_daily(sf, alpha=0.3)
    for t in ["a", "b"]:
        g = got[got["event_type"] == t].sort_values("day")
        x = g["n"].to_numpy(np.float64)
        e = x[0]
        assert abs(g["ewma"].iloc[0] - e) < 1e-9
        for i in range(1, len(x)):
            e = 0.3 * x[i] + 0.7 * e
            assert abs(g["ewma"].iloc[i] - e) < 1e-6
