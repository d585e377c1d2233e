"""JL norm ratios and per-user type runs vs references."""
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from pgd_ray.stages.vector_stats import jl_norm_ratios
from pgd_ray.stages.windows import type_runs

SF = "/root/testdata/sf0.001"


def test_jl_ratio_concentrates_and_is_deterministic():
    rng = np.random.default_rng(11)
    m = rng.normal(size=(200, 64))
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(200), pa.int64()),
        "embedding": pa.array(list(m.astype(np.float32))),
    })).materialize()
    r1 = jl_norm_ratios(ds, p=16).to_pandas().sort_values(
        "vec_id", ignore_index=True)
    r2 = jl_norm_ratios(ds, p=16).to_pandas().sort_values(
        "vec_id", ignore_index=True)
    assert r1.equals(r2)  # deterministic matrix
    x = r1["norm_ratio"].to_numpy()
    # E[ratio] = 1; at p=16 the spread is wide but centered
    assert 0.8 < x.mean() < 1.2
    assert (x > 0).all()


def test_type_runs_against_pandas_lag():
    out = type_runs(SF)
    ev = pd.read_parquet(f"{SF}/events.parquet",
                         columns=["event_id", "ts", "user_id", "event_type"])
    ev = ev.sort_values(["user_id", "ts", "event_id"], kind="stable")
    ref = []
    for uid, g in ev.groupby("user_id"):
        et = g["event_type"].to_numpy()
        runs = 1 + int((et[1:] != et[:-1]).sum())
        ref.append((uid, len(g), runs, round(len(g) / runs, 6)))
    refdf = pd.DataFrame(ref, columns=["user_id", "n_events", "n_runs",
                                       "avg_run_len"]).sort_values(
        "user_id", ignore_index=True)
    assert out.equals(refdf.astype({"user_id": np.int64,
                                    "n_events": np.int64,
                                    "n_runs": np.int64}))
