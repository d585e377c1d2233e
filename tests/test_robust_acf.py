"""MAD outlier screen and daily-count ACF vs hand-computed references."""
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from pgd_ray.stages.robust import mad_outliers
from pgd_ray.stages.windows import acf_daily

SF = "/root/testdata/sf0.001"


def test_mad_outliers_known_values():
    # group A: 1..9 plus a wild 1000 -> med rule rank floor(.5*9)=4 ->
    # sorted[4]=5; absdev sorted: [0,1,1,2,2,3,3,4,4,995] -> mad=2
    vals = list(range(1, 10)) + [1000]
    ds = ray.data.from_arrow(pa.table({
        "g": pa.array(["A"] * 10 + ["B"] * 3),
        "x": pa.array([float(v) for v in vals] + [7.0, 7.0, 7.0]),
    }))
    out = mad_outliers(ds, "g", "x", thresh=3.0)
    a = out[out.g == "A"].iloc[0]
    assert a["med"] == 5.0 and a["mad"] == 2.0
    # outliers: |x-5| > 6 -> {1000} only (|1-5|=4, |9-5|=4)
    assert a["n"] == 10 and a["n_outliers"] == 1
    b = out[out.g == "B"].iloc[0]
    assert b["med"] == 7.0 and b["mad"] == 0.0 and b["n_outliers"] == 0


def test_acf_daily_matches_pandas(ray_session=None):
    out = acf_daily(SF, max_lag=7)
    ev = pd.read_parquet(f"{SF}/events.parquet", columns=["ts"])
    day = ev["ts"].astype("datetime64[us]").astype(np.int64) // 86_400_000_000
    x = day.value_counts().sort_index().to_numpy(np.float64)
    c = x - x.mean()
    den = (c * c).sum()
    for k in range(1, 8):
        ref = (c[:-k] * c[k:]).sum() / den
        got = float(out.loc[out.lag == k, "acf"].iloc[0])
        assert abs(got - ref) < 1e-9
    assert len(out) == 7
