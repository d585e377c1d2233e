import math

import numpy as np
import pyarrow as pa
import ray.data as rd

SF = "/root/testdata/sf0.001"


def test_lexical_diversity_reference():
    from pgd_ray.text.entropy import lexical_diversity

    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array([1, 2, 3], pa.int64()),
        "text": pa.array(["a b a b", "x x x x", ""], pa.string()),
    }))
    out = {r["doc_id"]: r for r in lexical_diversity(docs).take_all()}
    assert out[1]["n_tokens"] == 4 and out[1]["n_types"] == 2
    assert abs(out[1]["entropy"] - math.log(2)) < 1e-12
    assert abs(out[1]["simpson"] - 0.5) < 1e-12
    assert out[1]["ttr"] == 0.5
    assert out[2]["entropy"] == 0.0 and out[2]["simpson"] == 1.0
    assert out[3]["n_tokens"] == 0 and out[3]["entropy"] == 0.0
    assert out[3]["ttr"] == 0.0


def test_user_activity_features_vs_pandas():
    import pandas as pd
    import pyarrow.parquet as pq

    from pgd_ray.stages.features import user_activity_features

    got = user_activity_features(SF).to_pandas().sort_values(
        "user_id", ignore_index=True)
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    ref = ev.groupby("user_id").agg(
        n_events=("event_id", "size"),
        n_types=("event_type", "nunique"),
        first_us=("ts_us", "min"),
        last_us=("ts_us", "max"),
        total_value=("value", "sum"),
        mean_value=("value", "mean"),
    ).reset_index().sort_values("user_id", ignore_index=True)
    assert got["user_id"].tolist() == ref["user_id"].tolist()
    for c in ("n_events", "n_types", "first_us", "last_us"):
        assert got[c].astype(np.int64).tolist() == ref[c].tolist(), c
    assert np.allclose(got["total_value"], ref["total_value"])
    assert np.allclose(got["mean_value"], ref["mean_value"])
    assert (got["span_us"] == got["last_us"] - got["first_us"]).all()
