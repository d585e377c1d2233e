import numpy as np
import pandas as pd
import ray.data

from pgd_ray.stages.funnel import funnel_counts


def _ev(rows):
    df = pd.DataFrame(rows, columns=["user_id", "event_type", "ts"])
    df["ts"] = pd.to_datetime(df["ts"], unit="s")
    df["user_id"] = df["user_id"].astype(np.int64)
    return ray.data.from_pandas(df)


def test_funnel_strict_ordering():
    ds = _ev([
        # user 1 completes A->B->C in order
        (1, "A", 10), (1, "B", 20), (1, "C", 30),
        # user 2 has B before A only -> stops after step 1
        (2, "B", 5), (2, "A", 10),
        # user 3: B at the SAME time as A -> strict > excludes it
        (3, "A", 10), (3, "B", 10),
        # user 4: A->B but C before B -> stops at step 2
        (4, "A", 1), (4, "C", 2), (4, "B", 3),
        # user 5: never does A
        (5, "B", 1), (5, "C", 2),
    ])
    out = funnel_counts(ds, ["A", "B", "C"])
    assert list(out["step"]) == [1, 2, 3]
    assert list(out["event_type"]) == ["A", "B", "C"]
    assert list(out["users"]) == [4, 2, 1]


def test_funnel_first_touch_times():
    # user does A twice; funnel must anchor on the FIRST A: B between
    # the two As still counts
    ds = _ev([(1, "A", 10), (1, "A", 100), (1, "B", 50)])
    out = funnel_counts(ds, ["A", "B"])
    assert list(out["users"]) == [1, 1]


def test_funnel_empty_steps_and_no_match():
    ds = _ev([(1, "A", 1)])
    assert len(funnel_counts(ds, [])) == 0
    out = funnel_counts(ds, ["Z", "A"])
    assert list(out["users"]) == [0, 0]
