import numpy as np
import pyarrow as pa
import pytest
import ray.data as rd

from pgd_ray.stages.retention import cohort_retention

WEEK = 604_800_000_000


def _events(uids, weeks):
    ts = (np.asarray(weeks, np.int64) * WEEK + 12345).astype("datetime64[us]")
    return rd.from_arrow(pa.table({
        "user_id": pa.array(uids, pa.int64()),
        "ts": pa.array(ts),
    }))


def test_cohort_retention_hand_matrix():
    # u1: weeks 0,1,3   u2: weeks 0,0,1 (dup)   u3: week 1 only
    ev = _events(
        [1, 1, 1, 2, 2, 2, 3],
        [0, 1, 3, 0, 0, 1, 1],
    ).repartition(4)
    out = cohort_retention(ev).to_pandas().sort_values(
        ["cohort_week", "week_offset"], ignore_index=True)
    got = {(r.cohort_week, r.week_offset): r.users
           for r in out.itertuples(index=False)}
    assert got == {(0, 0): 2, (0, 1): 2, (0, 3): 1, (1, 0): 1}


def test_cohort_retention_dedups_within_week_and_week_size():
    # one user active 5 times in one week → a single (0, 0) cell of 1
    ev = _events([7] * 5, [0] * 5)
    out = cohort_retention(ev).to_pandas()
    assert len(out) == 1
    assert out.iloc[0]["users"] == 1
    # custom week size: two events 10 us apart with week_us=4 → offsets 0 and 2
    ev2 = rd.from_arrow(pa.table({
        "user_id": pa.array([1, 1], pa.int64()),
        "ts": pa.array(np.array([0, 10], np.int64).astype("datetime64[us]")),
    }))
    out2 = cohort_retention(ev2, week_us=4).to_pandas().sort_values(
        "week_offset", ignore_index=True)
    assert list(out2["week_offset"]) == [0, 2]
    with pytest.raises(ValueError):
        cohort_retention(ev2, week_us=0)
