import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest


def _write_events(tmp_path, users, types):
    """Deterministic small bipartite incidence via an events parquet."""
    rng = np.random.RandomState(7)
    rows = []
    eid = 0
    for u in range(users):
        for t in range(types):
            if rng.rand() < 0.5:
                # duplicate some incidences: pairs must dedup them
                for _ in range(1 + (rng.rand() < 0.3)):
                    rows.append((eid, u, f"t{t}"))
                    eid += 1
    df = pd.DataFrame(rows, columns=["event_id", "user_id", "event_type"])
    df["ts"] = pd.to_datetime(df["event_id"], unit="s")
    df["value"] = 1.0
    df["props"] = ""
    pq.write_table(pa.Table.from_pandas(df, preserve_index=False),
                   f"{tmp_path}/events.parquet")
    B = np.zeros((users, types))
    for _, r in df.iterrows():
        B[r["user_id"], int(r["event_type"][1:])] = 1.0
    return B


def _hits_ref(B, iters):
    T = B.shape[1]
    M = B.T @ B
    a = np.full(T, 1.0 / np.sqrt(T))
    for _ in range(iters):
        a = M @ a
        a = a / np.linalg.norm(a)
    h = B @ a
    return a, h / np.linalg.norm(h)


def test_hits_matches_dense(tmp_path, ray_session):
    from pgd_ray.graph.bipartite import hits_scores

    B = _write_events(tmp_path, users=12, types=4)
    a_ref, h_ref = _hits_ref(B, 16)
    auth, hubs = hits_scores(str(tmp_path), iters=16)
    assert list(auth["event_type"]) == [f"t{i}" for i in range(4)]
    assert np.allclose(auth["authority"].to_numpy(), a_ref, atol=1e-8)
    got_h = hubs.set_index("user_id")["hub"]
    # users with no incidence never appear
    present = np.where(B.sum(1) > 0)[0]
    assert sorted(got_h.index) == sorted(present.tolist())
    assert np.allclose(got_h.loc[present].to_numpy(), h_ref[present],
                       atol=1e-8)


def test_butterflies_match_brute(tmp_path, ray_session):
    from pgd_ray.graph.bipartite import butterflies_per_type

    B = _write_events(tmp_path, users=15, types=5)
    got = butterflies_per_type(str(tmp_path)).set_index("event_type")
    M = (B.T @ B).astype(np.int64)
    T = B.shape[1]
    want = {}
    for i in range(T):
        for j in range(i + 1, T):
            c = M[i, j]
            if c >= 2:
                for t in (i, j):
                    want[f"t{t}"] = want.get(f"t{t}", 0) + c * (c - 1) // 2
    assert got["butterflies"].to_dict() == want
