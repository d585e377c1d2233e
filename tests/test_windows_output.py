import json

import numpy as np
import pyarrow as pa
import ray.data as rd

from pgd_ray.stages.windows import sessionize, tumbling_counts

SF = "/root/testdata/sf0.001"


def test_sessionize_matches_pandas_reference():
    import pandas as pd
    import pyarrow.parquet as pq

    ours = sessionize(SF)
    ev = pq.read_table(f"{SF}/events.parquet").to_pandas()
    ev["ts_us"] = ev["ts"].astype("datetime64[us]").astype(np.int64)
    ev = ev.sort_values(["user_id", "ts_us", "event_id"], kind="stable")
    rows = []
    for uid, g in ev.groupby("user_id"):
        ts = g["ts_us"].to_numpy()
        new = np.concatenate(([True], np.diff(ts) > 1_800_000_000))
        sid = np.cumsum(new) - 1
        for s in range(sid.max() + 1):
            sel = ts[sid == s]
            rows.append((uid, s, sel[0], sel[-1], len(sel)))
    ref = pd.DataFrame(rows, columns=["user_id", "session_idx", "start_ts", "end_ts", "n_events"])
    a = ours.sort_values(["user_id", "session_idx"], ignore_index=True)
    b = ref.sort_values(["user_id", "session_idx"], ignore_index=True)
    assert a.equals(b.astype(a.dtypes.to_dict()))


def test_tumbling_counts_total():
    out = tumbling_counts(SF).to_pandas()
    assert out["n_events"].sum() == 1000


def test_macro_approx_full_fraction_is_exact():
    from pgd_ray.graph.csr import csr_from_edge_arrays
    from pgd_ray.graph.graphlets import graphlet_macro, graphlet_macro_approx

    src = np.array([0, 0, 0, 1, 1, 2])
    dst = np.array([1, 2, 3, 2, 3, 3])
    ds = rd.from_arrow(pa.table({"src": src, "dst": dst}))
    csr = csr_from_edge_arrays(src, dst, n=4)
    exact = graphlet_macro(ds, csr, concurrency=(1, 2))
    approx = graphlet_macro_approx(ds, csr, fraction=1.0, concurrency=(1, 2))
    assert approx.counts == exact.counts


def test_write_partitioned_resumable(tmp_path):
    from pgd_ray.state.output import completed_partitions, write_partitioned

    ds = rd.from_arrow(pa.table({"x": np.arange(100)}))
    e1 = write_partitioned(ds, tmp_path, "shard0")
    assert e1["rows"] == 100
    assert completed_partitions(tmp_path) == {"shard0"}
    # second call skips the work (manifest hit)
    e2 = write_partitioned(ds, tmp_path, "shard0")
    assert e2 == json.loads((tmp_path / "partition=shard0" / "_SUCCESS").read_text())
    write_partitioned(ds, tmp_path, "shard1")
    assert completed_partitions(tmp_path) == {"shard0", "shard1"}


def test_cli_end_to_end(tmp_path):
    from pgd_ray.__main__ import main

    macro = tmp_path / "macro.txt"
    micro = tmp_path / "micro.csv"
    pr = tmp_path / "pr.parquet"
    rc = main(["-f", "/root/reference/data/4-clique.txt",
               "--macro", str(macro), "--micro", str(micro),
               "--pagerank", str(pr), "-w", "2",
               "-o", "degree", "--neigh-ordering", "degree"])
    assert rc == 0
    assert "total_4_clique = 1" in macro.read_text()
    assert len(micro.read_text().strip().splitlines()) == 7
    import pandas as pd

    prdf = pd.read_parquet(pr)
    assert abs(prdf["pagerank"].sum() - 1.0) < 1e-9
    assert sorted(prdf["v"]) == [1, 2, 3, 4]
