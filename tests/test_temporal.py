"""Monthly graph stats vs a local pandas/DuckDB-free reference."""
import numpy as np
import pandas as pd

from pgd_ray.graph.temporal import _tri_total, monthly_graph_stats

SF = "/root/testdata/sf0.001"


def test_tri_total_small_cases():
    # K4: 4 triangles
    src = np.array([0, 0, 0, 1, 1, 2])
    dst = np.array([1, 2, 3, 2, 3, 3])
    assert _tri_total(src, dst) == 4
    # path: none
    assert _tri_total(np.array([0, 1]), np.array([1, 2])) == 0
    assert _tri_total(np.array([], np.int64), np.array([], np.int64)) == 0


def test_monthly_graph_consistency():
    out = monthly_graph_stats(SF)
    li = pd.read_parquet(f"{SF}/lineitem.parquet",
                         columns=["l_orderkey", "l_partkey"]).drop_duplicates()
    od = pd.read_parquet(f"{SF}/orders.parquet",
                         columns=["o_orderkey", "o_orderdate"])
    od["month"] = (od["o_orderdate"].dt.year * 100
                   + od["o_orderdate"].dt.month).astype(np.int64)
    inc = li.merge(od[["o_orderkey", "month"]], left_on="l_orderkey",
                   right_on="o_orderkey")
    pairs = inc.merge(li, on="l_orderkey", suffixes=("_a", "_b"))
    pairs = pairs[pairs.l_partkey_a < pairs.l_partkey_b]
    ed = pairs[["month", "l_partkey_a", "l_partkey_b"]].drop_duplicates()
    ref = []
    for mo, g in ed.groupby("month", sort=True):
        a = g["l_partkey_a"].to_numpy(np.int64)
        b = g["l_partkey_b"].to_numpy(np.int64)
        n = len(np.unique(np.concatenate([a, b])))
        ref.append((int(mo), n, len(g), _tri_total(a, b)))
    refdf = pd.DataFrame(ref, columns=out.columns).astype(np.int64)
    assert out.equals(refdf)
