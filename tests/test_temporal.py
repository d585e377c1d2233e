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


def test_monthly_edge_overlap_matches_pandas():
    import numpy as np
    import pandas as pd
    import pyarrow.parquet as pq

    from pgd_ray.graph.temporal import monthly_edge_overlap

    SF = "/root/testdata/sf0.001"
    li = pq.read_table(f"{SF}/lineitem.parquet",
                       columns=["l_orderkey", "l_partkey"]).to_pandas()
    od = pq.read_table(f"{SF}/orders.parquet",
                       columns=["o_orderkey", "o_orderdate"]).to_pandas()
    od["month"] = (od["o_orderdate"].dt.year * 100
                   + od["o_orderdate"].dt.month).astype(np.int64)
    po = li.drop_duplicates()
    j = po.merge(po, on="l_orderkey").query("l_partkey_x < l_partkey_y")
    j = j.merge(od[["o_orderkey", "month"]], left_on="l_orderkey",
                right_on="o_orderkey")
    sets = {m: set(zip(g["l_partkey_x"], g["l_partkey_y"]))
            for m, g in j.groupby("month")}
    months = sorted(sets)
    out = monthly_edge_overlap(SF)
    assert len(out) == len(months) - 1
    for i in range(len(months) - 1):
        a, b = sets[months[i]], sets[months[i + 1]]
        r = out.iloc[i]
        assert int(r["month_a"]) == months[i]
        assert int(r["month_b"]) == months[i + 1]
        assert int(r["n_a"]) == len(a) and int(r["n_b"]) == len(b)
        assert int(r["n_both"]) == len(a & b)
        exp = len(a & b) / len(a | b) if (a | b) else 0.0
        assert abs(r["jaccard"] - round(exp, 9)) < 1e-12


def test_tri_total_vectorized_matches_brute():
    """Round-5 vectorized oriented-wedge kernel vs brute-force
    triangle enumeration on random graphs (gappy ids, hubs)."""
    from itertools import combinations

    rng = np.random.default_rng(31)
    for _ in range(25):
        n = int(rng.integers(3, 25))
        mx = n * (n - 1) // 2
        m = int(rng.integers(1, mx + 1))
        pairs = set()
        while len(pairs) < m:
            x, y = rng.integers(0, n, 2) * 7 + 3  # gappy external ids
            if x != y:
                pairs.add((min(x, y), max(x, y)))
        E = np.array(sorted(pairs), dtype=np.int64)
        adj = set(map(tuple, E))
        verts = sorted({v for e in pairs for v in e})
        brute = sum(1 for a, b, c in combinations(verts, 3)
                    if (a, b) in adj and (a, c) in adj and (b, c) in adj)
        assert _tri_total(E[:, 0], E[:, 1]) == brute
