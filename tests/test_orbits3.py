import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

SF = "/root/testdata/sf0.001"


def test_orbits3_matches_oracle():
    import __ray_entry__ as E

    got = E.queries()["vertex_orbits3"](SF).reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS FROM '{SF}/lineitem.parquet'")
    exp = con.execute(E.oracle_sql()["vertex_orbits3"]).df()
    assert len(got) == len(exp) > 0
    for c in got.columns:
        assert got[c].tolist() == exp[c].tolist(), c
    # global identity: Σ orbit3 = 3·T, Σ orbit2 + T·3... sanity:
    # wedges = Σ C(d,2) = Σ(orbit2) + Σ(orbit3)
    wedges = (got["orbit0_degree"] * (got["orbit0_degree"] - 1) // 2).sum()
    assert wedges == got["orbit2_wedge_center"].sum() + \
        got["orbit3_triangle"].sum()


def test_orbits3_brute_force():
    from itertools import combinations

    from pgd_ray.graph.csr import csr_from_edge_arrays
    from pgd_ray.graph.graphlets import vertex_orbits3

    rng = np.random.default_rng(3)
    n = 40
    pairs = [(i, j) for i, j in combinations(range(n), 2)
             if rng.random() < 0.15]
    src = np.array([p[0] for p in pairs], np.int64)
    dst = np.array([p[1] for p in pairs], np.int64)
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    csr = csr_from_edge_arrays(src, dst, n=n)
    out = (vertex_orbits3(ds, csr).to_pandas()
           .set_index("v").sort_index())

    adj = [set() for _ in range(n)]
    for a, b in pairs:
        adj[a].add(b); adj[b].add(a)
    for v in range(n):
        if v not in out.index:
            assert not adj[v]
            continue
        deg = len(adj[v])
        tri = sum(1 for a, b in combinations(sorted(adj[v]), 2)
                  if b in adj[a])
        o1 = sum(len(adj[u]) - 1 for u in adj[v]) - 2 * tri
        o2 = deg * (deg - 1) // 2 - tri
        r = out.loc[v]
        assert (r["orbit0_degree"], r["orbit1_path_end"],
                r["orbit2_wedge_center"], r["orbit3_triangle"]) == \
            (deg, o1, o2, tri), v
