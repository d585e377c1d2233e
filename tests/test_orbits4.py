import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

SF = "/root/testdata/sf0.001"


def test_orbits4_tool_matches_oracle():
    import __ray_entry__ as E

    got = E.queries()["vertex_orbits4_tool"](SF).reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS FROM '{SF}/events.parquet'")
    exp = con.execute(E.oracle_sql()["vertex_orbits4_tool"]).df()
    assert got["v"].tolist() == exp["v"].tolist()
    assert got["clique4"].tolist() == exp["clique4"].tolist()
    assert got["cycle4"].tolist() == exp["cycle4"].tolist()
    assert len(got) > 0


def test_orbits4_closed_forms():
    from pgd_ray.graph.csr import csr_from_edge_arrays
    from pgd_ray.graph.graphlets import graphlet_micro

    def orbits(src, dst, n):
        ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
        csr = csr_from_edge_arrays(src, dst, n=n)
        mi = graphlet_micro(ds, csr).to_pandas()
        up = pd.concat([
            mi[["src", "clique4", "cycle4"]].rename(columns={"src": "v"}),
            mi[["dst", "clique4", "cycle4"]].rename(columns={"dst": "v"}),
        ])
        agg = up.groupby("v", sort=True).sum()
        return (agg["clique4"] // 3, agg["cycle4"] // 2)

    # K5: each vertex in C(4,3)=4 cliques of size 4; no induced 4-cycle
    from itertools import combinations
    pairs = list(combinations(range(5), 2))
    src = np.array([p[0] for p in pairs], np.int64)
    dst = np.array([p[1] for p in pairs], np.int64)
    clq, cyc = orbits(src, dst, 5)
    assert (clq == 4).all() and (cyc == 0).all()

    # C4 ring: one induced 4-cycle, every vertex in it, no cliques
    src = np.array([0, 1, 2, 0], np.int64)
    dst = np.array([1, 2, 3, 3], np.int64)
    clq, cyc = orbits(src, dst, 4)
    assert (clq == 0).all() and (cyc == 1).all()
