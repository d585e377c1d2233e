import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

SF = "/root/testdata/sf0.001"


def test_orbit_spearman_matches_oracle_exactly():
    import __ray_entry__ as E

    got = E.queries()["orbit_spearman"](SF).reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS FROM '{SF}/lineitem.parquet'")
    exp = con.execute(E.oracle_sql()["orbit_spearman"]).df()
    g = got.sort_values(["orbit_a", "orbit_b"], ignore_index=True)
    e = exp.sort_values(["orbit_a", "orbit_b"], ignore_index=True)
    assert g["orbit_a"].tolist() == e["orbit_a"].tolist()
    assert g["orbit_b"].tolist() == e["orbit_b"].tolist()
    assert g["rho"].tolist() == e["rho"].tolist()  # bit-exact contract
    assert len(g) == 6
    assert (g["rho"].abs() <= 1.0).all()


def test_orbit_spearman_vs_scipy_free_reference():
    from pgd_ray.graph.csr import csr_from_edge_arrays
    from pgd_ray.graph.graphlets import orbit_spearman, vertex_orbits3

    rng = np.random.default_rng(11)
    n = 60
    from itertools import combinations
    pairs = [(i, j) for i, j in combinations(range(n), 2)
             if rng.random() < 0.12]
    src = np.array([p[0] for p in pairs], np.int64)
    dst = np.array([p[1] for p in pairs], np.int64)
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    csr = csr_from_edge_arrays(src, dst, n=n)
    got = orbit_spearman(ds, csr).set_index(["orbit_a", "orbit_b"])
    orb = vertex_orbits3(ds, csr).to_pandas()
    cols = ["orbit0_degree", "orbit1_path_end",
            "orbit2_wedge_center", "orbit3_triangle"]
    for i in range(4):
        for j in range(i + 1, 4):
            ra = orb[cols[i]].rank(method="average")
            rb = orb[cols[j]].rank(method="average")
            ref = np.corrcoef(ra, rb)[0, 1]
            assert abs(got.loc[(cols[i], cols[j]), "rho"] - ref) < 1e-9


def test_centrality_spearman_scipy_reference():
    import numpy as np
    import __ray_entry__ as em

    out = em.queries()["centrality_spearman"]("/root/testdata/sf0.001")
    rho = float(out["rho"].iloc[0])
    # PageRank on an undirected graph is strongly degree-driven
    assert 0.8 < rho <= 1.0
    # reference via pandas rank + pearson
    import pandas as pd
    pr = em.queries()["pagerank_copurchase"]("/root/testdata/sf0.001")
    eds, dense, csr, vids = em._copurchase_bundle("/root/testdata/sf0.001")
    deg = pd.DataFrame({"v": vids, "y": csr.degrees()})
    o = pr.merge(deg, on="v")
    ref = o["score"].rank().corr(o["y"].rank())
    assert abs(rho - ref) < 1e-9
