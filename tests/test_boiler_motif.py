import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

SF = "/root/testdata/sf0.001"


def test_boilerplate_matches_oracle():
    import __ray_entry__ as E

    got = E.queries()["boilerplate_lines"](SF).reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS FROM '{SF}/documents.parquet'")
    exp = con.execute(E.oracle_sql()["boilerplate_lines"]).df()
    assert got["doc_id"].tolist() == exp["doc_id"].tolist()
    assert got["n_lines"].tolist() == exp["n_lines"].tolist()
    assert got["n_boiler"].tolist() == exp["n_boiler"].tolist()
    assert np.allclose(got["boiler_frac"], exp["boiler_frac"],
                       rtol=0, atol=1e-9)


def test_boilerplate_closed_form():
    from pgd_ray.text.boilerplate import boilerplate_lines

    docs = ray.data.from_items([
        {"doc_id": 1, "text": "COOKIE BANNER\nunique alpha\nCOOKIE BANNER"},
        {"doc_id": 2, "text": "COOKIE BANNER\nunique beta"},
        {"doc_id": 3, "text": "  \n\n"},
    ])
    out = boilerplate_lines(docs, min_docs=2)
    r = out.set_index("doc_id")
    # in-doc repeat counts once; banner is in 2 docs -> boiler
    assert r.loc[1, "n_lines"] == 2 and r.loc[1, "n_boiler"] == 1
    assert r.loc[2, "n_lines"] == 2 and r.loc[2, "n_boiler"] == 1
    assert r.loc[3, "n_lines"] == 0 and r.loc[3, "boiler_frac"] == 0.0


def test_motif_significance_matches_oracle():
    import __ray_entry__ as E

    got = E.queries()["motif_significance"](SF)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW lineitem AS FROM '{SF}/lineitem.parquet'")
    exp = con.execute(E.oracle_sql()["motif_significance"]).df()
    for c in got.columns:
        if got[c].dtype == np.int64:
            assert got[c].tolist() == exp[c].tolist(), c
        else:
            assert np.allclose(got[c], exp[c], rtol=0, atol=2e-9), c
    # a co-purchase graph is far more clustered than its null
    assert float(got["tri_ratio"][0]) > 1.0


def test_motif_significance_triangle_graph():
    from pgd_ray.graph.csr import csr_from_edge_arrays
    from pgd_ray.graph.graphlets import motif_significance

    src = np.array([0, 0, 1], np.int64)
    dst = np.array([1, 2, 2], np.int64)
    ds = ray.data.from_arrow(pa.table({"src": src, "dst": dst}))
    csr = csr_from_edge_arrays(src, dst, n=3)
    out = motif_significance(ds, csr)
    assert int(out["triangles"][0]) == 1
    assert int(out["wedges"][0]) == 3
    # S1=6, S2=6: E[T] = 216/(6*216) = 1/6 -> ratio 6
    assert abs(float(out["expected_tri_cfg"][0]) - 1 / 6) < 1e-9
    assert abs(float(out["tri_ratio"][0]) - 6.0) < 1e-8
    assert float(out["global_cc"][0]) == 1.0


def test_boilerplate_join_fallback_matches_broadcast():
    """Round-5 broadcast bound (VERDICT r4 item 7): past
    max_broadcast_lines the scorer switches to a distributed hash
    join; results must be identical on an adversarial corpus where
    EVERY distinct line is duplicated (broadcast ∝ corpus)."""
    import pyarrow as pa
    import ray.data as rd

    from pgd_ray.text.boilerplate import boilerplate_lines

    # 60 docs sharing 40 distinct duplicated lines + one unique line
    lines = [f"shared navigation chrome line {i}" for i in range(40)]
    texts = ["\n".join(lines[i % 3::3] + [f"unique token {i}"])
             for i in range(60)]
    docs = rd.from_arrow(pa.table({
        "doc_id": pa.array(range(60), pa.int64()),
        "text": texts})).repartition(5)

    broad = boilerplate_lines(docs, min_docs=2,
                              max_broadcast_lines=1_000_000)
    joined = boilerplate_lines(docs, min_docs=2, max_broadcast_lines=4)
    assert joined.equals(broad)
    assert (broad["n_boiler"] > 0).any()
