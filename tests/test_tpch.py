import duckdb
import numpy as np

SF = "/root/testdata/sf0.001"


def _con():
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "orders", "lineitem"]:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF}/{t}.parquet')"
        )
    return con


def test_q5_matches_duckdb():
    import __ray_entry__ as E

    got = E.queries()["tpch_q5"](SF).reset_index(drop=True)
    exp = _con().execute(E.oracle_sql()["tpch_q5"]).df()
    assert got["n_name"].tolist() == exp["n_name"].tolist()
    assert np.allclose(got["revenue"], exp["revenue"], atol=0.011)


def test_q6_matches_duckdb():
    import __ray_entry__ as E

    got = E.queries()["tpch_q6"](SF)
    exp = _con().execute(E.oracle_sql()["tpch_q6"]).df()
    assert len(got) == 1
    assert abs(float(got["revenue"][0]) - float(exp["revenue"][0])) <= 0.011


def test_q6_empty_window_is_zero():
    from pgd_ray.pipelines.tpch import q6

    out = q6(SF, date_lo_us=0, date_hi_us=1, disc_lo=0.0, disc_hi=0.1,
             qty_below=100.0)
    assert float(out["revenue"][0]) == 0.0
