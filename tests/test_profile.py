import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

SF = "/root/testdata/sf0.001"


def test_profile_events_matches_oracle():
    import __ray_entry__ as E

    got = E.queries()["profile_events"](SF).reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS FROM '{SF}/events.parquet'")
    exp = con.execute(E.oracle_sql()["profile_events"]).df()
    for c in got.columns:
        assert got[c].tolist() == exp[c].tolist(), c
    assert got["column"].tolist() == ["event_id", "ts", "user_id",
                                      "event_type", "value", "props"]


def test_table_profile_nulls_and_distinct():
    from pgd_ray.stages.profile import table_profile

    ds = ray.data.from_arrow(pa.table({
        "a": pa.array([1, 1, 2, None, 3], pa.int64()),
        "b": pa.array(["x", None, None, "x", "y"], pa.string()),
    })).repartition(3)
    out = table_profile(ds, ["a", "b"]).set_index("column")
    assert int(out.loc["a", "n_rows"]) == 5
    assert int(out.loc["a", "n_null"]) == 1
    assert int(out.loc["a", "n_distinct"]) == 3
    assert int(out.loc["b", "n_null"]) == 2
    assert int(out.loc["b", "n_distinct"]) == 2


def test_table_diff_matches_oracle():
    import __ray_entry__ as E

    got = E.queries()["table_diff_events"](SF)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS FROM '{SF}/events.parquet'")
    exp = con.execute(E.oracle_sql()["table_diff_events"]).df()
    for c in got.columns:
        assert got[c].tolist() == exp[c].tolist(), c
    # conservation: old = removed + changed + unchanged
    r = got.iloc[0]
    assert r["n_old"] == r["n_removed"] + r["n_changed"] + r["n_unchanged"]
    assert r["n_new"] == r["n_added"] + r["n_changed"] + r["n_unchanged"]
    assert r["n_added"] > 0 and r["n_removed"] > 0 and r["n_changed"] > 0


def test_table_diff_identity_and_disjoint():
    from pgd_ray.stages.diff import table_diff

    ds = ray.data.from_arrow(pa.table({
        "k": np.arange(10, dtype=np.int64),
        "x": [f"v{i}" for i in range(10)]}))
    same = table_diff(ds, ds, "k", ["x"]).iloc[0]
    assert same["n_changed"] == 0 and same["n_unchanged"] == 10
    other = ray.data.from_arrow(pa.table({
        "k": np.arange(10, 15, dtype=np.int64),
        "x": [f"w{i}" for i in range(5)]}))
    d = table_diff(ds, other, "k", ["x"]).iloc[0]
    assert d["n_added"] == 5 and d["n_removed"] == 10 and d["n_unchanged"] == 0


def test_key_skew_matches_oracle_and_conserves():
    import __ray_entry__ as E

    got = E.queries()["key_skew"](SF).reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS FROM '{SF}/events.parquet'")
    exp = con.execute(E.oracle_sql()["key_skew"]).df()
    assert got["bucket"].tolist() == exp["bucket"].tolist()
    assert got["n"].tolist() == exp["n"].tolist()
    n_events = con.execute("SELECT COUNT(*) FROM events").fetchone()[0]
    assert int(got["n"].sum()) == n_events
