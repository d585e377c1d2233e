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
