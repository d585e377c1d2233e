"""Driver-contract smoke + mini oracle run: every oracle_sql query is
executed through DuckDB on sf0.001 and compared (row count + sorted
values) against the Ray result — the same shape of check the driver
does at sf0.01."""

import duckdb
import numpy as np
import pandas as pd
import pytest

import __ray_entry__ as entrymod

SF = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def _con():
    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS FROM '{SF}/{t}.parquet'")
    return con


def _to_df(res) -> pd.DataFrame:
    if isinstance(res, pd.DataFrame):
        return res
    try:
        import pyarrow as pa

        if isinstance(res, pa.Table):
            return res.to_pandas()
    except ImportError:
        pass
    return res.to_pandas()


def _normalize(df: pd.DataFrame) -> pd.DataFrame:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), ignore_index=True)


def test_entry_smoke():
    out = entrymod.entry()
    df = _to_df(out)
    assert len(df) >= 0
    assert {"tool_id", "pagerank", "component", "degree"} <= set(df.columns)
    assert abs(df["pagerank"].sum() - 1.0) < 1e-6


@pytest.mark.parametrize("name", sorted(entrymod.oracle_sql().keys()))
def test_query_matches_oracle(name):
    q = entrymod.queries()[name]
    sql = entrymod.oracle_sql()[name]
    ray_df = _normalize(_to_df(q(SF)))
    con = _con()
    ora_df = _normalize(con.sql(sql).df())
    assert len(ray_df) == len(ora_df), f"{name}: rows {len(ray_df)} vs {len(ora_df)}"
    assert list(ray_df.columns) == list(ora_df.columns), name
    for c in ray_df.columns:
        a, b = ray_df[c], ora_df[c]
        if pd.api.types.is_float_dtype(a):
            assert np.allclose(a.to_numpy(dtype=float), b.to_numpy(dtype=float),
                               atol=1e-6, equal_nan=True), f"{name}.{c}"
        else:
            assert (a.to_numpy() == b.to_numpy()).all(), f"{name}.{c}"


def test_rows_only_queries_run():
    qs = entrymod.queries()
    oracled = set(entrymod.oracle_sql())
    for name, fn in qs.items():
        if name in oracled:
            continue
        df = _to_df(fn(SF))
        assert df is not None and len(df) >= 0, name
