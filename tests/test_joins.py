"""asof_join / range_join: both strategies vs DuckDB on sf0.001, plus
tie-break, left-join nulls and empty-right edge cases on micro data."""

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from pgd_ray.stages.joins import asof_join, range_join

SF = "/root/testdata/sf0.001"


def _norm(df: pd.DataFrame, cols) -> pd.DataFrame:
    df = df[list(cols)].copy()
    for c in df.columns:
        if pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].round(6)
        elif pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype(np.int64)
    return df.sort_values(list(df.columns), ignore_index=True)


def _asof_oracle() -> pd.DataFrame:
    return duckdb.sql(f"""
        WITH ranked AS (
          SELECT e.event_id, e.user_id, CAST(epoch_us(e.ts) AS BIGINT) AS ts,
                 o.o_orderkey, ROUND(o.o_totalprice, 6) AS o_totalprice,
                 CAST(epoch_us(o.o_orderdate) AS BIGINT) AS asof_orderdate,
                 row_number() OVER (PARTITION BY e.event_id
                                    ORDER BY o.o_orderdate DESC, o.o_orderkey) rn
          FROM '{SF}/events.parquet' e JOIN '{SF}/orders.parquet' o
            ON e.user_id = o.o_custkey AND o.o_orderdate <= e.ts)
        SELECT event_id, user_id, ts, o_orderkey, o_totalprice, asof_orderdate
        FROM ranked WHERE rn = 1""").df()


@pytest.mark.parametrize("strategy", ["broadcast", "partitioned"])
def test_asof_join_matches_duckdb(strategy):
    ev = ray.data.read_parquet(
        f"{SF}/events.parquet", columns=["event_id", "user_id", "ts"])
    orders = ray.data.read_parquet(
        f"{SF}/orders.parquet",
        columns=["o_orderkey", "o_custkey", "o_orderdate", "o_totalprice"])
    out = asof_join(
        ev, orders,
        left_key="user_id", right_key="o_custkey",
        left_time="ts", right_time="o_orderdate", tiebreak="o_orderkey",
        right_cols=["o_orderkey", "o_totalprice"],
        right_time_as="asof_orderdate",
        strategy=strategy, num_partitions=8,
    ).to_pandas()
    cols = ["event_id", "user_id", "ts", "o_orderkey", "o_totalprice",
            "asof_orderdate"]
    got, want = _norm(out, cols), _norm(_asof_oracle(), cols)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


@pytest.mark.parametrize("strategy", ["broadcast", "partitioned"])
def test_range_join_matches_duckdb(strategy):
    orders = ray.data.read_parquet(
        f"{SF}/orders.parquet", columns=["o_orderkey", "o_orderdate"])
    li = ray.data.read_parquet(
        f"{SF}/lineitem.parquet",
        columns=["l_orderkey", "l_partkey", "l_linenumber", "l_shipdate"])
    out = range_join(
        orders, li,
        left_key="o_orderkey", right_key="l_orderkey",
        left_time="o_orderdate", right_time="l_shipdate",
        before_us=0, after_us=30 * 86_400_000_000,
        left_cols=["o_orderkey", "o_orderdate"],
        right_cols=["l_partkey", "l_linenumber"],
        right_time_as="ship_ts",
        strategy=strategy, num_partitions=8,
    ).to_pandas()
    want = duckdb.sql(f"""
        SELECT o.o_orderkey, CAST(epoch_us(o.o_orderdate) AS BIGINT) AS o_orderdate,
               l.l_partkey, l.l_linenumber,
               CAST(epoch_us(l.l_shipdate) AS BIGINT) AS ship_ts
        FROM '{SF}/orders.parquet' o JOIN '{SF}/lineitem.parquet' l
          ON o.o_orderkey = l.l_orderkey
         AND l.l_shipdate >= o.o_orderdate
         AND l.l_shipdate <= o.o_orderdate + INTERVAL 30 DAY""").df()
    cols = ["o_orderkey", "o_orderdate", "l_partkey", "l_linenumber", "ship_ts"]
    got, want = _norm(out, cols), _norm(want, cols)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)


def _micro_sides():
    left = ray.data.from_arrow(pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "k": pa.array([10, 10, 20, 30], pa.int64()),
        "t": pa.array([100, 50, 100, 100], pa.int64()),
    }))
    # key 10: ties at t=40 (rows 7, 5 -> min tiebreak 5 wins), later row
    # at t=60 matches only left t=100; key 20 has no row <= 100 except
    # t=100 exact; key 99 never queried; key 30 absent (unmatched).
    right = ray.data.from_arrow(pa.table({
        "rk": pa.array([10, 10, 10, 20, 99], pa.int64()),
        "rt": pa.array([40, 40, 60, 100, 1], pa.int64()),
        "rid": pa.array([7, 5, 9, 11, 13], pa.int64()),
        "val": pa.array([0.7, 0.5, 0.9, 1.1, 1.3], pa.float64()),
    }))
    return left, right


@pytest.mark.parametrize("strategy", ["broadcast", "partitioned"])
def test_asof_tiebreak_and_left_nulls(strategy):
    left, right = _micro_sides()
    out = asof_join(
        left, right, left_key="k", right_key="rk", left_time="t",
        right_time="rt", tiebreak="rid", right_cols=["rid", "val"],
        how="left", strategy=strategy, num_partitions=4,
    ).to_pandas().sort_values("id", ignore_index=True)
    # id=1 (k=10,t=100) -> rt=60 row rid=9; id=2 (k=10,t=50) -> tie at
    # rt=40 -> min rid=5; id=3 (k=20,t=100) -> exact match rid=11;
    # id=4 (k=30) unmatched -> nulls kept by how='left'
    assert out["id"].tolist() == [1, 2, 3, 4]
    assert out["rid"].tolist()[:3] == [9, 5, 11]
    assert pd.isna(out["rid"].iloc[3]) and pd.isna(out["val"].iloc[3])
    inner = asof_join(
        left, right, left_key="k", right_key="rk", left_time="t",
        right_time="rt", tiebreak="rid", right_cols=["rid"],
        how="inner", strategy=strategy, num_partitions=4,
    ).to_pandas()
    assert sorted(inner["id"].tolist()) == [1, 2, 3]


@pytest.mark.parametrize("strategy", ["broadcast", "partitioned"])
def test_range_join_micro_and_empty_right(strategy):
    left, right = _micro_sides()
    out = range_join(
        left, right, left_key="k", right_key="rk", left_time="t",
        right_time="rt", before_us=60, after_us=0,
        left_cols=["id", "t"], right_cols=["rid"],
        strategy=strategy, num_partitions=4,
    ).to_pandas()
    # id=1 (k=10, window [40,100]): rids {7,5,9}; id=2 (window [-10,50]):
    # {7,5}; id=3 (k=20, [40,100]): {11}; id=4 (k=30): none
    got = {i: sorted(g["rid"].tolist()) for i, g in out.groupby("id")}
    assert got == {1: [5, 7, 9], 2: [5, 7], 3: [11]}
    empty_right = ray.data.from_arrow(pa.table({
        "rk": pa.array([], pa.int64()), "rt": pa.array([], pa.int64()),
        "rid": pa.array([], pa.int64()),
    }))
    out2 = range_join(
        left, empty_right, left_key="k", right_key="rk", left_time="t",
        right_time="rt", before_us=10, after_us=10,
        left_cols=["id"], right_cols=["rid"], strategy=strategy,
        num_partitions=4,
    ).to_pandas()
    assert len(out2) == 0


def test_join_rejects_output_name_collisions():
    import pytest
    import pyarrow as pa
    import ray.data as rd

    from pgd_ray.stages.joins import asof_join, range_join

    left = rd.from_arrow(pa.table({"k": [1], "t": [10], "v": [1.0]}))
    right = rd.from_arrow(pa.table({"k": [1], "t": [5], "v": [2.0]}))
    with pytest.raises(ValueError, match="collision"):
        asof_join(left, right, left_key="k", right_key="k", left_time="t",
                  right_time="t", tiebreak="k", right_cols=["v"])
    with pytest.raises(ValueError, match="collision"):
        asof_join(left, right, left_key="k", right_key="k", left_time="t",
                  right_time="t", tiebreak="k", right_cols=[],
                  right_time_as="t")
    with pytest.raises(ValueError, match="collision"):
        range_join(left, right, left_key="k", right_key="k", left_time="t",
                   right_time="t", before_us=1, after_us=1,
                   left_cols=["k", "t"], right_cols=["t"])


def test_asof_left_join_empty_right_keeps_types():
    import pyarrow as pa
    import ray.data as rd

    from pgd_ray.stages.joins import asof_join

    left = rd.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64()),
                                   "t": pa.array([10, 20], pa.int64())}))
    right = rd.from_arrow(pa.table({
        "k": pa.array([], pa.int64()), "rt": pa.array([], pa.int64()),
        "name": pa.array([], pa.string()), "price": pa.array([], pa.float64()),
    }))
    out = asof_join(left, right, left_key="k", right_key="k", left_time="t",
                    right_time="rt", tiebreak="k",
                    right_cols=["name", "price"], how="left")
    sch = dict(zip(out.schema().names, out.schema().types))
    assert sch["name"] == pa.string() and sch["price"] == pa.float64()
    df = out.to_pandas()
    assert len(df) == 2 and df["name"].isna().all()


# ------------------------------------------------------------------
# semi / anti joins
# ------------------------------------------------------------------

def _sa_fixture():
    import ray.data as rd

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2, 3, 4, 5, 2], pa.int64()),
        "x": pa.array([10, 20, 30, 40, 50, 21], pa.int64()),
    })).repartition(3)
    right = rd.from_arrow(pa.table({
        "rk": pa.array([2, 2, 4, 9], pa.int64()),
        "junk": pa.array(["a", "b", "c", "d"], pa.string()),
    })).repartition(2)
    return left, right


@pytest.mark.parametrize("strategy", ["broadcast", "partitioned"])
def test_semi_join_both_strategies(strategy):
    from pgd_ray.stages.joins import semi_join

    left, right = _sa_fixture()
    out = semi_join(left, right, left_key="k", right_key="rk",
                    strategy=strategy).to_pandas().sort_values(
        ["k", "x"], ignore_index=True)
    # keys 2 (twice) and 4 match; no fan-out from right dup of 2
    assert list(out["k"]) == [2, 2, 4]
    assert list(out["x"]) == [20, 21, 40]
    assert list(out.columns) == ["k", "x"]


@pytest.mark.parametrize("strategy", ["broadcast", "partitioned"])
def test_anti_join_both_strategies(strategy):
    from pgd_ray.stages.joins import anti_join

    left, right = _sa_fixture()
    out = anti_join(left, right, left_key="k", right_key="rk",
                    strategy=strategy).to_pandas().sort_values(
        "k", ignore_index=True)
    assert list(out["k"]) == [1, 3, 5]
    assert list(out.columns) == ["k", "x"]


def test_semi_anti_empty_right_and_same_name():
    import ray.data as rd

    from pgd_ray.stages.joins import anti_join, semi_join

    left = rd.from_arrow(pa.table({
        "k": pa.array([1, 2], pa.int64()),
        "x": pa.array([7, 8], pa.int64())}))
    empty = rd.from_arrow(pa.table({"rk": pa.array([], pa.int64())}))
    assert semi_join(left, empty, left_key="k", right_key="rk").count() == 0
    anti = anti_join(left, empty, left_key="k", right_key="rk").to_pandas()
    assert sorted(anti["k"]) == [1, 2]
    # same column name on both sides (partitioned renames internally)
    right = rd.from_arrow(pa.table({"k": pa.array([2], pa.int64())}))
    got = semi_join(left, right, left_key="k", right_key="k",
                    strategy="partitioned").to_pandas()
    assert list(got.columns) == ["k", "x"] and list(got["k"]) == [2]
