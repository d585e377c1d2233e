import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

SF = "/root/testdata/sf0.001"


def test_rfm_matches_oracle():
    import __ray_entry__ as E

    got = E.queries()["rfm_segments"](SF).reset_index(drop=True)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW orders AS FROM '{SF}/orders.parquet'")
    exp = con.execute(E.oracle_sql()["rfm_segments"]).df()
    assert len(got) == len(exp) > 0
    for c in ("c_custkey", "recency_days", "frequency", "r_q", "f_q", "m_q"):
        assert got[c].tolist() == exp[c].tolist(), c
    assert np.allclose(got["monetary"], exp["monetary"], rtol=0, atol=0.005)
    # quintiles are balanced: sizes differ by at most 1
    for c in ("r_q", "f_q", "m_q"):
        sizes = got[c].value_counts()
        assert sorted(sizes.index) == [1, 2, 3, 4, 5]
        assert sizes.max() - sizes.min() <= 1


def test_global_ntile_exact_semantics():
    from pgd_ray.stages.windows import global_ntile

    # n=7, k=3 -> NTILE buckets sized 3,2,2
    vals = np.array([10, 20, 30, 40, 50, 60, 70], np.int64)
    ids = np.arange(7, dtype=np.int64)
    ds = ray.data.from_arrow(pa.table({"v": vals, "id": ids})) \
        .repartition(3)
    out = (global_ntile(ds, "v", "id", 3).to_pandas()
           .sort_values("v", ignore_index=True))
    assert out["ntile"].tolist() == [1, 1, 1, 2, 2, 3, 3]
    # n < k: each row its own bucket
    small = ray.data.from_arrow(pa.table(
        {"v": vals[:2], "id": ids[:2]}))
    o2 = (global_ntile(small, "v", "id", 5).to_pandas()
          .sort_values("v", ignore_index=True))
    assert o2["ntile"].tolist() == [1, 2]


def test_global_ntile_duplicate_tiebreak_rejected():
    import pytest

    from pgd_ray.stages.windows import global_ntile

    ds = ray.data.from_arrow(pa.table(
        {"v": np.array([1, 3, 2, 4], np.int64),
         "id": np.array([7, 7, 7, 7], np.int64)})).repartition(4)
    # every block heads with id=7 after the sort -> must be rejected
    # (unless Ray coalesced everything into one block)
    try:
        out = global_ntile(ds, "v", "id", 2).to_pandas()
        assert len(out) == 4  # single-block fallback: ran fine
    except ValueError as e:
        assert "unique tiebreak" in str(e)


def test_revenue_pareto_matches_pandas():
    import numpy as np
    import pyarrow.parquet as pq

    from pgd_ray.stages.rfm import revenue_pareto

    SF = "/root/testdata/sf0.001"
    od = pq.read_table(f"{SF}/orders.parquet",
                       columns=["o_custkey", "o_totalprice"]).to_pandas()
    od["cents"] = np.floor(od["o_totalprice"].to_numpy() * 100.0
                           + 0.5).astype(np.int64)
    pc = od.groupby("o_custkey")["cents"].sum().sort_values(
        ascending=False)
    n = len(pc)
    k = int(np.ceil(0.1 * n))
    top = int(pc.iloc[:k].sum())
    total = int(pc.sum())

    out = revenue_pareto(SF, top_frac=0.1)
    assert int(out["n_customers"].iloc[0]) == n
    assert int(out["top_k"].iloc[0]) == k
    assert int(out["total_cents"].iloc[0]) == total
    assert int(out["top_cents"].iloc[0]) == top
    assert abs(out["share"].iloc[0] - round(top / total, 9)) < 1e-12
    assert out["share"].iloc[0] >= 0.1  # top decile holds >= its share
