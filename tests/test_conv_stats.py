import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

SF = "/root/testdata/sf0.001"


def _oracle(name):
    import __ray_entry__ as E

    con = duckdb.connect()
    con.sql(f"CREATE VIEW events AS FROM '{SF}/events.parquet'")
    return con.execute(E.oracle_sql()[name]).df()


def test_conv_profile_matches_oracle():
    import __ray_entry__ as E

    got = E.queries()["conv_profile"](SF).reset_index(drop=True)
    exp = _oracle("conv_profile")
    assert got["conv_id"].tolist() == exp["conv_id"].tolist()
    for c in ("n_turns", "n_roles", "n_tools", "n_chars", "span_s"):
        assert got[c].tolist() == exp[c].tolist(), c
    assert np.allclose(got["avg_chars"], exp["avg_chars"],
                       rtol=0, atol=1e-9)
    assert (got["n_roles"] <= 3).all()


def test_response_latency_matches_oracle():
    import __ray_entry__ as E

    got = E.queries()["response_latency"](SF).reset_index(drop=True)
    exp = _oracle("response_latency")
    assert got["role"].tolist() == exp["role"].tolist()
    assert got["n_gaps"].tolist() == exp["n_gaps"].tolist()
    assert np.allclose(got["mean_gap_s"], exp["mean_gap_s"],
                       rtol=0, atol=1e-9)
    # every turn except each conversation's first contributes a gap
    prof = E.queries()["conv_profile"](SF)
    assert int(got["n_gaps"].sum()) == int(
        (prof["n_turns"] - 1).sum())


def test_response_latency_boundary_stitch():
    from pgd_ray.stages.conv_stats import response_latency

    # one conversation split across many tiny blocks: every gap must
    # still be found exactly once
    n = 30
    rows = [{"conv_id": "c1", "turn_idx": np.int32(i),
             "role": ["user", "assistant"][i % 2], "text": "x",
             "tool": "t",
             "ts": np.datetime64(1_000_000_000_000 + i * 7_000_000, "us")}
            for i in range(n)]
    ds = ray.data.from_items(rows).repartition(10)
    out = response_latency(ds)
    assert int(out["n_gaps"].sum()) == n - 1
    # constant 7s gaps regardless of role
    assert np.allclose(out["mean_gap_s"], 7.0)


def test_tool_transitions_matches_oracle():
    import __ray_entry__ as E

    got = E.queries()["tool_transitions"](SF).reset_index(drop=True)
    exp = _oracle("tool_transitions")
    for c in got.columns:
        assert got[c].tolist() == exp[c].tolist(), c
    # transitions conserve: sum = total turns - #conversations
    prof = E.queries()["conv_profile"](SF)
    assert int(got["n_trans"].sum()) == int((prof["n_turns"] - 1).sum())


def test_tool_transitions_boundary_stitch():
    from pgd_ray.stages.conv_stats import tool_transitions

    rows = [{"conv_id": "c1", "turn_idx": np.int32(i),
             "role": "user", "text": "x",
             "tool": ["alpha", "beta"][i % 2],
             "ts": np.datetime64(10 ** 12 + i, "us")}
            for i in range(21)]
    ds = ray.data.from_items(rows).repartition(7)
    out = tool_transitions(ds).set_index(["tool_a", "tool_b"])
    assert int(out.loc[("alpha", "beta"), "n_trans"]) == 10
    assert int(out.loc[("beta", "alpha"), "n_trans"]) == 10
    assert int(out["n_trans"].sum()) == 20


def test_conv_docs_matches_oracle():
    import __ray_entry__ as E

    got = (E.queries()["conv_docs"](SF).to_pandas()
           .sort_values("conv_id", ignore_index=True))
    exp = _oracle("conv_docs")
    assert got["conv_id"].tolist() == exp["conv_id"].tolist()
    assert got["n_turns"].tolist() == exp["n_turns"].tolist()
    assert got["text"].tolist() == exp["text"].tolist()  # byte-exact


def test_conv_docs_boundary_stitch_exact():
    from pgd_ray.stages.conv_stats import conversations_to_documents

    # one long conversation split over many blocks + tiny interiors
    rows = []
    for i in range(40):
        rows.append({"conv_id": "cA", "turn_idx": np.int32(i),
                     "role": "user", "text": f"t{i}", "tool": "x",
                     "ts": np.datetime64(10 ** 12 + i, "us")})
    rows.append({"conv_id": "cB", "turn_idx": np.int32(0),
                 "role": "user", "text": "solo", "tool": "x",
                 "ts": np.datetime64(10 ** 12, "us")})
    ds = ray.data.from_items(rows).repartition(8)
    out = (conversations_to_documents(ds).to_pandas()
           .set_index("conv_id"))
    assert out.loc["cA", "text"] == "\n".join(f"t{i}" for i in range(40))
    assert int(out.loc["cA", "n_turns"]) == 40
    assert out.loc["cB", "text"] == "solo"


def test_latency_quantiles_matches_pandas():
    import numpy as np

    from pgd_ray.stages.conv_stats import latency_quantiles
    from pgd_ray.sources.transcripts import derive_transcripts

    SF = "/root/testdata/sf0.001"
    tds = derive_transcripts(SF)
    out = latency_quantiles(tds, qs=(0.5, 0.9)).set_index(["role", "q"])

    df = tds.to_pandas().sort_values(["conv_id", "turn_idx"],
                                     ignore_index=True)
    tu = df["ts"].astype("datetime64[us]").astype(np.int64)
    gaps = {}
    for i in range(1, len(df)):
        if df.loc[i, "conv_id"] == df.loc[i - 1, "conv_id"]:
            gaps.setdefault(df.loc[i, "role"], []).append(
                int(tu[i] - tu[i - 1]))
    for role, g in gaps.items():
        g = sorted(g)
        for q in (0.5, 0.9):
            exp = g[int(np.floor(q * (len(g) - 1)))]
            assert int(out.loc[(role, q), "value"]) == exp, (role, q)


def test_role_pair_latency_mass_matches_response_latency():
    import numpy as np

    from pgd_ray.stages.conv_stats import (response_latency,
                                           role_pair_latency)
    from pgd_ray.sources.transcripts import derive_transcripts

    SF = "/root/testdata/sf0.001"
    tds = derive_transcripts(SF)
    pair = role_pair_latency(tds)
    flat = response_latency(tds)
    # folding the pair matrix over role_a reproduces the flat view
    agg = pair.groupby("role_b").apply(
        lambda g: (g["n_gaps"].sum(),
                   (g["mean_gap_s"] * g["n_gaps"]).sum()
                   / g["n_gaps"].sum()),
        include_groups=False)
    for r in flat.itertuples(index=False):
        n, mean = agg[r.role]
        assert int(n) == r.n_gaps
        assert abs(mean - r.mean_gap_s) < 1e-4
