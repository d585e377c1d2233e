"""role_assortativity + transition_reciprocity closed-form checks on
hand-built transcript tables."""

import numpy as np
import pandas as pd
import ray.data

from pgd_ray.stages.conv_stats import (role_assortativity,
                                       transition_reciprocity)


def _tr(rows):
    df = pd.DataFrame(rows, columns=["conv_id", "turn_idx", "role",
                                     "text", "tool", "ts"])
    df["ts"] = pd.to_datetime(df["ts"], unit="s")
    df["turn_idx"] = df["turn_idx"].astype(np.int32)
    return ray.data.from_pandas(df)


def test_role_assortativity_perfect_homophily_is_one():
    # two conversations, each a single role: every transition is
    # within-class → r = 1 (the pinned degenerate contract)
    rows = [("c1", i, "user", "x", "t", i) for i in range(4)] + \
           [("c2", i, "tool", "x", "t", i) for i in range(4)]
    out = role_assortativity(_tr(rows))
    assert int(out["n_pairs"].iloc[0]) == 6
    assert out["trace_e"].iloc[0] == 1.0
    assert out["r"].iloc[0] == 1.0


def test_role_assortativity_alternating_is_negative():
    # strict alternation user/assistant → trace 0, r < 0
    rows = [("c1", i, ["user", "assistant"][i % 2], "x", "t", i)
            for i in range(6)]
    out = role_assortativity(_tr(rows))
    assert out["trace_e"].iloc[0] == 0.0
    assert out["r"].iloc[0] < 0
    # closed form: counts u->a = 3? (turns 0..5: pairs 01,12,23,34,45
    # = u->a, a->u, u->a, a->u, u->a) n=5, diag=0
    n = 5
    row = {"user": 3, "assistant": 2}
    col = {"assistant": 3, "user": 2}
    sab = (row["user"] * col["user"] + row["assistant"] * col["assistant"]) \
        / float(n * n)
    assert abs(out["sum_ab"].iloc[0] - round(sab, 9)) < 1e-12
    assert abs(out["r"].iloc[0] - round((0 - sab) / (1 - sab), 9)) < 1e-12


def test_reciprocity_closed_form():
    # transitions: A->B x2, B->A x1, A->C x1  (self loops ignored)
    rows = [
        ("c1", 0, "u", "x", "A", 0), ("c1", 1, "u", "x", "B", 1),
        ("c1", 2, "u", "x", "A", 2), ("c1", 3, "u", "x", "B", 3),
        ("c2", 0, "u", "x", "A", 0), ("c2", 1, "u", "x", "C", 1),
        ("c3", 0, "u", "x", "D", 0), ("c3", 1, "u", "x", "D", 1),
    ]
    out = transition_reciprocity(_tr(rows))
    # ordered mass between distinct tools: A->B 2, B->A 1, A->C 1 = 4
    assert int(out["n_ordered"].iloc[0]) == 4
    # min(2,1)*2 = 2 reciprocated
    assert int(out["n_recip"].iloc[0]) == 2
    assert abs(out["recip_weighted"].iloc[0] - 0.5) < 1e-12
    # pairs: {A,B} bidir, {A,C} one-way
    assert int(out["n_pairs"].iloc[0]) == 2
    assert int(out["n_pairs_bidir"].iloc[0]) == 1
    assert abs(out["recip_pairs"].iloc[0] - 0.5) < 1e-12


def test_reciprocity_no_cross_tool_transitions():
    rows = [("c1", 0, "u", "x", "A", 0), ("c1", 1, "u", "x", "A", 1)]
    out = transition_reciprocity(_tr(rows))
    assert int(out["n_ordered"].iloc[0]) == 0
    assert out["recip_weighted"].iloc[0] == 0.0


def test_tool_scc_cycle_and_chain():
    from pgd_ray.stages.conv_stats import tool_scc
    # A->B->A (2-cycle), C->D (chain), E isolated
    rows = [
        ("c1", 0, "u", "x", "A", 0), ("c1", 1, "u", "x", "B", 1),
        ("c1", 2, "u", "x", "A", 2),
        ("c2", 0, "u", "x", "C", 0), ("c2", 1, "u", "x", "D", 1),
        ("c3", 0, "u", "x", "E", 0),
    ]
    out = tool_scc(_tr(rows)).set_index("tool")["scc"]
    assert out["A"] == "A" and out["B"] == "A"
    assert out["C"] == "C" and out["D"] == "D" and out["E"] == "E"


def test_tool_scc_three_cycle():
    from pgd_ray.stages.conv_stats import tool_scc
    rows = [("c1", i, "u", "x", t, i)
            for i, t in enumerate(["B", "C", "A", "B"])]  # B->C->A->B
    out = tool_scc(_tr(rows)).set_index("tool")["scc"]
    assert set(out) == {"A"} and len(out) == 3


def test_tool_pagerank_mass_and_sink():
    from pgd_ray.stages.conv_stats import tool_pagerank
    # chain A->B->C repeated: C is a sink (dangling)
    rows = [("c%d" % k, i, "u", "x", t, i)
            for k in range(3) for i, t in enumerate(["A", "B", "C"])]
    out = tool_pagerank(_tr(rows), alpha=0.85, iters=64)
    s = out.set_index("tool")["score"]
    # mass conserved (dangling self-loop keeps total at 1)
    assert abs(s.sum() - 1.0) < 1e-6
    # downstream accumulates: C > B > A
    assert s["C"] > s["B"] > s["A"]


def test_tool_pagerank_symmetric_cycle_uniform():
    from pgd_ray.stages.conv_stats import tool_pagerank
    rows = [("c1", i, "u", "x", t, i)
            for i, t in enumerate(["A", "B", "C", "A"])]  # A->B->C->A
    out = tool_pagerank(_tr(rows), iters=128)
    s = out["score"].to_numpy()
    assert abs(s.max() - s.min()) < 1e-6  # cycle symmetry → uniform


def test_transition_entropy_closed_forms():
    import numpy as np

    from pgd_ray.stages.conv_stats import transition_entropy
    # A always -> B (deterministic, H=0); B -> A or C equally (H=ln 2)
    rows = [("c1", i, "u", "x", t, i) for i, t in
            enumerate(["A", "B", "A", "B", "C"])] + \
           [("c2", i, "u", "x", t, i) for i, t in
            enumerate(["A", "B", "A", "B", "A"])]
    out = transition_entropy(_tr(rows)).set_index("tool")
    assert abs(out.loc["A", "entropy"]) < 1e-12          # A->B only
    # B -> A 3x, B -> C 1x
    p = np.array([0.75, 0.25])
    assert abs(out.loc["B", "entropy"] + (p * np.log(p)).sum()) < 1e-9
    # rate = weighted mean of per-state entropies
    w = out["n_out"].to_numpy(float)
    expect = float((w / w.sum() * out["entropy"].to_numpy()).sum())
    assert abs(out["entropy_rate"].iloc[0] - expect) < 2e-9


def test_conv_typicality_closed_form():
    import numpy as np

    from pgd_ray.stages.conv_stats import conv_typicality
    # chain A->B in c1 twice, B->C once in c2; corpus P(A->B)=1,
    # P(B->C)=1 -> every conversation has nll 0... make it non-trivial:
    rows = [
        ("c1", 0, "u", "x", "A", 0), ("c1", 1, "u", "x", "B", 1),
        ("c1", 2, "u", "x", "A", 2),
        ("c2", 0, "u", "x", "A", 0), ("c2", 1, "u", "x", "C", 1),
    ]
    # transitions: A->B (1), B->A (1), A->C (1); P(A->B)=0.5,
    # P(A->C)=0.5, P(B->A)=1
    out = conv_typicality(_tr(rows)).set_index("conv_id")
    ln2 = float(np.log(2))
    # c1: A->B (ln .5), B->A (ln 1) -> nll = (ln2 + 0)/2
    assert abs(out.loc["c1", "nll"] - round(ln2 / 2, 9)) < 1e-9
    assert int(out.loc["c1", "n_trans"]) == 2
    # c2: A->C -> nll = ln2
    assert abs(out.loc["c2", "nll"] - round(ln2, 9)) < 1e-9
