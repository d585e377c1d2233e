"""Conversation-level analytics over the transcript table — the
engine's north-star input shape (conv_id, turn_idx, role, text, tool,
ts).  Two programs:

* ``conv_profile`` — per-conversation shape stats: turn count,
  distinct roles/tools (exact two-step distinct —
  ``stages.distinct.grouped_distinct_count``, hot-conversation-safe),
  total/mean text chars, wall-clock span.  Three hash aggregations,
  merged on the driver over O(#conversations) rows (the query's own
  output size).
* ``response_latency`` — mean seconds between consecutive turns,
  grouped by the RESPONDING role (the agent-latency profile): one
  global (conv_id, turn_idx) sort, per-block vectorized adjacent
  pairs, ≤ 1 boundary pair per block stitched from a tiny per-block
  (first/last row) summary on the driver.

The reference has no transcript surface beyond edge derivation
(SURVEY.md S7); these close the loop on transcripts as a first-class
analytics table, not just a graph source.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Count, Max, Min, Sum


def conv_profile(transcripts: ray.data.Dataset) -> pd.DataFrame:
    """Columns (conv_id, n_turns, n_roles, n_tools, n_chars,
    avg_chars, span_s), ordered by conv_id; avg_chars rounded to 6,
    span_s = whole seconds floor((max ts − min ts)/1s)."""
    from pgd_ray.stages.distinct import grouped_distinct_count

    def keyed(t: pa.Table) -> pa.Table:
        txt = t["text"].combine_chunks()
        nch = pa.compute.utf8_length(txt.fill_null(""))
        ts = (t["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        return pa.table({"conv_id": t["conv_id"],
                         "nch": pa.array(
                             nch.to_numpy(zero_copy_only=False)
                             .astype(np.int64), pa.int64()),
                         "tus": pa.array(ts, pa.int64())})

    base = (
        transcripts.map_batches(keyed, batch_format="pyarrow")
        .groupby("conv_id")
        .aggregate(Count(alias_name="n_turns"),
                   Sum("nch", alias_name="n_chars"),
                   Min("tus", alias_name="t0"),
                   Max("tus", alias_name="t1"))
        .to_pandas()
    )
    roles = grouped_distinct_count(
        transcripts, "conv_id", "role", alias="n_roles").to_pandas()
    tools = grouped_distinct_count(
        transcripts, "conv_id", "tool", alias="n_tools").to_pandas()
    out = base.merge(roles, on="conv_id").merge(tools, on="conv_id")
    n = out["n_turns"].to_numpy(np.int64)
    nch = out["n_chars"].to_numpy(np.int64)
    return pd.DataFrame({
        "conv_id": out["conv_id"],
        "n_turns": n,
        "n_roles": out["n_roles"].to_numpy(np.int64),
        "n_tools": out["n_tools"].to_numpy(np.int64),
        "n_chars": nch,
        "avg_chars": np.round(nch / n, 6),
        "span_s": (out["t1"].to_numpy(np.int64)
                   - out["t0"].to_numpy(np.int64)) // 1_000_000,
    }).sort_values("conv_id", ignore_index=True)


def response_latency(transcripts: ray.data.Dataset) -> pd.DataFrame:
    """Mean gap (seconds, rounded 6) between consecutive turns of a
    conversation, grouped by the LATER turn's role — "how long does
    each role take to respond".  Columns (role, n_gaps, mean_gap_s),
    ordered by role."""
    srt = transcripts.select_columns(
        ["conv_id", "turn_idx", "role", "ts"]
    ).sort(["conv_id", "turn_idx"]).materialize()

    def block_pairs(t: pa.Table) -> pa.Table:
        # interior pairs + this block's first/last rows for the stitch
        if t.num_rows == 0:
            return pa.table({"kind": pa.array([], pa.int64()),
                             "role": pa.array([], pa.string()),
                             "conv": pa.array([], pa.string()),
                             "tidx": pa.array([], pa.int64()),
                             "gap": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        role = t["role"].to_numpy(zero_copy_only=False)
        tidx = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (t["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        same = conv[1:] == conv[:-1]
        gaps = ts[1:] - ts[:-1]
        kinds, roles_, convs, tidxs, gvals, ns = [], [], [], [], [], []
        # per-role interior partials (kind 0): sum + count
        rl = role[1:][same]
        gv = gaps[same]
        if len(rl):
            for r in np.unique(rl):
                m = rl == r
                kinds.append(0); roles_.append(str(r)); convs.append("")
                tidxs.append(0); gvals.append(int(gv[m].sum()))
                ns.append(int(m.sum()))
        # boundary rows (kind 1 = first row, kind 2 = last row)
        for kind, i in ((1, 0), (2, t.num_rows - 1)):
            kinds.append(kind); roles_.append(str(role[i]))
            convs.append(str(conv[i])); tidxs.append(int(tidx[i]))
            gvals.append(int(ts[i])); ns.append(0)
        return pa.table({"kind": pa.array(kinds, pa.int64()),
                         "role": pa.array(roles_, pa.string()),
                         "conv": pa.array(convs, pa.string()),
                         "tidx": pa.array(tidxs, pa.int64()),
                         "gap": pa.array(gvals, pa.int64()),
                         "n": pa.array(ns, pa.int64())})

    parts = srt.map_batches(block_pairs, batch_format="pyarrow",
                            batch_size=None).to_pandas()
    agg: dict = {}
    if not parts.empty:
        for r, g, n in zip(parts.loc[parts["kind"] == 0, "role"],
                           parts.loc[parts["kind"] == 0, "gap"],
                           parts.loc[parts["kind"] == 0, "n"]):
            s, c = agg.get(r, (0, 0))
            agg[r] = (s + int(g), c + int(n))
        # stitch: last row of block i pairs with first row of block
        # i+1 when they share a conversation (blocks in sorted order)
        firsts = parts[parts["kind"] == 1].reset_index(drop=True)
        lasts = parts[parts["kind"] == 2].reset_index(drop=True)
        order = np.lexsort((firsts["tidx"].to_numpy(),
                            firsts["conv"].to_numpy()))
        firsts = firsts.iloc[order].reset_index(drop=True)
        lasts = lasts.iloc[order].reset_index(drop=True)
        for i in range(1, len(firsts)):
            if lasts.loc[i - 1, "conv"] == firsts.loc[i, "conv"]:
                r = firsts.loc[i, "role"]
                s, c = agg.get(r, (0, 0))
                agg[r] = (s + int(firsts.loc[i, "gap"]
                                  - lasts.loc[i - 1, "gap"]), c + 1)
    rows = [(r, np.int64(c), round(s / 1e6 / c, 6))
            for r, (s, c) in sorted(agg.items()) if c]
    return pd.DataFrame(rows, columns=["role", "n_gaps", "mean_gap_s"]) \
        if rows else pd.DataFrame({"role": pd.Series([], dtype=object),
                                   "n_gaps": pd.Series([], dtype=np.int64),
                                   "mean_gap_s": pd.Series([], dtype=np.float64)})


def tool_transitions(transcripts: ray.data.Dataset) -> pd.DataFrame:
    """Tool-call transition matrix within conversations: counts of
    consecutive (tool_prev → tool_next) pairs in (conv_id, turn_idx)
    order — the agent-behavior Markov screen over the north-star
    table.  Same physical plan as ``response_latency``: one sort,
    vectorized per-block adjacent pairs, ≤ 1 boundary pair per block
    stitched on the driver.  Columns (tool_a, tool_b, n_trans),
    ordered (tool_a, tool_b)."""
    return _transition_counts(transcripts, "tool", "tool_a", "tool_b")


def _transition_counts(transcripts: ray.data.Dataset, col: str,
                       name_a: str, name_b: str) -> pd.DataFrame:
    """Consecutive-turn (col_prev → col_next) pair counts within
    conversations — the shared physical plan behind
    ``tool_transitions`` and ``role_assortativity``."""
    srt = transcripts.select_columns(
        ["conv_id", "turn_idx", col]
    ).sort(["conv_id", "turn_idx"]).materialize()

    def block_pairs(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"kind": pa.array([], pa.int64()),
                             "ta": pa.array([], pa.string()),
                             "tb": pa.array([], pa.string()),
                             "conv": pa.array([], pa.string()),
                             "tidx": pa.array([], pa.int64()),
                             "n": pa.array([], pa.int64())})
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        tool = t[col].to_numpy(zero_copy_only=False)
        tidx = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        same = conv[1:] == conv[:-1]
        kinds, tas, tbs, convs, tidxs, ns = [], [], [], [], [], []
        if same.any():
            df = pd.DataFrame({"a": tool[:-1][same], "b": tool[1:][same]})
            g = df.groupby(["a", "b"], sort=False).size()
            for (a, b), c in g.items():
                kinds.append(0); tas.append(str(a)); tbs.append(str(b))
                convs.append(""); tidxs.append(0); ns.append(int(c))
        for kind, i in ((1, 0), (2, t.num_rows - 1)):
            kinds.append(kind); tas.append(str(tool[i])); tbs.append("")
            convs.append(str(conv[i])); tidxs.append(int(tidx[i]))
            ns.append(0)
        return pa.table({"kind": pa.array(kinds, pa.int64()),
                         "ta": pa.array(tas, pa.string()),
                         "tb": pa.array(tbs, pa.string()),
                         "conv": pa.array(convs, pa.string()),
                         "tidx": pa.array(tidxs, pa.int64()),
                         "n": pa.array(ns, pa.int64())})

    parts = srt.map_batches(block_pairs, batch_format="pyarrow",
                            batch_size=None).to_pandas()
    agg: dict = {}
    if not parts.empty:
        for a, b, n in zip(parts.loc[parts["kind"] == 0, "ta"],
                           parts.loc[parts["kind"] == 0, "tb"],
                           parts.loc[parts["kind"] == 0, "n"]):
            agg[(a, b)] = agg.get((a, b), 0) + int(n)
        firsts = parts[parts["kind"] == 1].reset_index(drop=True)
        lasts = parts[parts["kind"] == 2].reset_index(drop=True)
        order = np.lexsort((firsts["tidx"].to_numpy(),
                            firsts["conv"].to_numpy()))
        firsts = firsts.iloc[order].reset_index(drop=True)
        lasts = lasts.iloc[order].reset_index(drop=True)
        for i in range(1, len(firsts)):
            if lasts.loc[i - 1, "conv"] == firsts.loc[i, "conv"]:
                key = (lasts.loc[i - 1, "ta"], firsts.loc[i, "ta"])
                agg[key] = agg.get(key, 0) + 1
    rows = [(a, b, np.int64(n)) for (a, b), n in sorted(agg.items())]
    return pd.DataFrame(rows, columns=[name_a, name_b, "n_trans"]) \
        if rows else pd.DataFrame({name_a: pd.Series([], dtype=object),
                                   name_b: pd.Series([], dtype=object),
                                   "n_trans": pd.Series([], dtype=np.int64)})


def role_assortativity(transcripts: ray.data.Dataset) -> pd.DataFrame:
    """Newman categorical assortativity of the ROLE labels across
    consecutive-turn transitions — the homophily screen ("does an
    assistant turn follow an assistant turn?").  From the mixing
    matrix e_ij = c_ij / n of the directed transition counts:
    r = (Σ e_ii − Σ a_i·b_i) / (1 − Σ a_i·b_i), with a = row sums and
    b = column sums; the degenerate single-class case (denominator 0)
    pins r = 1.0 (everything is within-class).  One row: (n_pairs,
    trace_e, sum_ab, r) — trace/sum_ab as single divisions of integer
    sums, so the SQL mirror is bit-identical.  The heavy part is the
    shared sorted-block transition plan; the mixing matrix is
    O(#roles²) driver rows."""
    c = _transition_counts(transcripts, "role", "a", "b")
    n = int(c["n_trans"].sum())
    if n == 0:
        return pd.DataFrame({"n_pairs": [np.int64(0)], "trace_e": [0.0],
                             "sum_ab": [0.0], "r": [0.0]})
    diag = int(c.loc[c["a"] == c["b"], "n_trans"].sum())
    row = c.groupby("a")["n_trans"].sum()
    col = c.groupby("b")["n_trans"].sum()
    labels = sorted(set(row.index) | set(col.index))
    sab_int = sum(int(row.get(k, 0)) * int(col.get(k, 0)) for k in labels)
    trace = float(diag) / float(n)
    sab = float(sab_int) / (float(n) * float(n))
    r = 1.0 if sab == 1.0 else (trace - sab) / (1.0 - sab)
    return pd.DataFrame({"n_pairs": [np.int64(n)],
                         "trace_e": [round(trace, 9)],
                         "sum_ab": [round(sab, 9)],
                         "r": [round(r, 9)]})


def transition_reciprocity(transcripts: ray.data.Dataset) -> pd.DataFrame:
    """Reciprocity of the tool-transition digraph: of the transition
    mass between DISTINCT tools, how much is matched by reverse
    transitions?  Weighted form Σ_{a≠b} min(c(a,b), c(b,a)) / Σ c and
    the unordered-pair form (#bidirectional pairs / #pairs).  One row:
    (n_ordered, n_recip, recip_weighted, n_pairs, n_pairs_bidir,
    recip_pairs).  Derived on the driver from the O(#tools²) count
    table produced by the shared distributed transition plan."""
    c = _transition_counts(transcripts, "tool", "a", "b")
    c = c[c["a"] != c["b"]]
    if c.empty:
        return pd.DataFrame({"n_ordered": [np.int64(0)],
                             "n_recip": [np.int64(0)],
                             "recip_weighted": [0.0],
                             "n_pairs": [np.int64(0)],
                             "n_pairs_bidir": [np.int64(0)],
                             "recip_pairs": [0.0]})
    lo = np.minimum(c["a"].to_numpy(), c["b"].to_numpy())
    hi = np.maximum(c["a"].to_numpy(), c["b"].to_numpy())
    fwd = np.where(c["a"].to_numpy() < c["b"].to_numpy(),
                   c["n_trans"].to_numpy(), 0)
    bwd = np.where(c["a"].to_numpy() > c["b"].to_numpy(),
                   c["n_trans"].to_numpy(), 0)
    g = pd.DataFrame({"lo": lo, "hi": hi, "fwd": fwd, "bwd": bwd}) \
        .groupby(["lo", "hi"], as_index=False).sum()
    n_ordered = int(g["fwd"].sum() + g["bwd"].sum())
    n_recip = 2 * int(np.minimum(g["fwd"], g["bwd"]).sum())
    n_pairs = len(g)
    n_bidir = int(((g["fwd"] > 0) & (g["bwd"] > 0)).sum())
    return pd.DataFrame({
        "n_ordered": [np.int64(n_ordered)],
        "n_recip": [np.int64(n_recip)],
        "recip_weighted": [round(float(n_recip) / float(n_ordered), 9)
                           if n_ordered else 0.0],
        "n_pairs": [np.int64(n_pairs)],
        "n_pairs_bidir": [np.int64(n_bidir)],
        "recip_pairs": [round(float(n_bidir) / float(n_pairs), 9)
                        if n_pairs else 0.0],
    })


def conversations_to_documents(
    transcripts: ray.data.Dataset,
    sep: str = "\n",
) -> ray.data.Dataset:
    """Doc-ify conversations for LLM training: one row per
    conversation with its turns' texts joined by ``sep`` in
    (conv_id, turn_idx) order — columns (conv_id, text, n_turns).

    Streaming contract: conversations interior to a sorted block are
    joined in-block and STAY a Dataset; only the ≤ 2 boundary
    conversations per block ship fragments to the driver for the
    stitch (total fragments ≤ 2 × #blocks, each carrying only its own
    conversation's text).  The classic map_groups formulation would
    pay an interpreter round-trip per conversation; this is the
    sorted-block shape used across the engine (packing, sessionize,
    response_latency)."""
    srt = transcripts.select_columns(
        ["conv_id", "turn_idx", "text"]
    ).sort(["conv_id", "turn_idx"]).materialize()

    def block_docs(t: pa.Table) -> pa.Table:
        empty = pa.table({"kind": pa.array([], pa.int64()),
                          "conv_id": pa.array([], pa.string()),
                          "text": pa.array([], pa.string()),
                          "n_turns": pa.array([], pa.int64()),
                          "first_tidx": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        df = t.to_pandas()
        df["text"] = df["text"].fillna("")
        convs = df["conv_id"].to_numpy()
        first_c, last_c = convs[0], convs[-1]
        g = df.groupby("conv_id", sort=True)
        joined = g["text"].agg(sep.join)
        counts = g.size()
        first_t = g["turn_idx"].min()
        kind = np.where(np.isin(joined.index.to_numpy(object),
                                [first_c, last_c]), 1, 0)
        return pa.table({
            "kind": pa.array(kind, pa.int64()),
            "conv_id": pa.array(joined.index.to_numpy(object), pa.string()),
            "text": pa.array(joined.to_numpy(object), pa.string()),
            "n_turns": pa.array(counts.to_numpy(np.int64), pa.int64()),
            "first_tidx": pa.array(first_t.to_numpy(np.int64), pa.int64()),
        })

    parts = srt.map_batches(block_docs, batch_format="pyarrow",
                            batch_size=None).materialize()
    final = parts.filter(expr="kind == 0") \
        .select_columns(["conv_id", "text", "n_turns"])
    frags = parts.filter(expr="kind == 1").to_pandas()
    if frags.empty:
        return final
    frags = frags.sort_values(["conv_id", "first_tidx"],
                              ignore_index=True)
    stitched = frags.groupby("conv_id", sort=True).agg(
        text=("text", sep.join), n_turns=("n_turns", "sum"))
    sdf = pd.DataFrame({"conv_id": stitched.index.to_numpy(object),
                        "text": stitched["text"].to_numpy(object),
                        "n_turns": stitched["n_turns"]
                        .to_numpy(np.int64)})
    return final.union(ray.data.from_pandas(sdf))


def tool_scc(transcripts: ray.data.Dataset) -> pd.DataFrame:
    """Strongly connected components of the tool-transition DIGRAPH
    (the directed structure reciprocity summarizes): scc = the
    lexicographically smallest tool mutually reachable with this one.
    The distributed stage is the shared sorted-block transition plan;
    the closure runs on the O(#tools²) vocabulary digraph (driver
    rows = output size, the mixing-matrix convention).  Columns
    (tool, scc), one row per distinct tool, ordered by tool."""
    c = _transition_counts(transcripts, "tool", "a", "b")
    # vocabulary = every tool seen anywhere in the table (not only
    # transition participants): one distributed distinct
    vocab = (
        transcripts.select_columns(["tool"]).groupby("tool")
        .aggregate(Count()).to_pandas()["tool"].to_numpy(object)
    )
    names = np.sort(vocab)
    n = len(names)
    reach = np.eye(n, dtype=bool)
    if not c.empty:
        ia = np.searchsorted(names, c["a"].to_numpy(object))
        ib = np.searchsorted(names, c["b"].to_numpy(object))
        reach[ia, ib] = True
    # transitive closure by repeated boolean squaring (O(log n) matmuls
    # over the tiny vocabulary matrix)
    while True:
        nxt = reach | (reach @ reach)
        if (nxt == reach).all():
            break
        reach = nxt
    mutual = reach & reach.T
    scc_idx = np.argmax(mutual, axis=1)  # first True = smallest index
    return pd.DataFrame({"tool": names, "scc": names[scc_idx]})


def tool_pagerank(transcripts: ray.data.Dataset, alpha: float = 0.85,
                  iters: int = 32) -> pd.DataFrame:
    """PageRank on the DIRECTED tool-transition digraph (the
    importance ranking the undirected co-occurrence PageRank cannot
    express — direction matters for "what do agents reach for
    next").  Transition matrix P(a→b) = c(a,b)/Σ_b c(a,b); dangling
    tools (no outgoing transition) self-loop — mass stays put (the
    stated contract; no global dangling scalar, which keeps the SQL
    recursion single-reference).  Fixed ``iters`` rounds of
    x ← (1−α)/n + α·Pᵀx on the O(#tools²) count matrix from the
    shared distributed transition plan.  Columns (tool, score
    round 9), ordered by tool."""
    c = _transition_counts(transcripts, "tool", "a", "b")
    vocab = np.sort(
        transcripts.select_columns(["tool"]).groupby("tool")
        .aggregate(Count()).to_pandas()["tool"].to_numpy(object))
    n = len(vocab)
    if n == 0:
        return pd.DataFrame({"tool": pd.Series([], dtype=object),
                             "score": pd.Series([], dtype=np.float64)})
    P = np.zeros((n, n))
    if not c.empty:
        ia = np.searchsorted(vocab, c["a"].to_numpy(object))
        ib = np.searchsorted(vocab, c["b"].to_numpy(object))
        P[ia, ib] = c["n_trans"].to_numpy(np.float64)
    out_w = P.sum(axis=1)
    dangling = out_w == 0
    P[dangling, dangling] = 1.0
    out_w[dangling] = 1.0
    P = P / out_w[:, None]
    x = np.full(n, 1.0 / n)
    base = (1.0 - alpha) / n
    for _ in range(iters):
        x = base + alpha * (P.T @ x)
    return pd.DataFrame({"tool": vocab, "score": np.round(x, 9)})


def transition_entropy(transcripts: ray.data.Dataset) -> pd.DataFrame:
    """Empirical entropy of the tool-transition Markov chain: per
    source tool, H_a = −Σ_b P(a,b)·ln P(a,b) with P = c(a,b)/Σ_b
    c(a,b) (how predictable is the next tool given this one?), plus
    the corpus entropy RATE Σ_a (w_a/N)·H_a repeated per row (the
    window-sum mirror convention).  Driver fold over the O(#tools²)
    counts from the shared distributed transition plan.  Columns
    (tool, n_out, entropy, entropy_rate), ordered by tool; only tools
    with ≥ 1 outgoing transition appear."""
    c = _transition_counts(transcripts, "tool", "a", "b")
    if c.empty:
        return pd.DataFrame({"tool": pd.Series([], dtype=object),
                             "n_out": pd.Series([], dtype=np.int64),
                             "entropy": pd.Series([], dtype=np.float64),
                             "entropy_rate": pd.Series([], dtype=np.float64)})
    w = c.groupby("a")["n_trans"].sum()
    total = int(c["n_trans"].sum())
    ents = {}
    for a, g in c.groupby("a"):
        p = g["n_trans"].to_numpy(np.float64) / float(w[a])
        ents[a] = float(-(p * np.log(p)).sum())
    rate = sum((float(w[a]) / total) * h for a, h in ents.items())
    tools = sorted(ents)
    return pd.DataFrame({
        "tool": tools,
        "n_out": [np.int64(w[a]) for a in tools],
        "entropy": [round(ents[a], 9) for a in tools],
        "entropy_rate": [round(rate, 9)] * len(tools),
    })


def tool_colift(transcripts: ray.data.Dataset) -> pd.DataFrame:
    """Tool co-USAGE lift within conversations (ANY co-occurrence,
    not adjacency — the complement of ``tool_transitions``):
    lift(a,b) = P(a,b together) / (P(a)·P(b)) over conversations.
    One distinct (conv, tool) hash aggregation, then
    ``stages.basket.mask_overlap_counts`` — mask-histogram shape for
    small tool vocabularies, pairwise aggregation beyond
    ``MASK_VOCAB_LIMIT`` (no 2^T allocation / int64 bit overflow).
    Columns (tool_a, tool_b, n_both, n_a, n_b, n_convs, lift) for
    co-occurring pairs, a < b."""
    from ray.data.aggregate import Count as _Cnt

    from pgd_ray.stages.basket import mask_overlap_counts

    pairs = (transcripts.select_columns(["conv_id", "tool"])
             .groupby(["conv_id", "tool"]).aggregate(_Cnt())
             .select_columns(["conv_id", "tool"]).materialize())
    tools = sorted(pairs.groupby("tool").aggregate(_Cnt())
                   .to_pandas()["tool"])
    pair_df, n_item, n_convs = mask_overlap_counts(
        pairs, "conv_id", "tool", tools)
    rows = []
    for ta, tb, both in pair_df.itertuples(index=False):
        na, nb = n_item[ta], n_item[tb]
        lift = (both / n_convs) / ((na / n_convs) * (nb / n_convs))
        rows.append((ta, tb, int(both), na, nb, n_convs, round(lift, 9)))
    return pd.DataFrame(rows, columns=["tool_a", "tool_b", "n_both",
                                       "n_a", "n_b", "n_convs", "lift"])


def latency_gap_rows(transcripts: ray.data.Dataset) -> ray.data.Dataset:
    """(role, gap) rows — one per consecutive-turn pair, gap in µs
    credited to the LATER turn's role — as a DATASET (the quantile
    engine's input; ``response_latency`` folds the same pairs to
    means).  In-block pairs are emitted vectorized; the ≤ 1 junction
    pair per block boundary is stitched from the O(#blocks) first/last
    summaries and unioned as a tiny driver-built fragment."""
    srt = transcripts.select_columns(
        ["conv_id", "turn_idx", "role", "ts"]
    ).sort(["conv_id", "turn_idx"]).materialize()

    def in_block(t: pa.Table) -> pa.Table:
        if t.num_rows < 2:
            return pa.table({"role": pa.array([], pa.string()),
                             "gap": pa.array([], pa.int64())})
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        role = t["role"].to_numpy(zero_copy_only=False)
        ts = (t["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        same = conv[1:] == conv[:-1]
        return pa.table({"role": pa.array(role[1:][same], pa.string()),
                         "gap": pa.array((ts[1:] - ts[:-1])[same],
                                         pa.int64())})

    def edges(t: pa.Table) -> pa.Table:
        # first/last ROW of each block (kind 1/2) — the
        # response_latency junction convention
        empty = pa.table({"kind": pa.array([], pa.int64()),
                          "conv": pa.array([], pa.string()),
                          "tidx": pa.array([], pa.int64()),
                          "role": pa.array([], pa.string()),
                          "tus": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        role = t["role"].to_numpy(zero_copy_only=False)
        tidx = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (t["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        rows = [(1, 0), (2, t.num_rows - 1)]
        return pa.table({
            "kind": pa.array([k for k, _ in rows], pa.int64()),
            "conv": pa.array([str(conv[i]) for _, i in rows], pa.string()),
            "tidx": pa.array([int(tidx[i]) for _, i in rows], pa.int64()),
            "role": pa.array([str(role[i]) for _, i in rows], pa.string()),
            "tus": pa.array([int(ts[i]) for _, i in rows], pa.int64()),
        })

    inner = srt.map_batches(in_block, batch_format="pyarrow",
                            batch_size=None)
    bdf = srt.map_batches(edges, batch_format="pyarrow",
                          batch_size=None).to_pandas()
    extra = []
    if len(bdf):
        firsts = bdf[bdf["kind"] == 1].reset_index(drop=True)
        lasts = bdf[bdf["kind"] == 2].reset_index(drop=True)
        order = np.lexsort((firsts["tidx"].to_numpy(),
                            firsts["conv"].to_numpy()))
        firsts = firsts.iloc[order].reset_index(drop=True)
        lasts = lasts.iloc[order].reset_index(drop=True)
        for i in range(1, len(firsts)):
            if lasts.loc[i - 1, "conv"] == firsts.loc[i, "conv"]:
                extra.append((str(firsts.loc[i, "role"]),
                              int(firsts.loc[i, "tus"]
                                  - lasts.loc[i - 1, "tus"])))
    parts = [inner]
    if extra:
        parts.append(ray.data.from_pandas(pd.DataFrame(
            extra, columns=["role", "gap"])))
    return parts[0] if len(parts) == 1 else parts[0].union(parts[1])


def latency_quantiles(transcripts: ray.data.Dataset,
                      qs=(0.5, 0.9, 0.99)) -> pd.DataFrame:
    """Per-role response-latency quantiles (exact, rank rule
    floor(q·(n−1)), µs integers) — the agent-latency SLO view
    ``response_latency``'s mean hides.  Composes ``latency_gap_rows``
    with the group-aware histogram-refinement quantile engine (no
    per-group sorts).  Columns (role, q, value)."""
    from pgd_ray.stages.quantiles import grouped_quantiles

    gaps = latency_gap_rows(transcripts)
    out = grouped_quantiles(gaps, "role", "gap", list(qs))
    out = out.rename(columns={"key": "role"}) if "key" in out.columns \
        else out
    # gaps are integer µs and the floor-rank rule picks ACTUAL values,
    # so the quantiles are exact integers — emit them as int64 (the
    # oracle's type; a float64 column hash-mismatches on dtype alone)
    out["value"] = out["value"].astype(np.int64)
    return out.sort_values(["role", "q"], ignore_index=True)


def conv_typicality(transcripts: ray.data.Dataset) -> pd.DataFrame:
    """Conversation typicality under the corpus's own tool-transition
    Markov chain: per conversation, the mean negative log-likelihood
    of its transitions, nll = −(1/n)·Σ ln P(tool_i → tool_{i+1}) with
    P = corpus MLE — high nll flags agent behavior unlike the rest of
    the corpus (the anomaly screen).  Two passes over the shared
    sorted table: the transition-count plan builds P (O(#tools²),
    broadcast), then a per-conversation fold of ln-P partials (conv
    boundary pairs stitched exactly like response_latency).  Columns
    (conv_id, n_trans, nll round 9) for conversations with ≥ 1
    transition, ordered by conv_id."""
    c = _transition_counts(transcripts, "tool", "a", "b")
    if c.empty:
        return pd.DataFrame({"conv_id": pd.Series([], dtype=object),
                             "n_trans": pd.Series([], dtype=np.int64),
                             "nll": pd.Series([], dtype=np.float64)})
    w = c.groupby("a")["n_trans"].sum()
    logp = {(a, b): float(np.log(n / w[a]))
            for a, b, n in zip(c["a"], c["b"], c["n_trans"])}
    # dense log-prob matrix for the per-batch hot path: factorize
    # tools to int ids once here (the vocabulary is O(#tools), tiny)
    # so each batch indexes a numpy matrix instead of doing a Python
    # dict lookup per consecutive-turn pair (VERDICT r3 item 5)
    vocab = sorted({t for ab in logp for t in ab},
                   key=lambda x: (x is None, str(x)))
    tid = {t: i for i, t in enumerate(vocab)}
    # one extra all-NaN sentinel row/column (index len(vocab)) for
    # out-of-vocabulary tools: the `same` mask should never select an
    # OOV position as a pair, but if that invariant ever breaks
    # (nulls, filtered transitions) the pair surfaces as NaN nll
    # instead of silently contributing tool-0's log-prob (ADVICE r4)
    lpm = np.full((len(vocab) + 1, len(vocab) + 1), np.nan,
                  dtype=np.float64)
    for (a, b), v in logp.items():
        lpm[tid[a], tid[b]] = v

    srt = transcripts.select_columns(
        ["conv_id", "turn_idx", "tool"]
    ).sort(["conv_id", "turn_idx"]).materialize()

    def block(t: pa.Table) -> pa.Table:
        empty = pa.table({"kind": pa.array([], pa.int64()),
                          "conv": pa.array([], pa.string()),
                          "tidx": pa.array([], pa.int64()),
                          "tool": pa.array([], pa.string()),
                          "s": pa.array([], pa.float64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        tool = t["tool"].to_numpy(zero_copy_only=False)
        tidx = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        same = conv[1:] == conv[:-1]
        # tools outside the vocabulary (e.g. a single-turn conv's
        # tool, never part of a transition) map to the NaN sentinel
        # index — an invariant violation yields NaN nll, not a wrong
        # value
        ids = (pd.Series(tool).map(tid).fillna(len(tid))
               .to_numpy(np.int64))
        lp = lpm[ids[:-1][same], ids[1:][same]]
        cv = conv[1:][same]
        kinds, convs, tidxs, tools, ss, ns = [], [], [], [], [], []
        if len(cv):
            df = pd.DataFrame({"c": cv, "lp": lp})
            g = df.groupby("c", sort=False)["lp"].agg(["sum", "size"])
            for cid, row in g.iterrows():
                kinds.append(0); convs.append(str(cid)); tidxs.append(0)
                tools.append(""); ss.append(float(row["sum"]))
                ns.append(int(row["size"]))
        for kind, i in ((1, 0), (2, t.num_rows - 1)):
            kinds.append(kind); convs.append(str(conv[i]))
            tidxs.append(int(tidx[i])); tools.append(str(tool[i]))
            ss.append(0.0); ns.append(0)
        return pa.table({"kind": pa.array(kinds, pa.int64()),
                         "conv": pa.array(convs, pa.string()),
                         "tidx": pa.array(tidxs, pa.int64()),
                         "tool": pa.array(tools, pa.string()),
                         "s": pa.array(ss, pa.float64()),
                         "n": pa.array(ns, pa.int64())})

    parts = srt.map_batches(block, batch_format="pyarrow",
                            batch_size=None).to_pandas()
    acc: dict = {}
    if not parts.empty:
        for cid, s, n in zip(parts.loc[parts["kind"] == 0, "conv"],
                             parts.loc[parts["kind"] == 0, "s"],
                             parts.loc[parts["kind"] == 0, "n"]):
            a, b = acc.get(cid, (0.0, 0))
            acc[cid] = (a + float(s), b + int(n))
        firsts = parts[parts["kind"] == 1].reset_index(drop=True)
        lasts = parts[parts["kind"] == 2].reset_index(drop=True)
        order = np.lexsort((firsts["tidx"].to_numpy(),
                            firsts["conv"].to_numpy()))
        firsts = firsts.iloc[order].reset_index(drop=True)
        lasts = lasts.iloc[order].reset_index(drop=True)
        for i in range(1, len(firsts)):
            if lasts.loc[i - 1, "conv"] == firsts.loc[i, "conv"]:
                cid = firsts.loc[i, "conv"]
                a, b = acc.get(cid, (0.0, 0))
                acc[cid] = (a + logp[(lasts.loc[i - 1, "tool"],
                                      firsts.loc[i, "tool"])], b + 1)
    rows = [(cid, np.int64(n), round(-s / n, 9))
            for cid, (s, n) in sorted(acc.items()) if n]
    return pd.DataFrame(rows, columns=["conv_id", "n_trans", "nll"]) \
        if rows else pd.DataFrame({"conv_id": pd.Series([], dtype=object),
                                   "n_trans": pd.Series([], dtype=np.int64),
                                   "nll": pd.Series([], dtype=np.float64)})


def role_pair_latency(transcripts: ray.data.Dataset) -> pd.DataFrame:
    """Response-latency MATRIX: mean gap seconds per (previous role →
    responding role) pair — the finer view ``response_latency``
    aggregates away (is assistant-after-tool slower than
    assistant-after-user?).  Same sorted-block plan with pair-keyed
    integer partials and the ≤ 1 junction pair per boundary.  Columns
    (role_a, role_b, n_gaps, mean_gap_s round 6), ordered."""
    srt = transcripts.select_columns(
        ["conv_id", "turn_idx", "role", "ts"]
    ).sort(["conv_id", "turn_idx"]).materialize()

    def block(t: pa.Table) -> pa.Table:
        empty = pa.table({"kind": pa.array([], pa.int64()),
                          "ra": pa.array([], pa.string()),
                          "rb": pa.array([], pa.string()),
                          "conv": pa.array([], pa.string()),
                          "tidx": pa.array([], pa.int64()),
                          "gap": pa.array([], pa.int64()),
                          "n": pa.array([], pa.int64())})
        if t.num_rows == 0:
            return empty
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        role = t["role"].to_numpy(zero_copy_only=False)
        tidx = t["turn_idx"].to_numpy(zero_copy_only=False).astype(np.int64)
        ts = (t["ts"].to_numpy(zero_copy_only=False)
              .astype("datetime64[us]").astype(np.int64))
        same = conv[1:] == conv[:-1]
        kinds, ras, rbs, convs, tidxs, gaps, ns = ([] for _ in range(7))
        if same.any():
            df = pd.DataFrame({"a": role[:-1][same], "b": role[1:][same],
                               "g": (ts[1:] - ts[:-1])[same]})
            g = df.groupby(["a", "b"], sort=False)["g"].agg(["sum", "size"])
            for (a, b), row in g.iterrows():
                kinds.append(0); ras.append(str(a)); rbs.append(str(b))
                convs.append(""); tidxs.append(0)
                gaps.append(int(row["sum"])); ns.append(int(row["size"]))
        for kind, i in ((1, 0), (2, t.num_rows - 1)):
            kinds.append(kind); ras.append(str(role[i])); rbs.append("")
            convs.append(str(conv[i])); tidxs.append(int(tidx[i]))
            gaps.append(int(ts[i])); ns.append(0)
        return pa.table({"kind": pa.array(kinds, pa.int64()),
                         "ra": pa.array(ras, pa.string()),
                         "rb": pa.array(rbs, pa.string()),
                         "conv": pa.array(convs, pa.string()),
                         "tidx": pa.array(tidxs, pa.int64()),
                         "gap": pa.array(gaps, pa.int64()),
                         "n": pa.array(ns, pa.int64())})

    parts = srt.map_batches(block, batch_format="pyarrow",
                            batch_size=None).to_pandas()
    acc: dict = {}
    if not parts.empty:
        for a, b, g, n in zip(parts.loc[parts["kind"] == 0, "ra"],
                              parts.loc[parts["kind"] == 0, "rb"],
                              parts.loc[parts["kind"] == 0, "gap"],
                              parts.loc[parts["kind"] == 0, "n"]):
            s, c = acc.get((a, b), (0, 0))
            acc[(a, b)] = (s + int(g), c + int(n))
        firsts = parts[parts["kind"] == 1].reset_index(drop=True)
        lasts = parts[parts["kind"] == 2].reset_index(drop=True)
        order = np.lexsort((firsts["tidx"].to_numpy(),
                            firsts["conv"].to_numpy()))
        firsts = firsts.iloc[order].reset_index(drop=True)
        lasts = lasts.iloc[order].reset_index(drop=True)
        for i in range(1, len(firsts)):
            if lasts.loc[i - 1, "conv"] == firsts.loc[i, "conv"]:
                key = (lasts.loc[i - 1, "ra"], firsts.loc[i, "ra"])
                s, c = acc.get(key, (0, 0))
                acc[key] = (s + int(firsts.loc[i, "gap"]
                                    - lasts.loc[i - 1, "gap"]), c + 1)
    rows = [(a, b, np.int64(c), round(s / 1e6 / c, 6))
            for (a, b), (s, c) in sorted(acc.items()) if c]
    return pd.DataFrame(rows, columns=["role_a", "role_b", "n_gaps",
                                       "mean_gap_s"]) \
        if rows else pd.DataFrame(
            {"role_a": pd.Series([], dtype=object),
             "role_b": pd.Series([], dtype=object),
             "n_gaps": pd.Series([], dtype=np.int64),
             "mean_gap_s": pd.Series([], dtype=np.float64)})
