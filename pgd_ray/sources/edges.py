"""Edge-table derivations (SURVEY.md §2.1 S7).

Two graph sources, both DuckDB-oracle-expressible:

* ``edges_from_transcripts`` — the north-rule transcript graph:
  nodes are tool-vocabulary entities, an edge links the tools of
  consecutive turns within one conversation.  Nodes get dense ids by
  lexicographic rank of the tool string (deterministic, matches SQL
  ``row_number() OVER (ORDER BY tool)``).

* ``edges_copurchase`` — the workhorse benchmark graph from the
  TPC-H-ish tables: parts co-occurring in the same order
  (lineitem self-join on l_orderkey).  Non-bipartite, triangle-rich,
  with realistic degree skew.

Both return canonical (src<dst), exact-deduped edge Datasets.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data

from pgd_ray.graph.normalize import dedup_edges


def tool_vocab(tds: ray.data.Dataset) -> np.ndarray:
    """Sorted distinct tool strings (the node universe of the
    transcript tool graph).  Distributed distinct, tiny result."""

    def to_tool(t: pa.Table) -> pa.Table:
        arr = t["tool"].to_pandas().dropna().unique()
        return pa.table({"tool": pa.array(sorted(arr), pa.string())})

    parts = [
        b["tool"].to_pandas().to_numpy()
        for b in tds.map_batches(to_tool, batch_format="pyarrow")
        .groupby("tool")
        .count()
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        if b.num_rows
    ]
    if not parts:
        return np.array([], dtype=object)
    return np.sort(np.unique(np.concatenate(parts)))


def edges_from_transcripts(
    tds: ray.data.Dataset, vocab: np.ndarray | None = None
) -> ray.data.Dataset:
    """Consecutive-turn tool co-occurrence edges.

    Per conversation (one ``groupby(conv_id)`` hash shuffle, groups =
    conversations, inherently small): sort by ``turn_idx``, pair each
    turn's tool with the next turn's tool, map tools to dense ids via
    the broadcast vocabulary, canonicalize, drop self-loops; global
    exact dedup afterwards.  ``text`` is never touched — the per-turn
    text-equality invariant holds by construction.
    """
    if vocab is None:
        vocab = tool_vocab(tds)
    vocab_ref = ray.put(np.asarray(vocab, dtype=object))

    def per_conv(g: pd.DataFrame) -> pd.DataFrame:
        vv = ray.get(vocab_ref)
        g = g.sort_values("turn_idx", kind="stable")
        tools = g["tool"].to_numpy()
        if len(tools) < 2:
            return pd.DataFrame({"src": np.array([], np.int64), "dst": np.array([], np.int64)})
        a = np.searchsorted(vv, tools[:-1])
        b = np.searchsorted(vv, tools[1:])
        lo = np.minimum(a, b).astype(np.int64)
        hi = np.maximum(a, b).astype(np.int64)
        keep = lo != hi
        return pd.DataFrame({"src": lo[keep], "dst": hi[keep]})

    raw = tds.select_columns(["conv_id", "turn_idx", "tool"]).groupby(
        "conv_id"
    ).map_groups(per_conv, batch_format="pandas")
    return dedup_edges(raw)


def edges_copurchase(sf_dir: str) -> ray.data.Dataset:
    """Parts co-occurring in the same order → canonical deduped edges.

    SQL equivalent:  SELECT DISTINCT a.l_partkey src, b.l_partkey dst
    FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
    AND a.l_partkey < b.l_partkey.

    Ray realization: ``groupby(l_orderkey).map_groups`` (orders are
    tiny groups → no skew), per-group pair expansion with numpy
    triangular indices, then global exact dedup.
    """
    li = ray.data.read_parquet(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"]
    )

    def per_order(g: pd.DataFrame) -> pd.DataFrame:
        parts = np.unique(g["l_partkey"].to_numpy())
        k = len(parts)
        if k < 2:
            return pd.DataFrame({"src": np.array([], np.int64), "dst": np.array([], np.int64)})
        iu, ju = np.triu_indices(k, 1)
        return pd.DataFrame(
            {"src": parts[iu].astype(np.int64), "dst": parts[ju].astype(np.int64)}
        )

    raw = li.groupby("l_orderkey").map_groups(per_order, batch_format="pandas")
    return dedup_edges(raw)
