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
import pyarrow as pa
import ray
import ray.data

from pgd_ray.graph.normalize import dedup_edges


def tool_vocab(tds: ray.data.Dataset) -> np.ndarray:
    """Sorted distinct tool strings (the node universe of the
    transcript tool graph).

    Per-batch ``pc.unique`` combiner merged with one Arrow unique on
    the driver — the result is the O(#tools) vocabulary the caller
    holds anyway, so a distributed distinct (groupby on strings) only
    re-shuffles rows the driver must collect regardless (measured 13 s
    → 1.5 s on a 5 M-turn table).  Scale path past ~10⁹ tools: a
    per-node second-level combiner before the driver merge."""
    import pyarrow.compute as pc

    def to_tool(t: pa.Table) -> pa.Table:
        col = t["tool"]
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        u = pc.unique(col.drop_null())
        return pa.table({"tool": u})

    parts = [
        b["tool"].combine_chunks() if isinstance(b["tool"], pa.ChunkedArray) else b["tool"]
        for b in tds.select_columns(["tool"])
        .map_batches(to_tool, batch_format="pyarrow")
        .iter_batches(batch_size=1 << 20, batch_format="pyarrow")
        if b.num_rows
    ]
    if not parts:
        return np.array([], dtype=object)
    merged = pc.unique(pa.concat_arrays([p.cast(pa.string()) for p in parts]))
    return np.sort(np.asarray(merged.to_pylist(), dtype=object))


def edges_from_transcripts(
    tds: ray.data.Dataset,
    vocab: np.ndarray | None = None,
    dedup: bool = True,
    return_vocab: bool = False,
):
    """Consecutive-turn tool co-occurrence edges.

    One global ``sort(conv_id, turn_idx)`` (the single shuffle), then
    per-BLOCK vectorized pairing of each turn's tool with the next
    turn's tool, tools mapped to dense ids via the broadcast
    vocabulary, canonicalized, self-loops dropped; global exact dedup
    afterwards.  ``text`` is never touched — the per-turn
    text-equality invariant holds by construction.

    When ``vocab`` is not supplied it is derived from the already
    materialized *sorted* table, so the input parquet is scanned
    exactly once (at 10^12 turns a second vocabulary scan of the raw
    input would double the read cost).  ``return_vocab=True`` hands
    the vocabulary back alongside the edges for callers that need the
    id→tool mapping (e.g. ``build_csr(n=len(vocab))``).
    """
    from pgd_ray.util import strip_schema_metadata

    srt = (
        tds.select_columns(["conv_id", "turn_idx", "tool"])
        .map_batches(strip_schema_metadata, batch_format="pyarrow")
        .sort(["conv_id", "turn_idx"])
        .materialize()
    )
    if vocab is None:
        vocab = tool_vocab(srt)
    vocab_ref = ray.put(np.asarray(vocab, dtype=object))

    def pairs_in_block(t: pa.Table) -> pa.Table:
        from pgd_ray.graph.cache import get_cached

        empty = pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        if t.num_rows < 2:
            return empty
        vv = get_cached(vocab_ref)
        conv = t["conv_id"].to_numpy(zero_copy_only=False)
        tool = t["tool"].to_numpy(zero_copy_only=False)
        same = conv[1:] == conv[:-1]
        a = np.searchsorted(vv, tool[:-1][same])
        b = np.searchsorted(vv, tool[1:][same])
        lo = np.minimum(a, b).astype(np.int64)
        hi = np.maximum(a, b).astype(np.int64)
        keep = lo != hi
        return pa.table({"src": lo[keep], "dst": hi[keep]})

    raw = srt.map_batches(pairs_in_block, batch_format="pyarrow", batch_size=None)

    # stitch pairs that span block boundaries: one summary row per block
    def block_edges(t: pa.Table) -> pa.Table:
        cols = {"fconv": pa.string(), "fturn": pa.int64(), "lconv": pa.string(),
                "lturn": pa.int64(), "ltool": pa.string(), "ftool": pa.string()}
        if t.num_rows == 0:
            return pa.table({k: pa.array([], v) for k, v in cols.items()})
        return pa.table(
            {
                "fconv": pa.array([t["conv_id"][0].as_py()], pa.string()),
                "fturn": pa.array([int(t["turn_idx"][0].as_py())], pa.int64()),
                "lconv": pa.array([t["conv_id"][-1].as_py()], pa.string()),
                "lturn": pa.array([int(t["turn_idx"][-1].as_py())], pa.int64()),
                "ltool": pa.array([t["tool"][-1].as_py()], pa.string()),
                "ftool": pa.array([t["tool"][0].as_py()], pa.string()),
            }
        )

    bdf = srt.map_batches(block_edges, batch_format="pyarrow", batch_size=None).to_pandas()
    extra_src, extra_dst = [], []
    if len(bdf) > 1:
        vv = np.asarray(vocab, dtype=object)
        # blocks ordered by their first (conv, turn) — unique per block
        bdf = bdf.sort_values(["fconv", "fturn"], kind="stable").reset_index(drop=True)
        for bidx in range(len(bdf) - 1):
            if (
                bdf.loc[bidx, "lconv"] == bdf.loc[bidx + 1, "fconv"]
                and int(bdf.loc[bidx + 1, "fturn"]) == int(bdf.loc[bidx, "lturn"]) + 1
            ):
                x = int(np.searchsorted(vv, bdf.loc[bidx, "ltool"]))
                y = int(np.searchsorted(vv, bdf.loc[bidx + 1, "ftool"]))
                if x != y:
                    extra_src.append(min(x, y))
                    extra_dst.append(max(x, y))
    if extra_src:
        raw = raw.union(
            ray.data.from_arrow(
                pa.table({"src": pa.array(extra_src, pa.int64()),
                          "dst": pa.array(extra_dst, pa.int64())})
            )
        )
    # dedup=False hands the raw pairs to a fused consumer
    # (pipelines.graph_build dedups during CSR assembly)
    out = dedup_edges(raw) if dedup else raw
    return (out, vocab) if return_vocab else out


def _segment_pairs(keys: np.ndarray, vals: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """All within-segment value pairs of a key-sorted array, fully
    vectorized (no per-group Python): for each row r at position p in
    its segment, pair it with the p earlier rows."""
    n = len(keys)
    if n == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    new_seg = np.empty(n, dtype=bool)
    new_seg[0] = True
    new_seg[1:] = keys[1:] != keys[:-1]
    seg_start = np.maximum.accumulate(np.where(new_seg, np.arange(n), 0))
    pos = np.arange(n) - seg_start
    total = int(pos.sum())
    if total == 0:
        return np.empty(0, np.int64), np.empty(0, np.int64)
    j_idx = np.repeat(np.arange(n), pos)
    offs = np.arange(total) - np.repeat(np.concatenate(([0], np.cumsum(pos)[:-1])), pos)
    i_idx = np.repeat(seg_start, pos) + offs
    a, b = vals[i_idx], vals[j_idx]
    lo = np.minimum(a, b).astype(np.int64)
    hi = np.maximum(a, b).astype(np.int64)
    keep = lo != hi
    return lo[keep], hi[keep]


def copurchase_pairs(sf_dir: str) -> ray.data.Dataset:
    """Raw (pre-dedup) co-purchase pairs — see ``edges_copurchase``.

    SQL equivalent:  SELECT DISTINCT a.l_partkey src, b.l_partkey dst
    FROM lineitem a JOIN lineitem b ON a.l_orderkey = b.l_orderkey
    AND a.l_partkey < b.l_partkey.

    Ray realization (vectorized — a per-group ``map_groups`` pays one
    Python call per order, which dominates at millions of orders):
    global ``sort(l_orderkey)`` (the one shuffle), then per-BLOCK
    segment pair expansion in pure numpy.  An order whose rows straddle
    a block boundary is excluded from in-block expansion (its rows are
    emitted as marker rows ``dst = -(orderkey+1)``) and completed on
    the driver — at most 2 boundary orders per block, so the driver
    work is O(#blocks × order size).
    """
    from pgd_ray.util import default_blocks

    from pgd_ray.util import read_parquet_clean

    li = read_parquet_clean(
        f"{sf_dir}/lineitem.parquet", columns=["l_orderkey", "l_partkey"],
        override_num_blocks=default_blocks(),
    )
    srt = li.sort("l_orderkey")

    def expand(t: pa.Table) -> pa.Table:
        ok = t["l_orderkey"].to_numpy(zero_copy_only=False)
        pk = t["l_partkey"].to_numpy(zero_copy_only=False)
        if len(ok) == 0:
            return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        interior = (ok != ok[0]) & (ok != ok[-1])
        lo, hi = _segment_pairs(ok[interior], pk[interior])
        bmask = ~interior
        bsrc = pk[bmask].astype(np.int64)
        bdst = -(ok[bmask].astype(np.int64) + 1)  # marker rows
        return pa.table(
            {"src": np.concatenate([lo, bsrc]), "dst": np.concatenate([hi, bdst])}
        )

    raw = srt.map_batches(expand, batch_format="pyarrow", batch_size=None).materialize()

    # complete the boundary orders on the driver (tiny)
    markers = raw.filter(expr="dst < 0")
    bm = markers.to_pandas()
    okeys = -(bm["dst"].to_numpy()) - 1
    order = np.argsort(okeys, kind="stable")
    extra_lo, extra_hi = _segment_pairs(okeys[order], bm["src"].to_numpy()[order])
    pairs = raw.filter(expr="dst >= 0")
    if len(extra_lo):
        pairs = pairs.union(
            ray.data.from_arrow(pa.table({"src": extra_lo, "dst": extra_hi}))
        )
    return pairs


def edges_copurchase(sf_dir: str) -> ray.data.Dataset:
    """Parts co-occurring in the same order → canonical deduped edges
    (the composable-operator form; the benchmark path fuses the dedup
    into ``pipelines.graph_build.build_graph``)."""
    return dedup_edges(copurchase_pairs(sf_dir))
