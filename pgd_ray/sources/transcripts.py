"""Conversation-transcript table: the engine's external input shape.

Schema (BASELINE.json input_hint / FIXTURES.md §1):
    (conv_id: string, turn_idx: int32, role: string, text: string,
     tool: string, ts: timestamp[us])

Three producers:
  * ``derive_transcripts(sf_dir)`` — deterministic derivation from the
    driver-generated ``events`` table (so the DuckDB oracle can compute
    the identical table with window functions; see
    ``__ray_entry__.oracle_sql``).
  * ``transcripts_from_edges(src,dst)`` — golden re-encoding: one
    two-turn conversation per edge so the transcript→edge stage
    reproduces an arbitrary target graph exactly (FIXTURES.md §1).
  * ``synth_transcripts`` — seeded random transcripts for property
    tests and large-scale benchmarks.

Invariant carried through every downstream stage: per-turn ``text``
equality under stable ``(conv_id, turn_idx)`` ordering
(``stable_turns`` materializes that ordering for comparison).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

TRANSCRIPT_SCHEMA = pa.schema(
    [
        ("conv_id", pa.string()),
        ("turn_idx", pa.int32()),
        ("role", pa.string()),
        ("text", pa.string()),
        ("tool", pa.string()),
        ("ts", pa.timestamp("us")),
    ]
)

_ROLES = np.array(["user", "assistant", "tool"])


from pgd_ray.util import default_blocks as _block_count


def derive_transcripts(sf_dir: str) -> ray.data.Dataset:
    """events → transcripts, deterministically.

    Rule (mirrored 1:1 in SQL by the oracle):
      conv_id  = 'c' || user_id
      turn_idx = rank of the event within its user, ordered by
                 (ts, event_id), 0-based
      role     = ['user','assistant','tool'][event_id % 3]
      text     = props        (carried byte-identical)
      tool     = event_type
      ts       = ts

    The partition-rank is computed WITHOUT per-group Python (a
    ``map_groups`` call per conversation would cost one interpreter
    round-trip per conversation — untenable at 10⁹ conversations):
    one global ``sort(user_id, ts, event_id)`` shuffle, then per-block
    vectorized segment ranks.  A conversation whose rows straddle block
    boundaries gets its rank offset fixed by a tiny driver-side pass
    over per-block fragment summaries (#fragments ≤ 2 × #blocks).
    """
    from pgd_ray.util import read_parquet_clean

    ev = read_parquet_clean(
        f"{sf_dir}/events.parquet",
        columns=["event_id", "ts", "user_id", "event_type", "props"],
        override_num_blocks=_block_count(),
    )
    srt = ev.sort(["user_id", "ts", "event_id"]).materialize()

    # pass 1 (cheap): per-block fragment summary of the boundary users
    def frag_summary(t: pa.Table) -> pa.Table:
        if t.num_rows == 0:
            return pa.table({"user_id": pa.array([], pa.int64()),
                             "min_eid": pa.array([], pa.int64()),
                             "min_ts": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        tsv = t["ts"].to_numpy(zero_copy_only=False).astype("datetime64[us]").astype(np.int64)
        out_u, out_e, out_t, out_c = [], [], [], []
        for key in {uid[0], uid[-1]}:
            mask = uid == key
            out_u.append(int(key))
            out_e.append(int(eid[mask][0]))  # sorted → first row = fragment min
            out_t.append(int(tsv[mask][0]))
            out_c.append(int(mask.sum()))
        return pa.table({"user_id": pa.array(out_u, pa.int64()),
                         "min_eid": pa.array(out_e, pa.int64()),
                         "min_ts": pa.array(out_t, pa.int64()),
                         "cnt": pa.array(out_c, pa.int64())})

    frags = srt.map_batches(frag_summary, batch_format="pyarrow", batch_size=None).to_pandas()
    # offsets: fragments of one user ordered by their (sorted) min event
    # fragments ordered by the global sort key (ts, event_id) within user
    frags = frags.sort_values(["user_id", "min_ts", "min_eid"], kind="stable")
    frags["offset"] = frags.groupby("user_id")["cnt"].cumsum() - frags["cnt"]
    offset_map = {
        (int(u), int(e)): int(o)
        for u, e, o in zip(frags["user_id"], frags["min_eid"], frags["offset"])
    }
    offset_ref = ray.put(offset_map)

    def emit(t: pa.Table) -> pa.Table:
        from pgd_ray.graph.cache import get_cached

        if t.num_rows == 0:
            return pa.table({f.name: pa.array([], f.type) for f in TRANSCRIPT_SCHEMA})
        offs = get_cached(offset_ref)
        uid = t["user_id"].to_numpy(zero_copy_only=False)
        eid = t["event_id"].to_numpy(zero_copy_only=False)
        n = len(uid)
        new_seg = np.empty(n, dtype=bool)
        new_seg[0] = True
        new_seg[1:] = uid[1:] != uid[:-1]
        seg_start = np.maximum.accumulate(np.where(new_seg, np.arange(n), 0))
        rank = np.arange(n) - seg_start
        # boundary users: add this fragment's global offset
        for key in {int(uid[0]), int(uid[-1])}:
            mask = uid == key
            off = offs.get((key, int(eid[mask][0])), 0)
            if off:
                rank[mask] += off
        conv = np.char.add("c", uid.astype(str))
        return pa.table(
            {
                "conv_id": pa.array(conv.astype(object), pa.string()),
                "turn_idx": pa.array(rank.astype(np.int32), pa.int32()),
                "role": pa.array(_ROLES[eid % 3].astype(object), pa.string()),
                "text": t["props"],
                "tool": t["event_type"],
                "ts": t["ts"],
            }
        )

    return srt.map_batches(emit, batch_format="pyarrow", batch_size=None)


def transcripts_from_edges(src, dst, start_ts: int = 0) -> pa.Table:
    """Golden re-encoding: edge i → conversation ``e{i}`` with two
    turns whose ``tool`` fields carry the endpoint ids (``v{id}``).

    Running the transcript→edge stage over this table reproduces the
    input edge list exactly (used to replay the reference's golden
    graphs through the full pipeline, FIXTURES.md §1).
    """
    src = np.asarray(src, dtype=np.int64)
    dst = np.asarray(dst, dtype=np.int64)
    k = len(src)
    conv = np.repeat(np.char.add("e", np.arange(k).astype(str)), 2)
    turn = np.tile(np.array([0, 1], dtype=np.int32), k)
    tools = np.empty(2 * k, dtype=object)
    tools[0::2] = np.char.add("v", src.astype(str))
    tools[1::2] = np.char.add("v", dst.astype(str))
    roles = np.where(turn == 0, "user", "assistant")
    text = np.char.add("turn-text-", np.arange(2 * k).astype(str))
    ts = (start_ts + np.arange(2 * k)).astype("datetime64[us]")
    return pa.table(
        {
            "conv_id": pa.array(conv, pa.string()),
            "turn_idx": pa.array(turn, pa.int32()),
            "role": pa.array(roles.astype(object), pa.string()),
            "text": pa.array(text.astype(object), pa.string()),
            "tool": pa.array(list(tools), pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )


def synth_transcripts(
    n_convs: int,
    mean_turns: int = 8,
    n_tools: int = 50,
    seed: int = 7,
) -> pa.Table:
    """Seeded synthetic transcripts (no external data; deterministic)."""
    rng = np.random.default_rng(seed)
    turns_per_conv = 1 + rng.poisson(mean_turns - 1, n_convs)
    total = int(turns_per_conv.sum())
    conv = np.repeat(np.char.add("c", np.arange(n_convs).astype(str)), turns_per_conv)
    turn = np.concatenate([np.arange(t, dtype=np.int32) for t in turns_per_conv])
    role = _ROLES[rng.integers(0, 3, total)]
    # zipf-ish tool popularity → realistic hub skew in the tool graph
    ranks = np.arange(1, n_tools + 1)
    probs = 1.0 / ranks
    probs /= probs.sum()
    tool = np.char.add("tool", rng.choice(n_tools, total, p=probs).astype(str))
    text = np.char.add("text-", rng.integers(0, 1 << 30, total).astype(str))
    ts = (np.arange(total) * 1000).astype("datetime64[us]")
    return pa.table(
        {
            "conv_id": pa.array(conv.astype(object), pa.string()),
            "turn_idx": pa.array(turn, pa.int32()),
            "role": pa.array(role.astype(object), pa.string()),
            "text": pa.array(text.astype(object), pa.string()),
            "tool": pa.array(tool.astype(object), pa.string()),
            "ts": pa.array(ts, pa.timestamp("us")),
        }
    )


def stable_turns(tds: ray.data.Dataset) -> ray.data.Dataset:
    """The transcript table in its stable ``(conv_id, turn_idx)``
    ordering, text carried through — the per-row invariant surface."""
    return tds.select_columns(["conv_id", "turn_idx", "text"]).sort(
        ["conv_id", "turn_idx"]
    )
