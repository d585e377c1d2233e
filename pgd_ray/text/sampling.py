"""Deterministic content-hash sampling.

At 100 TB you never sample with an RNG: a content-hash predicate is
reproducible across reruns/retries, partition-invariant, and cheap to
mirror in SQL for audits.  ``sample_by_hash`` keeps a row iff the
first 16 bits of ``md5(text)`` fall below a threshold — rate
granularity 1/65536, bit-exactly mirrored by DuckDB's
``substr(md5(text), 1, 4) < '<hex>'`` (fixed-width lowercase hex
compares lexicographically = numerically).  md5 is the SQL-anchored
choice (same contract as ``text.analysis.Fingerprint``); the
engine-native vectorized samplers (splitmix64 content hashes, e.g.
``graph.graphlets.graphlet_macro_approx``) are preferred where no SQL
mirror is required.

The predicates are STATELESS (a few ints / a tiny dict captured by
closure), so the stages run as plain map_batches tasks — no actor
pool, no constructor args in the object store (the ray#53727 restart
hazard), and retries are trivially safe.

The reference has no sampling operator (SURVEY.md §2.8); this is a
round-2 training-pipeline addition.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pandas as pd
import ray.data

# any hex-digit string is < "g***": the sentinel threshold that keeps
# every row while staying inside the fixed-width lexicographic compare
_KEEP_ALL = "g000"


def _task_cap(concurrency):
    if concurrency is None:
        return None
    if isinstance(concurrency, (tuple, list)):
        return int(concurrency[-1])
    return int(concurrency)


def _thr_hex(threshold_16bit: int) -> str:
    if not 0 <= threshold_16bit <= 0x10000:
        raise ValueError("threshold must be in [0, 65536]")
    # 0x10000 would format as the 5-char '10000' and break the
    # fixed-width compare — it means "keep all"
    return _KEEP_ALL if threshold_16bit == 0x10000 else format(threshold_16bit, "04x")


def _md5_prefixes(texts) -> np.ndarray:
    return np.array(
        [hashlib.md5(t.encode()).hexdigest()[:4] for t in texts], dtype=object
    )


def sample_by_hash(
    docs: ray.data.Dataset,
    threshold_16bit: int = 0x4000,
    column: str = "text",
    concurrency=(1, 16),
) -> ray.data.Dataset:
    """Keep rows where ``int(md5(column)[:4], 16) < threshold_16bit``
    (default 0x4000 → a deterministic 25 % sample).  Adds the ``h4``
    hex prefix column for auditability."""
    thr = _thr_hex(threshold_16bit)

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        # NULL text is dropped (not hashed as "") — matching the SQL
        # mirror, where md5(NULL) IS NULL fails any comparison.
        b = b[b[column].notna().to_numpy()]
        h4 = _md5_prefixes(b[column])
        mask = np.asarray(h4 < thr, dtype=bool)
        out = b[mask].copy()
        out["h4"] = h4[mask]
        return out

    return docs.map_batches(
        fn, batch_format="pandas", batch_size=4096,
        concurrency=_task_cap(concurrency),
    )


def stratified_sample(
    docs: ray.data.Dataset,
    group_col: str,
    rates_16bit: dict,
    default_16bit: int = 0x10000,
    column: str = "text",
    concurrency=(1, 16),
) -> ray.data.Dataset:
    """Deterministic per-group sampling: a row in group g survives iff
    ``int(md5(column)[:4], 16) < rates_16bit.get(g, default)``.
    Groups absent from the map keep the default rate (0x10000 = keep
    all).  Same SQL-auditable predicate as ``sample_by_hash``."""
    thr_map = {g: _thr_hex(t) for g, t in rates_16bit.items()}
    default_hex = _thr_hex(default_16bit)

    def fn(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[column].notna().to_numpy()]
        h4 = _md5_prefixes(b[column])
        # Series.map(dict) is the C path (missing keys → NaN → default);
        # _KEEP_ALL thresholds compare above every hex prefix
        thr = b[group_col].map(thr_map).fillna(default_hex).to_numpy(dtype=object)
        mask = np.asarray(h4 < thr, dtype=bool)
        out = b[mask].copy()
        out["h4"] = h4[mask]
        return out

    return docs.map_batches(
        fn, batch_format="pandas", batch_size=4096,
        concurrency=_task_cap(concurrency),
    )


def cap_per_group(
    docs: ray.data.Dataset,
    group_col: str,
    n: int,
    id_col: str,
    column: str = "text",
    concurrency=(1, 16),
) -> ray.data.Dataset:
    """At most ``n`` rows per group, chosen DETERMINISTICALLY — the
    kept subset is the n smallest by (md5(column), id_col), i.e. a
    uniform reproducible draw, not "first n seen" (which would depend
    on scan order).  The heavy lifting is ``stages.topn.grouped_topk``
    (sorted blocks + O(n · #blocks) boundary stitch); rows gain
    ``md5`` and ``rnk`` columns.  Classic corpus-balancing cap:
    "no source may contribute more than n documents"."""
    from pgd_ray.stages.topn import grouped_topk

    def md5_col(b: pd.DataFrame) -> pd.DataFrame:
        b = b[b[column].notna().to_numpy()].copy()
        b["md5"] = [hashlib.md5(t.encode()).hexdigest() for t in b[column]]
        return b

    hashed = docs.map_batches(
        md5_col, batch_format="pandas", batch_size=4096,
        concurrency=_task_cap(concurrency),
    )
    return grouped_topk(
        hashed, group_col, ["md5", id_col], [False, False], k=n
    )


def weighted_sample_topk(
    docs: ray.data.Dataset,
    k: int,
    weight_col: str = "n_chars",
    id_col: str = "doc_id",
    batch_size: int = 65536,
) -> pd.DataFrame:
    """Deterministic weighted sampling WITHOUT replacement
    (Efraimidis–Spirakis A-ES): row i gets key u_i^(1/w_i) with
    u_i = (splitmix64(id) >> 11 + 1) · 2^-53 ∈ (0, 1]; the k largest
    keys are the sample — inclusion probability ∝ weight, and the
    draw is a pure function of the ids (rerun/retry/partition
    invariant, SQL-mirrorable).  Ranked by the monotone equivalent
    ``score = ln(u)/w`` (descending, ties -> min id); returns
    (id, weight, score), score the ranking value.

    One streamed pass: each batch emits its local top-k (#batches × k
    driver merge — the topk_cosine shape); no sort, no shuffle."""
    import pyarrow as pa

    from pgd_ray.text.hashing import splitmix64

    def local_top(t: pa.Table) -> pa.Table:
        ids = t[id_col].to_numpy(zero_copy_only=False).astype(np.int64)
        w = t[weight_col].to_numpy(zero_copy_only=False).astype(np.float64)
        if not len(ids):
            return pa.table({id_col: pa.array([], pa.int64()),
                             weight_col: pa.array([], pa.float64()),
                             "score": pa.array([], pa.float64())})
        u = ((splitmix64(ids) >> np.uint64(11)).astype(np.float64) + 1.0) \
            * 2.0 ** -53
        score = np.log(u) / w
        kk = min(k, len(ids))
        order = np.lexsort((ids, -score))[:kk]
        return pa.table({id_col: pa.array(ids[order], pa.int64()),
                         weight_col: pa.array(w[order], pa.float64()),
                         "score": pa.array(score[order], pa.float64())})

    cands = docs.select_columns([id_col, weight_col]).map_batches(
        local_top, batch_format="pyarrow", batch_size=batch_size
    ).to_pandas()
    if cands.empty:
        # empty Datasets drop their schema through to_pandas
        return pd.DataFrame({id_col: pd.Series([], dtype=np.int64),
                             weight_col: pd.Series([], dtype=np.float64),
                             "score": pd.Series([], dtype=np.float64)})
    cands = cands.sort_values(["score", id_col],
                              ascending=[False, True], ignore_index=True)
    return cands.head(k).reset_index(drop=True)


def mixture_weights(
    docs: ray.data.Dataset,
    tau: float = 0.7,
    text_col: str = "text",
    group_col: str = "source",
) -> pd.DataFrame:
    """Static training-mixture reweighting (the multilingual-LM /
    DoReMi-lite temperature rule): per-source token mass T_s → natural
    share p_s = T_s/ΣT → training weight w_s ∝ p_s^τ (τ<1 upsamples
    tail sources) → boost = w_s/p_s, the factor a sampler applies to
    that source.

    Scale shape: per-batch (source, token-partial) rows — the shuffle
    carries ≤ #sources rows per batch, never documents — one hash
    groupby, then closed-form math on the #sources driver rows.  Token
    contract = the corpus-wide ``TOKEN_RE`` with re.ASCII (identical
    to the SQL ``regexp_extract_all`` mirror).  Returns
    (source, tokens, p, w, boost), floats rounded to 6.
    """
    import re

    import pyarrow as pa
    from ray.data.aggregate import Sum

    from pgd_ray.text.analysis import TOKEN_RE

    tok_re = re.compile(TOKEN_RE, re.ASCII)

    def partials(t: pa.Table) -> pa.Table:
        s = t[text_col].to_pandas().fillna("")
        tok = s.str.count(tok_re).to_numpy(np.int64)
        g = pd.Series(tok).groupby(
            t[group_col].to_pandas().to_numpy()).sum()
        return pa.table({group_col: pa.array(g.index, pa.string()),
                         "tok": pa.array(g.to_numpy(np.int64))})

    tot = (docs.select_columns([group_col, text_col])
           .map_batches(partials, batch_format="pyarrow")
           .groupby(group_col).aggregate(Sum("tok", alias_name="tokens"))
           .to_pandas().sort_values(group_col, ignore_index=True))
    t = tot["tokens"].to_numpy(np.int64)
    p = t / float(t.sum())
    pw = p ** float(tau)
    w = pw / pw.sum()
    return pd.DataFrame({
        group_col: tot[group_col],
        "tokens": t,
        "p": np.round(p, 6),
        "w": np.round(w, 6),
        "boost": np.round(w / p, 6),
    })
