"""Document-table sources: one reader for the three formats a text
corpus ships in — Parquet (columnar, the scale path), CSV, and JSONL —
dispatched on extension like ``io.read_graph``.

All readers return the same normalized schema
(``doc_id: int64, text: string`` + passthrough extras), so every text
stage (dedup family, analysis, fingerprints, multimodal synth)
consumes any format unchanged.  Parquet gets column pruning pushed to
the read; CSV/JSONL are row formats, so columns are projected right
after parse (the bytes still leave storage — prefer Parquet at scale,
this is stated, not hidden).
"""

from __future__ import annotations

from pathlib import Path

import pyarrow as pa
import ray.data


def _normalize_docs(ds: ray.data.Dataset, columns: list[str] | None) -> ray.data.Dataset:
    cols = columns or ["doc_id", "text"]

    def norm(t: pa.Table) -> pa.Table:
        out = {}
        for c in cols:
            col = t[c]
            if c == "doc_id":
                col = col.cast(pa.int64())
            elif c == "text":
                col = col.cast(pa.string())
            out[c] = col
        return pa.table(out)

    return ds.map_batches(norm, batch_format="pyarrow")


def read_documents(
    path: str | Path, columns: list[str] | None = None, **read_kwargs
) -> ray.data.Dataset:
    """Extension dispatch: ``.parquet``/``.pq`` (or a directory of
    them) → ``read_parquet`` with column pruning; ``.csv`` →
    ``read_csv``; ``.jsonl``/``.json`` → ``read_json`` (newline-
    delimited).  Returns (doc_id int64, text string, *extras)."""
    p = Path(path)
    suffix = p.suffix.lower()
    if suffix in (".parquet", ".pq") or p.is_dir():
        from pgd_ray.util import read_parquet_clean

        ds = read_parquet_clean(
            str(p), columns=columns or ["doc_id", "text"], **read_kwargs
        )
        return _normalize_docs(ds, columns)
    if suffix == ".csv":
        ds = ray.data.read_csv(str(p), **read_kwargs)
        return _normalize_docs(ds, columns)
    if suffix in (".jsonl", ".json"):
        ds = ray.data.read_json(str(p), **read_kwargs)
        return _normalize_docs(ds, columns)
    raise ValueError(f"unsupported document format: {p.suffix!r} ({p})")
