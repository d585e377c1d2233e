"""PGD-compatible graph file readers (SURVEY.md §2.1 S1-S5).

Reproduces the reference reader contract (graphlet_core.cpp:291-457):
  1. delimiter inference: comma → tab → space (cpp:196-228)
  2. comment lines start '#' or '%' (cpp:349,379)
  3. a 3rd column means weights — parsed then DISCARDED (cpp:184-194)
  4. base detection: if no id 0 appears anywhere, ids are decremented
     (cpp:334-339)
  5. self-loop removal (cpp:391)
  6. undirected + exact dedup (cpp:404-405,530-556)

The generic reader is distributed: ``ray.data.read_text`` →
vectorized pandas string-split inside ``map_batches``; only the O(1)
delimiter sniff and the strict ``.mtx`` header touch the driver.  The
``.mtx`` body itself also streams through ``read_text``.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data

from pgd_ray.graph.normalize import normalize_edges


def detect_delimiter(path: str | Path) -> str:
    """First data line decides: ',' then tab then space
    (graphlet_core.cpp:196-228)."""
    with open(path) as f:
        for line in f:
            if line.startswith(("#", "%")) or not line.strip():
                continue
            if "," in line:
                return ","
            if "\t" in line:
                return "\t"
            return " "
    return " "


def _parse_pairs(delim: str):
    def fn(t: pa.Table) -> pa.Table:
        lines = t["text"].to_pandas()
        lines = lines[~lines.str.startswith(("#", "%"), na=True)]
        lines = lines[lines.str.strip() != ""]
        if lines.empty:
            return pa.table({"src": pa.array([], pa.int64()), "dst": pa.array([], pa.int64())})
        if delim == " ":
            cols = lines.str.split(expand=True)
        else:
            cols = lines.str.strip().str.split(delim, expand=True)
        src = pd.to_numeric(cols[0], errors="coerce")
        dst = pd.to_numeric(cols[1], errors="coerce")
        ok = src.notna() & dst.notna()
        return pa.table(
            {
                "src": src[ok].astype(np.int64).to_numpy(),
                "dst": dst[ok].astype(np.int64).to_numpy(),
            }
        )

    return fn


def read_edge_list(path: str | Path, dense: bool = True):
    """Generic edge-list reader with reference semantics.

    Returns ``(canonical_edge_ds, vids)`` like ``normalize_edges``.
    Weights (a 3rd column) are parsed past and ignored; base shift
    (1-based → 0-based) happens implicitly through the dense relabel,
    which maps sorted raw ids to [0, n) — the reference's decrement
    plus first-seen relabel lands in the same dense space up to vertex
    naming, and every count is relabel-invariant (SURVEY.md §2.2 M3/M4).
    """
    delim = detect_delimiter(path)
    ds = ray.data.read_text(str(path)).map_batches(
        _parse_pairs(delim), batch_format="pyarrow"
    )
    return normalize_edges(ds, dense=dense)


def read_mtx(path: str | Path, dense: bool = True):
    """Strict MatrixMarket reader (graphlet_core.cpp:459-522):
    '%' comments, header 'n n m', 1-based symmetric coordinates."""
    n_declared = None
    skip = 0
    with open(path) as f:
        for line in f:
            skip += 1
            if line.startswith("%"):
                continue
            parts = line.split()
            n_declared = int(parts[0])
            break

    ds = ray.data.read_text(str(path)).map_batches(
        _parse_pairs(" "), batch_format="pyarrow"
    )

    # drop the header row (it parses as a pair (n, n)); it is the only
    # row we must exclude — coordinates are 1-based ≤ n
    def drop_header(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = pc.and_(
            pc.equal(t["src"], n_declared), pc.equal(t["dst"], n_declared)
        )
        # remove at most the single header occurrence per file; a real
        # (n,n) self-loop would be dropped by normalization anyway
        return t.filter(pc.invert(mask))

    ds = ds.map_batches(drop_header, batch_format="pyarrow")
    return normalize_edges(ds, dense=dense)


def read_graph(path: str | Path, dense: bool = True):
    """Extension dispatch (graphlet_core.cpp:259-283): '.mtx' → strict
    reader, everything else → generic edge-list reader."""
    if str(path).endswith(".mtx"):
        return read_mtx(path, dense=dense)
    return read_edge_list(path, dense=dense)
