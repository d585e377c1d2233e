"""Small shared helpers."""

from __future__ import annotations


def strip_schema_metadata(t):
    """Drop Arrow schema metadata (e.g. the ``pandas`` blob parquet
    files attach).  Schemas with metadata are unhashable, which makes
    every downstream sort/groupby reduce task log "Failed to hash the
    schemas (for deduplication): unhashable type: 'dict'" and skip a
    fast path; stripping costs nothing (buffers are shared)."""
    if t.schema.metadata:
        return t.replace_schema_metadata(None)
    return t


def default_blocks(factor: int = 2, floor: int = 8) -> int:
    """A sensible Dataset block count for this cluster: ~factor blocks
    per CPU.  Ray's default (200) drowns small/medium inputs in task
    overhead; explicit block counts keep shuffles proportional."""
    try:
        import ray

        return max(floor, int(ray.cluster_resources().get("CPU", 16)) * factor)
    except Exception:
        return 32


def list_array_2d(m, value_type=None):
    """(nrows, k) numpy matrix → Arrow LargeListArray of k-element
    rows, built from the flat value buffer + offsets (one FFI call;
    ``pa.array(list(m))`` pays one per row)."""
    import numpy as np
    import pyarrow as pa

    m = np.ascontiguousarray(m)
    nrows, k = m.shape
    offs = np.arange(nrows + 1, dtype=np.int64) * k
    vals = pa.array(m.reshape(-1), value_type) if value_type else pa.array(m.reshape(-1))
    return pa.LargeListArray.from_arrays(offs, vals)
