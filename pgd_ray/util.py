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
