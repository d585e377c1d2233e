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


def read_parquet_clean(path, columns=None, **kw):
    """``ray.data.read_parquet`` with the file's schema pre-stripped of
    metadata (the parquet ``pandas`` blob makes Arrow schemas
    unhashable in this pyarrow build, so every read/sort/groupby task
    logs "Failed to hash the schemas" and Ray skips its schema-dedup
    fast path).  Passing the stripped — and, when ``columns`` is
    given, projected — schema to the read itself fixes the noise at
    the source with no extra pipeline stage."""
    import os

    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    p0 = path[0] if isinstance(path, (list, tuple)) else path
    if os.path.isdir(p0):
        names = sorted(n for n in os.listdir(p0) if n.endswith(".parquet"))
        p0 = os.path.join(p0, names[0]) if names else None
    try:
        sch = pq.ParquetFile(p0).schema_arrow.remove_metadata()
        if columns is not None:
            sch = pa.schema([sch.field(c) for c in columns])
    except Exception:
        sch = None  # odd layout (partitioned dirs etc.) — plain read
    return ray.data.read_parquet(path, columns=columns, schema=sch, **kw)


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


def bound_cls(cls, /, **kwargs):
    """Subclass of ``cls`` whose no-arg ``__init__`` applies
    ``kwargs`` — actor-pool ``map_batches`` stages built this way need
    no ``fn_constructor_kwargs``, so Ray never parks constructor
    arguments in the object store (the ray#53727 restart hazard: an
    actor whose plasma-held ctor args are evicted cannot restart).
    The bound values travel inside the serialized class definition
    instead, which restarts re-deserialize self-contained."""

    class _Bound(cls):
        def __init__(self):
            super().__init__(**kwargs)

    _Bound.__name__ = cls.__name__
    _Bound.__qualname__ = getattr(cls, "__qualname__", cls.__name__)
    return _Bound


def int_sum_headroom(x, what: str = "integer sum"):
    """Guard exact-integer aggregate magnitudes (ADVICE r4): int64
    partial sums of scaled-money products (e.g. q1's ch6 ≈ 4e10/row)
    approach 2^63 near sf≈150, where the engine would silently wrap
    while the SQL oracle's HUGEINT keeps going.  Fail loudly at 2^62
    — one bit of headroom before wraparound — so exactness claims
    never degrade into silent divergence.  Returns ``x`` unchanged."""
    import numpy as np

    a = np.asarray(x)
    if a.size and int(np.abs(a).max()) >= (1 << 62):
        raise OverflowError(
            f"{what}: |sum| >= 2^62 — int64 exact-arithmetic headroom "
            "exhausted at this scale factor; accumulate this column in "
            "split hi/lo partials or object-dtype integers")
    return x


def round_half_away(x, nd: int = 6):
    """Round half AWAY from zero at ``nd`` decimals — SQL ROUND
    semantics (DuckDB/ANSI), unlike numpy's round-half-to-even.
    Exact-tie values at the nd-th digit otherwise hash-mismatch the
    oracle by exactly 10^-nd (observed at sf0.01, ADVICE-class)."""
    import numpy as np

    x = np.asarray(x, dtype=np.float64)
    s = 10.0 ** nd
    return np.sign(x) * np.floor(np.abs(x) * s + 0.5) / s
