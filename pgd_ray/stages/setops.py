"""Distributed set operations with SQL DISTINCT semantics — the one
relational family the reference has no trace of (SURVEY §2.8 lists
union/dedup only; INTERSECT / EXCEPT are absent) and Ray Data lacks
natively.

Distribution shape: each side runs ONE map_batches pass that collapses
to per-batch DISTINCT key tuples tagged with a side id (the combiner —
shuffle volume is per-batch-distinct rows, never raw occurrences), the
tagged streams union, and a single hash groupby over the key tuple
aggregates (Min(tag), Max(tag)).  Set membership falls out of the two
tag extremes: a tuple present on both sides has min=1 ∧ max=2,
left-only has max=1, right-only min=2.  One all-to-all; stateless
filter after it; the result stays a Dataset.

Hot keys are harmless: the groupby key IS the value tuple, so a key's
group never exceeds 2·#blocks rows after the per-batch combiner.
"""

from __future__ import annotations

import pyarrow as pa
import ray.data
from ray.data.aggregate import Max, Min

_TAG = "__setop_tag__"


def _tagged(ds: ray.data.Dataset, cols: list[str], tag: int) -> ray.data.Dataset:
    def fn(t: pa.Table) -> pa.Table:
        d = t.select(cols).group_by(cols).aggregate([])
        return d.append_column(_TAG, pa.array([tag] * d.num_rows, pa.int8()))

    return ds.select_columns(cols).map_batches(
        fn, batch_format="pyarrow", batch_size=65536)


def _classified(left: ray.data.Dataset, right: ray.data.Dataset,
                cols: list[str]) -> ray.data.Dataset:
    u = _tagged(left, cols, 1).union(_tagged(right, cols, 2))
    return u.groupby(cols).aggregate(Min(_TAG), Max(_TAG))


def _finish(g: ray.data.Dataset, cols: list[str], keep) -> ray.data.Dataset:
    mn, mx = f"min({_TAG})", f"max({_TAG})"

    def fn(t: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        mask = keep(pc, t[mn], t[mx])
        return t.filter(mask).select(cols)

    return g.map_batches(fn, batch_format="pyarrow", batch_size=65536)


def intersect_distinct(left: ray.data.Dataset, right: ray.data.Dataset,
                       cols: list[str]) -> ray.data.Dataset:
    """SQL ``SELECT DISTINCT cols FROM left INTERSECT ... right``."""
    return _finish(
        _classified(left, right, cols), cols,
        lambda pc, mn, mx: pc.and_(pc.equal(mn, 1), pc.equal(mx, 2)))


def except_distinct(left: ray.data.Dataset, right: ray.data.Dataset,
                    cols: list[str]) -> ray.data.Dataset:
    """SQL ``SELECT DISTINCT cols FROM left EXCEPT ... right``."""
    return _finish(
        _classified(left, right, cols), cols,
        lambda pc, mn, mx: pc.equal(mx, 1))


def union_distinct(left: ray.data.Dataset, right: ray.data.Dataset,
                   cols: list[str]) -> ray.data.Dataset:
    """SQL ``SELECT cols FROM left UNION ... right`` (distinct set
    semantics) — completes the set-operation family.  Same
    tagged-union shape: per-batch distinct combiner on each side, ONE
    hash groupby, keep everything."""
    return _finish(
        _classified(left, right, cols), cols,
        lambda pc, mn, mx: pc.greater_equal(mx, 1))
