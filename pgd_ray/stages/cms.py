"""Count-Min sketch: sublinear frequency estimation over a key stream.

Cormode & Muthukrishnan (2005): a depth×width counter matrix; row d
increments cell ``splitmix64(key ^ d·C) % width``; the estimate for a
key is the MIN over rows of its cells — always an overestimate, with
error ≤ εN at probability 1-δ for width=⌈e/ε⌉, depth=⌈ln 1/δ⌉.

Why it belongs in a 100-TB engine: exact per-key counts of a
high-cardinality column need a full hash-aggregation shuffle of every
distinct key; the sketch shuffles at most depth×width PARTIAL CELLS
per batch regardless of cardinality, and sketches of disjoint shards
ADD — the canonical mergeable-summary pattern (same family as the HLL
stage in ``stages/cardinality.py``).

Determinism: the repo-wide ``splitmix64`` keyed by ``d·golden`` —
bit-exactly mirrorable in SQL (``_splitmix_sql``), so the driver
oracle reproduces the sketch AND its estimates cell-for-cell.

Scale shape: one ``map_batches`` pass emitting ≤ depth×width nonzero
partial cells per batch → ONE hash aggregation over ≤ depth×width
groups (constant, not data-sized) → the finished sketch is a tiny
driver array, broadcast via ``ray.put`` to the estimation pass.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Sum

from pgd_ray.text.hashing import U64, splitmix64

from pgd_ray.util import bound_cls

CMS_C = 0x9E3779B97F4A7C15  # golden-ratio row key (matches _P2)


def _row_keys(depth: int) -> list[int]:
    return [(d * CMS_C) % (1 << 64) for d in range(depth)]


def _cells(keys: np.ndarray, d_key: int, width: int) -> np.ndarray:
    return (splitmix64(keys.astype(U64) ^ U64(d_key))
            % U64(width)).astype(np.int64)


def cms_sketch(
    ds: ray.data.Dataset,
    col: str,
    width: int = 256,
    depth: int = 4,
    concurrency: int = 16,
) -> np.ndarray:
    """Build the (depth, width) int64 sketch of ``ds[col]`` (int keys).

    Per-batch partials are bincounts (≤ depth×width nonzero cells per
    batch); one constant-size hash aggregation finishes the sketch."""
    if width <= 0 or depth <= 0:
        raise ValueError("width and depth must be positive")
    dkeys = _row_keys(depth)

    def partial(t: pa.Table) -> pa.Table:
        k = t[col].to_numpy(zero_copy_only=False).astype(np.int64)
        rows, cells, cnts = [], [], []
        for d, dk in enumerate(dkeys):
            bc = np.bincount(_cells(k, dk, width), minlength=width)
            nz = np.flatnonzero(bc)
            rows.append(np.full(len(nz), d, dtype=np.int64))
            cells.append(nz.astype(np.int64))
            cnts.append(bc[nz].astype(np.int64))
        return pa.table({"d": np.concatenate(rows),
                         "cell": np.concatenate(cells),
                         "cnt": np.concatenate(cnts)})

    agg = (
        ds.select_columns([col])
        .map_batches(partial, batch_format="pyarrow", batch_size=65536,
                     concurrency=int(concurrency))
        .groupby(["d", "cell"]).aggregate(Sum("cnt", alias_name="n"))
    )
    sk = np.zeros((depth, width), dtype=np.int64)
    for b in agg.iter_batches(batch_size=None, batch_format="pyarrow"):
        sk[b["d"].to_numpy(zero_copy_only=False),
           b["cell"].to_numpy(zero_copy_only=False)] = \
            b["n"].to_numpy(zero_copy_only=False)
    return sk


class _Estimate:
    def __init__(self, sketch_ref, col: str, width: int):
        self.sk = ray.get(sketch_ref) if isinstance(
            sketch_ref, ray.ObjectRef) else sketch_ref
        self.col = col
        self.width = width
        self.dkeys = _row_keys(self.sk.shape[0])

    def __call__(self, t: pa.Table) -> pa.Table:
        k = t[self.col].to_numpy(zero_copy_only=False).astype(np.int64)
        est = np.full(len(k), np.iinfo(np.int64).max, dtype=np.int64)
        for d, dk in enumerate(self.dkeys):
            est = np.minimum(est, self.sk[d, _cells(k, dk, self.width)])
        return pa.table({self.col: pa.array(k, pa.int64()),
                         "est_count": pa.array(est, pa.int64())})


def cms_estimate(
    ds: ray.data.Dataset,
    col: str,
    sketch: np.ndarray,
    concurrency=(1, 16),
) -> ray.data.Dataset:
    """Point-query the sketch for every row of ``ds[col]`` — the
    sketch is ``ray.put`` once and fetched once per worker."""
    ref = ray.put(np.ascontiguousarray(sketch))
    return ds.select_columns([col]).map_batches(
        bound_cls(_Estimate, sketch_ref=ref, col=col,
                  width=sketch.shape[1]),
        batch_format="pyarrow", batch_size=65536,
        concurrency=concurrency,
    )
