"""Approximate distinct counting (HyperLogLog) with bit-exact,
SQL-auditable register state.

``stages.distinct`` is exact but shuffles one row per distinct
(key, value) pair; at 10^10+ distinct values a fixed-size sketch is
the right tool.  This HLL is built so the DISTRIBUTED part is
integer-deterministic end to end:

* hash = splitmix64 (``text.hashing`` — already mirrored in DuckDB
  HUGEINT SQL by ``__ray_entry__._splitmix_sql``),
* bucket = top ``p`` hash bits, rho = leading-zero count of the
  remaining 64-p bits + 1 (exact integer bit-length via shift
  cascade, no float log2 — DuckDB mirrors it with ``length(bin(w))``),
* per-batch partial max per bucket (combiner) → one tiny
  ``groupby("bucket").max`` — at most 2^p rows ever shuffle.

The register table is therefore bit-reproducible in SQL (driver
oracle `hll_users`); only the final scalar estimate involves float
math (Flajolet et al. 2007 estimator + small-range correction),
kept driver-side and validated by error-bound tests.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray.data
from ray.data.aggregate import Max


def _bit_length_u64(x: np.ndarray) -> np.ndarray:
    """Exact integer bit length of uint64 values (0 → 0)."""
    bl = np.zeros(x.shape, dtype=np.int64)
    x = x.copy()
    for s in (32, 16, 8, 4, 2, 1):
        big = x >= (np.uint64(1) << np.uint64(s))
        bl[big] += s
        x[big] >>= np.uint64(s)
    return bl + (x != 0)


def hll_registers(
    ds: ray.data.Dataset, col: str, p: int = 12
) -> ray.data.Dataset:
    """HLL register table for an integer column: columns
    (bucket, rho) with one row per non-empty bucket (≤ 2^p rows).
    NULL values are ignored (COUNT DISTINCT semantics)."""
    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")
    from pgd_ray.text.hashing import splitmix64

    shift = np.uint64(64 - p)
    wmask = np.uint64((1 << (64 - p)) - 1)
    wbits = 64 - p

    def regs(t: pa.Table) -> pa.Table:
        c = t[col].combine_chunks()
        c = c.filter(c.is_valid())
        if len(c) == 0:
            return pa.table({"bucket": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        h = splitmix64(c.to_numpy(zero_copy_only=False).astype(np.uint64))
        bucket = (h >> shift).astype(np.int64)
        rho = wbits - _bit_length_u64(h & wmask) + 1
        order = np.argsort(bucket, kind="stable")
        bs, rs = bucket[order], rho[order]
        ub, start = np.unique(bs, return_index=True)
        return pa.table({"bucket": ub,
                         "rho": np.maximum.reduceat(rs, start)})

    return (
        ds.select_columns([col])
        .map_batches(regs, batch_format="pyarrow")
        .groupby("bucket")
        .aggregate(Max("rho", alias_name="rho"))
    )


def hll_estimate(registers: pd.DataFrame, p: int = 12) -> float:
    """Cardinality estimate from a (bucket, rho) register table.
    Standard bias-corrected HLL with the small-range (linear
    counting) correction; 64-bit hashes need no large-range term."""
    m = 1 << p
    M = np.zeros(m, dtype=np.float64)
    if len(registers):  # empty input → empty (possibly column-less) table
        M[registers["bucket"].to_numpy()] = registers["rho"].to_numpy()
    if m >= 128:
        alpha = 0.7213 / (1 + 1.079 / m)
    elif m == 64:
        alpha = 0.709
    elif m == 32:
        alpha = 0.697
    else:
        alpha = 0.673
    est = alpha * m * m / np.sum(np.exp2(-M))
    zeros = int(np.count_nonzero(M == 0))
    if est <= 2.5 * m and zeros:
        est = m * np.log(m / zeros)
    return float(est)


def approx_distinct(ds: ray.data.Dataset, col: str, p: int = 12) -> float:
    """One-shot approximate COUNT(DISTINCT col) — relative standard
    error ≈ 1.04 / sqrt(2^p) (~1.6 % at the default p=12)."""
    return hll_estimate(hll_registers(ds, col, p).to_pandas(), p)
