"""Vectorized, process-stable string hashing over Arrow buffers.

Every text sketch in the engine (exact dedup, MinHash shingles,
SimHash token hashes) reduces to "hash many variable-length byte
segments of one contiguous buffer".  This module does that with O(1)
Python calls per BATCH (never per row/token/byte):

* ``poly_segment_hash`` — polynomial hash of arbitrary segments via
  prefix sums: S[j] = Σ_{i<j} b[i]·p^i (uint64 wraparound), so
  hash[s,e) = (S[e] − S[s]) · p^{−s}; p odd ⇒ invertible mod 2^64.
  A splitmix64 finalizer disperses the algebraic structure and mixes
  in the segment length.
* ``poly_ngram_hash`` — the same prefix sums evaluated at every
  k-window (rolling shingle hashes for the whole batch at once).
* ``fnv1a_rows`` — exact FNV-1a 64 per row, vectorized ACROSS rows
  (one pass per byte position over the batch's padded byte matrix,
  masked by row length) — bit-identical to the per-byte reference
  loop, ~max_len vector ops per batch instead of Σlen Python ops.

NOTE: never use the builtin ``hash()`` in sketches — Python salts
string hashing per process, which would make sketches differ across
Ray workers.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

U64 = np.uint64
_P1 = U64(0x100000001B3)  # FNV prime (odd → invertible mod 2^64)
_P2 = U64(0x9E3779B97F4A7C15)  # golden-ratio odd constant
_INV = {p: U64(pow(int(p), -1, 1 << 64)) for p in (_P1, _P2)}


def splitmix64(x: np.ndarray) -> np.ndarray:
    x = x.astype(U64, copy=True)
    x += U64(0x9E3779B97F4A7C15)
    x ^= x >> U64(30)
    x *= U64(0xBF58476D1CE4E5B9)
    x ^= x >> U64(27)
    x *= U64(0x94D049BB133111EB)
    x ^= x >> U64(31)
    return x


def arrow_string_bytes(col: pa.ChunkedArray | pa.Array) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """(bytes, starts, ends) of a string/large_string column — the
    concatenated utf-8 buffer plus per-row segment bounds, zero-copy
    from the Arrow offsets/data buffers (nulls become empty rows)."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    if col.null_count:
        col = col.fill_null("")
    if pa.types.is_large_string(col.type):
        arr = col
    else:
        arr = col.cast(pa.large_string())
    buffers = arr.buffers()  # [validity, offsets, data]
    offsets = np.frombuffer(buffers[1], dtype=np.int64, count=len(arr) + 1 + arr.offset)[
        arr.offset :
    ]
    data = np.frombuffer(buffers[2], dtype=np.uint8, count=int(offsets[-1]))
    return data[offsets[0] :], offsets[:-1] - offsets[0], offsets[1:] - offsets[0]


def _prefix(data: np.ndarray, p: np.uint64) -> tuple[np.ndarray, np.ndarray]:
    """(S, ipw): S[j] = Σ_{i<j} b[i]·p^i;  ipw[j] = p^{−j}  (mod 2^64)."""
    n = len(data)
    pw = np.full(n, p, dtype=U64)
    if n:
        pw[0] = U64(1)
    pw = np.cumprod(pw)  # p^0 .. p^{n-1}, wraps mod 2^64
    S = np.zeros(n + 1, dtype=U64)
    if n:
        np.cumsum(data.astype(U64) * pw, out=S[1:])
    ipw = np.full(n + 1, _INV[p], dtype=U64)
    ipw[0] = U64(1)
    ipw = np.cumprod(ipw)
    return S, ipw


def poly_segment_hash(
    data: np.ndarray, starts: np.ndarray, ends: np.ndarray, p: np.uint64 = _P1
) -> np.ndarray:
    """64-bit hash of each [start, end) segment; one vector pass."""
    S, ipw = _prefix(data, p)
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    h = (S[ends] - S[starts]) * ipw[starts]
    return splitmix64(h ^ (ends - starts).astype(U64))


def poly_segment_hash128(
    data: np.ndarray, starts: np.ndarray, ends: np.ndarray
) -> tuple[np.ndarray, np.ndarray]:
    """Two independent 64-bit segment hashes (collision-safe grouping
    key for exact dedup: birthday bound 2^64 on the pair)."""
    return (
        poly_segment_hash(data, starts, ends, _P1),
        poly_segment_hash(data, starts, ends, _P2),
    )


def poly_ngram_hash(data: np.ndarray, k: int, p: np.uint64 = _P1) -> np.ndarray:
    """Rolling k-gram hashes: out[i] = hash(data[i:i+k]) for every
    window start i in [0, len−k]; callers mask out windows that cross
    their row boundaries."""
    n = len(data)
    if n < k:
        return np.empty(0, dtype=U64)
    S, ipw = _prefix(data, p)
    idx = np.arange(n - k + 1)
    h = (S[idx + k] - S[idx]) * ipw[idx]
    return splitmix64(h ^ U64(k))


def fnv1a_rows(data: np.ndarray, starts: np.ndarray, ends: np.ndarray) -> np.ndarray:
    """Exact FNV-1a 64 of each row — identical to the sequential
    reference (h=offset; per byte: h=(h^b)*prime) but iterated over
    BYTE POSITIONS with all rows advanced in lockstep."""
    starts = np.asarray(starts, dtype=np.int64)
    ends = np.asarray(ends, dtype=np.int64)
    lens = ends - starts
    h = np.full(len(starts), U64(1469598103934665603), dtype=U64)
    max_len = int(lens.max()) if len(lens) else 0
    prime = U64(1099511628211)
    for j in range(max_len):
        alive = lens > j
        if not alive.any():
            break
        idx = starts[alive] + j
        h[alive] = (h[alive] ^ data[idx].astype(U64)) * prime
    return h


def rows_of_positions(starts: np.ndarray, ends: np.ndarray, n_positions: int) -> np.ndarray:
    """row id of every byte position (for masking n-gram windows):
    searchsorted over the row starts."""
    return np.searchsorted(np.asarray(starts, dtype=np.int64), np.arange(n_positions), side="right") - 1
