"""Bloom-filter semi-join: the classic big-join prefilter.

A semi-join whose build side fits a few KiB of bits but whose probe
side is the 100-TB table should not shuffle the probe table.  The
Bloom path:

1. ``bloom_bits`` — each build batch hashes its keys k ways
   (splitmix64 with k seed offsets, mod m bits) and emits its set-bit
   INDICES (deduped per batch); a ``groupby(bit)`` merges them and
   the driver folds the <= m distinct indices into one packed uint64
   bit array.  Exchange: O(#batches · bits-set), never rows.
2. ``bloom_semi_join`` — the packed array is broadcast (``ray.put``
   once, zero-copy view per task) and the probe stream drops every
   row whose key misses ANY of the k probes.  Bloom filters have no
   false negatives, so no matching row is ever dropped.
3. Survivors — now ~|matches| + FP·|probe| rows instead of |probe| —
   go through an EXACT hash semi-join against the deduped build keys,
   so the OUTPUT is exactly the semi-join regardless of the false-
   positive rate; the Bloom stage only sheds shuffle volume.

m_bits=2^16 / k=4 give FP ≈ 2.4 % at 5k build keys; size m at
~10 bits/key for 1 % at scale.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import ray
import ray.data
from ray.data.aggregate import Count

from pgd_ray.text.hashing import splitmix64

_SEEDS = np.array([0x9E3779B97F4A7C15, 0xBF58476D1CE4E5B9,
                   0x94D049BB133111EB, 0xD6E8FEB86659FD93],
                  dtype=np.uint64)


def _bit_indices(keys: np.ndarray, m_bits: int, k: int) -> np.ndarray:
    h = keys.astype(np.uint64)[:, None] ^ _SEEDS[None, :k]
    return (splitmix64(h.ravel()) % np.uint64(m_bits)).astype(np.int64)


def bloom_bits(
    build: ray.data.Dataset, key: str, m_bits: int = 1 << 16, k: int = 4
) -> np.ndarray:
    """Packed uint64 Bloom bit array over the build keys."""

    def partial(t: pa.Table) -> pa.Table:
        ks = t[key].to_numpy(zero_copy_only=False)
        if len(ks) == 0:
            return pa.table({"bit": pa.array([], pa.int64())})
        return pa.table({"bit": np.unique(_bit_indices(ks, m_bits, k))})

    bits = (
        build.select_columns([key])
        .map_batches(partial, batch_format="pyarrow")
        .groupby("bit")
        .aggregate(Count())
        .to_pandas()["bit"]
        .to_numpy(np.int64)
    )
    packed = np.zeros((m_bits + 63) // 64, dtype=np.uint64)
    np.bitwise_or.at(packed, bits // 64,
                     np.uint64(1) << (bits % 64).astype(np.uint64))
    return packed


def bloom_semi_join(
    probe: ray.data.Dataset,
    build: ray.data.Dataset,
    key: str,
    build_key: str | None = None,
    m_bits: int = 1 << 16,
    k: int = 4,
    num_partitions: int = 8,
) -> ray.data.Dataset:
    """Rows of ``probe`` whose ``key`` appears in ``build[build_key]``
    — exact output, Bloom-prefiltered shuffle."""
    build_key = build_key or key
    packed = bloom_bits(build, build_key, m_bits, k)
    pref = ray.put(packed)

    def prefilter(t: pa.Table, pref) -> pa.Table:
        bits = ray.get(pref) if isinstance(pref, ray.ObjectRef) else pref
        ks = t[key].to_numpy(zero_copy_only=False)
        if len(ks) == 0:
            return t
        idx = _bit_indices(ks, m_bits, k).reshape(len(ks), k)
        hit = (bits[idx // 64] >> (idx % 64).astype(np.uint64)) & np.uint64(1)
        return t.filter(pa.array(hit.astype(bool).all(axis=1)))

    survivors = probe.map_batches(
        prefilter, fn_kwargs={"pref": pref}, batch_format="pyarrow"
    ).materialize()

    def rn(t: pa.Table) -> pa.Table:
        return pa.table({"__bk": t[build_key]})

    bkeys = (
        build.map_batches(rn, batch_format="pyarrow")
        .groupby("__bk").aggregate(Count())
        .select_columns(["__bk"])
        .materialize()
        .repartition(num_partitions)
        .materialize()
    )
    return survivors.join(
        bkeys, "inner", num_partitions,
        on=(key,), right_on=("__bk",),
        aggregator_ray_remote_args={"num_cpus": 0.25},
    )
