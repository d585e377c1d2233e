"""Deterministic synthetic link graph for scale benchmarks.

The sf0.1 co-purchase graph (1.2M edges) is small enough that one
PageRank iteration is ~15 ms of compute — coordination-bound at 32
CPUs, so it cannot evidence the north-rule scaling criterion.  This
generator produces a transcript-shaped co-occurrence graph (power-law
hub skew like a tool/conversation graph) at tens of millions of edges,
fully deterministic from the seed, with no external data.
"""

from __future__ import annotations

import numpy as np


def synth_powerlaw_pairs(
    n: int = 1_000_000, m: int = 20_000_000, seed: int = 42, skew: float = 2.2
) -> tuple[np.ndarray, np.ndarray]:
    """m raw (src, dst) pairs over n vertices; one endpoint Zipf-skewed
    (hubs at low ids — the tool-vocabulary shape), the other uniform.
    Self-loops / duplicates are left in (the pipeline removes them)."""
    rng = np.random.default_rng(seed)
    src = (rng.random(m) ** skew * n).astype(np.int64)
    dst = (rng.random(m) * n).astype(np.int64)
    return src, dst
