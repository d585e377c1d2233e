"""Text-analysis and deduplication stages for training-data pipelines."""

from pgd_ray.text.analysis import text_stats, lang_id, fingerprints
from pgd_ray.text.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    simhash_dedup,
    embedding_neardup,
)

__all__ = [
    "text_stats",
    "lang_id",
    "fingerprints",
    "exact_dedup",
    "minhash_lsh_dedup",
    "simhash_dedup",
    "embedding_neardup",
]
