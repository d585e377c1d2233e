"""Text-analysis and deduplication stages for training-data pipelines."""

from pgd_ray.text.analysis import text_stats, lang_id, fingerprints, vocab_topk
from pgd_ray.text.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    simhash_dedup,
    embedding_neardup,
)
from pgd_ray.text.sampling import sample_by_hash

__all__ = [
    "text_stats",
    "lang_id",
    "fingerprints",
    "vocab_topk",
    "exact_dedup",
    "minhash_lsh_dedup",
    "simhash_dedup",
    "embedding_neardup",
    "sample_by_hash",
]
