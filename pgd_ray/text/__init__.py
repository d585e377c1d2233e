"""Text-analysis and deduplication stages for training-data pipelines."""

from pgd_ray.text.analysis import (
    text_stats,
    lang_id,
    fingerprints,
    repetition_stats,
    vocab_topk,
)
from pgd_ray.text.dedup import (
    exact_dedup,
    minhash_lsh_dedup,
    simhash_dedup,
    simhash_pairs_ds,
    embedding_neardup,
    embedding_neardup_ds,
)
from pgd_ray.text.sampling import cap_per_group, sample_by_hash, stratified_sample

__all__ = [
    "text_stats",
    "lang_id",
    "fingerprints",
    "vocab_topk",
    "repetition_stats",
    "exact_dedup",
    "minhash_lsh_dedup",
    "simhash_dedup",
    "simhash_pairs_ds",
    "embedding_neardup",
    "embedding_neardup_ds",
    "sample_by_hash",
    "stratified_sample",
    "cap_per_group",
]
