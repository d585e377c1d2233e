"""pgd_ray — a Ray-Data-native link-graph / data-processing engine.

A from-scratch re-expression of the query and data-processing
capabilities of nkahmed/PGD (parallel graphlet decomposition,
reference snapshot at /root/reference) on top of ``ray.data.Dataset``
pipelines: zero-copy Arrow batches, actor pools for stateful stages,
groupby-aggregate shuffles for message exchange, and streaming
execution throughout.  Extended (per the project north rule) with
PageRank / connected components / label propagation / k-core over an
edge table derived from conversation-transcript Parquet, plus the
training-data-pipeline operators (dedup, similarity search, text
analysis, multimodal plumbing) a 100 TB corpus pipeline needs.

Nothing here calls ``ray.init`` — the driver owns the Ray session.
"""

__version__ = "0.1.0"
