"""Generic pipeline stages: similarity search, multimodal plumbing,
micro-output writers, univariate stats, windowing, per-group top-k,
exact distributed quantiles, as-of/range joins."""
