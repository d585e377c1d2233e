"""Generic pipeline stages: similarity search, multimodal plumbing,
micro-output writers, univariate stats."""
