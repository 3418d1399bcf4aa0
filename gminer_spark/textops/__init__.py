"""Text analysis + deduplication for large-scale corpus pipelines."""
