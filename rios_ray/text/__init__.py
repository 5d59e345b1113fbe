"""Text-analysis + dedup operators for large-scale training-data pipelines."""
