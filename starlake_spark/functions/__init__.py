"""Data-pipeline operator library: text analysis, deduplication,
similarity search, multimodal plumbing."""

from starlake_spark.functions import dedup, multimodal, similarity, text

__all__ = ["text", "dedup", "similarity", "multimodal"]
