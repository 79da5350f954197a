"""LLM-data-pipeline operators — first-class extensions beyond the
reference's own surface (BASELINE.json north star): deduplication,
similarity search, text analysis, multimodal columns.

Everything is built from JVM-side `pyspark.sql.functions` (no row-at-a-time
Python in any hot path); the only Python execution is the explicitly-stubbed
multimodal decode, which runs as Arrow-batched `mapInPandas`.
"""

from otterbrix_spark.llm import dedup, similarity, text, multimodal  # noqa: F401

__all__ = ["dedup", "similarity", "text", "multimodal"]
