"""starlake_spark — a PySpark-native lakehouse engine.

A from-scratch rebuild of the capabilities of the reference system
(engine-plus/StarLake, surveyed in SURVEY.md): versioned parquet tables
with range (directory) partitions and hash-bucketed primary keys, ACID
commits through a file-based manifest metastore, merge-on-read upserts
with a pluggable per-column merge-operator algebra, UPDATE / DELETE /
UPSERT / COMPACTION DML, materialized views with query rewriting, and an
exactly-once structured-streaming sink — all expressed Spark-first with
the DataFrame / SQL API so Catalyst + Tungsten plan the physical
execution.

On top of the reference surface it adds the operators a large-scale
training-data pipeline needs (``starlake_spark.functions``):
deduplication (exact / MinHash-LSH / SimHash / n-gram Jaccard /
embedding-cosine), similarity search (brute-force + LSH-bucketed ANN),
text analysis (language id, quality scoring, token counting,
fingerprinting), and multimodal binary-column plumbing.

Reference parity citations use ``file:line`` of /root/reference.
"""

from starlake_spark.session import get_spark, star_session
from starlake_spark.table import StarTable, convert_to_star, create_table
from starlake_spark.sql import StarSession
from starlake_spark.writer_v2 import write_to
from starlake_spark import merge_ops

__version__ = "0.1.0"

__all__ = [
    "StarTable",
    "StarSession",
    "convert_to_star",
    "create_table",
    "get_spark",
    "star_session",
    "merge_ops",
    "write_to",
]
