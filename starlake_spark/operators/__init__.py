"""Storage-side operators: bucketed transactional writes, merge-on-read
scans, and DML rewrites (upsert / update / delete / compaction)."""

from starlake_spark.operators.writer import write_files, normalize_for_write
from starlake_spark.operators.reader import scan

__all__ = ["write_files", "normalize_for_write", "scan"]
