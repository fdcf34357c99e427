"""Per-column merge operators for the merge-on-read key collapse.

Reference parity: batch/merge_operator/MergeOperator.scala:28-72 defines
``MergeOperator[T].mergeData(input: Seq[T]): T`` with built-ins
DefaultMergeOp (take last version), MergeOpInt / MergeOpLong (sum across
versions, null→0 — MergeOperatorSuite.scala:299-338) and MergeOpString
(comma-concat across versions). The reference registers them as marker
ScalaUDFs and strips them out of the plan with a catalyst rule
(rules/ExtractMergeOperator.scala:32-100); here they are an explicit
``merge_ops={'col': op}`` parameter on the read path — same semantics,
no plan surgery.

Each operator is expressed as a Column transform over the per-key
version list ``array<struct<v:long, x:T>>`` (sorted ascending by commit
version, entries only for versions whose files physically contain the
column — the ``file_exist_cols`` rule of MergeParquetScan.scala:128-138).
Built-ins stay entirely JVM-side (higher-order functions, codegen'd);
custom Python callables run as one Arrow-batched pandas UDF over the
collected lists — the slow path, clearly marked.
"""

from __future__ import annotations

from typing import Callable

import pandas as pd
from pyspark.sql import Column, functions as F, types as T


class MergeOperator:
    """Base: subclass and override ``column(versions, dtype)`` for
    JVM-side ops, or pass a Python callable to :class:`PythonMergeOp`.

    ``singleton_identity``: True iff ``op([x]) == x`` — i.e. the
    operator is the identity on a single-version list. All built-ins
    are (last/sum/concat/min/max of one value is that value), which
    lets the reader serve already-compacted partitions as a plain
    columnar scan. Operators WITHOUT this property (e.g. a
    count-of-versions or length-style custom op) force the reader to
    route even single-version partitions through the operator algebra,
    so results are consistent across a half-compacted table.

    ``associative``: True iff ``op(vs1 + vs2) == op([op(vs1)] + vs2)``
    for any version-ordered split — i.e. folding a contiguous PREFIX of
    versions into one intermediate value and re-folding gives the same
    answer. This is exactly what the part-merge OOM guard does
    (StarLakePartFileMerge.scala:31-104 merges the oldest chunk of
    files into an intermediate stamped before the rest), so chunked
    compaction is only offered to tables whose declared operators all
    have it. Every built-in does (last / sum / min / max, and concat
    because the chunk is a contiguous version prefix)."""

    name = "base"
    singleton_identity = True
    associative = True

    def column(self, versions: Column, dtype: T.DataType) -> Column:
        raise NotImplementedError


class LastMergeOp(MergeOperator):
    """DefaultMergeOp (MergeOperator.scala:54-58): value from the highest
    write_version whose file contains the column — explicit null wins
    (MergeOperatorSuite.scala:272-296 'merge return null')."""

    name = "last"

    def column(self, versions: Column, dtype: T.DataType) -> Column:
        # versions is sorted ascending by v; take the final element's x.
        n = F.size(versions)
        return F.when(n > 0, F.get(versions, n - 1).getField("x"))


class SumMergeOp(MergeOperator):
    """MergeOpInt/MergeOpLong (MergeOperator.scala:61-65): sum across all
    versions, null treated as 0."""

    name = "sum"

    def column(self, versions: Column, dtype: T.DataType) -> Column:
        zero = F.lit(0).cast(dtype)
        total = F.aggregate(
            versions,
            zero,
            lambda acc, e: acc + F.coalesce(e.getField("x"), F.lit(0).cast(dtype)),
        )
        # no version carries the column at all → NULL, not 0
        return F.when(F.size(versions) > 0, total)


class ConcatMergeOp(MergeOperator):
    """MergeOpString (MergeOperator.scala:68-72): comma-joined concat of
    all version values (nulls skipped by array_join)."""

    name = "concat"

    def __init__(self, sep: str = ","):
        self.sep = sep

    def column(self, versions: Column, dtype: T.DataType) -> Column:
        vals = F.transform(versions, lambda e: e.getField("x").cast("string"))
        return F.when(F.size(versions) > 0, F.array_join(vals, self.sep))


class MinMergeOp(MergeOperator):
    name = "min"

    def column(self, versions: Column, dtype: T.DataType) -> Column:
        return F.array_min(F.transform(versions, lambda e: e.getField("x")))


class MaxMergeOp(MergeOperator):
    name = "max"

    def column(self, versions: Column, dtype: T.DataType) -> Column:
        return F.array_max(F.transform(versions, lambda e: e.getField("x")))


class PythonMergeOp(MergeOperator):
    """Custom merge logic: ``fn(values: list) -> value`` applied to the
    ascending-version value list. Arrow-batched pandas UDF — use only
    when the built-ins can't express the semantics (SURVEY §2.4)."""

    name = "python"
    # conservative: an opaque callable is NOT assumed identity on a
    # singleton version list — pass singleton_identity=True to restore
    # the plain-scan fast path for ops that are (e.g. a custom max) —
    # nor assumed associative (part-merge falls back to the one-shot
    # full merge rather than chunk-fold an op like count-of-versions)
    singleton_identity = False
    associative = False

    def __init__(self, fn: Callable, result_type: T.DataType | str | None = None,
                 singleton_identity: bool = False, associative: bool = False):
        self.fn = fn
        self.result_type = result_type
        self.singleton_identity = singleton_identity
        self.associative = associative

    def column(self, versions: Column, dtype: T.DataType) -> Column:
        fn = self.fn
        rtype = self.result_type or dtype

        def _merge(series: "pd.Series") -> "pd.Series":
            return series.map(
                lambda entries: fn([e["x"] for e in entries]) if entries is not None else None
            )

        _merge.__annotations__ = {"series": pd.Series, "return": pd.Series}
        return F.pandas_udf(_merge, rtype)(versions)


_REGISTRY: dict[str, Callable[[], MergeOperator]] = {
    "last": LastMergeOp,
    "default": LastMergeOp,
    "sum": SumMergeOp,
    "concat": ConcatMergeOp,
    "min": MinMergeOp,
    "max": MaxMergeOp,
}


def register_merge_operator(name: str, factory: Callable[[], MergeOperator]) -> None:
    """Analogue of StarTable.registerMergeOperator (tables.py:20-291)."""
    _REGISTRY[name] = factory


def resolve(op) -> MergeOperator:
    if isinstance(op, MergeOperator):
        return op
    if isinstance(op, str):
        if op not in _REGISTRY:
            raise KeyError(f"unknown merge operator '{op}' (have {sorted(_REGISTRY)})")
        return _REGISTRY[op]()
    if callable(op):
        return PythonMergeOp(op)
    raise TypeError(f"cannot resolve merge operator from {op!r}")
