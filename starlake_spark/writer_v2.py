"""DataFrameWriterV2 surface for star tables.

The reference exposes ``df.writeTo("name")`` through its Spark V2
catalog plugin (reference DataFrameWriterV2Suite.scala:76-456,
catalog/StarLakeCatalog.scala:51-546). Spark's catalog-based
``writeTo`` can't dispatch into a Python data source, so this module is
the closest supported spelling: ``write_to(spark, df, identifier)``
returns a builder with the V2 verbs — ``append`` / ``overwrite(cond)``
/ ``overwritePartitions`` / ``create`` / ``createOrReplace`` /
``replace`` / ``partitionedBy`` / ``tableProperty`` — carrying the
reference semantics case-for-case with refusal-message parity
(tests/test_reference_parity_r6.py ports each suite case).

Identifier forms:

* ``"name"`` — a catalog short name (``<warehouse>/_catalog.json``).
* ``"star.`/path/to/table`"`` — a path identifier, same syntax the SQL
  router accepts (DataFrameWriterV2Suite.scala:418-430: append/read by
  path works; create by path is refused — a short table name can't be
  a path, :432-440).

Divergence from the reference (documented superset):
``overwritePartitions()`` on a RANGE-PARTITIONED table performs a real
dynamic partition overwrite (Spark/Delta partitionOverwriteMode=dynamic)
instead of the reference's blanket "does not support dynamic overwrite"
refusal; unpartitioned tables still refuse with the reference's message
shape, since dynamic overwrite would degenerate to a full overwrite.
"""

from __future__ import annotations

import os
import re

from pyspark.sql import DataFrame, SparkSession

from starlake_spark import catalog
from starlake_spark.meta import ManifestStore
from starlake_spark.table import StarTable, create_table

_PATH_IDENT_RE = re.compile(r"^\s*star\s*\.\s*`(?P<path>[^`]+)`\s*$",
                            re.IGNORECASE)
_TRANSFORM_RE = re.compile(
    r"^\s*(?P<fn>years|months|days|hours)\s*\(", re.IGNORECASE)
_BUCKET_RE = re.compile(r"^\s*bucket\s*\(", re.IGNORECASE)


def write_to(spark: SparkSession, df: DataFrame, identifier: str,
             warehouse: str | None = None) -> "StarWriterV2":
    """``df.writeTo(identifier)`` equivalent — see module docstring."""
    return StarWriterV2(spark, df, identifier, warehouse=warehouse)


class StarWriterV2:
    def __init__(self, spark: SparkSession, df: DataFrame, identifier: str,
                 warehouse: str | None = None):
        self.spark = spark
        self.df = df
        self.identifier = identifier
        self.warehouse = warehouse
        self._options: dict[str, str] = {}
        self._props: dict[str, str] = {}
        self._partitioning: list[str] = []
        m = _PATH_IDENT_RE.match(identifier)
        self._path_ident = os.path.abspath(m["path"]) if m else None

    # ---------- builder surface ----------

    def using(self, provider: str) -> "StarWriterV2":
        if provider.lower() != "star":
            raise ValueError(
                f"write_to targets star tables; got using({provider!r})")
        return self

    def option(self, key: str, value) -> "StarWriterV2":
        self._options[key] = str(value)
        return self

    def options(self, **kw) -> "StarWriterV2":
        for k, v in kw.items():
            self.option(k, v)
        return self

    def tableProperty(self, key: str, value: str) -> "StarWriterV2":
        self._props[key] = value
        return self

    def partitionedBy(self, *cols) -> "StarWriterV2":
        """Identity transforms only — the reference refuses expression
        transforms and bucket transforms with these exact message
        shapes (DataFrameWriterV2Suite.scala:352-409). Hash bucketing
        is declared through tableProperty hashPartitions/hashBucketNum
        instead (the reference routes it the same way — CLUSTERED BY is
        refused, NotSupportedDDLSuite)."""
        out = []
        for c in cols:
            s = c if isinstance(c, str) else _column_sql(c)
            if _BUCKET_RE.match(s):
                raise ValueError(
                    "Bucketing by a partition transform is not supported "
                    "for star tables — declare hashPartitions/"
                    "hashBucketNum table properties instead")
            if _TRANSFORM_RE.match(s):
                raise ValueError(
                    "Partitioning by expressions is not supported for "
                    "star tables — materialize the column first "
                    f"(got {s!r})")
            out.append(s.strip().strip("`"))
        self._partitioning = out
        return self

    # ---------- resolution ----------

    def _resolve(self) -> str | None:
        """Existing table path for the identifier, else None."""
        if self._path_ident is not None:
            return (self._path_ident
                    if ManifestStore.is_star_table(self._path_ident)
                    else None)
        try:
            p = catalog.resolve(self.identifier, self.warehouse)
        except KeyError:
            return None
        return p if ManifestStore.is_star_table(p) else None

    def _table(self, op: str) -> StarTable:
        p = self._resolve()
        if p is None:
            raise ValueError(
                f"{op}: Table or view not found: {self.identifier}")
        return StarTable.for_path(self.spark, p)

    def _align(self, t: StarTable) -> DataFrame:
        """V2 writes resolve BY NAME, not position
        (DataFrameWriterV2Suite.scala:94-108): the column-name sets must
        match exactly; order is normalized to the table's. Type
        widening/casting is the writer's job downstream."""
        import json

        from pyspark.sql import types as T

        schema = T.StructType.fromJson(json.loads(t.info.schema_json))
        table_cols = [f.name for f in schema.fields]
        if set(self.df.columns) != set(table_cols):
            raise ValueError(
                f"schema mismatch writing to {self.identifier}: table "
                f"columns {table_cols} vs data columns "
                f"{list(self.df.columns)} (writeTo resolves by name)")
        return self.df.select(*table_cols)

    # ---------- verbs ----------

    def append(self) -> None:
        t = self._table("append")
        df = self._align(t)
        if t.info.hash_cols:
            # appends to primary-key tables route through upsert, the
            # table's ingest primitive (WriteIntoTable.scala:96-97 —
            # same routing the SQL INSERT path uses)
            t.upsert(df)
        else:
            t.write(df, mode="append")

    def overwrite(self, condition) -> None:
        """Overwrite rows matched by ``condition`` with the data frame —
        replaceWhere semantics: rows in the frame falling OUTSIDE the
        condition refuse the write (DataFrameWriterV2Suite.scala:149-153
        'Invalid data would be written to partitions'). ``lit(True)`` /
        "true" is a full overwrite."""
        t = self._table("overwrite")
        df = self._align(t)
        cond = _column_sql(condition)
        if cond.strip().strip("()").lower() == "true":
            t.write(df, mode="overwrite")
            return
        try:
            t.write(df, mode="overwrite", replace_where=cond)
        except ValueError as e:
            if "outside the predicate" in str(e) \
                    or "do not match predicate" in str(e):
                raise ValueError(
                    "Invalid data would be written to partitions not "
                    f"matched by the overwrite condition {cond!r}: {e}")
            raise

    def overwritePartitions(self) -> None:
        t = self._table("overwritePartitions")
        if not t.info.range_cols:
            # reference message shape (DataFrameWriterV2Suite.scala:200,
            # 221): unpartitioned dynamic overwrite degenerates to a
            # full overwrite — require the caller to say so
            raise ValueError(
                f"Table {self.identifier} does not support dynamic "
                "overwrite (no range partition columns — use "
                "overwrite(lit(True)) for a full overwrite)")
        t.write(self._align(t), mode="overwrite",
                partition_overwrite="dynamic")

    def create(self) -> None:
        if self._path_ident is not None:
            # DataFrameWriterV2Suite.scala:432-440
            raise ValueError(
                f"Short Table name `{self._path_ident}` can't be a path "
                "— writeTo-create registers a catalog name; use "
                "create_table / write.format('star').save(path) for "
                "path-addressed tables")
        if self._resolve() is not None or \
                self.identifier in catalog.list_tables(self.warehouse):
            raise ValueError(
                f"Table {self.identifier} already exists")
        df = self.df
        rng = self._partitioning
        missing = [c for c in rng if c not in df.columns]
        if missing:
            raise ValueError(f"partition column(s) {missing} not in data")
        if rng:
            # partition columns go LAST in the created schema, exactly
            # as Spark/the reference lay out identity-partitioned tables
            # (DataFrameWriterV2Suite.scala:279-293)
            df = df.select(*[c for c in df.columns if c not in rng], *rng)
        props = dict(self._props)
        hash_cols = [c.strip() for c in
                     props.pop("hashPartitions", "").split(",") if c.strip()]
        bucket_num = int(props.pop("hashBucketNum", -1))
        location = self._options.get("path") or os.path.join(
            self.warehouse or catalog.DEFAULT_WAREHOUSE, self.identifier)
        create_table(self.spark, df, location,
                     range_partitions=rng or None,
                     hash_partitions=hash_cols or None,
                     hash_bucket_num=bucket_num,
                     short_name=self.identifier,
                     configuration=props or None,
                     warehouse=self.warehouse)

    def replace(self) -> None:
        raise ValueError(
            "`replaceTable` is not supported for Star tables "
            "(reference DataFrameWriterV2Suite.scala:331-350)")

    def createOrReplace(self) -> None:
        if self._resolve() is not None:
            self.replace()
        self.create()


def _column_sql(cond) -> str:
    """SQL text for a condition: strings pass through; a PySpark Column
    renders via its repr (``Column<'(id = 3)'>``) — the classic-mode
    contract, stable across 3.x/4.x."""
    if isinstance(cond, str):
        return cond
    if isinstance(cond, bool):
        return "true" if cond else "false"
    m = re.match(r"^Column<'(?P<sql>.*)'>$", repr(cond), re.DOTALL)
    if not m:
        raise ValueError(
            f"cannot render condition {cond!r} to SQL — pass a string")
    return m["sql"]
