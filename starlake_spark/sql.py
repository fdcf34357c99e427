"""StarSession — SQL entry point with catalog integration and
materialized-view query rewriting.

The reference wires itself into Spark's analyzer/catalog via session
extensions (StarSparkSessionExtension.scala:72-120). A pure-Python
engine instead owns its SQL entry point: registered star tables become
temp views backed by their MoR snapshot DataFrames, and SELECT text is
given to the MV rewriter (starlake_spark.plans.mv) before falling
through to ``spark.sql`` — same observable semantics, no JVM plugin
(SURVEY §4 'MV query rewriting', option b).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from starlake_spark import catalog
from starlake_spark.table import StarTable, create_table


class StarSession:
    def __init__(self, spark: SparkSession, warehouse: str | None = None):
        self.spark = spark
        self.warehouse = warehouse
        self._tables: dict[str, StarTable] = {}
        self._mv_enabled = True

    # ---------- catalog ----------

    def create_table(self, df, path: str, name: str | None = None, **kw) -> StarTable:
        t = create_table(self.spark, df, path, short_name=name,
                         warehouse=self.warehouse, **kw)
        if name:
            self._tables[name] = t
        return t

    def register(self, name: str, table_or_path) -> StarTable:
        t = (table_or_path if isinstance(table_or_path, StarTable)
             else StarTable.for_path(self.spark, table_or_path))
        self._tables[name] = t
        return t

    def table(self, name: str) -> StarTable:
        if name not in self._tables:
            self._tables[name] = StarTable.for_name(self.spark, name, self.warehouse)
        return self._tables[name]

    # ---------- SQL ----------

    def _sync_views(self) -> None:
        for name, t in self._tables.items():
            t.to_df().createOrReplaceTempView(name)

    def sql(self, text: str, rewrite: bool | None = None) -> DataFrame:
        """Run SQL over registered star tables, trying MV rewrite first
        (RewriteQueryByMaterialView.scala:44-1268; any rewrite failure
        silently falls back to the original plan, :1158-1160)."""
        self._sync_views()
        if rewrite is None:
            rewrite = self._mv_enabled
        if rewrite:
            try:
                from starlake_spark.plans import mv

                hit = mv.try_rewrite(self, text)
                if hit is not None:
                    return hit
            except Exception:
                pass
        return self.spark.sql(text)

    # ---------- materialized views ----------

    def create_material_view(self, name: str, path: str, sql_text: str,
                             auto_update: bool = False) -> StarTable:
        from starlake_spark.plans import mv

        return mv.create_material_view(self, name, path, sql_text, auto_update)

    def update_material_view(self, name: str) -> None:
        from starlake_spark.plans import mv

        mv.update_material_view(self, name)
