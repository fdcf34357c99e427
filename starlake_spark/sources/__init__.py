from starlake_spark.sources.datasource import (
    StarDataSource,
    read_star,
    register,
    range_changes,
    table_changes,
)

__all__ = ["StarDataSource", "range_changes", "read_star", "register", "table_changes"]
