from starlake_spark.sources.datasource import (
    StarDataSource,
    read_star,
    register,
    table_changes,
)

__all__ = ["StarDataSource", "read_star", "register", "table_changes"]
