from starlake_spark.sources.datasource import StarDataSource, read_star, register

__all__ = ["StarDataSource", "read_star", "register"]
