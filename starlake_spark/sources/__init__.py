from starlake_spark.sources.datasource import StarDataSource, register

__all__ = ["StarDataSource", "register"]
