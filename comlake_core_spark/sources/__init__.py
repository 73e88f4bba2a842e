from comlake_core_spark.sources.comlake_source import ComlakeDataSource, register

__all__ = ["ComlakeDataSource", "register"]
