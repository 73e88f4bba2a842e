from comlake_core_spark.catalog.catalog import Catalog, MissingMetadata

__all__ = ["Catalog", "MissingMetadata"]
