from comlake_core_spark.store.base import ContentStore
from comlake_core_spark.store.local import LocalStore

__all__ = ["ContentStore", "LocalStore"]
