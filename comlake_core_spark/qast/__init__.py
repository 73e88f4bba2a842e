from comlake_core_spark.qast.compiler import compile_qast, QastError, default_resolver
from comlake_core_spark.qast.sqlgen import qast_to_sql

__all__ = ["compile_qast", "QastError", "default_resolver", "qast_to_sql"]
