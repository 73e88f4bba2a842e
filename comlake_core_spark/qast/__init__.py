from comlake_core_spark.qast.compiler import compile_qast, QastError, default_resolver

__all__ = ["compile_qast", "QastError", "default_resolver"]
