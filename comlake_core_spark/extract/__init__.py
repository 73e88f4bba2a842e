from comlake_core_spark.extract.reader import extract, read_content, UnsupportedType
from comlake_core_spark.extract.schema_infer import infer_schema_json, struct_to_json_schema

__all__ = ["extract", "read_content", "UnsupportedType", "infer_schema_json", "struct_to_json_schema"]
