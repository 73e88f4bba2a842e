"""Schema inference with JSON-Schema draft-07 output (reference parity).

The reference infers schemas at ingest and serves them as JSON Schema
draft-07 (reference src/comlake/core/extract/metadata.clj:26-53):

- CSV: column-wise fold over all rows with a two-type lattice
  {number < string}; blank cells don't demote a number column
  (metadata.clj:41-47 'only consider number and string').
- JSON: full nested inference via a library (metadata.clj:30-34).

Spark-first re-expression:
- the CSV fold is a single distributed aggregate: per column,
  max(0 if blank-or-number else 1) — one scan, partial aggregation,
  no collect. Same lattice, same JSON-number regex (re-number,
  metadata.clj:26-28).
- JSON nesting comes from spark.read.json's own inference; the resulting
  StructType is serialized to draft-07 by struct_to_json_schema.
"""

from __future__ import annotations

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from comlake_core_spark.store.base import ContentStore

# JSON number regex, exactly the reference's re-number (metadata.clj:26-28)
RE_NUMBER = r"-?(?:0|[1-9]\d*)(?:\.\d+)?(?:[eE][+-]?\d+)?"


def infer_csv_property_types(df: DataFrame) -> dict[str, str]:
    """The reference's column fold as one Spark aggregate: a column is
    'number' iff every non-blank cell full-matches the JSON number regex."""
    aggs = [
        F.max(
            F.when(
                (F.col(c).isNull()) | (F.trim(F.col(c)) == "") | F.col(c).rlike(f"^(?:{RE_NUMBER})$"),
                0,
            ).otherwise(1)
        ).alias(c)
        for c in df.columns
    ]
    row = df.agg(*aggs).first()
    return {c: ("string" if row[c] else "number") for c in df.columns}


def infer_csv_schema_json(df: DataFrame, title: str) -> str:
    """Emit the reference's exact draft-07 shape for CSV
    (metadata.clj:48-53: array of objects, properties typed
    number|string)."""
    types = infer_csv_property_types(df)
    return json.dumps(
        {
            "$schema": "http://json-schema.org/draft-07/schema#",
            "title": title,
            "type": "array",
            "items": {
                "type": "object",
                "properties": {name: {"type": t} for name, t in types.items()},
            },
        }
    )


def _datatype_to_schema(dt: T.DataType) -> dict:
    if isinstance(dt, T.StructType):
        return {
            "type": "object",
            "properties": {f.name: _datatype_to_schema(f.dataType) for f in dt.fields},
        }
    if isinstance(dt, T.ArrayType):
        return {"type": "array", "items": _datatype_to_schema(dt.elementType)}
    if isinstance(dt, (T.ByteType, T.ShortType, T.IntegerType, T.LongType)):
        return {"type": "integer"}
    if isinstance(dt, (T.FloatType, T.DoubleType, T.DecimalType)):
        return {"type": "number"}
    if isinstance(dt, T.BooleanType):
        return {"type": "boolean"}
    if isinstance(dt, T.NullType):
        return {"type": "null"}
    return {"type": "string"}


def struct_to_json_schema(schema: T.StructType, title: str, as_array: bool = True) -> str:
    """StructType → JSON Schema draft-07 — the API-parity bridge from
    Spark's native schema to the reference's inferred-schema format."""
    body = _datatype_to_schema(schema)
    doc = {"$schema": "http://json-schema.org/draft-07/schema#", "title": title}
    if as_array:
        doc.update({"type": "array", "items": body})
    else:
        doc.update(body)
    return json.dumps(doc)


def infer_schema_json(spark: SparkSession, store: ContentStore, cid: str, mime_type: str) -> str | None:
    """Dispatch on MIME like the reference's extractor (metadata.clj:55-76);
    None for unsupported types (→ the caller's 'unsupported data type')."""
    path = store.spark_path(cid)
    if mime_type == "text/csv":
        df = spark.read.option("header", True).csv(path)
        return infer_csv_schema_json(df, cid)
    if mime_type == "application/json":
        df = spark.read.option("multiLine", True).json(path)
        return struct_to_json_schema(df.schema, cid, as_array=True)
    return None


def cached_schema(spark: SparkSession, store: ContentStore, catalog, cid: str, mime_type: str) -> str | None:
    """Check catalog cache, infer on miss, write back — the reference's
    schema() flow (metadata.clj:55-65) without the memoized-future
    indirection: Spark jobs are already async-parallel, and the catalog
    cache (content.extra['schema']) is the durable memo."""
    saved = catalog.get_schema(cid)
    if saved:
        return saved
    result = infer_schema_json(spark, store, cid, mime_type)
    if result is not None:
        catalog.set_schema(cid, result)
    return result
