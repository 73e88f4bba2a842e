"""Content extraction: MIME-dispatched Spark reads + compiled qast filter.

The Spark form of the reference's extract path (reference
src/comlake/core/extract/data.clj:29-37): dispatch on MIME type, parse
CSV/JSON into rows, filter by the compiled predicate. Where the reference
streams one lazy seq on one thread, this reads through spark.read with the
predicate pushed into the scan.

Reference parity pins:
- CSV values stay STRINGS at extract time (csv->json zips raw strings,
  data.clj:23-27; doc/api.md:417-423 shows string year values) — we read
  with inferSchema OFF for extraction.
- ``~`` is a full anchored match on this path (qast.clj:97-101).
- unsupported MIME → UnsupportedType (data.clj:36 nil → HTTP 400
  'failed query', api_test.clj:214-218).
- JSON content is an array of objects → multiLine read
  (projects.json fixture shape).
"""

from __future__ import annotations

from typing import Any

from pyspark.sql import DataFrame, SparkSession

from comlake_core_spark.qast.compiler import compile_predicate
from comlake_core_spark.store.base import ContentStore


class UnsupportedType(ValueError):
    """MIME type not extractable (reference: 'failed query')."""


def read_content(spark: SparkSession, store: ContentStore, cid: str, mime_type: str) -> DataFrame:
    path = store.spark_path(cid)
    if mime_type == "text/csv":
        # header yes, inference no: extract-time values are strings
        return spark.read.option("header", True).csv(path)
    if mime_type == "application/json":
        # JSON array-of-objects (the reference parses whole documents)
        return spark.read.option("multiLine", True).json(path)
    if mime_type in ("application/vnd.apache.parquet", "application/x-parquet"):
        # EXTENSION beyond the reference (it errors on anything but
        # CSV/JSON, data.clj:36): parquet content keeps its native types
        # and gives the extract path real predicate pushdown + column
        # pruning — the format a 100 TB lake actually stores
        return spark.read.parquet(path)
    raise UnsupportedType(f"cannot extract rows from {mime_type!r}")


def extract(
    spark: SparkSession,
    store: ContentStore,
    cid: str,
    ast: Any,
    mime_type: str | None = None,
) -> DataFrame:
    """POST /extract/{cid} (reference HttpHandler.java:219-229): resolve
    content, parse, filter with full-match regex semantics."""
    df = read_content(spark, store, cid, mime_type or "text/csv")
    return df.filter(compile_predicate(ast, schema=df.schema, regex_mode="full"))
