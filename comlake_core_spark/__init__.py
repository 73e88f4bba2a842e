"""comlake_core_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of ComLake/comlake.core, rebuilt Spark-first.

The reference (at /root/reference, v0.4.2) is a data-lake core microservice:
content blobs in IPFS, a metadata catalog in PostgreSQL, and a JSON s-expression
predicate language ("qast") compiled to both a SQL WHERE clause and a JVM row
closure.  Here the same capabilities are re-expressed on Spark DataFrames:

- one qast→Column compiler serves both catalog search and content extraction
  (replacing the reference's two divergent backends, qast.clj:31-50/90-118);
- the catalog is a pair of Parquet-backed DataFrames (content, dataset) with
  append-only versioned updates (PostgreSQL.java:41-62 semantics);
- the content store is an interface (FileSystem.java:25-46 semantics) with a
  local sha256-CID implementation and an IPFS HTTP-gateway adapter;
- extraction is spark.read.csv/json + the compiled Column filter
  (extract/data.clj:29-37 semantics), scaling from one lazy seq to a cluster;
- beyond the reference surface: dedup, similarity search, text analysis and
  multimodal plumbing designed for 100 TB scale.
"""

from comlake_core_spark.session import get_spark, tables, ensure_parallelism
from comlake_core_spark.qast.compiler import compile_qast, compile_predicate, QastError

__version__ = "0.1.0"

__all__ = [
    "get_spark",
    "tables",
    "ensure_parallelism",
    "compile_qast",
    "compile_predicate",
    "QastError",
]


def __getattr__(name):
    # heavier subsystems lazily, so `import comlake_core_spark` stays cheap
    if name == "Catalog":
        from comlake_core_spark.catalog import Catalog

        return Catalog
    if name == "IncrementalRollup":
        from comlake_core_spark.operators.matview import IncrementalRollup

        return IncrementalRollup
    if name == "LocalStore":
        from comlake_core_spark.store import LocalStore

        return LocalStore
    if name == "IpfsStore":
        from comlake_core_spark.store.ipfs import IpfsStore

        return IpfsStore
    if name == "ComlakeServer":
        from comlake_core_spark.server import ComlakeServer

        return ComlakeServer
    raise AttributeError(name)
