"""catalog scan/join/revision/time-travel workloads

Split from the monolithic workloads.py (VERDICT r5 "Next round" #6).
Module organization CANNOT move the driver window: registration order is
re-pinned to the original monolith order by _REGISTRATION_ORDER in
workloads/__init__.py, and tests/test_driver_window.py pins the first-50.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comlake_core_spark.qast.compiler import compile_predicate, default_resolver
from comlake_core_spark.session import tables

from ._base import _t, dec, workload



# ---------------------------------------------------------------------------
# Reference parity: the catalog query (POST /find)
# join + filter + projection, reference PostgreSQL.java:51-54,157-178
# ---------------------------------------------------------------------------


@workload(
    "catalog_find",
    """
    WITH content AS (
      SELECT CAST(doc_id AS VARCHAR) AS cid, lang AS type FROM documents
    ), dataset AS (
      SELECT doc_id AS id, CAST(doc_id AS VARCHAR) AS file,
             source, n_chars FROM documents
    )
    SELECT d.id, c.cid, c.type, d.source, d.n_chars
    FROM dataset d JOIN content c ON d.file = c.cid
    WHERE d.n_chars < 250 AND c.type = 'en'
    """,
    "catalog",
    "join",
)
def catalog_find(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The one relational query in the reference: dataset ⋈ content on
    file = cid, qast WHERE, fixed projection (PostgreSQL.java:51-54).
    The content side is a small dim → Catalyst broadcast-hash join; at
    100 TB the dataset side stays shuffle-free."""
    (docs,) = _t(spark, sf_dir, "documents")
    content = docs.select(F.col("doc_id").cast("string").alias("cid"), F.col("lang").alias("type"))
    dataset = docs.select(
        F.col("doc_id").alias("id"),
        F.col("doc_id").cast("string").alias("file"),
        "source",
        "n_chars",
    )
    joined = dataset.join(F.broadcast(content), dataset.file == content.cid, "inner")
    ast = ["&", ["<", [".", ["$"], "n_chars"], 250], ["==", [".", ["$"], "type"], "en"]]
    return joined.filter(compile_predicate(ast, schema=joined.schema)).select(
        "id", "cid", "type", "source", "n_chars"
    )




@workload(
    "catalog_latest_revision",
    """
    SELECT o_orderkey, o_custkey, strftime(o_orderdate, '%Y-%m-%d') AS rev_date
    FROM (
      SELECT *, row_number() OVER (
        PARTITION BY o_custkey ORDER BY o_orderdate DESC, o_orderkey DESC
      ) AS rn FROM orders
    ) WHERE rn = 1
    """,
    "catalog",
    "window",
)
def catalog_latest_revision(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Latest revision per tree: the reference's dataset versioning forms a
    parent-chain (table.sql:5-13, PostgreSQL.java:128-154); 'current version
    of each dataset' = argmax over the chain — here as row_number over a
    key, the scalable form of the walk (no iterative join needed for the
    latest-revision question)."""
    (orders,) = _t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        orders.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "o_orderkey",
            "o_custkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("rev_date"),
        )
    )




# ---------------------------------------------------------------------------
# The real Catalog.find under the oracle gate + python UDAF surface
# ---------------------------------------------------------------------------


@workload(
    "catalog_find_real",
    """
    WITH dataset AS (
      SELECT doc_id AS id, CAST(doc_id AS VARCHAR) AS file, text AS description,
             source, ['docs', lang] AS topics, CAST(NULL AS BIGINT) AS parent,
             CAST(n_chars AS VARCHAR) AS length
      FROM documents WHERE doc_id < 40
    ), content AS (
      SELECT CAST(doc_id AS VARCHAR) AS cid, 'text/plain' AS type
      FROM documents WHERE doc_id < 40
    )
    SELECT d.id, c.cid, c.type, d.source, d.length
    FROM dataset d JOIN content c ON d.file = c.cid
    WHERE CAST(d.length AS DOUBLE) < 250 AND regexp_matches(d.source, '1')
    """,
    "catalog",
    "integration",
)
def catalog_find_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL Catalog component under the oracle gate: build a catalog
    (bulk ingest + content upserts) from the documents table in a temp dir,
    then run Catalog.find() — dynamic extra field with numeric comparison
    plus partial regex, the exact doc/api.md:225-257 query shape."""
    import tempfile

    from comlake_core_spark.catalog import Catalog

    (docs,) = _t(spark, sf_dir, "documents")
    rows = docs.filter(F.col("doc_id") < 40).select("doc_id", "text", "source", "lang", "n_chars").collect()
    cat = Catalog(spark, tempfile.mkdtemp(prefix="comlake-cat-wl-"))
    metas = [
        {
            "file": str(r["doc_id"]),
            "description": r["text"],
            "source": r["source"],
            "topics": ["docs", r["lang"]],
            "length": str(r["n_chars"]),
        }
        for r in rows
    ]
    # ids are assigned in list order: make them the doc_ids by sorting and
    # offsetting — bulk ids start at 1, so sort by doc_id and map back
    metas.sort(key=lambda m: int(m["file"]))
    cat.add_datasets(metas)
    content = spark.createDataFrame(
        [(str(r["doc_id"]), "text/plain", {}) for r in rows],
        "cid string, type string, extra map<string,string>",
    )
    cat._write("content", content, __import__("comlake_core_spark.catalog.catalog", fromlist=["CONTENT_SCHEMA"]).CONTENT_SCHEMA)

    found = cat.find(["&", ["<", [".", ["$"], "length"], 250], ["~", [".", ["$"], "source"], "1"]])
    # find() projects the fixed columns; cid == file by the join, so the
    # doc_id comes back through cid
    return found.select(
        F.col("cid").cast("long").alias("id"),
        "cid",
        "type",
        "source",
        F.col("extra")["length"].alias("length"),
    )




@workload(
    "server_find_real",
    """
    WITH dataset AS (
      SELECT doc_id AS id, CAST(doc_id AS VARCHAR) AS file, text AS description,
             source, CAST(n_chars AS VARCHAR) AS length
      FROM documents WHERE doc_id < 40
    ), content AS (
      SELECT CAST(doc_id AS VARCHAR) AS cid, 'text/plain' AS type
      FROM documents WHERE doc_id < 40
    )
    SELECT CAST(c.cid AS BIGINT) AS id, c.cid, c.type, d.source, d.length
    FROM dataset d JOIN content c ON d.file = c.cid
    WHERE regexp_matches(d.source, '1') AND c.type <> 'application/json'
    """,
    "catalog",
    "server",
    "integration",
)
def server_find_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL serving layer's /find SNAPSHOT fast path under the oracle
    gate: build a catalog from documents, stand up ComlakeServer (no HTTP
    socket needed — op_find is exercised directly), and issue a
    snapshot-safe predicate (fixed columns, partial regex, boolean
    logic). The workload asserts the predicate actually takes the
    snapshot path, so the driver gate covers the pure-Python interpreter
    + driver-resident snapshot serving pipeline end to end — the same
    component scripts/http_bench.py measures at ~50× the Spark path."""
    import tempfile

    from comlake_core_spark.catalog import Catalog
    from comlake_core_spark.catalog.catalog import CONTENT_SCHEMA
    from comlake_core_spark.server import ComlakeServer, snapshot_safe
    from comlake_core_spark.store import LocalStore

    (docs,) = _t(spark, sf_dir, "documents")
    rows = docs.filter(F.col("doc_id") < 40).select(
        "doc_id", "text", "source", "lang", "n_chars"
    ).collect()
    cat = Catalog(spark, tempfile.mkdtemp(prefix="comlake-cat-srv-"))
    metas = [
        {
            "file": str(r["doc_id"]),
            "description": r["text"],
            "source": r["source"],
            "topics": ["docs", r["lang"]],
            "length": str(r["n_chars"]),
        }
        for r in rows
    ]
    metas.sort(key=lambda m: int(m["file"]))
    cat.add_datasets(metas)
    content = spark.createDataFrame(
        [(str(r["doc_id"]), "text/plain", {}) for r in rows],
        "cid string, type string, extra map<string,string>",
    )
    cat._write("content", content, CONTENT_SCHEMA)

    srv = ComlakeServer(spark, LocalStore(tempfile.mkdtemp(prefix="comlake-cas-srv-")), cat)
    ast = ["&", ["~", [".", ["$"], "source"], "1"],
           ["!", ["==", [".", ["$"], "type"], "application/json"]]]
    assert snapshot_safe(ast), "predicate must exercise the snapshot path"
    status, hits = srv.op_find(ast)
    assert status == 200
    return spark.createDataFrame(
        [(int(h["cid"]), h["cid"], h["type"], h["source"], h["length"]) for h in hits]
        or spark.sparkContext.emptyRDD(),
        "id long, cid string, type string, source string, length string",
    )




@workload(
    "catalog_snapshot_diff_real",
    """
    SELECT CAST(doc_id + 1 AS BIGINT) AS id_parent,
           CAST(doc_id AS VARCHAR) AS file,
           source
    FROM documents WHERE doc_id < 30 AND doc_id % 5 = 0
    """,
    "catalog",
    "time-travel",
    "integration",
)
def catalog_snapshot_diff_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Snapshot DIFF on the REAL Catalog (time-travel put to work): bulk
    ingest documents < 30 (snapshot v0), revise every fifth dataset
    (copy-on-write — each update commits a snapshot), then diff the
    current table against v0 with exceptAll.  The delta is exactly the
    six new revision rows, parent-linked to the originals — the audit
    trail a catalog refresh review reads ("what changed since the last
    release?").  The oracle states the closed form.  Bounded fixture
    collect (30 rows, documented); the diff itself is a distributed
    EXCEPT over two snapshot reads."""
    import tempfile

    from comlake_core_spark.catalog import Catalog

    (docs,) = _t(spark, sf_dir, "documents")
    rows = docs.filter(F.col("doc_id") < 30).select("doc_id", "text", "source", "lang", "n_chars").collect()
    cat = Catalog(spark, tempfile.mkdtemp(prefix="comlake-cat-diff-"))
    metas = [
        {
            "file": str(r["doc_id"]),
            "description": r["text"],
            "source": r["source"],
            "topics": ["docs", r["lang"]],
            "length": str(r["n_chars"]),
        }
        for r in rows
    ]
    metas.sort(key=lambda m: int(m["file"]))
    ids = cat.add_datasets(metas)
    v0 = cat.snapshot_versions()[-1]
    for doc_id in range(0, 30, 5):
        cat.update_dataset(doc_id + 1, {"description": "revised in refresh"})
    base = cat.dataset_as_of(v0).select("id", "file", "source", "parent")
    now = cat.dataset().select("id", "file", "source", "parent")
    delta = now.exceptAll(base)
    return delta.select(F.col("parent").alias("id_parent"), "file", "source")
