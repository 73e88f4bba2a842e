"""qast predicate/extract language + JSON-path workloads

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
# Reference parity: qast predicates over content rows
# (the Spark analogue of POST /extract, reference extract/data.clj:29-37,
# and POST /find, reference PostgreSQL.java:157-178)
# ---------------------------------------------------------------------------


@workload(
    "qast_eq_filter",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem WHERE l_returnflag = 'R'
    """,
    "qast",
    "filter",
)
def qast_eq_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """["==", [".", ["$"], "l_returnflag"], "R"] — the canonical equality
    extract (reference doc/api.md:383-425 uses the same shape on a CSV)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    ast = ["==", [".", ["$"], "l_returnflag"], "R"]
    return li.filter(compile_predicate(ast, schema=li.schema)).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_returnflag"
    )




@workload(
    "qast_extract_regex",
    """
    SELECT doc_id, source FROM documents
    WHERE regexp_full_match(source, 'src1.?')
    """,
    "qast",
    "regex",
)
def qast_extract_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full-match ~ (extract path): reference re-matches semantics
    (qast.clj:97-101; api_test.clj:197-204 'Vi.tnam' ≍ 'Vietnam')."""
    (docs,) = _t(spark, sf_dir, "documents")
    ast = ["~", [".", ["$"], "source"], "src1.?"]
    return docs.filter(compile_predicate(ast, schema=docs.schema, regex_mode="full")).select("doc_id", "source")




@workload(
    "qast_find_regex",
    """
    SELECT c_custkey, c_name FROM customer
    WHERE regexp_matches(c_name, '00[0-9]$')
    """,
    "qast",
    "regex",
)
def qast_find_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Partial-match ~ (find path): reference PostgreSQL `~` semantics
    (qast.clj:35)."""
    (cust,) = _t(spark, sf_dir, "customer")
    ast = ["~", [".", ["$"], "c_name"], "00[0-9]$"]
    return cust.filter(compile_predicate(ast, schema=cust.schema, regex_mode="partial")).select(
        "c_custkey", "c_name"
    )




@workload(
    "qast_arith_revenue",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice * (1 - l_discount) AS revenue
    FROM lineitem
    WHERE l_extendedprice * (1 - l_discount) > 90000
    """,
    "qast",
    "arithmetic",
)
def qast_arith_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic qast both as predicate and projected value (ops + - * /,
    reference qast.clj:36-39).  Per-row double math matches DuckDB bitwise."""
    (li,) = _t(spark, sf_dir, "lineitem")
    resolve = default_resolver(li.schema)
    rev_ast = ["*", [".", ["$"], "l_extendedprice"], ["-", 1, [".", ["$"], "l_discount"]]]
    pred_ast = [">", rev_ast, 90000]
    from comlake_core_spark.qast.compiler import compile_qast

    return li.filter(compile_predicate(pred_ast, resolver=resolve)).select(
        "l_orderkey",
        "l_linenumber",
        compile_qast(rev_ast, resolver=resolve).alias("revenue"),
    )




@workload(
    "qast_maths_composite",
    """
    SELECT l_orderkey, l_linenumber FROM lineitem
    WHERE (l_linenumber % 2) = 1
      AND l_quantity < l_extendedprice
      AND (l_returnflag = 'A' OR l_returnflag = 'R')
      AND NOT (l_discount > 0.05)
    """,
    "qast",
    "logic",
)
def qast_maths_composite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Composite predicate exercising % == < | & ! in one tree — the shape of
    the reference's "quick maths" golden test (qast_test.clj:25-29)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    ast = [
        "&",
        ["==", ["%", [".", ["$"], "l_linenumber"], 2], 1],
        ["<", [".", ["$"], "l_quantity"], [".", ["$"], "l_extendedprice"]],
        ["|", ["==", [".", ["$"], "l_returnflag"], "A"], ["==", [".", ["$"], "l_returnflag"], "R"]],
        ["!", [">", [".", ["$"], "l_discount"], 0.05]],
    ]
    return li.filter(compile_predicate(ast, schema=li.schema)).select("l_orderkey", "l_linenumber")




@workload(
    "qast_array_overlap",
    """
    SELECT doc_id, lang, source FROM documents
    WHERE array_has_any([lang, source], ['en', 'src3'])
    """,
    "qast",
    "array",
)
def qast_array_overlap(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`&&` array overlap (reference qast.clj:47 compiles to PG &&; the
    closure backend left it TODO at qast.clj:113 — implemented here for both
    paths via arrays_overlap)."""
    (docs,) = _t(spark, sf_dir, "documents")
    tagged = docs.withColumn("tags", F.array("lang", "source"))
    ast = ["&&", [".", ["$"], "tags"], ["en", "src3"]]
    return tagged.filter(compile_predicate(ast, schema=tagged.schema)).select("doc_id", "lang", "source")




@workload(
    "extract_json_field",
    """
    SELECT event_id, CAST(json_extract_string(props, '$.k') AS INTEGER) AS k
    FROM events
    WHERE CAST(json_extract_string(props, '$.k') AS INTEGER) > 50
    """,
    "qast",
    "json",
    "dynamic-fields",
)
def extract_json_field(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dynamic extra-field access: the reference stores free-form metadata in
    jsonb and compiles field paths to `->` traversals (qast.clj:23-29,34).
    Spark analogue: get_json_object over a JSON string column."""
    (ev,) = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return ev.select("event_id", k.alias("k")).filter(F.col("k") > 50)




@workload(
    "events_props_sum",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    "json",
    "aggregation",
)
def events_props_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Aggregate over a dynamic JSON field (integer sum — exact)."""
    (ev,) = _t(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("long")
    return ev.groupBy("event_type").agg(
        F.sum(k).alias("sum_k"),
        F.count(F.lit(1)).alias("n"),
    )




@workload(
    "events_props_variant",
    """
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
    "json",
    "variant",
    "aggregation",
)
def events_props_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-on-read via the VARIANT type (Spark 4): parse_json once into
    a binary variant, then variant_get typed paths — same answers as the
    get_json_object twin (events_props_sum) but the parse happens ONCE per
    row regardless of how many paths are read, where get_json_object
    re-parses the string per extraction. At 100 TB with wide dynamic
    payloads, variant is the difference between one parse and N."""
    (ev,) = _t(spark, sf_dir, "events")
    return (
        ev.select("event_type", F.parse_json("props").alias("pv"))
        .select("event_type", F.variant_get("pv", "$.k", "bigint").alias("k"))
        .groupBy("event_type")
        .agg(F.sum("k").alias("sum_k"), F.count(F.lit(1)).alias("n"))
    )




@workload(
    "qast_string_concat",
    """
    SELECT c_custkey, c_name || '/' || c_mktsegment AS tag
    FROM customer WHERE c_acctbal >= 0
    """,
    "qast",
    "string",
)
def qast_string_concat(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`+` as string concatenation (doc/qast.md:15: + concatenates
    strings)."""
    from comlake_core_spark.qast.compiler import compile_qast

    (cust,) = _t(spark, sf_dir, "customer")
    resolve = default_resolver(cust.schema)
    tag_ast = ["+", [".", ["$"], "c_name"], "/", [".", ["$"], "c_mktsegment"]]
    pred = compile_predicate([">=", [".", ["$"], "c_acctbal"], 0], resolver=resolve)
    return cust.filter(pred).select("c_custkey", compile_qast(tag_ast, resolver=resolve).alias("tag"))




@workload(
    "qast_posix_regex",
    """
    SELECT c_custkey, c_name
    FROM customer
    WHERE regexp_matches(c_name, '[[:digit:]]7$')
      AND regexp_matches(c_mktsegment, '^[[:upper:]]+$')
    """,
    "qast",
    "regex",
    "posix",
)
def qast_posix_regex(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PG-dialect POSIX bracket classes on the find path (the reference
    compiles `~` to PostgreSQL POSIX regex, qast.clj:35): the engine
    translates [[:digit:]]/[[:upper:]] to Java-regex ranges
    (qast/regex_dialect.py) while DuckDB's RE2 takes them natively —
    dialect parity checked end-to-end by the oracle."""
    (cust,) = _t(spark, sf_dir, "customer")
    resolve = default_resolver(cust.schema)
    pred = compile_predicate(
        [
            "&",
            ["~", [".", ["$"], "c_name"], "[[:digit:]]7$"],
            ["~", [".", ["$"], "c_mktsegment"], "^[[:upper:]]+$"],
        ],
        resolver=resolve,
        regex_mode="partial",
    )
    return cust.filter(pred).select("c_custkey", "c_name")




@workload(
    "qast_division_negation",
    """
    SELECT l_orderkey, l_linenumber,
           l_extendedprice / 2 AS half_price,
           -l_discount AS neg_discount
    FROM lineitem WHERE l_linenumber = 7
    """,
    "qast",
    "arithmetic",
)
def qast_division_negation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`/` double division and unary `-` (qast.clj:37,39,105)."""
    from comlake_core_spark.qast.compiler import compile_qast

    (li,) = _t(spark, sf_dir, "lineitem")
    resolve = default_resolver(li.schema)
    return li.filter(compile_predicate(["==", [".", ["$"], "l_linenumber"], 7], resolver=resolve)).select(
        "l_orderkey",
        "l_linenumber",
        compile_qast(["/", [".", ["$"], "l_extendedprice"], 2], resolver=resolve).alias("half_price"),
        compile_qast(["-", [".", ["$"], "l_discount"]], resolver=resolve).alias("neg_discount"),
    )




@workload(
    "qast_json_path",
    """
    SELECT event_id, json_extract_string(props, '$.k') AS k
    FROM events WHERE json_extract_string(props, '$.k') = '69'
    """,
    "qast",
    "json",
)
def qast_json_path(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nested qast path through a JSON string column — the Spark form of
    the reference's jsonb `->` traversal (qast.clj:23-29): the compiler's
    resolver emits get_json_object for nested paths under string columns."""
    from comlake_core_spark.qast.compiler import compile_qast

    (ev,) = _t(spark, sf_dir, "events")
    resolve = default_resolver(ev.schema)
    path_ast = [".", ["$"], "props", "k"]
    return ev.filter(compile_predicate(["==", path_ast, "69"], resolver=resolve)).select(
        "event_id", compile_qast(path_ast, resolver=resolve).alias("k")
    )




@workload(
    "schema_infer_csv_real",
    r"""
    WITH src AS (
      SELECT CAST(doc_id AS VARCHAR) AS doc_id, lang, source,
             CAST(n_chars AS VARCHAR) AS n_chars,
             CASE WHEN doc_id % 2 = 1 THEN 'v' || CAST(n_chars AS VARCHAR)
                  ELSE CAST(n_chars AS VARCHAR) END AS mixed,
             CASE WHEN doc_id % 5 = 0 THEN ''
                  ELSE CAST(n_chars AS VARCHAR) END AS padded
      FROM documents WHERE doc_id < 200
    ),
    lattice AS (
      SELECT
        MAX(CASE WHEN doc_id IS NULL OR trim(doc_id) = ''
                   OR regexp_full_match(doc_id, '-?(?:0|[1-9]\d*)(?:\.\d+)?(?:[eE][+-]?\d+)?')
                 THEN 0 ELSE 1 END) AS doc_id,
        MAX(CASE WHEN lang IS NULL OR trim(lang) = ''
                   OR regexp_full_match(lang, '-?(?:0|[1-9]\d*)(?:\.\d+)?(?:[eE][+-]?\d+)?')
                 THEN 0 ELSE 1 END) AS lang,
        MAX(CASE WHEN source IS NULL OR trim(source) = ''
                   OR regexp_full_match(source, '-?(?:0|[1-9]\d*)(?:\.\d+)?(?:[eE][+-]?\d+)?')
                 THEN 0 ELSE 1 END) AS source,
        MAX(CASE WHEN n_chars IS NULL OR trim(n_chars) = ''
                   OR regexp_full_match(n_chars, '-?(?:0|[1-9]\d*)(?:\.\d+)?(?:[eE][+-]?\d+)?')
                 THEN 0 ELSE 1 END) AS n_chars,
        MAX(CASE WHEN mixed IS NULL OR trim(mixed) = ''
                   OR regexp_full_match(mixed, '-?(?:0|[1-9]\d*)(?:\.\d+)?(?:[eE][+-]?\d+)?')
                 THEN 0 ELSE 1 END) AS mixed,
        MAX(CASE WHEN padded IS NULL OR trim(padded) = ''
                   OR regexp_full_match(padded, '-?(?:0|[1-9]\d*)(?:\.\d+)?(?:[eE][+-]?\d+)?')
                 THEN 0 ELSE 1 END) AS padded
      FROM src
    )
    SELECT colname, CASE WHEN flag = 1 THEN 'string' ELSE 'number' END AS inferred
    FROM (
      SELECT 'doc_id' AS colname, doc_id AS flag FROM lattice
      UNION ALL SELECT 'lang', lang FROM lattice
      UNION ALL SELECT 'source', source FROM lattice
      UNION ALL SELECT 'n_chars', n_chars FROM lattice
      UNION ALL SELECT 'mixed', mixed FROM lattice
      UNION ALL SELECT 'padded', padded FROM lattice
    )
    """,
    "extract",
    "schema",
    "integration",
)
def schema_infer_csv_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL CSV schema-inference component under the oracle gate
    (VERDICT r1 #9): documents rows are rendered to CSV (with a mixed
    number/string column and a blank-padded number column), content-
    addressed into a LocalStore, inferred via infer_schema_json (the
    reference's two-type lattice: a column is 'number' iff every non-blank
    cell full-matches the JSON number regex — metadata.clj:41-47, blanks
    don't demote), and the draft-07 properties are returned as rows. The
    oracle refolds the same lattice over the same values in DuckDB SQL."""
    import json as _json
    import tempfile

    from comlake_core_spark.extract.schema_infer import infer_schema_json
    from comlake_core_spark.store.local import LocalStore

    (docs,) = _t(spark, sf_dir, "documents")
    rows = sorted(
        docs.filter(F.col("doc_id") < 200).select("doc_id", "lang", "source", "n_chars").collect(),
        key=lambda r: r["doc_id"],
    )
    lines = ["doc_id,lang,source,n_chars,mixed,padded"]
    for r in rows:
        mixed = f"v{r['n_chars']}" if r["doc_id"] % 2 == 1 else str(r["n_chars"])
        padded = "" if r["doc_id"] % 5 == 0 else str(r["n_chars"])
        lines.append(f"{r['doc_id']},{r['lang']},{r['source']},{r['n_chars']},{mixed},{padded}")
    store = LocalStore(tempfile.mkdtemp(prefix="comlake-schema-wl-"))
    cid = store.add_bytes(("\n".join(lines) + "\n").encode())
    schema_doc = _json.loads(infer_schema_json(spark, store, cid, "text/csv"))
    props = schema_doc["items"]["properties"]
    return spark.createDataFrame(
        [(name, spec["type"]) for name, spec in props.items()],
        "colname string, inferred string",
    )




@workload(
    "extract_parquet_real",
    """
    SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
    FROM lineitem
    WHERE l_orderkey < 1000 AND l_quantity > 30
    """,
    "extract",
    "parquet",
    "integration",
)
def extract_parquet_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL extract path over PARQUET content — an extension beyond
    the reference (which errors on any MIME but CSV/JSON): a parquet
    blob is written into the content store, then POST /extract semantics
    run a qast predicate against it. Unlike the CSV path (strings-only
    by reference parity), parquet content keeps native types, so the
    compiled predicate pushes into the scan — the extract path inherits
    Catalyst pushdown exactly where a 100 TB lake needs it."""
    import io
    import tempfile

    from comlake_core_spark.extract.reader import extract
    from comlake_core_spark.store import LocalStore

    (li,) = _t(spark, sf_dir, "lineitem")
    subset = (
        li.filter(F.col("l_orderkey") < 1000)
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
        .toPandas()
    )
    buf = io.BytesIO()
    subset.to_parquet(buf, index=False)
    buf.seek(0)
    store = LocalStore(tempfile.mkdtemp(prefix="comlake-cas-pq-"))
    cid = store.add(buf)
    ast = [">", [".", ["$"], "l_quantity"], 30]
    return extract(spark, store, cid, ast, "application/vnd.apache.parquet")
