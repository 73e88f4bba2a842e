"""joins, set ops, pivot/unpivot, CDC, layout, SQL-interface workloads

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
from comlake_core_spark.session import materialize, tables

from ._base import _t, dec, workload



@workload(
    "topk_orders",
    """
    SELECT o_orderkey, o_custkey, o_totalprice
    FROM orders
    ORDER BY o_totalprice DESC, o_orderkey ASC
    LIMIT 10
    """,
    "topk",
    "sort",
)
def topk_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit compiles to TakeOrderedAndProject —
    per-partition heaps + single merge, no global sort, O(k) driver memory
    at any scale."""
    (orders,) = _t(spark, sf_dir, "orders")
    return (
        orders.orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )




@workload(
    "topk_orders_per_segment",
    """
    SELECT c_mktsegment, o_orderkey, o_totalprice FROM (
      SELECT c.c_mktsegment, o.o_orderkey, o.o_totalprice,
             row_number() OVER (
               PARTITION BY c.c_mktsegment
               ORDER BY o.o_totalprice DESC, o.o_orderkey ASC
             ) AS rn
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
    ) WHERE rn <= 5
    """,
    "topk",
    "window",
    "join",
)
def topk_orders_per_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped top-k via row_number + rank filter: Spark ≥3.5 rewrites this
    to WindowGroupLimit, pruning each partition to k rows *before* the
    shuffle — the scalable form of per-group top-k."""
    orders, cust = _t(spark, sf_dir, "orders", "customer")
    joined = orders.join(cust, orders.o_custkey == cust.c_custkey)
    w = Window.partitionBy("c_mktsegment").orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
    return (
        joined.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 5)
        .select("c_mktsegment", "o_orderkey", "o_totalprice")
    )




@workload(
    "join_revenue_by_nation",
    """
    SELECT n.n_name,
           CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem l
    JOIN orders o ON l.l_orderkey = o.o_orderkey
    JOIN customer c ON o.o_custkey = c.c_custkey
    JOIN nation n ON c.c_nationkey = n.n_nationkey
    GROUP BY n.n_name
    """,
    "join",
    "aggregation",
)
def join_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-join + aggregate (TPC-H Q5 shape). nation (25 rows) is
    broadcast; customer is broadcast at test SFs and shuffle-joined at
    scale — AQE picks per actual size. The lineitem⋈orders join is the
    only unavoidable big shuffle."""
    li, orders, cust, nation = _t(spark, sf_dir, "lineitem", "orders", "customer", "nation")
    rev = dec("l_extendedprice") * (1 - dec("l_discount", 4, 2))
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.sum(rev).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n_items"),
        )
    )




@workload(
    "semi_join_orders_shipped_late",
    """
    SELECT o_orderpriority, COUNT(*) AS n
    FROM orders
    WHERE EXISTS (
      SELECT 1 FROM lineitem
      WHERE l_orderkey = o_orderkey AND l_shipdate > o_orderdate
    )
    GROUP BY o_orderpriority
    """,
    "join",
    "semi",
)
def semi_join_orders_shipped_late(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT SEMI join (EXISTS) — TPC-H Q4 shape. Semi joins shuffle only
    join keys + the probe side; no fanout on duplicate matches."""
    orders, li = _t(spark, sf_dir, "orders", "lineitem")
    cond = (orders.o_orderkey == li.l_orderkey) & (li.l_shipdate > orders.o_orderdate)
    return (
        orders.join(li, cond, "left_semi")
        .groupBy("o_orderpriority")
        .agg(F.count(F.lit(1)).alias("n"))
    )




@workload(
    "anti_join_customers_no_final",
    """
    SELECT c_mktsegment, COUNT(*) AS n
    FROM customer
    WHERE NOT EXISTS (
      SELECT 1 FROM orders WHERE o_custkey = c_custkey AND o_orderstatus = 'F'
    )
    GROUP BY c_mktsegment
    """,
    "join",
    "anti",
)
def anti_join_customers_no_final(spark: SparkSession, sf_dir: str) -> DataFrame:
    """LEFT ANTI join (NOT EXISTS): customers without any finalized order."""
    cust, orders = _t(spark, sf_dir, "customer", "orders")
    final_orders = orders.filter(F.col("o_orderstatus") == "F")
    return (
        cust.join(final_orders, cust.c_custkey == final_orders.o_custkey, "left_anti")
        .groupBy("c_mktsegment")
        .agg(F.count(F.lit(1)).alias("n"))
    )




@workload(
    "layout_partition_pruned_read",
    r"""
    SELECT event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS sum_value,
           COUNT(DISTINCT user_id) AS n_users
    FROM events
    WHERE event_type IN ('click', 'view')
    GROUP BY event_type
    """,
    "layout",
    "sources",
)
def layout_partition_pruned_read(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Storage-layout path under the oracle gate: events written out
    hive-partitioned by event_type + clustered by user_id
    (operators/relational.write_partitioned), read back through a
    partition-pruning filter (only the click/view directories are even
    listed — PartitionFilters, pinned in tests/test_scale_primitives.py),
    then aggregated. The oracle aggregates the original table directly, so
    equality proves the layout roundtrip loses/duplicates nothing."""
    import tempfile

    from comlake_core_spark.operators.relational import write_partitioned

    (ev,) = _t(spark, sf_dir, "events")
    out_dir = tempfile.mkdtemp(prefix="comlake-layout-")
    write_partitioned(ev, out_dir, ["event_type"], sort_cols=["user_id"])
    back = spark.read.parquet(out_dir).filter(F.col("event_type").isin("click", "view"))
    return back.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.sum(dec("value", 14, 4)).cast("double").alias("sum_value"),
        F.countDistinct("user_id").alias("n_users"),
    )




@workload(
    "set_intersect_nations",
    """
    SELECT c_nationkey AS nationkey FROM customer
    INTERSECT
    SELECT s_nationkey FROM supplier
    """,
    "setop",
)
def set_intersect_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, supp = _t(spark, sf_dir, "customer", "supplier")
    return cust.select(F.col("c_nationkey").alias("nationkey")).intersect(
        supp.select(F.col("s_nationkey").alias("nationkey"))
    )




@workload(
    "set_except_nations",
    """
    SELECT c_name FROM customer
    EXCEPT
    SELECT c_name FROM customer WHERE c_acctbal > 0
    """,
    "setop",
)
def set_except_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics). subtract == EXCEPT DISTINCT; exceptAll would
    keep surviving duplicates (multiset difference) and diverge from SQL
    EXCEPT. Operands chosen to stay non-trivially non-empty at every SF."""
    (cust,) = _t(spark, sf_dir, "customer")
    return cust.select("c_name").subtract(
        cust.filter(F.col("c_acctbal") > 0).select("c_name")
    )




@workload(
    "set_intersect_all_buyers",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    INTERSECT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    "setop",
    "multiset",
)
def set_intersect_all_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT ALL — multiset semantics (each custkey kept min(n_O, n_F)
    times), which DISTINCT-based set ops destroy. Spark plans this as one
    partial-counted aggregate per side joined on the key — no row-by-row
    matching."""
    (od,) = _t(spark, sf_dir, "orders")
    return (
        od.filter(F.col("o_orderstatus") == "O")
        .select("o_custkey")
        .intersectAll(od.filter(F.col("o_orderstatus") == "F").select("o_custkey"))
    )




@workload(
    "set_except_all_buyers",
    """
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'O'
    EXCEPT ALL
    SELECT o_custkey FROM orders WHERE o_orderstatus = 'F'
    """,
    "setop",
    "multiset",
)
def set_except_all_buyers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT ALL — multiset difference (max(n_O − n_F, 0) copies survive),
    the dual of set_except_nations' EXCEPT DISTINCT."""
    (od,) = _t(spark, sf_dir, "orders")
    return (
        od.filter(F.col("o_orderstatus") == "O")
        .select("o_custkey")
        .exceptAll(od.filter(F.col("o_orderstatus") == "F").select("o_custkey"))
    )




@workload(
    "set_union_acct_holders",
    """
    SELECT c_nationkey AS nationkey FROM customer WHERE c_acctbal > 5000
    UNION
    SELECT s_nationkey FROM supplier WHERE s_acctbal > 5000
    """,
    "setop",
)
def set_union_acct_holders(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, supp = _t(spark, sf_dir, "customer", "supplier")
    return (
        cust.filter(F.col("c_acctbal") > 5000)
        .select(F.col("c_nationkey").alias("nationkey"))
        .union(supp.filter(F.col("s_acctbal") > 5000).select(F.col("s_nationkey").alias("nationkey")))
        .distinct()
    )




_SHARED_SQL = """
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n_customers,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS total_balance,
           MAX(c_acctbal) AS max_balance
    FROM customer
    WHERE c_acctbal > 0
    GROUP BY c_mktsegment
"""




@workload(
    "sql_interface_shared_text",
    _SHARED_SQL,
    "sql",
    "interface",
)
def sql_interface_shared_text(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The SQL front door: the IDENTICAL SQL text executes on Spark
    (spark.sql over registered temp views) and on DuckDB as the oracle —
    one string, two engines, hash-equal results. Everything the qast and
    DataFrame surfaces can do is equally reachable through spark.sql,
    with the same Catalyst plan underneath (pushdown, partial aggs); this
    workload pins that the ANSI-portable subset really is portable."""
    (cu,) = _t(spark, sf_dir, "customer")
    cu.createOrReplaceTempView("customer")
    return spark.sql(_SHARED_SQL)




@workload(
    "fuzzy_customer_names",
    """
    SELECT a.c_custkey AS id_a, b.c_custkey AS id_b,
           levenshtein(a.c_name, b.c_name) AS dist
    FROM customer a JOIN customer b
      ON a.c_nationkey = b.c_nationkey AND a.c_custkey < b.c_custkey
    WHERE levenshtein(a.c_name, b.c_name) <= 2
    """,
    "fuzzy",
    "record-linkage",
)
def fuzzy_customer_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Record linkage by edit distance: candidate pairs BLOCKED on nation
    (the classic linkage trick — the quadratic self-join runs per block,
    |block|² ≪ n²), then levenshtein ≤ 2 keeps near-identical names. The
    distance is a JVM built-in evaluated post-join on the blocked pairs
    only; at 100 TB the block key would be a cheap canopy (prefix, soundex,
    or LSH bucket) sized so blocks fit a task."""
    (cu,) = _t(spark, sf_dir, "customer")
    a = cu.select(
        F.col("c_nationkey").alias("nk"), F.col("c_custkey").alias("id_a"), F.col("c_name").alias("name_a")
    )
    b = cu.select(
        F.col("c_nationkey").alias("nk"), F.col("c_custkey").alias("id_b"), F.col("c_name").alias("name_b")
    )
    return (
        a.join(b, "nk")
        .filter(F.col("id_a") < F.col("id_b"))
        .withColumn("dist", F.levenshtein("name_a", "name_b"))
        .filter(F.col("dist") <= 2)
        .select("id_a", "id_b", "dist")
    )




@workload(
    "unpivot_price_components",
    """
    SELECT component,
           COUNT(*) AS n,
           CAST(SUM(CAST(amount AS DECIMAL(12,2))) AS DOUBLE) AS total
    FROM (
      SELECT l_orderkey, 'extendedprice' AS component, l_extendedprice AS amount FROM lineitem
      UNION ALL
      SELECT l_orderkey, 'discount', l_discount FROM lineitem
      UNION ALL
      SELECT l_orderkey, 'tax', l_tax FROM lineitem
    )
    GROUP BY component
    """,
    "unpivot",
    "reshape",
)
def unpivot_price_components(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNPIVOT (melt) — wide price columns to long (component, amount)
    rows, the inverse reshape of pivot_status_by_priority. Spark's unpivot
    plans as a single-scan Expand (3 output rows per input row), NOT the
    oracle's 3-scan UNION ALL — same result, one third the reads; the agg
    then map-side combines per component."""
    (li,) = _t(spark, sf_dir, "lineitem")
    long = li.unpivot(
        ids=["l_orderkey"],
        values=["l_extendedprice", "l_discount", "l_tax"],
        variableColumnName="component",
        valueColumnName="amount",
    )
    return (
        long.withColumn("component", F.regexp_replace("component", "^l_", ""))
        .groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("amount")).cast("double").alias("total"),
        )
    )




# ---------------------------------------------------------------------------
# Classic analytic shapes (TPC-H Q3/Q6 analogues) — planner stress coverage
# ---------------------------------------------------------------------------


@workload(
    "shipping_priority",
    """
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue,
           strftime(o_orderdate, '%Y-%m-%d') AS orderdate
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01 00:00:00'
      AND l_shipdate > TIMESTAMP '1996-01-01 00:00:00'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, l_orderkey ASC
    LIMIT 10
    """,
    "join",
    "topk",
    "tpch-q3",
)
def shipping_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3 shape: selective dim filter → join → agg → global top-k.
    Filters push to every scan; customer side broadcasts after filtering;
    the top-k is TakeOrderedAndProject."""
    cust, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    rev = dec("l_extendedprice") * (1 - dec("l_discount", 4, 2))
    return (
        cust.filter(F.col("c_mktsegment") == "BUILDING")
        .join(orders, F.col("c_custkey") == F.col("o_custkey"))
        .filter(F.col("o_orderdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
        .join(li, F.col("l_orderkey") == F.col("o_orderkey"))
        .filter(F.col("l_shipdate") > F.lit("1996-01-01 00:00:00").cast("timestamp"))
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .select(
            "l_orderkey",
            "revenue",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("orderdate"),
        )
        .orderBy(F.desc("revenue"), F.asc("l_orderkey"))
        .limit(10)
    )




# ---------------------------------------------------------------------------
# Pivot, explode/unnest, scalar function library, outer joins, rank windows
# ---------------------------------------------------------------------------


@workload(
    "pivot_status_by_priority",
    """
    SELECT o_orderpriority,
           COUNT(*) FILTER (o_orderstatus = 'F') AS n_f,
           COUNT(*) FILTER (o_orderstatus = 'O') AS n_o,
           COUNT(*) FILTER (o_orderstatus = 'P') AS n_p
    FROM orders GROUP BY o_orderpriority
    """,
    "pivot",
    "aggregation",
)
def pivot_status_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot (wide conditional aggregation). Spark's .pivot() with an
    explicit value list — explicit values keep the single-pass plan (no
    extra distinct-values job) and a stable output schema at any scale."""
    (orders,) = _t(spark, sf_dir, "orders")
    out = (
        orders.groupBy("o_orderpriority")
        .pivot("o_orderstatus", ["F", "O", "P"])
        .agg(F.count(F.lit(1)))
    )
    return out.select(
        "o_orderpriority",
        F.coalesce("F", F.lit(0)).alias("n_f"),
        F.coalesce("O", F.lit(0)).alias("n_o"),
        F.coalesce("P", F.lit(0)).alias("n_p"),
    )




@workload(
    "explode_token_counts",
    r"""
    SELECT tok, COUNT(*) AS n FROM (
      SELECT unnest(string_split_regex(trim(text), '\s+')) AS tok FROM documents
    ) GROUP BY tok
    ORDER BY n DESC, tok ASC
    LIMIT 20
    """,
    "explode",
    "text",
)
def explode_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """explode/unnest + count + top-k: the word-count shape. At scale the
    explode multiplies rows ~n_tokens×, but partial aggregation collapses
    them map-side before the shuffle."""
    from comlake_core_spark.operators.text.core import tokens

    (docs,) = _t(spark, sf_dir, "documents")
    return (
        docs.select(F.explode(tokens("text")).alias("tok"))
        .groupBy("tok")
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), F.asc("tok"))
        .limit(20)
    )




@workload(
    "full_outer_nation_presence",
    """
    WITH c AS (SELECT c_nationkey AS k, COUNT(*) AS n_cust FROM customer GROUP BY 1),
         s AS (SELECT s_nationkey AS k, COUNT(*) AS n_supp FROM supplier GROUP BY 1)
    SELECT COALESCE(c.k, s.k) AS nationkey,
           COALESCE(c.n_cust, 0) AS n_cust,
           COALESCE(s.n_supp, 0) AS n_supp
    FROM c FULL OUTER JOIN s ON c.k = s.k
    """,
    "join",
    "outer",
)
def full_outer_nation_presence(spark: SparkSession, sf_dir: str) -> DataFrame:
    cust, supp = _t(spark, sf_dir, "customer", "supplier")
    c = cust.groupBy(F.col("c_nationkey").alias("k")).agg(F.count(F.lit(1)).alias("n_cust"))
    s = supp.groupBy(F.col("s_nationkey").alias("k")).agg(F.count(F.lit(1)).alias("n_supp"))
    joined = c.join(s, "k", "full_outer")
    return joined.select(
        F.col("k").alias("nationkey"),
        F.coalesce("n_cust", F.lit(0)).alias("n_cust"),
        F.coalesce("n_supp", F.lit(0)).alias("n_supp"),
    )




@workload(
    "top_customers_by_returns",
    """
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS lost_revenue
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY lost_revenue DESC, c_custkey ASC
    LIMIT 20
    """,
    "join",
    "topk",
    "tpch-q10",
)
def top_customers_by_returns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10 shape: returned-item revenue per customer, top 20."""
    cust, orders, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    rev = dec("l_extendedprice") * (1 - dec("l_discount", 4, 2))
    return (
        li.filter(F.col("l_returnflag") == "R")
        .join(orders, F.col("l_orderkey") == F.col("o_orderkey"))
        .join(cust, F.col("o_custkey") == F.col("c_custkey"))
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(rev).cast("double").alias("lost_revenue"))
        .orderBy(F.desc("lost_revenue"), F.asc("c_custkey"))
        .limit(20)
    )




@workload(
    "source_read_real",
    """
    SELECT CAST(c_custkey AS VARCHAR) AS c_custkey, c_name,
           CAST(c_nationkey AS VARCHAR) AS c_nationkey
    FROM customer WHERE c_custkey < 300 AND c_mktsegment = 'BUILDING'
    """,
    "sources",
    "integration",
)
def source_read_real(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The REAL comlake Python Data Source under the oracle gate (VERDICT
    r1 #9): 300 customer rows are content-addressed into a LocalStore as a
    3-part CSV directory (mkdir + add + immutable cp manifest derivation),
    read back via spark.read.format('comlake') with a directory-CID fan-out
    (one InputPartition per part), and filtered with an EqualTo that the
    source's pushFilters applies at parse time. Extract-time semantics:
    every CSV value is a string, mirrored by VARCHAR casts in the oracle."""
    import tempfile

    from comlake_core_spark.sources import register
    from comlake_core_spark.store.local import LocalStore

    (cust,) = _t(spark, sf_dir, "customer")
    # bounded driver-side ingest (300 rows) — same discipline as
    # catalog_find_real; real ingest would stream through store.add
    rows = sorted(
        cust.filter(F.col("c_custkey") < 300)
        .select("c_custkey", "c_name", "c_nationkey", "c_mktsegment")
        .collect(),
        key=lambda r: r["c_custkey"],
    )
    store = LocalStore(tempfile.mkdtemp(prefix="comlake-src-wl-"))
    header = "c_custkey,c_name,c_nationkey,c_mktsegment"
    dir_cid = store.mkdir()
    parts = 3
    for p in range(parts):
        body = "".join(
            f"{r['c_custkey']},{r['c_name']},{r['c_nationkey']},{r['c_mktsegment']}\n"
            for i, r in enumerate(rows)
            if i % parts == p
        )
        cid = store.add_bytes((header + "\n" + body).encode())
        dir_cid = store.cp(cid, dir_cid, f"part-{p:03d}.csv")
    register(spark)
    df = (
        spark.read.format("comlake")
        .option("store_root", store.root)
        .option("cid", dir_cid)
        .option("mime", "text/csv")
        .load()
    )
    return df.filter(F.col("c_mktsegment") == "BUILDING").select(
        "c_custkey", "c_name", "c_nationkey"
    )




# ---------------------------------------------------------------------------
# TPC-H-shape join/aggregation suite (shapes the star schema supports without
# partsupp): multi-way join ordering, conditional-aggregation ratios,
# correlated-average join-back, group-filter join-back, disjunctive predicate
# pushdown, scalar-subquery + anti-join. Each pins a distinct 100 TB plan
# property; none exists in the reference (SURVEY.md §2.4: no joins beyond the
# catalog equi-join, no aggregation at all).
# ---------------------------------------------------------------------------


@workload(
    "join_local_supplier_volume",
    """
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM customer, orders, lineitem, supplier, nation, region
    WHERE c_custkey = o_custkey AND l_orderkey = o_orderkey
      AND l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      AND s_nationkey = n_nationkey AND n_regionkey = r_regionkey
      AND r_name = 'ASIA'
      AND o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY n_name
    """,
    "join",
    "aggregation",
    "tpch-q5",
)
def join_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape: 6-way join narrowed by a region filter. Scale design:
    the three dims (supplier/nation/region) broadcast, so the only shuffles
    are the two fact joins (orders⋈lineitem, ⋈customer); the c_nationkey =
    s_nationkey correlation is a post-join filter, not an extra shuffle."""
    cu, od, li, su, na, re = _t(spark, sf_dir, "customer", "orders", "lineitem", "supplier", "nation", "region")
    price, disc = dec("l_extendedprice"), dec("l_discount", 4, 2)
    dims = (
        su.join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .join(F.broadcast(re.filter(F.col("r_name") == "ASIA")), na.n_regionkey == re.r_regionkey)
        .select("s_suppkey", "s_nationkey", "n_name")
    )
    od_f = od.filter(
        (F.col("o_orderdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
    )
    return (
        li.join(F.broadcast(dims), li.l_suppkey == dims.s_suppkey)
        .join(od_f, li.l_orderkey == od_f.o_orderkey)
        .join(cu, od_f.o_custkey == cu.c_custkey)
        .filter(F.col("c_nationkey") == F.col("s_nationkey"))
        .groupBy("n_name")
        .agg(F.sum(price * (1 - disc)).cast("double").alias("revenue"))
    )




@workload(
    "promo_revenue_ratio",
    """
    SELECT CAST(100.0 * CAST(SUM(CASE WHEN p_type = 'PROMO'
                 THEN CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))
                 ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
           / CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE)
           AS DOUBLE) AS promo_revenue_pct
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE l_shipdate >= TIMESTAMP '1996-09-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-10-01 00:00:00'
    """,
    "join",
    "aggregation",
    "tpch-q14",
)
def promo_revenue_ratio(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q14 shape: conditional-aggregation ratio (promo revenue share).
    One broadcast join (part is the dim), one month of lineitem after
    pushdown, two decimal sums in a single partial-agg pass, final division
    in double on the driver-side single row."""
    li, pa = _t(spark, sf_dir, "lineitem", "part")
    price, disc = dec("l_extendedprice"), dec("l_discount", 4, 2)
    rev = price * (1 - disc)
    li_f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-09-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-10-01 00:00:00").cast("timestamp"))
    )
    return (
        li_f.join(F.broadcast(pa), li_f.l_partkey == pa.p_partkey)
        .agg(
            (
                F.lit(100.0)
                * F.sum(F.when(F.col("p_type") == "PROMO", rev).otherwise(F.lit(0).cast("decimal(12,2)"))).cast(
                    "double"
                )
                / F.sum(rev).cast("double")
            )
            .cast("double")
            .alias("promo_revenue_pct")
        )
    )




@workload(
    "small_qty_order_revenue",
    """
    WITH per_part AS (
      SELECT l_partkey,
             CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
             COUNT(*) AS cnt
      FROM lineitem GROUP BY l_partkey
    )
    SELECT CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / 7.0 AS avg_yearly
    FROM lineitem l
    JOIN part p ON l.l_partkey = p.p_partkey
    JOIN per_part a ON l.l_partkey = a.l_partkey
    WHERE p.p_brand = 'Brand#12'
      AND l.l_quantity < 0.2 * (a.sum_qty / a.cnt)
    """,
    "join",
    "aggregation",
    "tpch-q17",
)
def small_qty_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape: revenue from below-average-quantity orders — the
    correlated scalar aggregate rewritten as an explicit per-key aggregate
    joined back to the fact (the scalable form: one extra partial-agg pass
    over lineitem, re-joined on the same key so AQE can pick shuffled-hash).
    The avg is computed as exact decimal sum / count, divided in double in
    BOTH engines so the threshold comparison agrees bit-for-bit."""
    li, pa = _t(spark, sf_dir, "lineitem", "part")
    per_part = li.groupBy("l_partkey").agg(
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("cnt"),
    )
    brand = pa.filter(F.col("p_brand") == "Brand#12").select("p_partkey")
    return (
        li.join(F.broadcast(brand), li.l_partkey == F.col("p_partkey"))
        .join(per_part.withColumnRenamed("l_partkey", "a_partkey"), li.l_partkey == F.col("a_partkey"))
        .filter(F.col("l_quantity") < F.lit(0.2) * (F.col("sum_qty") / F.col("cnt")))
        .agg((F.sum(dec("l_extendedprice")).cast("double") / F.lit(7.0)).alias("avg_yearly"))
    )




@workload(
    "large_order_customers",
    """
    WITH big AS (
      SELECT l_orderkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq
      FROM lineitem GROUP BY l_orderkey
      HAVING SUM(CAST(l_quantity AS DECIMAL(12,2))) > 150
    )
    SELECT c_name, c_custkey, o_orderkey,
           strftime(o_orderdate, '%Y-%m-%d') AS order_date,
           o_totalprice,
           CAST(sq AS DOUBLE) AS sum_qty
    FROM customer
    JOIN orders ON c_custkey = o_custkey
    JOIN big ON o_orderkey = l_orderkey
    """,
    "join",
    "aggregation",
    "having",
    "tpch-q18",
)
def large_order_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: group-filter (HAVING) then join back to the
    dimension side. Scale design: the HAVING prunes the aggregate BEFORE the
    join (a few % of orders survive), so the orders⋈big join is small; at
    100 TB the qualifying set usually broadcasts under AQE."""
    cu, od, li = _t(spark, sf_dir, "customer", "orders", "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("sq"))
        .filter(F.col("sq") > 150)
    )
    return (
        od.join(big, od.o_orderkey == big.l_orderkey)
        .join(cu, od.o_custkey == cu.c_custkey)
        .select(
            "c_name",
            "c_custkey",
            "o_orderkey",
            F.date_format("o_orderdate", "yyyy-MM-dd").alias("order_date"),
            "o_totalprice",
            F.col("sq").cast("double").alias("sum_qty"),
        )
    )




@workload(
    "disjunctive_filter_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS revenue
    FROM lineitem JOIN part ON p_partkey = l_partkey
    WHERE (p_brand = 'Brand#12' AND p_size BETWEEN 1 AND 15 AND l_quantity BETWEEN 1 AND 11)
       OR (p_brand = 'Brand#14' AND p_size BETWEEN 10 AND 30 AND l_quantity BETWEEN 10 AND 20)
       OR (p_brand = 'Brand#25' AND p_size BETWEEN 20 AND 50 AND l_quantity BETWEEN 20 AND 30)
    """,
    "join",
    "filter",
    "tpch-q19",
)
def disjunctive_filter_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q19 shape: disjunctive multi-table predicate. Catalyst derives
    the table-local implications (l_quantity ∈ [1,30] reaches the lineitem
    scan as a pushed filter; the p_brand/p_size disjunction reaches part)
    before the broadcast join evaluates the full OR — tested in
    tests/test_plans.py."""
    li, pa = _t(spark, sf_dir, "lineitem", "part")
    price, disc = dec("l_extendedprice"), dec("l_discount", 4, 2)
    joined = li.join(F.broadcast(pa), li.l_partkey == pa.p_partkey)
    q, b, s = F.col("l_quantity"), F.col("p_brand"), F.col("p_size")
    cond = (
        ((b == "Brand#12") & s.between(1, 15) & q.between(1, 11))
        | ((b == "Brand#14") & s.between(10, 30) & q.between(10, 20))
        | ((b == "Brand#25") & s.between(20, 50) & q.between(20, 30))
    )
    return joined.filter(cond).agg(F.sum(price * (1 - disc)).cast("double").alias("revenue"))




@workload(
    "idle_rich_customers",
    """
    WITH avg_bal AS (
      SELECT CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS ab
      FROM customer WHERE c_acctbal > 0.0
    )
    SELECT c_mktsegment AS segment,
           COUNT(*) AS numcust,
           CAST(SUM(CAST(c_acctbal AS DECIMAL(12,2))) AS DOUBLE) AS totacctbal
    FROM customer, avg_bal
    WHERE c_acctbal > ab
      AND NOT EXISTS (SELECT 1 FROM orders o
                      WHERE o.o_custkey = c_custkey
                        AND o.o_orderpriority = '1-URGENT')
    GROUP BY c_mktsegment
    """,
    "join",
    "anti",
    "subquery",
    "tpch-q22",
)
def idle_rich_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q22 shape: scalar aggregate subquery (global average balance)
    + anti join (customers with no urgent orders) + final rollup. The scalar
    is a one-row cross join (broadcast-nested-loop of a single row — free);
    the anti join shuffles on custkey and is AQE-skew-safe. Average is
    exact-decimal sum / count divided in double in both engines."""
    cu, od = _t(spark, sf_dir, "customer", "orders")
    avg_bal = cu.filter(F.col("c_acctbal") > 0.0).agg(
        (F.sum(dec("c_acctbal")).cast("double") / F.count(F.lit(1))).alias("ab")
    )
    urgent = od.filter(F.col("o_orderpriority") == "1-URGENT").select("o_custkey")
    return (
        cu.crossJoin(F.broadcast(avg_bal))
        .filter(F.col("c_acctbal") > F.col("ab"))
        .join(urgent, cu.c_custkey == urgent.o_custkey, "left_anti")
        .groupBy(F.col("c_mktsegment").alias("segment"))
        .agg(
            F.count(F.lit(1)).alias("numcust"),
            F.sum(dec("c_acctbal")).cast("double").alias("totacctbal"),
        )
    )




# ---------------------------------------------------------------------------
# Temporal joins (operators/temporal.py): as-of and bounded range join —
# neither exists in Spark natively, both one-equi-shuffle formulations.
# ---------------------------------------------------------------------------


@workload(
    "asof_last_purchase",
    """
    SELECT v.event_id, v.user_id,
           epoch_us(v.ts) AS view_us,
           epoch_us(p.ts) AS purchase_us,
           p.purchase_value
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'view') v
    ASOF LEFT JOIN (SELECT user_id, ts, max(value) AS purchase_value
                    FROM events WHERE event_type = 'purchase'
                    GROUP BY user_id, ts) p
      ON v.user_id = p.user_id AND v.ts >= p.ts
    """,
    "join",
    "asof",
    "temporal",
)
def asof_last_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each view event annotated with the user's most recent
    purchase at or before it (DuckDB ASOF JOIN is the oracle). The Spark
    plan is the union+window merge formulation — one shuffle on user_id,
    one sorted pass, state of one row per user; a theta-join formulation
    would plan a broadcast-nested-loop and die at scale."""
    from comlake_core_spark.operators.temporal import asof_join

    (ev,) = _t(spark, sf_dir, "events")
    views = ev.filter(F.col("event_type") == "view").select("event_id", "user_id", "ts")
    purchases = (
        ev.filter(F.col("event_type") == "purchase")
        .groupBy("user_id", "ts")
        .agg(F.max("value").alias("purchase_value"))
    )
    joined = asof_join(views, purchases, on="user_id", left_ts="ts", right_ts="ts")
    return joined.select(
        "event_id",
        "user_id",
        # events.ts is parquet timestamp[us] without a zone → TIMESTAMP_NTZ
        # under Spark 4's NTZ inference; unix_micros only takes TIMESTAMP_LTZ.
        # The session timezone is pinned UTC, so the cast is epoch-identity
        # and matches DuckDB's epoch_us over the same naive values.
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("view_us"),
        F.unix_micros(F.col("asof_ts").cast("timestamp_ltz")).alias("purchase_us"),
        "purchase_value",
    )




@workload(
    "range_join_clicks_after_purchase",
    """
    SELECT p.event_id AS purchase_id,
           COUNT(*) AS n_clicks,
           CAST(SUM(CAST(c.value AS DECIMAL(12,4))) AS DOUBLE) AS click_value
    FROM (SELECT event_id, user_id, ts FROM events WHERE event_type = 'purchase') p
    JOIN (SELECT user_id, ts, value FROM events WHERE event_type = 'click') c
      ON c.user_id = p.user_id AND c.ts >= p.ts AND c.ts < p.ts + INTERVAL 1 HOUR
    GROUP BY p.event_id
    """,
    "join",
    "range",
    "temporal",
)
def range_join_clicks_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bounded range join: clicks within one hour after each purchase.
    Implemented by time-bucket quantization (intervals explode to ≤2
    buckets, points to 1) + equi-join + exact range filter — shuffle is
    |points| + 2|intervals| rows, never the cross product a raw
    inequality join would plan."""
    from comlake_core_spark.operators.temporal import range_join_points_to_intervals

    (ev,) = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        F.col("ts").alias("start_ts"),
        (F.col("ts") + F.expr("INTERVAL 1 HOUR")).alias("end_ts"),
    )
    clicks = ev.filter(F.col("event_type") == "click").select("user_id", "ts", "value")
    joined = range_join_points_to_intervals(
        clicks, purchases, on="user_id", point_ts="ts",
        start_ts="start_ts", end_ts="end_ts", max_interval_seconds=3600,
    )
    return joined.groupBy("purchase_id").agg(
        F.count(F.lit(1)).alias("n_clicks"),
        F.sum(dec("value", 12, 4)).cast("double").alias("click_value"),
    )




@workload(
    "salted_join_revenue",
    """
    SELECT c_mktsegment AS segment,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY c_mktsegment
    """,
    "join",
    "skew",
    "scale-primitive",
)
def salted_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The salted skew join under the oracle gate: the plain equi-join is
    the oracle, so this proves salting is RESULT-TRANSPARENT (same rows,
    only the partitioning differs). Salting spreads each hot key over
    `salt` reducers — the deterministic fix when one key floods a
    partition and AQE's after-the-fact split isn't enough."""
    from comlake_core_spark.operators.relational import salted_join

    cu, od = _t(spark, sf_dir, "customer", "orders")
    dim = cu.select(F.col("c_custkey").alias("o_custkey"), "c_mktsegment")
    joined = salted_join(od, dim, key="o_custkey", salt=8)
    return joined.groupBy(F.col("c_mktsegment").alias("segment")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(dec("o_totalprice")).cast("double").alias("total_price"),
    )




@workload(
    "bloom_pruned_join",
    """
    SELECT c_nationkey AS nationkey,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS total_price
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE c_acctbal > 7500
    GROUP BY c_nationkey
    """,
    "join",
    "scale",
    "bloom",
)
def bloom_pruned_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bloom-filter pruned join under the oracle gate: the plain equi-join
    IS the oracle, proving the bloom pre-filter is result-transparent
    (false positives are removed by the real join; no true matches are
    dropped). The scale story: a selective dim predicate (c_acctbal>7500)
    that Catalyst can't see through to the fact scan becomes a 128 KiB
    broadcast bitset that drops non-matching orders BEFORE the join
    exchange — sideways information passing when the dim is too big or
    too late-filtered to broadcast outright."""
    from comlake_core_spark.operators.relational import bloom_prune_join

    cu, od = _t(spark, sf_dir, "customer", "orders")
    dim = cu.filter(F.col("c_acctbal") > 7500).select(
        F.col("c_custkey").alias("o_custkey"), "c_nationkey"
    )
    joined = bloom_prune_join(od, dim, key="o_custkey")
    return joined.groupBy(F.col("c_nationkey").alias("nationkey")).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(dec("o_totalprice")).cast("double").alias("total_price"),
    )




# ---------------------------------------------------------------------------
# TPC-H-shape suite, part 2: nation-pair joins, market-share ratio, double
# aggregation over an outer join, scalar-max join-back, and the semi+anti
# self-join — the remaining classic shapes the star schema supports (partsupp
# does not exist in the testdata; Q9's supplycost term is documented out).
# ---------------------------------------------------------------------------


@workload(
    "volume_shipping_pairs",
    """
    SELECT supp_nation, cust_nation, l_year,
           CAST(SUM(rev) AS DOUBLE) AS revenue
    FROM (
      SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
             CAST(year(l_shipdate) AS INTEGER) AS l_year,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2))) AS rev
      FROM supplier, lineitem, orders, customer, nation n1, nation n2
      WHERE s_suppkey = l_suppkey AND o_orderkey = l_orderkey
        AND c_custkey = o_custkey AND s_nationkey = n1.n_nationkey
        AND c_nationkey = n2.n_nationkey
        AND ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
          OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
        AND l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1998-01-01 00:00:00'
    ) GROUP BY supp_nation, cust_nation, l_year
    """,
    "join",
    "aggregation",
    "tpch-q7",
)
def volume_shipping_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 shape: trade volume between a nation pair by ship year.
    Scale design: both nation dims broadcast onto supplier and customer
    BEFORE the fact joins, so the pair predicate prunes most of supplier/
    customer early; the disjunctive pair condition is evaluated post-join
    on two tiny dim columns, and the only big shuffles are
    lineitem⋈orders⋈customer on their keys."""
    su, li, od, cu, na = _t(spark, sf_dir, "supplier", "lineitem", "orders", "customer", "nation")
    n1 = na.select(F.col("n_nationkey").alias("n1_key"), F.col("n_name").alias("supp_nation"))
    n2 = na.select(F.col("n_nationkey").alias("n2_key"), F.col("n_name").alias("cust_nation"))
    sup = su.join(F.broadcast(n1), su.s_nationkey == F.col("n1_key")).select("s_suppkey", "supp_nation")
    cus = cu.join(F.broadcast(n2), cu.c_nationkey == F.col("n2_key")).select("c_custkey", "cust_nation")
    pair = (
        (F.col("supp_nation") == "NATION_1") & (F.col("cust_nation") == "NATION_2")
    ) | ((F.col("supp_nation") == "NATION_2") & (F.col("cust_nation") == "NATION_1"))
    li_f = li.filter(
        (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01 00:00:00").cast("timestamp"))
    )
    rev = dec("l_extendedprice") * (1 - dec("l_discount", 4, 2))
    return (
        li_f.join(
            F.broadcast(sup.filter(F.col("supp_nation").isin("NATION_1", "NATION_2"))),
            li_f.l_suppkey == sup.s_suppkey,
        )
        .join(od, li_f.l_orderkey == od.o_orderkey)
        .join(
            cus.filter(F.col("cust_nation").isin("NATION_1", "NATION_2")),
            od.o_custkey == cus.c_custkey,
        )
        .filter(pair)
        .groupBy("supp_nation", "cust_nation", F.year("l_shipdate").cast("int").alias("l_year"))
        .agg(F.sum(rev).cast("double").alias("revenue"))
    )




@workload(
    "market_share_by_year",
    """
    SELECT o_year,
           CAST(CAST(SUM(CASE WHEN nation = 'NATION_1' THEN rev
                              ELSE CAST(0 AS DECIMAL(12,2)) END) AS DOUBLE)
                / CAST(SUM(rev) AS DOUBLE) AS DOUBLE) AS mkt_share
    FROM (
      SELECT CAST(year(o_orderdate) AS INTEGER) AS o_year,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2))) AS rev,
             n2.n_name AS nation
      FROM part, supplier, lineitem, orders, customer, nation n1, nation n2, region
      WHERE p_partkey = l_partkey AND s_suppkey = l_suppkey
        AND l_orderkey = o_orderkey AND o_custkey = c_custkey
        AND c_nationkey = n1.n_nationkey AND n1.n_regionkey = r_regionkey
        AND r_name = 'ASIA' AND s_nationkey = n2.n_nationkey
        AND p_type = 'PROMO'
    ) GROUP BY o_year
    """,
    "join",
    "aggregation",
    "tpch-q8",
)
def market_share_by_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 shape: a supplier nation's share of regional promo revenue
    by order year — 8-way join, conditional-sum ratio. part/supplier/nation/
    region all broadcast; customers are pre-pruned to the ASIA region by a
    broadcast semi-street before the fact joins. Both sums are exact
    decimals divided once in double (engine-agreement discipline)."""
    pa, su, li, od, cu, na, re = _t(
        spark, sf_dir, "part", "supplier", "lineitem", "orders", "customer", "nation", "region"
    )
    rev = dec("l_extendedprice") * (1 - dec("l_discount", 4, 2))
    asia_keys = (
        na.join(F.broadcast(re.filter(F.col("r_name") == "ASIA")), na.n_regionkey == re.r_regionkey)
        .select(F.col("n_nationkey").alias("asia_key"))
    )
    cu_asia = cu.join(F.broadcast(asia_keys), cu.c_nationkey == F.col("asia_key")).select("c_custkey")
    supp_nation = (
        su.join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    return (
        li.join(F.broadcast(pa.filter(F.col("p_type") == "PROMO").select("p_partkey")), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == supp_nation.s_suppkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .join(cu_asia, od.o_custkey == cu_asia.c_custkey)
        .groupBy(F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(
            (
                F.sum(F.when(F.col("nation") == "NATION_1", rev).otherwise(F.lit(0).cast("decimal(12,2)"))).cast("double")
                / F.sum(rev).cast("double")
            )
            .cast("double")
            .alias("mkt_share")
        )
    )




@workload(
    "profit_by_nation_year",
    """
    SELECT nation, o_year, CAST(SUM(rev) AS DOUBLE) AS sum_profit
    FROM (
      SELECT n_name AS nation,
             CAST(year(o_orderdate) AS INTEGER) AS o_year,
             CAST(l_extendedprice AS DECIMAL(12,2))
               * (1 - CAST(l_discount AS DECIMAL(4,2))) AS rev
      FROM part, supplier, lineitem, orders, nation
      WHERE s_suppkey = l_suppkey AND p_partkey = l_partkey
        AND o_orderkey = l_orderkey AND s_nationkey = n_nationkey
        AND p_name LIKE '%red%'
    ) GROUP BY nation, o_year
    """,
    "join",
    "aggregation",
    "tpch-q9",
)
def profit_by_nation_year(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape, minus the ps_supplycost term (no partsupp table in
    the testdata): revenue from parts matching a name substring, by supplier
    nation and order year. The LIKE filter prunes part before its broadcast;
    supplier+nation broadcast; lineitem⋈orders is the one big shuffle."""
    pa, su, li, od, na = _t(spark, sf_dir, "part", "supplier", "lineitem", "orders", "nation")
    rev = dec("l_extendedprice") * (1 - dec("l_discount", 4, 2))
    red_parts = pa.filter(F.col("p_name").like("%red%")).select("p_partkey")
    supp_nation = (
        su.join(F.broadcast(na), su.s_nationkey == na.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("nation"))
    )
    return (
        li.join(F.broadcast(red_parts), li.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(supp_nation), li.l_suppkey == supp_nation.s_suppkey)
        .join(od, li.l_orderkey == od.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("int").alias("o_year"))
        .agg(F.sum(rev).cast("double").alias("sum_profit"))
    )




@workload(
    "customer_order_distribution",
    """
    SELECT c_count, COUNT(*) AS custdist
    FROM (
      SELECT c_custkey, COUNT(o_orderkey) AS c_count
      FROM customer LEFT OUTER JOIN orders
        ON c_custkey = o_custkey AND o_orderpriority <> '1-URGENT'
      GROUP BY c_custkey
    ) GROUP BY c_count
    """,
    "join",
    "aggregation",
    "outer",
    "tpch-q13",
)
def customer_order_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape: how many customers placed how many orders —
    left outer join (customers with zero orders kept, counted as 0 via
    COUNT(col)'s null-skipping) then a second aggregation over the counts.
    Scale design: first agg shuffles on custkey, second on c_count; the
    second input is one row per customer, ~6 orders of magnitude smaller
    than the fact, so the distribution step is near-free."""
    cu, od = _t(spark, sf_dir, "customer", "orders")
    od_f = od.filter(F.col("o_orderpriority") != "1-URGENT").select("o_custkey", "o_orderkey")
    per_cust = (
        cu.join(od_f, cu.c_custkey == od_f.o_custkey, "left_outer")
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))




@workload(
    "top_supplier_by_revenue",
    """
    WITH revenue AS (
      SELECT l_suppkey AS supplier_no,
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                      * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS total_revenue
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
        AND l_shipdate < TIMESTAMP '1996-04-01 00:00:00'
      GROUP BY l_suppkey
    )
    SELECT s_suppkey, s_name, total_revenue
    FROM supplier, revenue
    WHERE s_suppkey = supplier_no
      AND total_revenue = (SELECT MAX(total_revenue) FROM revenue)
    """,
    "join",
    "subquery",
    "tpch-q15",
)
def top_supplier_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 shape: supplier(s) with the maximum quarterly revenue —
    an aggregate view joined back against its own scalar max. The revenue
    view is one shuffle over the date-pruned lineitem; its scalar max is a
    single-row broadcast cross join; equality on double is engine-safe
    because both sides derive the double from the same exact-decimal sum."""
    su, li = _t(spark, sf_dir, "supplier", "lineitem")
    rev = dec("l_extendedprice") * (1 - dec("l_discount", 4, 2))
    revenue = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-04-01 00:00:00").cast("timestamp"))
        )
        .groupBy(F.col("l_suppkey").alias("supplier_no"))
        .agg(F.sum(rev).cast("double").alias("total_revenue"))
    )
    max_rev = revenue.agg(F.max("total_revenue").alias("max_revenue"))
    return (
        revenue.crossJoin(F.broadcast(max_rev))
        .filter(F.col("total_revenue") == F.col("max_revenue"))
        .join(F.broadcast(su), F.col("supplier_no") == su.s_suppkey)
        .select("s_suppkey", "s_name", "total_revenue")
    )




@workload(
    "sole_returning_supplier",
    """
    SELECT s_name, COUNT(*) AS numwait
    FROM supplier, lineitem l1, orders
    WHERE s_suppkey = l1.l_suppkey AND o_orderkey = l1.l_orderkey
      AND o_orderstatus = 'F' AND l1.l_returnflag = 'R'
      AND EXISTS (SELECT 1 FROM lineitem l2
                  WHERE l2.l_orderkey = l1.l_orderkey
                    AND l2.l_suppkey <> l1.l_suppkey)
      AND NOT EXISTS (SELECT 1 FROM lineitem l3
                      WHERE l3.l_orderkey = l1.l_orderkey
                        AND l3.l_suppkey <> l1.l_suppkey
                        AND l3.l_returnflag = 'R')
    GROUP BY s_name
    """,
    "join",
    "semi",
    "anti",
    "tpch-q21",
)
def sole_returning_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (returnflag standing in for the missing
    receipt/commit dates): suppliers who were the ONLY supplier with a
    returned line in a multi-supplier finished order — a semi join plus an
    anti join against the same fact table. Scale design: all three lineitem
    legs shuffle on l_orderkey (one exchange reused by AQE), the
    suppkey-inequality is a post-match filter inside each join, and
    supplier broadcasts for the final name lookup."""
    su, li, od = _t(spark, sf_dir, "supplier", "lineitem", "orders")
    l1 = li.filter(F.col("l_returnflag") == "R").select("l_orderkey", "l_suppkey")
    l2 = li.select(F.col("l_orderkey").alias("o2_key"), F.col("l_suppkey").alias("s2_key"))
    l3 = (
        li.filter(F.col("l_returnflag") == "R")
        .select(F.col("l_orderkey").alias("o3_key"), F.col("l_suppkey").alias("s3_key"))
    )
    fin = od.filter(F.col("o_orderstatus") == "F").select("o_orderkey")
    waiting = (
        l1.join(fin, l1.l_orderkey == fin.o_orderkey, "left_semi")
        .join(l2, (F.col("l_orderkey") == F.col("o2_key")) & (F.col("l_suppkey") != F.col("s2_key")), "left_semi")
        .join(l3, (F.col("l_orderkey") == F.col("o3_key")) & (F.col("l_suppkey") != F.col("s3_key")), "left_anti")
    )
    return (
        waiting.join(F.broadcast(su), waiting.l_suppkey == su.s_suppkey)
        .groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
    )




@workload(
    "late_lines_by_priority",
    """
    SELECT l_returnflag,
           COUNT(CASE WHEN o_orderpriority IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS high_line_count,
           COUNT(CASE WHEN o_orderpriority NOT IN ('1-URGENT', '2-HIGH')
                      THEN 1 END) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_returnflag IN ('R', 'A') AND l_shipdate > o_orderdate
    GROUP BY l_returnflag
    """,
    "join",
    "agg",
    "tpch-q12",
)
def late_lines_by_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape (returnflag standing in for the missing l_shipmode):
    lines shipped after the order date, split into high/low-priority counts
    per flag. Scale design: the IN-list filter is scan-local on lineitem
    (pushed to the parquet reader, pruning before the shuffle); the
    shipdate>orderdate predicate is a post-join filter on the shuffle-hash
    join; the conditional counts are map-side-combined so only
    |flags|x|partitions| partial rows cross the final exchange."""
    od, li = _t(spark, sf_dir, "orders", "lineitem")
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")
    return (
        li.filter(F.col("l_returnflag").isin("R", "A"))
        .join(od, li.l_orderkey == od.o_orderkey)
        .filter(F.col("l_shipdate") > F.col("o_orderdate"))
        .groupBy("l_returnflag")
        .agg(
            F.count(F.when(high, 1)).alias("high_line_count"),
            F.count(F.when(~high, 1)).alias("low_line_count"),
        )
    )




@workload(
    "join_null_safe",
    """
    WITH a AS (SELECT nullif(event_type, 'view') AS k, COUNT(*) AS n_events
               FROM events GROUP BY 1),
         b AS (SELECT nullif(event_type, 'view') AS k,
                      CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS total_value
               FROM events GROUP BY 1)
    SELECT a.k, n_events, total_value
    FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
    """,
    "join",
    "null-safe",
)
def join_null_safe(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-safe equi-join (eqNullSafe ≡ IS NOT DISTINCT FROM): NULL keys
    match each other instead of silently dropping — the semantics dirty
    dimension keys need. Scale design: EqualNullSafe is still an equi-join
    condition for Catalyst, so this plans as a hash join (NULLs hash to one
    partition — a null-heavy fact side would need the usual skew
    treatment), never a nested-loop."""
    (ev,) = _t(spark, sf_dir, "events")
    k = F.nullif(F.col("event_type"), F.lit("view"))
    a = ev.groupBy(k.alias("k")).agg(F.count(F.lit(1)).alias("n_events"))
    b = ev.groupBy(k.alias("k2")).agg(
        F.sum(dec("value", 14, 4)).cast("double").alias("total_value")
    )
    return a.join(b, a["k"].eqNullSafe(b["k2"])).select("k", "n_events", "total_value")




@workload(
    "union_by_name_evolution",
    """
    WITH u AS (
      SELECT o_orderkey, o_totalprice, CAST(NULL AS VARCHAR) AS o_orderpriority
      FROM orders WHERE o_orderdate < DATE '1998-01-01'
      UNION ALL
      SELECT o_orderkey, o_totalprice, o_orderpriority
      FROM orders WHERE o_orderdate >= DATE '1998-01-01'
    )
    SELECT COALESCE(o_orderpriority, 'PRE-SCHEMA') AS priority,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS total
    FROM u GROUP BY 1
    """,
    "union",
    "schema-evolution",
)
def union_by_name_evolution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Schema-evolution union: a v1 extract (no priority column) merged
    with a v2 extract via unionByName(allowMissingColumns=True) — Spark
    aligns by NAME and fills the missing column with NULL, the DataFrame
    twin of mergeSchema parquet reads (see read_evolved). The aggregate
    then treats pre-schema rows as their own bucket. Scale design: the
    union is a plan-level concatenation (zero shuffle); both branches scan
    the same files, and Catalyst pushes each branch's date filter down so
    every row is read once."""
    (od,) = _t(spark, sf_dir, "orders")
    cutoff = F.lit("1998-01-01").cast("date")
    v1 = od.filter(F.col("o_orderdate") < cutoff).select("o_orderkey", "o_totalprice")
    v2 = od.filter(F.col("o_orderdate") >= cutoff).select(
        "o_orderkey", "o_totalprice", "o_orderpriority"
    )
    u = v1.unionByName(v2, allowMissingColumns=True)
    return u.groupBy(
        F.coalesce("o_orderpriority", F.lit("PRE-SCHEMA")).alias("priority")
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(dec("o_totalprice", 18, 2)).cast("double").alias("total"),
    )




# One SQL text, two engines (the sql_interface_shared_text discipline):
# recursive month spine LEFT-JOINed to the monthly order counts. Spark 4
# executes WITH RECURSIVE natively (UnionLoop); DuckDB runs the identical
# string as the oracle. CASTs normalize the one cross-engine type split
# (date + month-interval is DATE in Spark, TIMESTAMP in DuckDB).
_RECURSIVE_SPINE_SQL = """
WITH RECURSIVE spine(m) AS (
  SELECT DATE '1995-01-01'
  UNION ALL
  SELECT CAST(m + INTERVAL '1' MONTH AS DATE) FROM spine WHERE m < DATE '1995-12-01'
),
monthly AS (
  SELECT CAST(date_trunc('month', o_orderdate) AS DATE) AS m, COUNT(*) AS n
  FROM orders
  WHERE o_orderdate >= DATE '1995-01-01' AND o_orderdate < DATE '1996-01-01'
  GROUP BY 1
)
SELECT spine.m AS month_start, COALESCE(n, 0) AS n_orders
FROM spine LEFT JOIN monthly ON spine.m = monthly.m
"""




@workload(
    "recursive_cte_month_spine",
    _RECURSIVE_SPINE_SQL,
    "recursive-cte",
    "sql",
    "timeseries",
)
def recursive_cte_month_spine(spark: SparkSession, sf_dir: str) -> DataFrame:
    """WITH RECURSIVE (Spark 4's recursive CTE): generate a 12-month spine
    by recursion, then LEFT JOIN monthly order counts so empty months
    surface as zero — the recursive-SQL formulation of gap filling
    (events_gapfill_locf builds the same grid with sequence()+explode).
    The IDENTICAL SQL text runs on both engines. Scale design: recursion
    here produces the tiny side (one row per step on the driver-sized
    spine); the fact scan is pruned by the pushed year filter and
    aggregated before the broadcast-sized join. Recursion depth is bounded
    and static — at 100 TB the spine is still 12 rows."""
    (od,) = _t(spark, sf_dir, "orders")
    od.createOrReplaceTempView("orders")
    return spark.sql(_RECURSIVE_SPINE_SQL)




# Correlated LATERAL subquery with ORDER BY ... LIMIT — the SQL spelling of
# grouped top-1. One text, two engines.
_LATERAL_TOP_SQL = """
SELECT c_custkey, best.top_orderkey, best.top_price
FROM customer, LATERAL (
  SELECT o_orderkey AS top_orderkey, o_totalprice AS top_price
  FROM orders
  WHERE o_custkey = c_custkey
  ORDER BY o_totalprice DESC, o_orderkey DESC
  LIMIT 1
) AS best
"""




@workload(
    "lateral_top_order",
    _LATERAL_TOP_SQL,
    "join",
    "lateral",
    "topk",
)
def lateral_top_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated LATERAL join (each customer's single most expensive
    order) — identical SQL text on both engines. Spark decorrelates the
    per-row subquery into a DomainJoin + window-style rewrite rather than
    executing it row-at-a-time, so the plan is a join + grouped top-1, not
    |customer| subquery executions; the ORDER BY carries a unique
    tie-break (orderkey) so both engines pick the same row. Scale design:
    semantically equal to topk_orders_per_segment's row_number form — that
    one rides WindowGroupLimit and is the spelling to prefer at 100 TB;
    this workload pins that the LATERAL front door exists and agrees."""
    cu, od = _t(spark, sf_dir, "customer", "orders")
    cu.createOrReplaceTempView("customer")
    od.createOrReplaceTempView("orders")
    return spark.sql(_LATERAL_TOP_SQL)




# ---------------------------------------------------------------------------
# Round 2 widening: advanced-subquery TPC-H shapes (Q2/Q11/Q16/Q20) +
# corpus novelty, set-similarity retrieval, int8 quantization, canonical
# dedup survivors, streaming exact dedup
# ---------------------------------------------------------------------------


@workload(
    "min_unit_price_supplier",
    """
    WITH per AS (
      SELECT l_partkey, l_suppkey, MIN(l_extendedprice / l_quantity) AS min_unit
      FROM lineitem GROUP BY l_partkey, l_suppkey
    )
    SELECT p.p_partkey, p.p_brand, s.s_name, n.n_name, per.min_unit
    FROM per
    JOIN part p ON per.l_partkey = p.p_partkey
    JOIN supplier s ON per.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE p.p_size <= 10
      AND per.min_unit = (SELECT MIN(p2.min_unit) FROM per p2
                          WHERE p2.l_partkey = per.l_partkey)
    """,
    "join",
    "subquery",
    "tpch-q2",
)
def min_unit_price_supplier(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (observed lineitem unit price standing in for the
    missing partsupp.ps_supplycost): for each small part, the supplier(s)
    quoting the minimum unit price. The oracle states it as the classic
    correlated scalar subquery; the engine states it as a per-part window
    min — the decorrelated plan an optimizer would produce, with ties kept
    by equality (MIN and = on doubles are exact, so both engines agree
    bitwise). Scale: one shuffle on (partkey, suppkey) for the pre-agg,
    the window reuses the partkey hash; part/supplier/nation are broadcast
    lookups."""
    li, pt, su, na = _t(spark, sf_dir, "lineitem", "part", "supplier", "nation")
    per = (
        li.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("min_unit"))
    )
    w = Window.partitionBy("l_partkey")
    best = per.withColumn("_best", F.min("min_unit").over(w)).filter(
        F.col("min_unit") == F.col("_best")
    )
    return (
        best.join(F.broadcast(pt.filter(F.col("p_size") <= 10)), best.l_partkey == F.col("p_partkey"))
        .join(F.broadcast(su), best.l_suppkey == F.col("s_suppkey"))
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("p_partkey", "p_brand", "s_name", "n_name", "min_unit")
    )




@workload(
    "supplier_count_by_part_attrs",
    """
    SELECT p_brand, p_size, COUNT(DISTINCT l_suppkey) AS supplier_cnt
    FROM lineitem JOIN part ON l_partkey = p_partkey
    WHERE p_brand <> 'Brand#11'
      AND p_size IN (1, 5, 9, 13, 17, 21, 25, 29)
      AND l_suppkey NOT IN (SELECT s_suppkey FROM supplier WHERE s_acctbal < 0)
    GROUP BY p_brand, p_size
    """,
    "join",
    "anti",
    "distinct",
    "tpch-q16",
)
def supplier_count_by_part_attrs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (negative account balance standing in for the
    complaints comment filter): how many distinct suppliers can deliver
    each qualifying (brand, size) — a NOT IN subquery the engine plans as
    a broadcast anti join (the excluded-supplier set is tiny by
    construction; a NOT IN over a nullable key would need null-aware
    anti join, but s_suppkey is a key, so the plain anti join is exact).
    Scale: part filter is scan-local and broadcast; the distinct-count
    shuffles once on (brand, size) after a map-side partial distinct."""
    li, pt, su = _t(spark, sf_dir, "lineitem", "part", "supplier")
    bad = su.filter(F.col("s_acctbal") < 0).select("s_suppkey")
    ptf = pt.filter(
        (F.col("p_brand") != "Brand#11") & F.col("p_size").isin(1, 5, 9, 13, 17, 21, 25, 29)
    ).select("p_partkey", "p_brand", "p_size")
    return (
        li.join(F.broadcast(bad), li.l_suppkey == bad.s_suppkey, "left_anti")
        .join(F.broadcast(ptf), F.col("l_partkey") == F.col("p_partkey"))
        .groupBy("p_brand", "p_size")
        .agg(F.count_distinct("l_suppkey").alias("supplier_cnt"))
    )




@workload(
    "excess_volume_suppliers",
    """
    WITH ps AS (
      SELECT l_partkey, l_suppkey, SUM(CAST(l_quantity AS DECIMAL(12,2))) AS sq
      FROM lineitem
      WHERE l_shipdate >= TIMESTAMP '1995-01-01'
        AND l_shipdate < TIMESTAMP '1996-01-01'
      GROUP BY l_partkey, l_suppkey
    ), pt AS (
      SELECT l_partkey, SUM(sq) AS tq FROM ps GROUP BY l_partkey
    )
    SELECT DISTINCT s.s_suppkey, s.s_name, n.n_name
    FROM ps
    JOIN pt ON ps.l_partkey = pt.l_partkey
    JOIN supplier s ON ps.l_suppkey = s.s_suppkey
    JOIN nation n ON s.s_nationkey = n.n_nationkey
    WHERE ps.sq * 2 > pt.tq
    """,
    "join",
    "subquery",
    "tpch-q20",
)
def excess_volume_suppliers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape: suppliers who shipped MORE THAN HALF of some
    part's 1995 volume — the nested-aggregate IN subquery stated as a
    re-aggregation join (group (part,supp) → re-group part → compare),
    which is the decorrelation Spark would have to find anyway, made
    explicit. Exactness: quantity sums are decimal; sq*2 > tq is exact
    decimal comparison. Scale: the date filter prunes at the parquet
    scan; one shuffle on (partkey,suppkey) for the pre-agg and one on
    partkey for the per-part-total window (a window over the pre-agg
    instead of a re-agg + self-join — half the exchanges); supplier and
    nation broadcast."""
    li, su, na = _t(spark, sf_dir, "lineitem", "supplier", "nation")
    ps = (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1995-01-01").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1996-01-01").cast("timestamp"))
        )
        .groupBy("l_partkey", "l_suppkey")
        .agg(F.sum(dec("l_quantity")).alias("sq"))
    )
    wp = Window.partitionBy("l_partkey")
    return (
        ps.withColumn("tq", F.sum("sq").over(wp))
        .filter(F.col("sq") * 2 > F.col("tq"))
        .join(F.broadcast(su), ps.l_suppkey == su.s_suppkey)
        .join(F.broadcast(na), F.col("s_nationkey") == F.col("n_nationkey"))
        .select("s_suppkey", "s_name", "n_name")
        .distinct()
    )




@workload(
    "cdc_merge_orders",
    """
    WITH chg AS (
      SELECT o_orderkey AS k,
             CASE WHEN o_orderkey % 20 = 0 THEN 'D'
                  WHEN o_orderkey % 10 = 0 THEN 'U'
                  ELSE 'I' END AS op,
             CASE WHEN o_orderkey % 10 = 0 AND o_orderkey % 20 <> 0
                  THEN o_orderkey ELSE o_orderkey + 3000000 END AS key2,
             o_custkey, o_orderstatus,
             o_totalprice + 1000 AS o_totalprice, o_orderpriority
      FROM orders WHERE o_orderkey % 10 = 0 OR o_orderkey % 97 = 0
    ), chg2 AS (
      SELECT CASE WHEN op = 'I' THEN key2 ELSE k END AS o_orderkey,
             op, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
      FROM chg
    )
    SELECT COALESCE(t.o_orderkey, c.o_orderkey) AS o_orderkey,
           CASE WHEN c.op IN ('U','I') THEN c.o_custkey ELSE t.o_custkey END AS o_custkey,
           CASE WHEN c.op IN ('U','I') THEN c.o_orderstatus ELSE t.o_orderstatus END AS o_orderstatus,
           CASE WHEN c.op IN ('U','I') THEN c.o_totalprice ELSE t.o_totalprice END AS o_totalprice,
           CASE WHEN c.op IN ('U','I') THEN c.o_orderpriority ELSE t.o_orderpriority END AS o_orderpriority,
           CASE WHEN c.op IS NULL THEN 'kept'
                WHEN c.op = 'D' THEN 'deleted'
                WHEN t.o_orderkey IS NULL THEN 'inserted'
                ELSE 'updated' END AS _action
    FROM (SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
          FROM orders) t
    FULL OUTER JOIN chg2 c ON t.o_orderkey = c.o_orderkey
    WHERE CASE WHEN c.op IS NULL THEN 'kept'
               WHEN c.op = 'D' THEN 'deleted'
               WHEN t.o_orderkey IS NULL THEN 'inserted'
               ELSE 'updated' END <> 'deleted'
    """,
    "cdc",
    "merge",
    "join",
)
def cdc_merge_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lakehouse MERGE INTO (Delta/Iceberg shape) under the oracle gate:
    a deterministic changelog derived from orders — deletes for keys
    %20==0, updates (+1000 price) for the remaining %10==0, inserts under
    key+3e6 for %97==0 — applied to the snapshot with ONE full-outer
    join. The oracle states the same merge as SQL CASE arms. See
    operators/relational.apply_changelog for the scale contract."""
    from comlake_core_spark.operators.relational import apply_changelog

    (od,) = _t(spark, sf_dir, "orders")
    base = od.select("o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority")
    src = od.filter((F.col("o_orderkey") % 10 == 0) | (F.col("o_orderkey") % 97 == 0))
    op = (
        F.when(F.col("o_orderkey") % 20 == 0, "D")
        .when(F.col("o_orderkey") % 10 == 0, "U")
        .otherwise("I")
    )
    changes = src.select(
        F.when(op == "I", F.col("o_orderkey") + 3000000)
        .otherwise(F.col("o_orderkey"))
        .alias("o_orderkey"),
        op.alias("_op"),
        "o_custkey",
        "o_orderstatus",
        (F.col("o_totalprice") + 1000).alias("o_totalprice"),
        "o_orderpriority",
    )
    return apply_changelog(base, changes, key="o_orderkey", op_col="_op")




@workload(
    "zorder_pruning_audit",
    r"""
    WITH pts AS (
      SELECT user_id % 32 AS x,
             date_diff('day', DATE '2024-01-01', ts) AS y
      FROM events
    ), zed AS (
      SELECT x, y,
             (((x >> 0) & 1) << 1) + (((y >> 0) & 1) << 0)
           + (((x >> 1) & 1) << 3) + (((y >> 1) & 1) << 2)
           + (((x >> 2) & 1) << 5) + (((y >> 2) & 1) << 4)
           + (((x >> 3) & 1) << 7) + (((y >> 3) & 1) << 6)
           + (((x >> 4) & 1) << 9) + (((y >> 4) & 1) << 8) AS z
      FROM pts
    )
    SELECT CAST(z >> 6 AS BIGINT) AS zrange,
           COUNT(*) AS n_rows,
           CAST(MIN(x) AS BIGINT) AS x_min, CAST(MAX(x) AS BIGINT) AS x_max,
           CAST(MIN(y) AS BIGINT) AS y_min, CAST(MAX(y) AS BIGINT) AS y_max,
           CAST(MAX(x) - MIN(x) + 1 AS BIGINT) AS x_span,
           MAX(x) < 8 OR MIN(x) > 11 AS skipped_by_query
    FROM zed GROUP BY zrange
    """,
    "layout",
    "zorder",
    "pruning",
)
def zorder_pruning_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order layout audit: Morton-interleave (user bucket × event day),
    bucket by z-range (one range ≡ one file/row-group under a z-sorted
    write), and report each range's bounding box plus whether a
    single-dimension query box could SKIP it on min/max stats — the
    measured pruning argument for multi-dimensional layout at 100 TB
    (row-order gives zero skips; the gate pins the z-order spans and
    skip flags exactly).  Pure integer shift/mask arithmetic, one
    map-only projection + one small-key aggregate.  See
    operators/relational.zorder_audit."""
    from comlake_core_spark.operators.relational import zorder_audit

    (ev,) = _t(spark, sf_dir, "events")
    return zorder_audit(
        ev,
        x=F.col("user_id") % 32,
        y=F.datediff(F.to_date("ts"), F.to_date(F.lit("2024-01-01"))),
        bits=5,
        range_shift=6,
        query_x=(8, 11),
    )




@workload(
    "join_skew_audit",
    r"""
    WITH keyed AS (
      SELECT CASE WHEN user_id % 10 < 3 THEN 0 ELSE user_id % 100 END AS k
      FROM events
    ), per_key AS (
      SELECT k, COUNT(*) AS n_rows, COUNT(*) * COUNT(*) AS contribution
      FROM keyed GROUP BY k
    ), tot AS (
      SELECT CAST(SUM(contribution) AS DOUBLE) AS total FROM per_key
    )
    SELECT CAST(k AS BIGINT) AS k, n_rows,
           CAST(contribution AS BIGINT) AS pair_contribution,
           ROUND(contribution / total, 9) AS share
    FROM per_key CROSS JOIN tot
    ORDER BY pair_contribution DESC, k ASC
    LIMIT 10
    """,
    "join",
    "skew",
    "diagnostics",
)
def join_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-join skew audit: per join key, the self-join pair contribution
    n² and its share of the total — the report that decides WHETHER a
    join needs salting (salted_join) before a straggler task finds out
    the hard way.  The key here folds 30% of events onto one value (a
    deterministic stand-in for a production hot key); the top key's
    share makes the skew unmissable.  Cost: one map-combined key count +
    a TakeOrdered top-10 — strictly cheaper than the join it protects
    (the lsh_bucket_skew_audit discipline applied to relational joins)."""
    (ev,) = _t(spark, sf_dir, "events")
    k = F.when(F.col("user_id") % 10 < 3, F.lit(0)).otherwise(F.col("user_id") % 100)
    per_key = ev.select(k.alias("k")).groupBy("k").agg(F.count(F.lit(1)).alias("n_rows"))
    per_key = per_key.select(
        F.col("k").cast("long").alias("k"),
        "n_rows",
        (F.col("n_rows") * F.col("n_rows")).alias("pair_contribution"),
    )
    tot = per_key.agg(F.sum("pair_contribution").cast("double").alias("_total"))
    return (
        per_key.crossJoin(F.broadcast(tot))
        .select(
            "k",
            "n_rows",
            "pair_contribution",
            F.round(F.col("pair_contribution") / F.col("_total"), 9).alias("share"),
        )
        .orderBy(F.col("pair_contribution").desc(), F.col("k").asc())
        .limit(10)
    )




@workload(
    "asof_next_view_after_purchase",
    """
    SELECT p.event_id, p.user_id,
           epoch_us(p.ts) AS purchase_us,
           epoch_us(v.ts) AS next_view_us,
           v.next_view_event
    FROM (SELECT event_id, user_id, ts FROM events
          WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT user_id, ts, min(event_id) AS next_view_event
                    FROM events WHERE event_type = 'view'
                    GROUP BY user_id, ts) v
      ON p.user_id = v.user_id AND p.ts <= v.ts
    """,
    "join",
    "asof",
    "temporal",
)
def asof_next_view_after_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join (r8): each purchase annotated with the user's
    next view at or after it — post-purchase engagement, the time-mirror
    of asof_last_purchase.  DuckDB's ASOF JOIN with the <= inequality is
    the oracle.  Same union+window merge plan as backward (one shuffle
    on user_id, one sorted pass, one-row state), just scanned in
    descending time — a theta-join formulation would plan a
    broadcast-nested-loop and die at scale.  See
    operators/temporal.asof_join(direction='forward')."""
    from comlake_core_spark.operators.temporal import asof_join

    (ev,) = _t(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase").select(
        "event_id", "user_id", "ts"
    )
    views = (
        ev.filter(F.col("event_type") == "view")
        .groupBy("user_id", "ts")
        .agg(F.min("event_id").alias("next_view_event"))
    )
    joined = asof_join(
        purchases, views, on="user_id", left_ts="ts", right_ts="ts",
        direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        # events.ts is parquet timestamp[us] without a zone -> TIMESTAMP_NTZ;
        # session timezone is pinned UTC so the LTZ cast is epoch-identity
        # (same note as asof_last_purchase)
        F.unix_micros(F.col("ts").cast("timestamp_ltz")).alias("purchase_us"),
        F.unix_micros(F.col("asof_ts").cast("timestamp_ltz")).alias("next_view_us"),
        "next_view_event",
    )




@workload(
    "market_basket_lift",
    r"""
    WITH items AS (
      SELECT DISTINCT l_orderkey AS o, l_partkey AS p FROM lineitem
    ), n AS (
      SELECT CAST(COUNT(DISTINCT o) AS DOUBLE) AS n_orders FROM items
    ), freq AS (
      SELECT p, COUNT(*) AS c FROM items GROUP BY p
    ), pairs AS (
      SELECT a.p AS part_a, b.p AS part_b, COUNT(*) AS support
      FROM items a JOIN items b ON a.o = b.o AND a.p < b.p
      GROUP BY a.p, b.p
      HAVING COUNT(*) >= 3
    ), scored AS (
      SELECT part_a, part_b, support,
             round((support * n.n_orders)
                   / (CAST(fa.c AS DOUBLE) * fb.c), 9) AS lift
      FROM pairs
      JOIN freq fa ON pairs.part_a = fa.p
      JOIN freq fb ON pairs.part_b = fb.p
      CROSS JOIN n
    )
    SELECT part_a, part_b, support, lift FROM (
      SELECT *, row_number() OVER (
        ORDER BY lift DESC, part_a ASC, part_b ASC) AS rn
      FROM scored
    ) WHERE rn <= 20
    """,
    "join",
    "aggregation",
    "association-rules",
)
def market_basket_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket association mining on TPC-H lineitem: top-20
    co-ordered part pairs by LIFT (support·N / (c_a·c_b)) with min
    support 3 — the classic within-group pair mining shape (a self-join
    on the group key, never on the corpus).  Scale: the distinct pass
    and the pair aggregate are map-combined shuffles on orderkey/pair;
    pair volume is Σ_order |items|² with TPC-H's small basket sizes —
    bounded fanout, same shape as the LSH bucket join.  Lift lands on
    the 9-grid (int·double/int·int), top-20 rides TakeOrdered.  Ties
    break (lift desc, part_a, part_b)."""
    from comlake_core_spark.session import ensure_parallelism

    (li,) = _t(spark, sf_dir, "lineitem")
    items = (
        ensure_parallelism(li)
        .select(F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p"))
        .distinct()
        # feeds the pair join (both sides), the item counts, and n_orders;
        # lazy localCheckpoint, not persist (r14 A/B, median-of-3:
        # persist 2.49 s / no materialization 2.09 s / checkpoint 1.73 s
        # for the full query at sf0.1) — the columnar cache write is
        # overhead for once-per-run readers and the cut truncates the
        # four readers' plans
        .transform(materialize)
    )
    n_orders = items.select(F.countDistinct("o").cast("double").alias("n_orders"))
    freq = items.groupBy("p").agg(F.count(F.lit(1)).alias("c"))
    b = items.select(F.col("o"), F.col("p").alias("p_b"))
    pairs = (
        items.join(b, "o")
        .filter(F.col("p") < F.col("p_b"))
        .groupBy(F.col("p").alias("part_a"), F.col("p_b").alias("part_b"))
        .agg(F.count(F.lit(1)).alias("support"))
        .filter(F.col("support") >= 3)
    )
    fa = freq.select(F.col("p").alias("part_a"), F.col("c").alias("_ca"))
    fb = freq.select(F.col("p").alias("part_b"), F.col("c").alias("_cb"))
    scored = (
        pairs.join(fa, "part_a")
        .join(fb, "part_b")
        .crossJoin(F.broadcast(n_orders))
        .select(
            "part_a",
            "part_b",
            "support",
            F.round(
                (F.col("support") * F.col("n_orders"))
                / (F.col("_ca").cast("double") * F.col("_cb")),
                9,
            ).alias("lift"),
        )
    )
    # top-20 via orderBy+limit → TakeOrderedAndProject (per-partition
    # heaps + driver merge), NOT a row_number window, whose empty
    # partitionBy would funnel every surviving pair through one task
    # (review r8 #2)
    return scored.orderBy(
        F.desc("lift"), F.asc("part_a"), F.asc("part_b")
    ).limit(20)
