"""aggregation, window, sketch, and scalar-function-family workloads

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
# Extensions (SURVEY.md §2.4 gaps / §7 Phase 4): aggregation, top-k, joins,
# windows — designed for 100 TB (partial aggregation, broadcast dims,
# WindowGroupLimit-eligible top-k).
# ---------------------------------------------------------------------------


@workload(
    "agg_pricing_summary",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * (1 - CAST(l_discount AS DECIMAL(4,2))) * (1 + CAST(l_tax AS DECIMAL(4,2)))) AS DOUBLE) AS sum_charge,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_qty,
           CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS avg_price,
           CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) / COUNT(*) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
    "aggregation",
    "groupby",
)
def agg_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1 shape: hash aggregate with map-side partial aggregation —
    the canonical 100 TB-safe reduction (shuffle carries one row per
    group per mapper, not the data)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    qty, price = dec("l_quantity"), dec("l_extendedprice")
    disc, tax = dec("l_discount", 4, 2), dec("l_tax", 4, 2)
    cnt = F.count(F.lit(1))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(qty).cast("double").alias("sum_qty"),
            F.sum(price).cast("double").alias("sum_base_price"),
            F.sum(price * (1 - disc)).cast("double").alias("sum_disc_price"),
            F.sum(price * (1 - disc) * (1 + tax)).cast("double").alias("sum_charge"),
            (F.sum(qty).cast("double") / cnt).alias("avg_qty"),
            (F.sum(price).cast("double") / cnt).alias("avg_price"),
            (F.sum(disc).cast("double") / cnt).alias("avg_disc"),
            cnt.alias("count_order"),
        )
    )




@workload(
    "distinct_event_users",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS n_users,
           COUNT(*) AS n_events
    FROM events GROUP BY event_type
    """,
    "aggregation",
    "distinct",
)
def distinct_event_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — expands to a two-phase partial-distinct aggregate
    in Spark (dedup before the final shuffle). For 100 TB cardinality
    estimation, approx_count_distinct is the cheap alternative (see
    operators.text)."""
    (ev,) = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.count_distinct("user_id").alias("n_users"),
        F.count(F.lit(1)).alias("n_events"),
    )




@workload(
    "events_hourly",
    """
    SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour,
           event_type,
           COUNT(*) AS n,
           CAST(SUM(CAST(value AS DECIMAL(14,4))) AS DOUBLE) AS sum_value
    FROM events GROUP BY 1, 2
    """,
    "window",
    "time",
)
def events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tumbling 1-hour aggregation over event time — the batch form of the
    Structured Streaming windowed agg (streaming/ holds the readStream
    variant; semantics identical, reference has no streaming query model
    at all, SURVEY.md §2.4)."""
    (ev,) = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        ).agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(dec("value", 14, 4)).cast("double").alias("sum_value"),
        )
    )




@workload(
    "window_running_sum",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(14,4))) OVER (
             PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_value
    FROM events
    """,
    "window",
)
def window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-user sum — classic analytic window. Exact decimal
    accumulation so frame-evaluation strategy differences between engines
    can't change the value."""
    (ev,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(Window.unboundedPreceding, 0)
    return ev.select(
        "event_id",
        "user_id",
        F.sum(dec("value", 14, 4)).over(w).cast("double").alias("running_value"),
    )




@workload(
    "part_brand_stats",
    """
    SELECT p_brand,
           MIN(p_size) AS min_size, MAX(p_size) AS max_size,
           COUNT(DISTINCT p_type) AS n_types, COUNT(*) AS n_parts
    FROM part GROUP BY p_brand
    """,
    "aggregation",
)
def part_brand_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    (part,) = _t(spark, sf_dir, "part")
    return part.groupBy("p_brand").agg(
        F.min("p_size").alias("min_size"),
        F.max("p_size").alias("max_size"),
        F.count_distinct("p_type").alias("n_types"),
        F.count(F.lit(1)).alias("n_parts"),
    )




@workload(
    "agg_grouping_sets",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY GROUPING SETS ((l_returnflag), (l_linestatus))
    """,
    "aggregation",
    "grouping-sets",
)
def agg_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arbitrary GROUPING SETS — the two one-column marginals in a single
    pass, which neither rollup nor cube expresses. Spark expands the sets
    once and partial-aggregates each; still one scan of lineitem."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupingSets(
        [["l_returnflag"], ["l_linestatus"]], "l_returnflag", "l_linestatus"
    ).agg(
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )




@workload(
    "agg_rollup_flag_status",
    """
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) AS sum_qty,
           COUNT(*) AS n
    FROM lineitem
    GROUP BY ROLLUP(l_returnflag, l_linestatus)
    """,
    "aggregation",
    "rollup",
)
def agg_rollup_flag_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP grouping sets (subtotals + grand total in one pass)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.rollup("l_returnflag", "l_linestatus").agg(
        F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
        F.count(F.lit(1)).alias("n"),
    )




# ---------------------------------------------------------------------------
# qast surface completion + set ops + exact stats + more windows
# ---------------------------------------------------------------------------


@workload(
    "array_higher_order",
    r"""
    SELECT doc_id,
           len(list_filter(toks, t -> len(t) > 4)) AS n_long,
           list_has_any(toks, ['spark']) AS has_spark,
           len(toks) = len(list_filter(toks, t -> len(t) > 0)) AS all_nonempty
    FROM (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS toks
      FROM documents
    )
    """,
    "array",
    "higher-order",
)
def array_higher_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions — filter/exists/forall lambdas compile
    to JVM expressions evaluated inline over the token array (no explode,
    no shuffle, no Python): the map-only shape for per-document feature
    extraction at scan speed."""
    from comlake_core_spark.operators.text.core import tokens

    from comlake_core_spark.session import ensure_parallelism

    (docs,) = _t(spark, sf_dir, "documents")
    toks = tokens(F.lower(F.col("text")))
    return ensure_parallelism(docs).select(
        "doc_id",
        F.size(F.filter(toks, lambda t: F.length(t) > 4)).alias("n_long"),
        F.exists(toks, lambda t: t == "spark").alias("has_spark"),
        F.forall(toks, lambda t: F.length(t) > 0).alias("all_nonempty"),
    )




@workload(
    "agg_stats_manual",
    """
    SELECT l_returnflag,
           COUNT(*) AS n,
           CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) / COUNT(*) AS mean_qty,
           sqrt(
             (COUNT(*) * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
              - CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE) * CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE))
             / (COUNT(*) * (COUNT(*) - 1))
           ) AS std_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    "aggregation",
    "stats",
)
def agg_stats_manual(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact mean/stddev from decimal power sums: var = (nΣx² − (Σx)²) /
    (n(n−1)). Built-in stddev uses order-dependent streaming updates that
    can't hash-match across engines; power sums in exact decimal are
    associative, so this formulation is both distributed-friendly (one
    partial-agg pass) and bitwise-reproducible."""
    (li,) = _t(spark, sf_dir, "lineitem")
    q = dec("l_quantity")
    n = F.count(F.lit(1))
    sum_x = F.sum(q).cast("double")
    sum_x2 = F.sum(q * q).cast("double")
    return li.groupBy("l_returnflag").agg(
        n.alias("n"),
        (sum_x / n).alias("mean_qty"),
        F.sqrt((n * sum_x2 - sum_x * sum_x) / (n * (n - 1))).alias("std_qty"),
    )




@workload(
    "window_lag_delta",
    """
    SELECT event_id, user_id,
           value - lag(value) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS delta
    FROM events
    """,
    "window",
    "lag",
)
def window_lag_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() analytic — per-row double subtraction, bitwise-stable."""
    (ev,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return ev.select(
        "event_id",
        "user_id",
        (F.col("value") - F.lag("value").over(w)).alias("delta"),
    )




@workload(
    "window_moving_avg",
    """
    SELECT event_id, user_id,
           CAST(SUM(CAST(value AS DECIMAL(14,4))) OVER w AS DOUBLE)
             / COUNT(*) OVER w AS mov_avg
    FROM events
    WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
                 ROWS BETWEEN 2 PRECEDING AND CURRENT ROW)
    """,
    "window",
    "moving-avg",
)
def window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-row moving average per user (decimal sum / frame count)."""
    (ev,) = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id").rowsBetween(-2, 0)
    return ev.select(
        "event_id",
        "user_id",
        (F.sum(dec("value", 14, 4)).over(w).cast("double") / F.count(F.lit(1)).over(w)).alias("mov_avg"),
    )




@workload(
    "window_percentile_ranks",
    """
    SELECT c_custkey, c_nationkey,
           percent_rank() OVER w AS pct_rank,
           cume_dist() OVER w AS cume,
           ntile(4) OVER w AS quartile
    FROM customer
    WINDOW w AS (PARTITION BY c_nationkey ORDER BY c_acctbal, c_custkey)
    """,
    "window",
    "rank",
)
def window_percentile_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution analytics per nation partition: percent_rank,
    cume_dist, and quartile (ntile). Partitioned by nation so every
    window is executor-local after one keyed shuffle — the scalable form;
    a GLOBAL ntile would demand a single-partition sort and is the
    documented anti-pattern (use approx quantile cuts instead at 100 TB).
    Ties broken by custkey so ranks are engine-portable; the rank ratios
    are exact small-integer divisions, hash-safe."""
    (cu,) = _t(spark, sf_dir, "customer")
    w = Window.partitionBy("c_nationkey").orderBy("c_acctbal", "c_custkey")
    return cu.select(
        "c_custkey",
        "c_nationkey",
        F.percent_rank().over(w).alias("pct_rank"),
        F.cume_dist().over(w).alias("cume"),
        F.ntile(4).over(w).alias("quartile"),
    )




@workload(
    "window_trailing_24h",
    """
    SELECT event_id, user_id,
           COUNT(*) OVER w AS n_24h,
           CAST(SUM(CAST(value AS DECIMAL(14,4))) OVER w AS DOUBLE) AS sum_24h
    FROM events
    WINDOW w AS (
      PARTITION BY user_id ORDER BY CAST(floor(epoch(ts)) AS BIGINT)
      RANGE BETWEEN 86399 PRECEDING AND CURRENT ROW
    )
    """,
    "window",
    "range-frame",
)
def window_trailing_24h(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-based RANGE frame: each event's trailing-24-hour activity for
    its user — the frame type rowsBetween can't express (peers at the same
    timestamp must enter together, and the window width is value-based,
    not row-count-based). Ordering is epoch SECONDS on both engines so
    the frame boundary arithmetic is integer-exact; the frame sum uses
    the exact-decimal form. Same keyed shuffle as any per-user window —
    the frame changes per-partition evaluation only."""
    (ev,) = _t(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.unix_timestamp("ts"))
        .rangeBetween(-86399, 0)
    )
    return ev.select(
        "event_id",
        "user_id",
        F.count(F.lit(1)).over(w).alias("n_24h"),
        F.sum(dec("value", 14, 4)).over(w).cast("double").alias("sum_24h"),
    )




@workload(
    "approx_distinct_users",
    """
    SELECT event_type,
           COUNT(DISTINCT user_id) AS exact_users,
           COUNT(*) AS n_events,
           TRUE AS within_2pct
    FROM events GROUP BY event_type
    """,
    "aggregation",
    "approx",
)
def approx_distinct_users(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++) — the 100TB cardinality path.

    Promoted from rows-only to a full value-hash oracle (VERDICT r2 #5):
    the sketch estimate itself is engine-specific (DuckDB has no HLL++
    twin), so the hashed contract is the *accuracy claim*: ``within_2pct``
    asserts |approx − exact| / exact ≤ 0.02 per group, and the oracle emits
    the same boolean as a constant TRUE plus the exact COUNT(DISTINCT) it
    can verify.  HLL++ is deterministic for fixed input, so this is a hard
    gate, not a flaky tolerance — rsd=0.005 leaves ~4σ of margin against
    the 2% line.  The exact column rides along only for the oracle; the
    production caller keeps the sketch and drops the shuffle-heavy exact
    twin (distinct_event_users is the standalone exact workload)."""
    (ev,) = _t(spark, sf_dir, "events")
    return ev.groupBy("event_type").agg(
        F.approx_count_distinct("user_id", rsd=0.005).alias("_approx"),
        F.count_distinct("user_id").alias("exact_users"),
        F.count(F.lit(1)).alias("n_events"),
    ).select(
        "event_type",
        "exact_users",
        "n_events",
        (
            F.abs(F.col("_approx") - F.col("exact_users"))
            / F.col("exact_users").cast("double")
            <= F.lit(0.02)
        ).alias("within_2pct"),
    )




@workload(
    "forecast_revenue",
    """
    SELECT CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                    * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) AS revenue,
           COUNT(*) AS n
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
      AND l_discount BETWEEN 0.02 AND 0.04
      AND l_quantity < 24
    """,
    "aggregation",
    "tpch-q6",
)
def forecast_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6 shape: pure scan+filter+agg — every predicate must reach
    PushedFilters; the whole query is one codegen'd map + 1-row reduce."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= F.lit("1996-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_shipdate") < F.lit("1997-01-01 00:00:00").cast("timestamp"))
            & (F.col("l_discount") >= 0.02)
            & (F.col("l_discount") <= 0.04)
            & (F.col("l_quantity") < 24)
        ).agg(
            F.sum(dec("l_extendedprice") * dec("l_discount", 4, 2)).cast("double").alias("revenue"),
            F.count(F.lit(1)).alias("n"),
        )
    )




# ---------------------------------------------------------------------------
# Percentiles, cube grouping, correlation (power-sum exact)
# ---------------------------------------------------------------------------


@workload(
    "agg_median_quantity",
    """
    SELECT l_returnflag,
           median(l_quantity) AS median_qty,
           quantile_cont(l_quantity, 0.25) AS q1_qty,
           quantile_cont(l_quantity, 0.75) AS q3_qty
    FROM lineitem GROUP BY l_returnflag
    """,
    "aggregation",
    "percentile",
)
def agg_median_quantity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles (Spark `percentile` ≡ DuckDB
    quantile_cont). The exact form needs a per-group sort — at 100 TB use
    percentile_approx (t-digest-style sketch, mergeable) instead; it has no
    cross-engine oracle, so the exact one carries the correctness check."""
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", 0.5).alias("median_qty"),
        F.percentile("l_quantity", 0.25).alias("q1_qty"),
        F.percentile("l_quantity", 0.75).alias("q3_qty"),
    )




@workload(
    "agg_cube_status",
    """
    SELECT o_orderstatus, o_orderpriority,
           COUNT(*) AS n,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(12,2))) AS DOUBLE) AS sum_price
    FROM orders
    GROUP BY CUBE(o_orderstatus, o_orderpriority)
    """,
    "aggregation",
    "cube",
)
def agg_cube_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets — all 4 grouping combinations in one pass."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.cube("o_orderstatus", "o_orderpriority").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("o_totalprice")).cast("double").alias("sum_price"),
    )




@workload(
    "agg_corr_price_qty",
    """
    SELECT l_returnflag,
           (COUNT(*) * CAST(SUM(CAST(l_discount AS DECIMAL(4,2)) * CAST(l_tax AS DECIMAL(4,2))) AS DOUBLE)
            - CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) * CAST(SUM(CAST(l_tax AS DECIMAL(4,2))) AS DOUBLE))
           / sqrt(
               (COUNT(*) * CAST(SUM(CAST(l_discount AS DECIMAL(4,2)) * CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE)
                - CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE) * CAST(SUM(CAST(l_discount AS DECIMAL(4,2))) AS DOUBLE))
               * (COUNT(*) * CAST(SUM(CAST(l_tax AS DECIMAL(4,2)) * CAST(l_tax AS DECIMAL(4,2))) AS DOUBLE)
                  - CAST(SUM(CAST(l_tax AS DECIMAL(4,2))) AS DOUBLE) * CAST(SUM(CAST(l_tax AS DECIMAL(4,2))) AS DOUBLE))
             ) AS corr_disc_tax
    FROM lineitem GROUP BY l_returnflag
    """,
    "aggregation",
    "stats",
)
def agg_corr_price_qty(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation from exact decimal power sums (same rationale as
    agg_stats_manual: built-in corr() streams in partition order and can't
    hash-match; power sums are associative and exact). Columns chosen with
    small magnitudes so the decimal sums stay exactly representable as
    doubles — DuckDB's decimal-to-double cast double-rounds on huge
    decimals while Spark rounds once, and correlation's cancellation
    amplifies that last-bit difference (corr is scale-invariant, so small
    columns lose nothing)."""
    (li,) = _t(spark, sf_dir, "lineitem")
    q, p = dec("l_discount", 4, 2), dec("l_tax", 4, 2)
    n = F.count(F.lit(1))
    sq, sp = F.sum(q).cast("double"), F.sum(p).cast("double")
    sqq, spp = F.sum(q * q).cast("double"), F.sum(p * p).cast("double")
    sqp = F.sum(q * p).cast("double")
    return li.groupBy("l_returnflag").agg(
        ((n * sqp - sq * sp) / F.sqrt((n * sqq - sq * sq) * (n * spp - sp * sp))).alias("corr_disc_tax")
    )




@workload(
    "string_functions",
    """
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           substring(c_name, 1, 8) AS name_prefix,
           replace(c_mktsegment, 'BUILD', 'B_') AS seg_replaced,
           length(c_name) AS name_len,
           regexp_extract(c_name, '([0-9]+)$', 1) AS trailing_digits
    FROM customer
    """,
    "functions",
    "string",
)
def string_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string library parity (upper/substring/replace/length/
    regexp_extract) — SURVEY §2.4 notes the reference has NO string
    functions beyond regex/concat; these are table stakes for an engine."""
    (cust,) = _t(spark, sf_dir, "customer")
    return cust.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.replace(F.col("c_mktsegment"), F.lit("BUILD"), F.lit("B_")).alias("seg_replaced"),
        F.length("c_name").alias("name_len"),
        F.regexp_extract("c_name", r"([0-9]+)$", 1).alias("trailing_digits"),
    )




@workload(
    "date_functions",
    """
    SELECT o_orderkey,
           EXTRACT(year FROM o_orderdate) AS yr,
           EXTRACT(month FROM o_orderdate) AS mo,
           EXTRACT(dow FROM o_orderdate) AS dow,
           strftime(o_orderdate + INTERVAL 30 DAY, '%Y-%m-%d') AS due_date,
           datediff('day', TIMESTAMP '1995-01-01 00:00:00', o_orderdate) AS days_since_epoch_start
    FROM orders WHERE o_orderkey % 97 = 0
    """,
    "functions",
    "date",
)
def date_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Temporal function parity (extract, interval arithmetic, datediff).
    DuckDB dow: Sunday=0 — Spark's dayofweek is Sunday=1, so subtract 1."""
    (orders,) = _t(spark, sf_dir, "orders")
    return orders.filter(F.col("o_orderkey") % 97 == 0).select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mo"),
        (F.dayofweek("o_orderdate") - 1).cast("long").alias("dow"),
        F.date_format(F.col("o_orderdate") + F.expr("INTERVAL 30 DAYS"), "yyyy-MM-dd").alias("due_date"),
        F.datediff(F.col("o_orderdate"), F.lit("1995-01-01").cast("timestamp")).cast("long").alias(
            "days_since_epoch_start"
        ),
    )




@workload(
    "window_ranks",
    """
    SELECT s_suppkey,
           rank() OVER w AS rnk,
           dense_rank() OVER w AS drnk,
           ntile(4) OVER (ORDER BY s_acctbal DESC, s_suppkey ASC) AS quartile
    FROM supplier
    WINDOW w AS (ORDER BY s_acctbal DESC, s_suppkey ASC)
    """,
    "window",
    "rank",
)
def window_ranks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank/dense_rank/ntile. Global ORDER BY window — fine on a dim-sized
    table; for big tables always partition the window (see
    catalog_latest_revision) or the sort is single-reducer."""
    (supp,) = _t(spark, sf_dir, "supplier")
    w = Window.orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return supp.select(
        "s_suppkey",
        F.rank().over(w).alias("rnk"),
        F.dense_rank().over(w).alias("drnk"),
        F.ntile(4).over(w).alias("quartile"),
    )




@workload(
    "array_functions",
    r"""
    SELECT doc_id,
           array_to_string(list_sort(list_distinct(string_split_regex(trim(text), '\s+'))), ' ') AS vocab,
           len(list_distinct(string_split_regex(trim(text), '\s+'))) AS vocab_size,
           array_to_string(list_sort(list_distinct(string_split_regex(trim(text), '\s+')))[1:3], ',') AS first3
    FROM documents WHERE doc_id % 29 = 0
    """,
    "functions",
    "array",
)
def array_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array function parity: distinct, sort, slice, join.

    The sorted-distinct vocab is emitted as a space-joined STRING, not a raw
    ARRAY<STRING>: the driver's canonicalizer sorts result rows with pandas,
    which cannot hash numpy arrays (r4's one red CORRECTNESS row). The array
    ops under test are identical; only the output shape is scalar."""
    from comlake_core_spark.operators.text.core import tokens

    (docs,) = _t(spark, sf_dir, "documents")
    vocab = F.array_sort(F.array_distinct(tokens("text")))
    return docs.filter(F.col("doc_id") % 29 == 0).select(
        "doc_id",
        F.array_join(vocab, " ").alias("vocab"),
        F.size(F.array_distinct(tokens("text"))).alias("vocab_size"),
        F.array_join(F.slice(vocab, 1, 3), ",").alias("first3"),
    )




# ---------------------------------------------------------------------------
# Grouped-map normalization + TPC-H Q10 shape
# ---------------------------------------------------------------------------


@workload(
    "zscore_events",
    """
    SELECT user_id, event_id,
           (value - CAST(SUM(CAST(value AS DECIMAL(14,4))) OVER w AS DOUBLE) / COUNT(*) OVER w)
           / sqrt(
               (COUNT(*) OVER w * CAST(SUM(CAST(value AS DECIMAL(14,4)) * CAST(value AS DECIMAL(14,4))) OVER w AS DOUBLE)
                - CAST(SUM(CAST(value AS DECIMAL(14,4))) OVER w AS DOUBLE) * CAST(SUM(CAST(value AS DECIMAL(14,4))) OVER w AS DOUBLE))
               / (COUNT(*) OVER w * (COUNT(*) OVER w - 1))
             ) AS zscore
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
    "window",
    "normalize",
)
def zscore_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    from comlake_core_spark.operators.groupmap import zscore_normalize_expr

    (ev,) = _t(spark, sf_dir, "events")
    return zscore_normalize_expr(ev)




@workload(
    "zscore_events_pandas",
    """
    SELECT user_id, event_id,
           CASE WHEN COUNT(*) OVER w < 2 OR STDDEV_SAMP(value) OVER w = 0
                THEN 0.0
                ELSE ROUND((value - AVG(value) OVER w)
                           / STDDEV_SAMP(value) OVER w, 6) END AS zscore
    FROM events
    WINDOW w AS (PARTITION BY user_id)
    """,
    "groupmap",
)
def zscore_events_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """applyInPandas grouped-map variant, oracle-checked at 6 decimal
    digits: pandas mean/std(ddof=1) and DuckDB AVG/STDDEV_SAMP differ only
    in float summation order (~1e-13 relative), so both engines agree
    after rounding — a boundary collision would need a z-score within
    ~1e-10 of a half-digit, which the synthetic values don't produce.
    The bitwise-exact decimal formulation is zscore_events (expression
    twin); pytest asserts the two are approx-equal row-by-row."""
    from comlake_core_spark.operators.groupmap import zscore_normalize_pandas

    (ev,) = _t(spark, sf_dir, "events")
    out = zscore_normalize_pandas(ev)
    return out.select("user_id", "event_id", F.round("zscore", 6).alias("zscore"))




@workload(
    "udaf_weighted_mean",
    r"""
    SELECT l_returnflag,
           ROUND(
             CAST(SUM(CAST(l_extendedprice AS DECIMAL(12,2)) * CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE)
             / CAST(SUM(CAST(l_quantity AS DECIMAL(12,2))) AS DOUBLE), 4) AS wmean_price
    FROM lineitem
    GROUP BY l_returnflag
    """,
    "udf",
)
def udaf_weighted_mean(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pandas grouped-agg UDF (the UDAF surface — SURVEY §2.4 notes the
    reference has no UDF surface at all): quantity-weighted mean price per
    return flag. The UDAF sums with math.fsum (exact, order-independent),
    so the exact-decimal oracle agrees to ~1 ulp; both sides round to 4
    decimals, ~6 orders of magnitude of margin over that ulp."""
    from comlake_core_spark.functions.udfs import make_weighted_mean_udaf

    wmean = make_weighted_mean_udaf()
    (li,) = _t(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.round(wmean("l_extendedprice", "l_quantity"), 4).alias("wmean_price")
    )




@workload(
    "events_daily_rollup",
    """
    SELECT strftime(date_trunc('day', ts), '%Y-%m-%d') AS day,
           event_type,
           COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS total_value
    FROM events
    GROUP BY 1, 2
    """,
    "aggregation",
    "rollup",
    "timeseries",
)
def events_daily_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style hierarchical rollup: the DAILY aggregate is computed
    FROM the hourly aggregate (aggregate-of-aggregate), not from raw events
    — the continuous-aggregate pattern where each resolution feeds the next.
    Exact-decimal sums compose associatively, so the two-level result equals
    the direct daily aggregate (the oracle computes it directly from raw
    rows). At 100 TB the hourly layer is the materialized one; daily/weekly
    read it instead of rescanning the events history."""
    (ev,) = _t(spark, sf_dir, "events")
    hourly = ev.groupBy(F.window("ts", "1 hour").alias("w"), "event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(dec("value", 12, 4)).alias("v"),
    )
    return (
        hourly.groupBy(
            F.date_format(F.date_trunc("day", F.col("w.start")), "yyyy-MM-dd").alias("day"),
            "event_type",
        )
        .agg(
            F.sum("n").alias("n_events"),
            F.sum("v").cast("double").alias("total_value"),
        )
    )




@workload(
    "incremental_rollup_events",
    """
    SELECT event_type,
           COUNT(*) AS n_rows,
           CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) AS sum_value,
           CASE WHEN COUNT(value) > 0
                THEN CAST(SUM(CAST(value AS DECIMAL(12,4))) AS DOUBLE) / COUNT(value)
           END AS avg_value,
           MIN(value) AS min_value,
           MAX(value) AS max_value
    FROM events GROUP BY event_type
    """,
    "aggregation",
    "materialized-view",
    "incremental",
)
def incremental_rollup_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained rollup under the oracle gate: the view is
    built from the FIRST half of events, then refreshed with the second
    half — and the oracle is the one-shot full-scan aggregate, so the
    merge of partial states is pinned exactly equal to a recompute
    (decimal sums are associative; see operators/matview.py). At 100 TB
    this is the difference between a refresh that shuffles one day's
    delta and one that rescans the lake."""
    import tempfile

    from comlake_core_spark.operators.matview import IncrementalRollup

    (ev,) = _t(spark, sf_dir, "events")
    view = IncrementalRollup(
        spark, tempfile.mkdtemp(prefix="rollup_"), keys=["event_type"], measures=["value"]
    )
    cutoff = "2024-01-15"
    view.refresh(ev.filter(F.col("ts") < cutoff))
    view.refresh(ev.filter(F.col("ts") >= cutoff))
    return view.read()




# ---------------------------------------------------------------------------
# Extension batch: argmax aggregates, ordered string agg, null-safe join,
# exact histograms, schema-evolution union, boolean aggregates, recursive
# CTEs, lateral joins, map-function pipelines (SURVEY.md §2.4 widening)
# ---------------------------------------------------------------------------

# Unique total order for argmin/argmax determinism: exact integer cents of
# the price, tie-broken by the (unique) order key. Both engines evaluate it
# as exact BIGINT arithmetic, so the winner is engine-independent even when
# prices tie. Cents ≤ 5e7 and keys ≤ 1.5e7 at sf10, so the packed value
# stays far below 2^63.
_PRICE_ORD = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) * 1000000000 + o_orderkey"




@workload(
    "agg_argmax_order",
    f"""
    SELECT o_orderpriority,
           arg_max(o_orderkey, {_PRICE_ORD}) AS best_orderkey,
           arg_min(o_orderkey, {_PRICE_ORD}) AS worst_orderkey,
           CAST(MAX(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS max_price
    FROM orders GROUP BY o_orderpriority
    """,
    "aggregation",
    "argmax",
)
def agg_argmax_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Argmin/argmax aggregates (max_by/min_by ≡ DuckDB arg_max/arg_min):
    the cheapest-and-most-expensive-order-per-priority shape. Scale design:
    max_by carries one (value, ordering) pair of state per group through
    map-side partial aggregation — same shuffle profile as MAX, no sort and
    no window. Determinism: the ordering expression is a unique BIGINT
    (exact cents packed with the order key), so ties cannot make the two
    engines pick different winners."""
    (od,) = _t(spark, sf_dir, "orders")
    ord_ = F.expr(_PRICE_ORD)
    return od.groupBy("o_orderpriority").agg(
        F.max_by("o_orderkey", ord_).alias("best_orderkey"),
        F.min_by("o_orderkey", ord_).alias("worst_orderkey"),
        F.max(dec("o_totalprice", 18, 2)).cast("double").alias("max_price"),
    )




@workload(
    "string_agg_nations",
    """
    SELECT r_name,
           string_agg(n_name, ',' ORDER BY n_name) AS nations_csv,
           COUNT(*) AS n_nations
    FROM region JOIN nation ON r_regionkey = n_regionkey
    GROUP BY r_name
    """,
    "aggregation",
    "string-agg",
)
def string_agg_nations(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation (LISTAGG / string_agg): Spark has no
    ordered string_agg aggregate, so the idiomatic form is
    array_join(array_sort(collect_list(x))) — collect_list's
    partition-dependent order is canonicalized by the sort, making the
    result deterministic and hash-equal to DuckDB's ORDER BY form. Scale
    design: only valid when each group's list fits an executor (here:
    nations per region, a dim-sized group); for unbounded groups the
    correct tool is explode-side processing, not string concatenation."""
    rg, na = _t(spark, sf_dir, "region", "nation")
    return (
        na.join(F.broadcast(rg), na.n_regionkey == rg.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(F.array_sort(F.collect_list("n_name")), ",").alias("nations_csv"),
            F.count(F.lit(1)).alias("n_nations"),
        )
    )




@workload(
    "histogram_totalprice",
    """
    SELECT CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 2500000 AS bucket,
           CAST((CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT) // 2500000) * 25000
                AS BIGINT) AS bucket_lo,
           COUNT(*) AS n_orders,
           CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE) AS bucket_value
    FROM orders GROUP BY 1, 2
    """,
    "aggregation",
    "histogram",
)
def histogram_totalprice(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact equi-width histogram ($25k buckets over order value) — the
    profiling shape behind width_bucket, built from integer arithmetic so
    bucket edges are engine-exact: double→DECIMAL(18,2)→integer cents,
    then BIGINT floor-division (Spark DIV ≡ DuckDB //; prices are
    non-negative so truncation == floor). Scale design: bucketing is a
    codegen'd map-only expression and the aggregate carries one row per
    bucket through map-side combine — a full-table profile costs one scan
    and a |buckets|-row shuffle."""
    (od,) = _t(spark, sf_dir, "orders")
    cents = "CAST(CAST(o_totalprice AS DECIMAL(18,2)) * 100 AS BIGINT)"
    return (
        od.withColumn("bucket", F.expr(f"{cents} DIV 2500000"))
        .groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(dec("o_totalprice", 18, 2)).cast("double").alias("bucket_value"),
        )
        .withColumn("bucket_lo", (F.col("bucket") * 25000).cast("bigint"))
    )




@workload(
    "agg_filtered_counts",
    """
    SELECT event_type,
           COUNT(*) AS n,
           CAST(count_if(value > 100) AS BIGINT) AS n_high,
           bool_or(value > 300) AS any_extreme,
           bool_and(value >= 0) AS all_nonneg
    FROM events GROUP BY event_type
    """,
    "aggregation",
    "boolean",
)
def agg_filtered_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Boolean / filtered aggregates (count_if, bool_or ≡ ANY, bool_and ≡
    EVERY) — the SQL FILTER-clause family. Scale design: each is a single
    conditional accumulator with map-side combine (bool_or/bool_and are
    1-bit state), so adding more rule columns adds zero shuffle volume —
    the same one-scan property the dq_orders_checks gate builds on."""
    (ev,) = _t(spark, sf_dir, "events")
    v = F.col("value")
    return ev.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.count_if(v > 100).alias("n_high"),
        F.bool_or(v > 300).alias("any_extreme"),
        F.bool_and(v >= 0).alias("all_nonneg"),
    )




@workload(
    "map_functions_pipeline",
    """
    SELECT user_id, event_type, COUNT(*) AS n
    FROM events GROUP BY user_id, event_type
    HAVING COUNT(*) >= 3
    """,
    "functions",
    "map",
)
def map_functions_pipeline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Map-type function family end-to-end: per-user counts are packed
    into a MAP via map_from_entries(collect_list(struct)), pruned with the
    map_filter higher-order lambda, and unpacked by exploding the map —
    landing exactly where the flat GROUP BY ... HAVING oracle lands. Pins
    that Spark's map construction/lambda/explode round-trips losslessly
    (keys are unique by construction — map_from_entries throws on
    duplicates). Scale design: the map stage is per-user state sized by
    |event types| (bounded, small); all lambdas are codegen'd JVM
    expressions, no Python."""
    (ev,) = _t(spark, sf_dir, "events")
    per = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    m = per.groupBy("user_id").agg(
        F.map_from_entries(F.collect_list(F.struct("event_type", "cnt"))).alias("m")
    )
    return m.select(
        "user_id",
        F.explode(F.map_filter("m", lambda k, v: v >= F.lit(3))).alias("event_type", "n"),
    )




@workload(
    "heavy_hitters_event_types",
    """
    SELECT event_type, COUNT(*) AS est_count
    FROM events GROUP BY event_type
    """,
    "sketch",
    "frequency",
)
def heavy_hitters_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Misra-Gries frequent-items summary (operators/sketches.py) run in
    its exact regime: k=16 exceeds |distinct(event_type)|, so no decrement
    ever fires and the sketch provably equals the exact GROUP BY — which
    makes the whole distributed pipeline (mapInPandas partial summaries →
    k·P-row shuffle → TakeOrdered offset broadcast) oracle-checkable. The
    approximate regime's deterministic n/(k+1) undercount bound is
    pytest-pinned on zipf-skewed data under multiple partitionings
    (tests/test_sketches.py, the PODS'12 mergeability result). At 100 TB
    the raw column never moves: shuffle volume is O(k × partitions)."""
    from comlake_core_spark.operators.sketches import misra_gries

    (ev,) = _t(spark, sf_dir, "events")
    return misra_gries(ev, "event_type", 16)




@workload(
    "important_part_values",
    """
    WITH val AS (
      SELECT l_partkey,
             SUM(CAST(l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l_discount AS DECIMAL(4,2)))) AS v
      FROM lineitem GROUP BY l_partkey
    )
    SELECT l_partkey, CAST(v AS DOUBLE) AS part_value
    FROM val
    WHERE v * 2000 > (SELECT SUM(v) FROM val)
    """,
    "aggregation",
    "subquery",
    "tpch-q11",
)
def important_part_values(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape: parts whose revenue exceeds a fixed fraction
    (1/2000) of GLOBAL revenue — a HAVING against a scalar subquery over
    the same aggregate. The engine computes the per-part decimal sums
    once, reduces them again to the global total (a 1-row broadcast
    scalar), and filters with exact decimal arithmetic (v*2000 > total
    instead of v > total*0.0005 — integer×decimal stays exact in both
    engines, fraction literals don't). Scale: one shuffle for the
    per-part agg; the global total is a tree-reduce of the already-
    aggregated rows; no second scan of lineitem."""
    (li,) = _t(spark, sf_dir, "lineitem")
    val = li.groupBy("l_partkey").agg(
        F.sum(dec("l_extendedprice") * (1 - dec("l_discount", 4, 2))).alias("v")
    )
    total = val.agg(F.sum("v").alias("_total"))
    return (
        val.crossJoin(F.broadcast(total))
        .filter(F.col("v") * 2000 > F.col("_total"))
        .select("l_partkey", F.col("v").cast("double").alias("part_value"))
    )




@workload(
    "udtf_top_terms",
    r"""
    SELECT doc_id, term, cnt FROM (
      SELECT doc_id, term, cnt,
             row_number() OVER (PARTITION BY doc_id
                                ORDER BY cnt DESC, term ASC) AS rn
      FROM (
        SELECT doc_id, term, COUNT(*) AS cnt
        FROM (
          SELECT doc_id,
                 unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
          FROM documents
        ) WHERE term <> ''
        GROUP BY doc_id, term
      )
    ) WHERE rn <= 3
    """,
    "udtf",
    "text",
    "lateral",
)
def udtf_top_terms(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python user-defined TABLE function (Spark 4 @udtf) under the
    oracle gate: per-document top-3 terms expanded by a LATERAL join —
    the row-fanout extensibility surface the reference lacks entirely.
    Deterministic expansion order (count desc, term asc) makes the
    Python fanout hash-comparable to the oracle's window ranking. The
    JVM codegen'd twin of this computation is text_tfidf_top_terms /
    text_top_bigrams — a UDTF is the slow path, demonstrated here
    because the API is the point (see functions/udtfs.py)."""
    from comlake_core_spark.functions.udtfs import register_udtfs

    from comlake_core_spark.session import ensure_parallelism

    register_udtfs(spark)
    (docs,) = _t(spark, sf_dir, "documents")
    ensure_parallelism(docs).createOrReplaceTempView("_udtf_docs")
    return spark.sql(
        "SELECT doc_id, t.term, t.cnt FROM _udtf_docs, LATERAL top_terms(text, 3) t"
    )




@workload(
    "ols_trend_by_nation",
    """
    WITH monthly AS (
      SELECT n.n_name,
             (EXTRACT(YEAR FROM l.l_shipdate) * 12
              + EXTRACT(MONTH FROM l.l_shipdate)) AS x,
             SUM(CAST(l.l_extendedprice AS DECIMAL(12,2))
                 * (1 - CAST(l.l_discount AS DECIMAL(4,2)))) AS y
      FROM lineitem l
      JOIN orders o ON l.l_orderkey = o.o_orderkey
      JOIN customer c ON o.o_custkey = c.c_custkey
      JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2
    ), stats AS (
      SELECT n_name,
             COUNT(*) AS n,
             CAST(SUM(x) AS BIGINT) AS sx,
             SUM(y) AS sy,
             SUM(y * x) AS sxy,
             CAST(SUM(x * x) AS BIGINT) AS sxx
      FROM monthly GROUP BY n_name
    )
    SELECT n_name,
           CAST(n AS BIGINT) AS n_months,
           CAST(CAST(n * sxy - sx * sy AS VARCHAR) AS DOUBLE)
             / CAST(n * sxx - sx * sx AS DOUBLE) AS slope_per_month,
           CAST(CAST(sy AS VARCHAR) AS DOUBLE) / n AS mean_monthly_revenue
    FROM stats
    """,
    "aggregation",
    "regression",
    "analytics",
)
def ols_trend_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Closed-form least-squares trend per group — the 'is revenue
    growing?' analytic, computed as pure aggregation (no MLlib, no
    iteration): slope = (nΣxy − ΣxΣy)/(nΣx² − (Σx)²) over (month-index,
    monthly-revenue) points. Every sum is exact (decimal y, integer x —
    associative, so partial aggregation cannot change them); only the
    final division is floating, with the VARCHAR-bridge cast making the
    big-decimal→double step identical across engines. Scale: the monthly
    pre-agg rides the revenue pipeline's joins; the per-nation OLS state
    is five scalars per group — this is the map-combinable 'sufficient
    statistics' shape any closed-form model fit takes at 100 TB."""
    li, orders, cust, nation = _t(spark, sf_dir, "lineitem", "orders", "customer", "nation")
    rev = dec("l_extendedprice") * (1 - dec("l_discount", 4, 2))
    x = (F.year("l_shipdate") * 12 + F.month("l_shipdate")).cast("long")
    monthly = (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(cust, orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .groupBy("n_name", x.alias("x"))
        .agg(F.sum(rev).alias("y"))
    )
    stats = monthly.groupBy("n_name").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("x").cast("long").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("y") * F.col("x")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).cast("long").alias("sxx"),
    )
    num = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")).cast("string").cast("double")
    den = (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
    return stats.select(
        "n_name",
        F.col("n").cast("long").alias("n_months"),
        (num / den).alias("slope_per_month"),
        (F.col("sy").cast("string").cast("double") / F.col("n")).alias("mean_monthly_revenue"),
    )




@workload(
    "approx_quantiles_prices",
    """
    WITH ex AS (
      SELECT l_returnflag,
             quantile_disc(l_extendedprice, 0.5)  AS p50_exact,
             quantile_disc(l_extendedprice, 0.95) AS p95_exact,
             COUNT(*) AS n_rows
      FROM lineitem GROUP BY l_returnflag
    )
    SELECT l_returnflag,
           CAST(p50_exact AS DOUBLE) AS p50_exact,
           CAST(p95_exact AS DOUBLE) AS p95_exact,
           n_rows,
           TRUE AS p50_within_rank_eps,
           TRUE AS p95_within_rank_eps
    FROM ex
    """,
    "aggregation",
    "approx",
    "sketch",
)
def approx_quantiles_prices(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate quantiles (Greenwald-Khanna sketch via percentile_approx)
    under the accuracy-claim oracle — the same promotion pattern as
    approx_distinct_users: the sketch value is engine-specific, so the
    hashed contract is its RANK-ERROR guarantee.  For each group the
    workload computes the approx p50/p95, then verifies IN-ENGINE that the
    approx value's true rank lies within ±eps·n of the target rank
    (eps = 1/accuracy = 1/1000 — GK's formal guarantee), and emits that
    boolean plus the exact quantiles (which DuckDB recomputes via
    quantile_disc).  percentile_approx is deterministic for fixed input,
    so the booleans are a hard gate.  At 100 TB the sketch is the only
    viable path (mergeable, one pass, O(1/eps) state per group) and the
    exact twin rides along here only for the oracle."""
    (li,) = _t(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice").cast("double")
    approx = li.groupBy("l_returnflag").agg(
        F.percentile_approx(price, [0.5, 0.95], 1000).alias("_ap"),
        F.count(F.lit(1)).alias("n_rows"),
    )
    # exact DISCRETE quantiles (DuckDB quantile_disc twin): lowest value
    # whose rank >= ceil(q*n); computed with a window-free join-back
    ranked = li.select("l_returnflag", price.alias("_v")).groupBy("l_returnflag", "_v").agg(
        F.count(F.lit(1)).alias("_c")
    )
    w = Window.partitionBy("l_returnflag").orderBy("_v")
    cum = ranked.withColumn("_cum", F.sum("_c").over(w))
    totals = ranked.groupBy("l_returnflag").agg(F.sum("_c").alias("_n"))
    cum = cum.join(totals, "l_returnflag")
    exact = cum.groupBy("l_returnflag").agg(
        F.min(F.when(F.col("_cum") >= F.ceil(F.col("_n") * 0.5), F.col("_v"))).alias("p50_exact"),
        F.min(F.when(F.col("_cum") >= F.ceil(F.col("_n") * 0.95), F.col("_v"))).alias("p95_exact"),
    )
    # rank-error check: the approx value's cumulative rank must lie within
    # eps*n of the target rank (two lookups against the same cum frame)
    joined = approx.join(exact, "l_returnflag")
    a50 = F.element_at("_ap", 1)
    # The approx value is an element of the input, so the largest _rv <= a50
    # IS that value's row; max(struct(_cum, _c)) picks it and carries its own
    # count, giving the value's rank RANGE [_cum - _c + 1, _cum].  GK only
    # guarantees SOME rank in that range is within eps*n of the target, so
    # the check passes iff the range intersects target +/- eps*n (duplicated
    # values straddling the target rank were a spurious-fail risk before).
    r = cum.select(
        F.col("l_returnflag").alias("_rf"), F.col("_v").alias("_rv"), "_cum", "_c", "_n"
    )
    out = (
        joined.join(r, (F.col("l_returnflag") == F.col("_rf")) & (F.col("_rv") <= a50), "left")
        .groupBy("l_returnflag", "_ap", "n_rows", "p50_exact", "p95_exact")
        .agg(F.max(F.struct("_cum", "_c")).alias("_s50"), F.max("_n").alias("_n"))
        .join(
            r.select(
                F.col("_rf").alias("_rf2"),
                F.col("_rv").alias("_rv2"),
                F.col("_cum").alias("_cum2"),
                F.col("_c").alias("_c2"),
            ),
            (F.col("l_returnflag") == F.col("_rf2")) & (F.col("_rv2") <= F.element_at("_ap", 2)),
            "left",
        )
        .groupBy("l_returnflag", "_ap", "n_rows", "p50_exact", "p95_exact", "_s50", "_n")
        .agg(F.max(F.struct("_cum2", "_c2")).alias("_s95"))
    )
    eps = 1.0 / 1000
    eps_n = F.greatest(F.ceil(F.col("_n") * eps), F.lit(1))

    def _within(s: str, cum_f: str, cnt_f: str, q: float):
        target = F.ceil(F.col("_n") * q)
        hi = F.col(s).getField(cum_f)
        lo = hi - F.col(s).getField(cnt_f) + 1
        return (lo <= target + eps_n) & (hi >= target - eps_n)

    return out.select(
        "l_returnflag",
        F.col("p50_exact").cast("double").alias("p50_exact"),
        F.col("p95_exact").cast("double").alias("p95_exact"),
        "n_rows",
        _within("_s50", "_cum", "_c", 0.5).alias("p50_within_rank_eps"),
        _within("_s95", "_cum2", "_c2", 0.95).alias("p95_within_rank_eps"),
    )




@workload(
    "events_ewma_decay",
    r"""
    WITH base AS (
      SELECT user_id, epoch_us(ts) AS us,
             CAST(round(value * 100, 0) AS BIGINT) AS vc,
             MAX(epoch_us(ts)) OVER (PARTITION BY user_id) AS tref
      FROM events
    ), recent AS (
      SELECT user_id, vc, (tref - us) // 3600000000 AS dh
      FROM base WHERE (tref - us) // 3600000000 <= 48
    )
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_recent,
           ROUND(CAST(SUM(CAST(vc AS HUGEINT)
                          * CAST(1::BIGINT << CAST(48 - dh AS INT) AS HUGEINT)) AS DOUBLE)
                 / 281474976710656.0, 6) AS ewma_value
    FROM recent GROUP BY user_id
    """,
    "window",
    "temporal",
)
def events_ewma_decay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponential time-decay feature (EWMA-style): each user's decayed
    value mass at their LAST event time, half-life 1 hour, horizon 48 h —
    the recency-weighted activity feature every behavioural model /
    training-mixture freshness weighting consumes.

    Exactness bridge (the reason decay = 1/2 per whole hour): the weight
    0.5^delta_hours scaled by 2^48 is an INTEGER power of two, and value
    in integer cents times that weight is an exact integer — both engines
    sum integers (Spark DECIMAL(38,0), DuckDB HUGEINT), so no float
    summation-order divergence exists; ONE final double division by 2^48
    lands both on the identical double.  Integer `div` (not floating /)
    computes delta-hours so bucket boundaries cannot ulp-flip.

    Plan: one window max over the user key, then one map-combined agg on
    the same key — the second exchange is elided because the window
    already partitioned by user_id (the subset rule); shuffle volume is
    O(users), never O(events)."""
    (ev,) = _t(spark, sf_dir, "events")
    base = ev.select(
        "user_id",
        F.round(F.col("value") * 100, 0).cast("long").alias("vc"),
        F.expr("(max(unix_micros(ts)) over (partition by user_id) - unix_micros(ts)) div 3600000000").alias("dh"),
    )
    recent = base.filter(F.col("dh") <= 48)
    contrib = (
        F.col("vc").cast("decimal(20,0)")
        * F.expr("shiftleft(1L, cast(48 - dh as int))").cast("decimal(18,0)")
    ).cast("decimal(38,0)")
    return recent.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_recent"),
        F.round(
            F.sum(contrib).cast("double") / F.lit(float(2**48)), 6
        ).alias("ewma_value"),
    )




@workload(
    "kmv_join_cardinality",
    r"""
    WITH a_keys AS (SELECT DISTINCT CAST(o_custkey AS VARCHAR) AS k FROM orders),
    b_keys AS (SELECT DISTINCT CAST(c_custkey AS VARCHAR) AS k FROM customer),
    a_sk AS (SELECT md5(k) AS h FROM a_keys ORDER BY h LIMIT 256),
    b_sk AS (SELECT md5(k) AS h FROM b_keys ORDER BY h LIMIT 256),
    u_sk AS (
      SELECT h FROM (SELECT DISTINCT h FROM (SELECT h FROM a_sk UNION ALL SELECT h FROM b_sk))
      ORDER BY h LIMIT 256
    ),
    ea AS (
      SELECT CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
             ELSE ROUND(255.0 / (CAST('0x' || substr(MAX(h), 1, 12) AS BIGINT)
                                 / 281474976710656.0), 6) END AS est_a
      FROM a_sk
    ),
    eb AS (
      SELECT CASE WHEN COUNT(*) < 256 THEN CAST(COUNT(*) AS DOUBLE)
             ELSE ROUND(255.0 / (CAST('0x' || substr(MAX(h), 1, 12) AS BIGINT)
                                 / 281474976710656.0), 6) END AS est_b
      FROM b_sk
    ),
    uu AS (
      SELECT COUNT(*) AS ku,
             CAST(SUM(CASE WHEN a.h IS NOT NULL AND b.h IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS kboth,
             MAX(u.h) AS hku
      FROM u_sk u LEFT JOIN a_sk a ON u.h = a.h LEFT JOIN b_sk b ON u.h = b.h
    ),
    eu AS (
      SELECT ku, kboth,
             CASE WHEN ku < 256 THEN CAST(ku AS DOUBLE)
             ELSE ROUND(255.0 / (CAST('0x' || substr(hku, 1, 12) AS BIGINT)
                                 / 281474976710656.0), 6) END AS est_u
      FROM uu
    ),
    ex AS (
      SELECT (SELECT COUNT(*) FROM a_keys) AS exact_a,
             (SELECT COUNT(*) FROM b_keys) AS exact_b,
             (SELECT COUNT(*) FROM a_keys JOIN b_keys USING (k)) AS exact_intersection
    )
    SELECT CAST(256 AS BIGINT) AS k,
           est_a, exact_a, est_b, exact_b,
           ROUND(CAST(kboth AS DOUBLE) / ku * est_u, 6) AS est_intersection,
           exact_intersection,
           ROUND(abs(ROUND(CAST(kboth AS DOUBLE) / ku * est_u, 6) - exact_intersection)
                 / NULLIF(CAST(exact_intersection AS DOUBLE), 0), 6) AS rel_err_intersection
    FROM ea, eb, eu, ex
    """,
    "sketches",
    "join",
    "cardinality",
)
def kmv_join_cardinality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-size planning with KMV bottom-k sketches (Beyer et al. 2007):
    estimate each side's distinct join keys and their intersection from
    O(k) mergeable sketch rows — how a 100 TB pipeline sizes a join
    before paying for it — with exact counts and the relative error in
    the same row (the estimator is AUDITED, not trusted).  md5 hashing
    keeps the sketch engine-portable, so the oracle recomputes the
    sketches themselves.  See operators/sketches.kmv_join_cardinality."""
    from comlake_core_spark.operators.sketches import kmv_join_cardinality as kmv

    od, cu = _t(spark, sf_dir, "orders", "customer")
    return kmv(od, "o_custkey", cu, "c_custkey", k=256)




@workload(
    "orders_rfm_segmentation",
    """
    WITH per_cust AS (
      SELECT o_custkey AS c,
             MAX(o_orderdate) AS r,
             COUNT(*) AS f,
             SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS m
      FROM orders GROUP BY o_custkey
    ), scored AS (
      SELECT c,
             ntile(4) OVER (ORDER BY r ASC, c ASC) AS r_score,
             ntile(4) OVER (ORDER BY f ASC, c ASC) AS f_score,
             ntile(4) OVER (ORDER BY m ASC, c ASC) AS m_score,
             m
      FROM per_cust
    )
    SELECT CAST(r_score AS VARCHAR) || CAST(f_score AS VARCHAR)
             || CAST(m_score AS VARCHAR) AS rfm,
           COUNT(*) AS n_customers,
           CAST(SUM(m) AS DOUBLE) AS total_monetary
    FROM scored GROUP BY rfm
    """,
    "aggregation",
    "segmentation",
    "window",
)
def orders_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary quartile
    scores, the classic marketing-analytics rollup): per-customer stats,
    ntile(4) per metric with the customer key as tie-break (a TOTAL order
    — ntile on ties is engine-defined otherwise), segments = the 3-digit
    code.  Exact-decimal monetary sums.

    r13: the three corpus-wide `ntile(4).over(Window.orderBy(...))`
    windows (each a single-partition funnel at 100 TB — the same class
    the dsir swap removed) are replaced by `global_row_number` ranks +
    the EXACT ntile arithmetic: with n rows, base = n div 4 and
    rem = n mod 4, SQL NTILE assigns the first rem tiles base+1 rows and
    the rest base — tile(rank) = ceil(rank/(base+1)) while
    rank <= rem·(base+1), else rem + ceil((rank−cut)/base).  Pure
    integer expressions of the exact rank, so the unchanged SQL-ntile
    oracle still matches hash-for-hash; three range shuffles replace
    three single-task sorts, exact at any customer count (the
    approx-quantile sketch remains the documented swap where exact
    quartile identity is not required)."""
    od = _t(spark, sf_dir, "orders")[0]
    from comlake_core_spark.operators.sampling import global_row_number

    per_cust = od.groupBy(F.col("o_custkey").alias("c")).agg(
        F.max("o_orderdate").alias("r"),
        F.count(F.lit(1)).alias("f"),
        F.sum(dec("o_totalprice", 18, 2)).alias("m"),
    )
    n_row = per_cust.agg(F.count(F.lit(1)).alias("_n"))
    scored = per_cust.crossJoin(F.broadcast(n_row))

    def quartile(df: DataFrame, key: str, out: str) -> DataFrame:
        ranked = global_row_number(
            df, [F.col(key).asc(), F.col("c").asc()], out="_rk"
        )
        tile = F.expr(
            "CASE WHEN _rk <= (_n % 4) * (_n div 4 + 1) "
            "THEN (_rk + (_n div 4)) div (_n div 4 + 1) "
            "ELSE (_n % 4) + (_rk - (_n % 4) * (_n div 4 + 1) "
            "      + (_n div 4) - 1) div (_n div 4) END"
        )
        return ranked.withColumn(out, tile.cast("int")).drop("_rk")

    scored = quartile(scored, "r", "r_score")
    scored = quartile(scored, "f", "f_score")
    scored = quartile(scored, "m", "m_score")
    return scored.groupBy(
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("rfm")
    ).agg(
        F.count(F.lit(1)).alias("n_customers"),
        F.sum("m").cast("double").alias("total_monetary"),
    )




@workload(
    "orders_pareto_revenue_share",
    """
    WITH rev AS (
      SELECT o_custkey AS c,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) * 100 AS BIGINT) AS cents
      FROM orders GROUP BY o_custkey
    ), curve AS (
      SELECT row_number() OVER (ORDER BY cents DESC, c ASC) AS rank,
             SUM(cents) OVER (ORDER BY cents DESC, c ASC
                              ROWS UNBOUNDED PRECEDING) AS cum
      FROM rev
    ), n AS (SELECT COUNT(*) AS n, SUM(cents) AS total FROM rev)
    SELECT pct,
           CAST(CAST(ceil(pct * n) AS BIGINT) AS BIGINT) AS n_top_customers,
           ROUND(CAST(MAX(CASE WHEN rank = CAST(ceil(pct * n) AS BIGINT)
                               THEN cum END) AS DOUBLE)
                 / CAST(total AS DOUBLE), 9) AS revenue_share
    FROM curve CROSS JOIN n
    CROSS JOIN (VALUES (CAST(0.01 AS DOUBLE)), (CAST(0.05 AS DOUBLE)),
                       (CAST(0.1 AS DOUBLE)), (CAST(0.2 AS DOUBLE))) t(pct)
    GROUP BY pct, n, total
    """,
    "aggregation",
    "distribution",
)
def orders_pareto_revenue_share(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto concentration audit: the revenue share captured by the top
    1/5/10/20% of customers — the skew number a mixture/reweighting
    decision reads (and the second consumer of global_running_sum after
    vocab_coverage: range shuffle + map-only Arrow cumsum over integer
    CENTS, no single-partition window, exact at any customer count)."""
    from comlake_core_spark.operators.sampling import global_running_sum

    od = _t(spark, sf_dir, "orders")[0]
    rev = od.groupBy(F.col("o_custkey").alias("c")).agg(
        (F.sum(dec("o_totalprice", 18, 2)) * 100).cast("long").alias("cents")
    )
    cum = global_running_sum(
        rev, [F.col("cents").desc(), F.col("c").asc()], "cents", out="_cum", rank_out="_rank"
    )
    one = rev.agg(F.count(F.lit(1)).alias("_n"), F.sum("cents").alias("_total"))
    hits = cum.crossJoin(F.broadcast(one))
    aggs = []
    pcts = (0.01, 0.05, 0.1, 0.2)
    for i, p in enumerate(pcts):
        at = F.ceil(F.lit(p) * F.col("_n")).cast("long")
        aggs.append(F.max(F.when(F.col("_rank") == at, at)).alias(f"_k{i}"))
        aggs.append(
            F.round(
                F.max(F.when(F.col("_rank") == at, F.col("_cum"))).cast("double")
                / F.max("_total").cast("double"),
                9,
            ).alias(f"_s{i}")
        )
    row = hits.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(p).alias("pct"),
                F.col(f"_k{i}").alias("n_top_customers"),
                F.col(f"_s{i}").alias("revenue_share"),
            )
            for i, p in enumerate(pcts)
        ]
    )
    return row.select(F.explode(pairs).alias("_p")).select(
        F.col("_p.pct").alias("pct"),
        F.col("_p.n_top_customers").alias("n_top_customers"),
        F.col("_p.revenue_share").alias("revenue_share"),
    )




@workload(
    "customer_segment_entropy",
    """
    WITH seg AS (
      SELECT c_nationkey AS nk, c_mktsegment AS s, COUNT(*) AS c
      FROM customer GROUP BY c_nationkey, c_mktsegment
    ), tot AS (
      SELECT nk, SUM(c) AS n FROM seg GROUP BY nk
    )
    SELECT CAST(nk AS BIGINT) AS nationkey,
           CAST(MIN(n) AS BIGINT) AS n_customers,
           COUNT(*) AS n_segments,
           CAST(SUM(CAST(ROUND(-(CAST(c AS DOUBLE) / n) * ln(CAST(c AS DOUBLE) / n), 9)
                         AS DECIMAL(20,9))) AS DOUBLE) AS segment_entropy
    FROM seg JOIN tot USING (nk)
    GROUP BY nk
    """,
    "aggregation",
    "distribution",
    "monitoring",
)
def customer_segment_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shannon entropy of the market-segment mix per nation — the
    distribution-balance monitor (a domain/language mixture audit uses
    the identical shape: low entropy = one segment dominates).  ln on
    the 9-decimal grid with exact decimal sums; two map-combined aggs
    over the dimension table."""
    cu = _t(spark, sf_dir, "customer")[0]
    seg = cu.groupBy(F.col("c_nationkey").alias("nk"), F.col("c_mktsegment").alias("s")).agg(
        F.count(F.lit(1)).alias("c")
    )
    tot = seg.groupBy("nk").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    term = F.round(-p * F.log(p), 9).cast("decimal(20,9)")
    return (
        seg.join(tot, "nk")
        .groupBy("nk")
        .agg(
            F.min("n").alias("n_customers"),
            F.count(F.lit(1)).alias("n_segments"),
            F.sum(term).cast("double").alias("segment_entropy"),
        )
        .select(
            F.col("nk").cast("long").alias("nationkey"),
            "n_customers",
            "n_segments",
            "segment_entropy",
        )
    )
