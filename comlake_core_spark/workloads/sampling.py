"""sampling, quality-classifier, and data-hygiene workloads

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



@workload(
    "train_test_split_counts",
    """
    SELECT CASE WHEN substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '1999'
                THEN 'test' ELSE 'train' END AS split,
           COUNT(*) AS n_docs
    FROM documents GROUP BY 1
    """,
    "sampling",
    "training-data",
)
def train_test_split_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stable content-hash train/test split of the documents corpus:
    assignment is a pure function of doc_id (no shuffle, no randomness),
    so re-ingesting or re-partitioning never moves a document across the
    split — the contamination guarantee an eval set needs. Uses the
    md5-based portable assignment so the EXACT membership (not just the
    counts) is recomputable in DuckDB/PostgreSQL for audits; the oracle
    applies the same cut (0x1999/0x10000 = 10%). The xxhash64 fast path
    keeps its determinism/bounds pins in tests/test_sampling.py."""
    from comlake_core_spark.operators.sampling import split_assignment_portable

    (docs,) = _t(spark, sf_dir, "documents")
    return (
        docs.select(
            F.when(split_assignment_portable(F.col("doc_id"), 0.1), "test")
            .otherwise("train")
            .alias("split")
        )
        .groupBy("split")
        .agg(F.count(F.lit(1)).alias("n_docs"))
    )




@workload(
    "dq_orders_checks",
    """
    SELECT 'not_null_o_custkey' AS rule,
           COUNT(*) FILTER (WHERE o_custkey IS NULL) AS n_violations FROM orders
    UNION ALL
    SELECT 'range_o_totalprice',
           COUNT(*) FILTER (WHERE NOT COALESCE(o_totalprice BETWEEN 0 AND 200000, FALSE))
    FROM orders
    UNION ALL
    SELECT 'domain_o_orderstatus',
           COUNT(*) FILTER (WHERE NOT COALESCE(o_orderstatus IN ('O', 'F'), FALSE))
    FROM orders
    UNION ALL
    SELECT 'shape_o_orderpriority',
           COUNT(*) FILTER (WHERE NOT COALESCE(regexp_matches(o_orderpriority, '^[1-5]-'), FALSE))
    FROM orders
    UNION ALL
    SELECT 'unique_o_orderkey', CAST(COALESCE(SUM(cnt - 1), 0) AS BIGINT)
    FROM (SELECT COUNT(*) AS cnt FROM orders GROUP BY o_orderkey)
    UNION ALL
    SELECT 'fk_o_custkey', COUNT(*)
    FROM orders LEFT JOIN customer ON o_custkey = c_custkey
    WHERE c_custkey IS NULL
    """,
    "quality",
    "governance",
)
def dq_orders_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative data-quality gate over orders: four row-level rules in
    ONE scan (each rule is a conditional count in a single map-side-
    combined aggregate — adding a rule adds a column, not a pass), plus
    key-uniqueness (one keyed agg) and referential integrity to customer
    (left anti join). Violation = predicate not TRUE, so nulls can't
    sneak past a range check. The oracle recomputes every count in SQL."""
    from comlake_core_spark.operators.quality import (
        check,
        fk_violations,
        in_domain,
        in_range,
        matches,
        not_null,
        unique_key,
    )

    cu, od = _t(spark, sf_dir, "customer", "orders")
    rules = check(
        od,
        [
            not_null("o_custkey"),
            in_range("o_totalprice", 0, 200000),
            in_domain("o_orderstatus", ("O", "F")),
            matches("o_orderpriority", "^[1-5]-"),
        ],
    )
    return rules.unionByName(unique_key(od, "o_orderkey")).unionByName(
        fk_violations(od, "o_custkey", cu, "c_custkey")
    )




@workload(
    "stratified_sample_orders",
    """
    SELECT o_orderkey, o_orderpriority
    FROM (
      SELECT o_orderkey, o_orderpriority,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority ORDER BY o_orderkey) AS rn,
             CEIL(COUNT(*) OVER (PARTITION BY o_orderpriority) * 0.1) AS quota
      FROM orders
    )
    WHERE rn <= quota
    """,
    "sampling",
    "training-data",
    "window",
)
def stratified_sample_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Proportional stratified sample (10% per priority class),
    deterministic in o_orderkey order — the class-balancing sampler a
    training pipeline uses to cap a dominant class while keeping every
    stratum represented. Two passes: O(#strata) quota agg broadcast back,
    then one shuffle with the rank filter applied map-side
    (WindowGroupLimit caps what each task forwards). The oracle recomputes
    the same quota + rank in pure SQL."""
    from comlake_core_spark.operators.sampling import stratified_sample

    (od,) = _t(spark, sf_dir, "orders")
    return stratified_sample(
        od.select("o_orderkey", "o_orderpriority"),
        stratum="o_orderpriority",
        order_by="o_orderkey",
        fraction=0.1,
    )




@workload(
    "token_budget_admit",
    """
    WITH c AS (
      SELECT event_id, user_id,
             SUM(CAST(value AS DECIMAL(14,4))) OVER (
               PARTITION BY user_id ORDER BY ts, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
      FROM events
    )
    SELECT event_id, user_id, CAST(cum AS DOUBLE) AS cum_value
    FROM c WHERE cum <= CAST(500.0 AS DECIMAL(14,4))
    """,
    "quota",
    "window",
    "streaming-twin",
)
def token_budget_admit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user ingestion quota: admit the longest event-time prefix whose
    cumulative value stays within a 500-unit budget — the admission-control
    operator for capping per-source intake in a 100 TB crawl. This batch
    form (window cumsum + filter, exact DECIMAL(14,4)) is the oracle twin
    of streaming/budget.py's stateful streaming implementation, which is
    pytest-pinned to emit bit-identical admissions across micro-batch
    replay. One shuffle on user_id; the quota filter is a codegen'd
    post-window predicate, so rejected rows never leave the executor."""
    from comlake_core_spark.streaming.budget import admit_within_budget

    (ev,) = _t(spark, sf_dir, "events")
    return admit_within_budget(ev, 500.0)




@workload(
    "analyze_orders_profile",
    """
    SELECT 'o_orderkey' AS column, COUNT(*) AS n_rows,
           CAST(SUM(CASE WHEN o_orderkey IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls,
           CAST(COUNT(DISTINCT o_orderkey) AS BIGINT) AS n_distinct,
           CAST(MIN(o_orderkey) AS DOUBLE) AS min_value,
           CAST(MAX(o_orderkey) AS DOUBLE) AS max_value
    FROM orders
    UNION ALL
    SELECT 'o_custkey', COUNT(*),
           CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_custkey) AS BIGINT),
           CAST(MIN(o_custkey) AS DOUBLE), CAST(MAX(o_custkey) AS DOUBLE)
    FROM orders
    UNION ALL
    SELECT 'o_totalprice', COUNT(*),
           CAST(SUM(CASE WHEN o_totalprice IS NULL THEN 1 ELSE 0 END) AS BIGINT),
           CAST(COUNT(DISTINCT o_totalprice) AS BIGINT),
           CAST(MIN(o_totalprice) AS DOUBLE), CAST(MAX(o_totalprice) AS DOUBLE)
    FROM orders
    """,
    "quality",
    "analyze",
    "stats",
)
def analyze_orders_profile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ANALYZE TABLE column statistics (the CBO's food) in one scan:
    row/null/exact-distinct counts and numeric extremes per column,
    emitted in the long catalog-stats shape. The oracle re-scans per
    column (UNION ALL); the engine reads the table ONCE. See
    operators/quality.profile_columns."""
    from comlake_core_spark.operators.quality import profile_columns

    (od,) = _t(spark, sf_dir, "orders")
    return profile_columns(od, ["o_orderkey", "o_custkey", "o_totalprice"])




@workload(
    "contrastive_negative_samples",
    """
    SELECT anchor_id, item_id, rn FROM (
      SELECT a.doc_id AS anchor_id, c.doc_id AS item_id,
             row_number() OVER (
               PARTITION BY a.doc_id
               ORDER BY md5(CAST(a.doc_id AS VARCHAR) || ':' || CAST(c.doc_id AS VARCHAR)) ASC,
                        c.doc_id ASC) AS rn
      FROM (SELECT doc_id FROM documents WHERE doc_id % 29 = 0) a
      JOIN documents c ON c.doc_id <> a.doc_id
    ) WHERE rn <= 4
    """,
    "sampling",
    "training-data",
    "contrastive",
)
def contrastive_negative_samples(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic negative sampling for contrastive pairs: 4 matched
    negatives per anchor drawn by the smallest md5(anchor:item) — seeded,
    partitioning-independent, and per-anchor distinct, so re-ingesting
    the corpus never changes a training pair (the same portability
    contract as the train/test split). Positive mining (minhash /
    embedding dedup) supplies the positives; this supplies the negatives.
    See operators/sampling.negative_samples."""
    from comlake_core_spark.operators.sampling import negative_samples

    (docs,) = _t(spark, sf_dir, "documents")
    anchors = docs.filter(F.col("doc_id") % 29 == 0)
    return negative_samples(docs, anchors, k=4)




@workload(
    "mixture_resample_corpus",
    r"""
    WITH base AS (
      SELECT lang, source, doc_id,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                             t -> t <> '')) AS tok
      FROM documents
    ), dom AS (
      SELECT lang, source, COUNT(*) AS n_docs_total,
             CAST(SUM(tok) AS BIGINT) AS domain_tokens,
             CAST(ROUND(sqrt(CAST(SUM(tok) AS DOUBLE)), 9) AS DECIMAL(20,9)) AS w
      FROM base GROUP BY lang, source
    ), tot AS (SELECT SUM(w) AS t FROM dom),
    -- largest-remainder apportionment (identical to the engine): floors,
    -- then the leftover seats to the biggest fractional remainders
    domq0 AS (
      SELECT lang, source, n_docs_total, domain_tokens,
             200.0 * (CAST(w AS DOUBLE) / CAST(t AS DOUBLE)) AS raw
      FROM dom CROSS JOIN tot
    ),
    domq AS (
      SELECT lang, source, n_docs_total, domain_tokens,
             CAST(FLOOR(raw) AS BIGINT)
               + CASE WHEN row_number() OVER (ORDER BY raw - FLOOR(raw) DESC,
                                              lang ASC, source ASC)
                        <= 200 - (SELECT SUM(CAST(FLOOR(raw) AS BIGINT)) FROM domq0)
                      THEN 1 ELSE 0 END AS quota
      FROM domq0
    ), ranked AS (
      SELECT b.lang, b.source, b.doc_id, b.tok,
             row_number() OVER (PARTITION BY b.lang, b.source
                                ORDER BY md5(CAST(b.doc_id AS VARCHAR)) ASC,
                                         b.doc_id ASC) AS rn
      FROM base b
    ), kept AS (
      SELECT r.lang, r.source, COUNT(*) AS n_kept,
             CAST(SUM(r.tok) AS BIGINT) AS kept_tokens,
             CAST(SUM(r.doc_id) AS BIGINT) AS kept_id_sum
      FROM ranked r JOIN domq d ON r.lang = d.lang AND r.source = d.source
      WHERE r.rn <= d.quota
      GROUP BY r.lang, r.source
    )
    SELECT d.lang, d.source, d.n_docs_total, d.domain_tokens, d.quota,
           COALESCE(k.n_kept, 0) AS n_kept,
           COALESCE(k.kept_tokens, 0) AS kept_tokens,
           COALESCE(k.kept_id_sum, 0) AS kept_id_sum
    FROM domq d LEFT JOIN kept k ON d.lang = k.lang AND d.source = k.source
    """,
    "sampling",
    "training-data",
    "mixture",
)
def mixture_resample_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Training-mixture re-weighting under the oracle gate: a 200-doc
    budget allocated across (lang, source) domains by α=0.5 temperature
    flattening of token mass (sqrt is IEEE-exact in every engine; the
    weight normalization runs on a 9-decimal grid), each domain's quota
    selected by content-hash rank. The kept_id_sum column pins the EXACT
    selected membership, not just counts — re-ingestion can never move a
    document in or out of the mixture. See
    operators/sampling.mixture_resample."""
    from comlake_core_spark.operators.sampling import mixture_resample
    from comlake_core_spark.operators.text.core import tokens

    (docs,) = _t(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(tokens(F.col("text")), lambda t: t != ""))
    base = docs.select("lang", "source", "doc_id", n_tok.alias("n_tokens"))
    return mixture_resample(base, ["lang", "source"], target_docs=200)




@workload(
    "leakage_safe_split_docs",
    r"""
    WITH RECURSIVE sh AS (
      SELECT doc_id AS id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' ')
             )) AS grams
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
            FROM documents)
    ), sized AS (SELECT id, grams, len(grams) AS gc FROM sh),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM sized a JOIN sized b
        ON a.id < b.id
       AND a.gc >= CAST(ceil(b.gc * 0.8) AS BIGINT)
       AND b.gc >= CAST(ceil(a.gc * 0.8) AS BIGINT)
      WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
               / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    walk(id, comp) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT e.b, w.comp FROM walk w JOIN edges e ON e.a = w.id
      WHERE w.comp < e.b
    ), comps AS (SELECT id, MIN(comp) AS comp FROM walk GROUP BY id),
    labeled AS (
      SELECT d.doc_id AS id, COALESCE(c.comp, d.doc_id) AS rep,
             CASE WHEN substring(md5(CAST(COALESCE(c.comp, d.doc_id) AS VARCHAR)), 1, 4)
                       < '2000'
                  THEN 'test' ELSE 'train' END AS split
      FROM documents d LEFT JOIN comps c ON d.doc_id = c.id
    ),
    crossing AS (
      SELECT COUNT(*) AS n FROM pairs p
      JOIN labeled la ON la.id = p.id_a
      JOIN labeled lb ON lb.id = p.id_b
      WHERE la.split <> lb.split
    )
    SELECT split, COUNT(*) AS n_docs,
           CAST(SUM(CASE WHEN rep <> id THEN 1 ELSE 0 END) AS BIGINT) AS n_in_clusters,
           CAST(SUM(id) AS BIGINT) AS id_sum,
           (SELECT n FROM crossing) AS cross_split_pairs
    FROM labeled GROUP BY split
    """,
    "sampling",
    "training-data",
    "dedup",
)
def leakage_safe_split_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination-safe train/test split under the full oracle gate: a
    plain per-document hash split puts a near-dup pair in DIFFERENT splits
    with probability 2f(1-f) — eval leakage. Here the assignment unit is
    the near-dup CLUSTER (MinHash-LSH edges at 0.8 ≡ brute-force exact
    Jaccard, the proven dedup_clusters equality → connected components →
    engine-portable md5 split of the representative), and the output's
    cross_split_pairs column COMPUTES the leakage (must be 0) rather than
    assuming it. See operators/sampling.leakage_safe_split."""
    from comlake_core_spark.operators.dedup.minhash import minhash_lsh_pairs
    from comlake_core_spark.operators.sampling import leakage_safe_split
    from comlake_core_spark.session import ensure_parallelism

    (docs,) = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(
        ensure_parallelism(docs), threshold=0.8, num_hashes=64, bands=16
    ).select("id_a", "id_b")
    return leakage_safe_split(docs, pairs, test_fraction=0.125)




@workload(
    "mad_outlier_events",
    r"""
    WITH q AS (
      SELECT event_type, CAST(round(value * 1000000, 0) AS BIGINT) AS vq FROM events
    ), m AS (
      SELECT event_type, vq,
             CAST(2 * quantile_cont(vq, 0.5) OVER (PARTITION BY event_type) AS BIGINT) AS med2
      FROM q
    ), d AS (
      SELECT event_type, med2, ABS(2*vq - med2) AS dev2 FROM m
    ), md AS (
      SELECT event_type, med2, dev2,
             CAST(2 * quantile_cont(dev2, 0.5) OVER (PARTITION BY event_type) AS BIGINT) AS mad4
      FROM d
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MAX(med2) / 2000000.0, 6) AS med_value,
           ROUND(MAX(mad4) / 4000000.0, 6) AS mad_value,
           CAST(SUM(CASE WHEN 2*dev2 > 3*mad4 THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers
    FROM md GROUP BY event_type
    """,
    "quality",
    "stats",
)
def mad_outlier_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust per-type outlier counts via median absolute deviation
    (|x - med| > 3*MAD) — the heavy-tail-safe complement to the stddev
    z-score family (zscore_events): one extreme value inflates a stddev
    but barely moves a median.  Values are quantized to integer
    micro-units before the medians, so every interpolated median is an
    exact half-integer and the outlier comparison is pure integer
    arithmetic in both engines (no float-boundary flips — see
    operators/quality.py:mad_outliers).  One shuffle on event_type; both
    median windows and the final agg reuse that partitioning."""
    from comlake_core_spark.operators.quality import mad_outliers

    (ev,) = _t(spark, sf_dir, "events")
    return mad_outliers(ev, "value", "event_type", k=3)




@workload(
    "weighted_sample_docs",
    r"""
    WITH wc AS (
      SELECT doc_id, source,
             len(string_split_regex(trim(text), '\s+')) AS w
      FROM documents
    ), keyed AS (
      SELECT doc_id, source, w,
             CAST(round(
               ln((CAST('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 12) AS BIGINT) + 1)
                  / 281474976710656.0) / greatest(w, 1) * 1000000000.0, 0) AS BIGINT) AS qk
      FROM wc
    ), ranked AS (
      SELECT source, doc_id, w, qk,
             row_number() OVER (PARTITION BY source ORDER BY qk DESC, doc_id) AS sample_rank
      FROM keyed
    )
    SELECT source, sample_rank, doc_id,
           CAST(w AS BIGINT) AS weight,
           ROUND(qk / 1000000000.0, 6) AS es_key
    FROM ranked WHERE sample_rank <= 5
    """,
    "sampling",
    "text",
)
def weighted_sample_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Weighted sampling without replacement, 5 docs per source weighted
    by word count — the A-ES scheme (Efraimidis & Spirakis 2006): rank by
    u^(1/w) (here the monotone ln(u)/w), top-n per group.  u derives from
    md5(doc_id) (the engine-portable recipe of split_assignment_portable)
    and the ranking key is quantized to an integer before the sort, so a
    1-ulp libm ln() difference between engines cannot reorder boundary
    rows.  The rank filter rides WindowGroupLimit: each map task forwards
    at most 5 rows per source before the single shuffle."""
    from comlake_core_spark.operators.sampling import weighted_sample
    from comlake_core_spark.operators.text.core import token_count

    (docs,) = _t(spark, sf_dir, "documents")
    return weighted_sample(
        docs.withColumn("_w", token_count("text")),
        weight="_w",
        n_per_group=5,
        group_col="source",
    )




@workload(
    "quality_lr_logit",
    r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      FROM documents
    ), tok2 AS (
      SELECT doc_id, term FROM tok WHERE term <> ''
    ), w AS (
      SELECT doc_id,
             CAST('0x' || substr(md5('w:' || CAST(
                 CAST('0x' || substr(md5(term), 1, 8) AS BIGINT) % 256
               AS VARCHAR)), 1, 8) AS BIGINT) % 2001 - 1000 AS w
      FROM tok2
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_tokens,
           CAST(SUM(w) AS BIGINT) AS logit_q,
           CAST((SUM(w) * 1000000) // COUNT(*) AS BIGINT) AS avg_logit_micro,
           SUM(w) > 0 AS admit
    FROM w GROUP BY doc_id
    """,
    "quality",
    "text",
    "model",
)
def quality_lr_logit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Model-based quality filtering: a linear classifier over hashed
    token features scores every document (the CCNet / GPT-3-WebText
    quality-gate shape), admitting those with positive logit.  Weights
    are a fixed md5-derived table so the oracle can recompute them — the
    plan shape (map-side hashed-feature dot product, one combine-enabled
    agg per doc) is exactly what serving a trained linear model costs.
    All-integer arithmetic; see operators/quality.lr_quality_logit."""
    from comlake_core_spark.operators.quality import lr_quality_logit

    from comlake_core_spark.session import ensure_parallelism

    (docs,) = _t(spark, sf_dir, "documents")
    return lr_quality_logit(ensure_parallelism(docs))




@workload(
    "dsir_importance_resampling",
    r"""
    WITH tok AS (
      SELECT doc_id, lang = 'en' AS is_tgt,
             unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      FROM documents
    ), tok2 AS (
      SELECT doc_id, is_tgt,
             CAST('0x' || substr(md5(term), 1, 8) AS BIGINT) % 1024 AS b
      FROM tok WHERE term <> ''
    ), raw AS (
      SELECT b, COUNT(*) AS cr FROM tok2 GROUP BY b
    ), tgt AS (
      SELECT b, COUNT(*) AS ct FROM tok2 WHERE is_tgt GROUP BY b
    ), nr AS (SELECT COUNT(*) AS n FROM tok2),
    nt AS (SELECT COUNT(*) AS n FROM tok2 WHERE is_tgt),
    model AS (
      SELECT raw.b,
             CAST(round((ln((COALESCE(tgt.ct, 0) + 1) / (nt.n + 1024))
                         - ln((raw.cr + 1) / (nr.n + 1024))) * 1000000000.0, 0)
                  AS BIGINT) AS lrq
      FROM raw LEFT JOIN tgt ON raw.b = tgt.b CROSS JOIN nr CROSS JOIN nt
    ), scored AS (
      SELECT doc_id, COUNT(*) AS n_tokens, SUM(lrq) AS wq
      FROM tok2 JOIN model ON tok2.b = model.b GROUP BY doc_id
    )
    SELECT doc_id,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST(wq AS BIGINT) AS weight_q,
           CAST((wq * 1000) // n_tokens AS BIGINT) AS avg_weight_micro,
           row_number() OVER (ORDER BY wq DESC, doc_id) <= 100 AS sampled
    FROM scored
    """,
    "sampling",
    "text",
    "model",
)
def dsir_importance_resampling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR (Xie et al., NeurIPS 2023): rank every document by the log
    importance ratio of two hashed-unigram LMs — target distribution =
    the corpus's English documents, raw = everything — and mark the
    global top-100 as the resampled set.  The standard label-free
    data-selection stage of a pretraining pipeline.  Per-bucket log
    ratios are quantized to integers once, so document weights are exact
    integer sums (operators/sampling.dsir_weights: two count aggregates,
    a ≤1024-row broadcast model join, one per-doc sum)."""
    from comlake_core_spark.operators.sampling import dsir_weights

    from comlake_core_spark.session import ensure_parallelism

    (docs,) = _t(spark, sf_dir, "documents")
    return dsir_weights(
        ensure_parallelism(docs), lambda d: d["lang"] == "en", top_n=100
    )




@workload(
    "shard_assign_balanced",
    r"""
    WITH sized AS (
      SELECT doc_id, len(string_split_regex(trim(text), '\s+')) AS n_tokens
      FROM documents
    ), ranked AS (
      SELECT doc_id, n_tokens,
             row_number() OVER (ORDER BY n_tokens DESC, doc_id ASC) AS rnk
      FROM sized
    )
    SELECT CAST((rnk - 1) % 8 AS INT) AS shard,
           CAST(COUNT(*) AS BIGINT) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(MAX(n_tokens) AS BIGINT) AS max_tokens,
           md5(string_agg(CAST(doc_id AS VARCHAR), ',' ORDER BY doc_id)) AS docs_md5
    FROM ranked GROUP BY (rnk - 1) % 8
    """,
    "sampling",
    "layout",
)
def shard_assign_balanced(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Size-balanced output sharding: rank by (token count desc, doc_id)
    and deal round-robin into 8 shards — the write-side step that keeps
    training-data shards (and therefore data-loader workers) balanced.
    The Spark side proves the DISTRIBUTED global rank: range-repartition
    + in-partition sort, monotonically_increasing_id decomposed into
    (partition, offset), an O(P) offset table broadcast back, rank
    assigned MAP-ONLY — no single-partition window anywhere (the naive
    Window.orderBy funnels the corpus through one task; the oracle's
    row_number states the same total order declaratively).  Output is
    O(n_shards) summary rows with an exact membership fingerprint.  See
    operators/sampling.global_row_number / assign_shards."""
    from comlake_core_spark.operators.sampling import assign_shards
    from comlake_core_spark.operators.text.core import token_count
    from comlake_core_spark.session import ensure_parallelism

    (docs,) = _t(spark, sf_dir, "documents")
    sized = ensure_parallelism(docs).select(
        "doc_id", token_count("text").alias("n_tokens")
    )
    return assign_shards(sized, n_shards=8, size_col="n_tokens", id_col="doc_id")




@workload(
    "temperature_mixture_langs",
    r"""
    WITH base AS (
      SELECT lang, doc_id,
             len(list_filter(string_split_regex(trim(text), '\s+'),
                             t -> t <> '')) AS tok
      FROM documents
    ), dom AS (
      SELECT lang, COUNT(*) AS n_docs_total,
             CAST(SUM(tok) AS BIGINT) AS domain_tokens,
             CAST(ROUND(pow(CAST(SUM(tok) AS DOUBLE), 0.3), 9) AS DECIMAL(20,9)) AS w
      FROM base GROUP BY lang
    ), tot AS (SELECT SUM(w) AS t FROM dom),
    domq0 AS (
      SELECT lang, n_docs_total, domain_tokens,
             300.0 * (CAST(w AS DOUBLE) / CAST(t AS DOUBLE)) AS raw
      FROM dom CROSS JOIN tot
    ),
    domq AS (
      SELECT lang, n_docs_total, domain_tokens,
             CAST(FLOOR(raw) AS BIGINT)
               + CASE WHEN row_number() OVER (ORDER BY raw - FLOOR(raw) DESC,
                                              lang ASC)
                        <= 300 - (SELECT SUM(CAST(FLOOR(raw) AS BIGINT)) FROM domq0)
                      THEN 1 ELSE 0 END AS quota
      FROM domq0
    ), ranked AS (
      SELECT b.lang, b.doc_id, b.tok,
             row_number() OVER (PARTITION BY b.lang
                                ORDER BY md5(CAST(b.doc_id AS VARCHAR)) ASC,
                                         b.doc_id ASC) AS rn
      FROM base b
    ), kept AS (
      SELECT r.lang, COUNT(*) AS n_kept,
             CAST(SUM(r.tok) AS BIGINT) AS kept_tokens,
             CAST(SUM(r.doc_id) AS BIGINT) AS kept_id_sum
      FROM ranked r JOIN domq d ON r.lang = d.lang
      WHERE r.rn <= d.quota
      GROUP BY r.lang
    )
    SELECT d.lang, d.n_docs_total, d.domain_tokens, d.quota,
           COALESCE(k.n_kept, 0) AS n_kept,
           COALESCE(k.kept_tokens, 0) AS kept_tokens,
           COALESCE(k.kept_id_sum, 0) AS kept_id_sum
    FROM domq d LEFT JOIN kept k ON d.lang = k.lang
    """,
    "sampling",
    "training-data",
    "mixture",
)
def temperature_mixture_langs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentiated (temperature) language sampling at α=0.3 — the
    XLM-R recipe verbatim (Conneau et al. 2020 §3.1): per-LANGUAGE token
    masses raised to 0.3 flatten the head languages hard enough that the
    tail survives a shared vocabulary and training budget; contrast with
    mixture_resample_corpus's α=0.5 over (lang, source).  tokens^0.3
    goes through libm pow, so the weight lands on the 9-decimal quantize
    grid before the exact decimal normalization (the ln discipline);
    quotas then use the same largest-remainder apportionment and
    content-hash selection, and kept_id_sum pins the exact membership.
    See operators/sampling.mixture_resample (alpha parameter)."""
    from comlake_core_spark.operators.sampling import mixture_resample
    from comlake_core_spark.operators.text.core import tokens

    (docs,) = _t(spark, sf_dir, "documents")
    n_tok = F.size(F.filter(tokens(F.col("text")), lambda t: t != ""))
    base = docs.select("lang", "doc_id", n_tok.alias("n_tokens"))
    return mixture_resample(base, ["lang"], target_docs=300, alpha=0.3)




@workload(
    "winsorize_events",
    r"""
    WITH q AS (
      SELECT event_type, CAST(round(value * 1000000, 0) AS BIGINT) AS vq FROM events
    ), r AS (
      SELECT event_type, vq,
             row_number() OVER (PARTITION BY event_type ORDER BY vq ASC) AS rn,
             COUNT(*) OVER (PARTITION BY event_type) AS n
      FROM q
    ), b AS (
      SELECT event_type, vq, n,
             MAX(CASE WHEN rn = greatest(CAST(ceil(0.05 * n) AS BIGINT), 1)
                      THEN vq END) OVER (PARTITION BY event_type) AS lo,
             MAX(CASE WHEN rn = CAST(ceil(0.95 * n) AS BIGINT)
                      THEN vq END) OVER (PARTITION BY event_type) AS hi
      FROM r
    )
    SELECT event_type,
           CAST(COUNT(*) AS BIGINT) AS n,
           ROUND(MAX(lo) / 1000000.0, 6) AS lo_value,
           ROUND(MAX(hi) / 1000000.0, 6) AS hi_value,
           CAST(SUM(CASE WHEN vq < lo THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_low,
           CAST(SUM(CASE WHEN vq > hi THEN 1 ELSE 0 END) AS BIGINT) AS n_clipped_high,
           ROUND(SUM(greatest(least(vq, hi), lo)) / COUNT(*) / 1000000.0, 6) AS winsorized_mean
    FROM b GROUP BY event_type
    """,
    "quality",
    "stats",
)
def winsorize_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-type winsorization of event values at the [5%, 95%]
    nearest-rank quantiles — clip, don't drop: the robust-preprocessing
    companion to mad_outlier_events for features feeding a model where
    every row must survive but a fat tail would dominate the loss.
    NEAREST-RANK (type-1) bounds keep the whole computation in integer
    arithmetic — interpolated quantiles at general p mix lo+frac*(hi-lo)
    in floating point where engine formula orderings can ulp-flip
    clip-boundary rows; the oracle states the identical row_number
    selection, trusting no quantile convention.  One shuffle on
    event_type serves the rank window, both bound windows, and the final
    agg.  See operators/quality.winsorize_groups."""
    from comlake_core_spark.operators.quality import winsorize_groups

    (ev,) = _t(spark, sf_dir, "events")
    return winsorize_groups(ev, "value", "event_type", p=0.05)




@workload(
    "k_anonymity_customers",
    r"""
    WITH g1 AS (
      SELECT c_mktsegment, c_nationkey, COUNT(*) AS n
      FROM customer GROUP BY c_mktsegment, c_nationkey
    ), g2 AS (
      SELECT c_mktsegment, r_regionkey, COUNT(*) AS n
      FROM customer
      JOIN nation ON c_nationkey = n_nationkey
      JOIN region ON n_regionkey = r_regionkey
      GROUP BY c_mktsegment, r_regionkey
    )
    SELECT 'segment_nation' AS level,
           CAST(COUNT(*) AS BIGINT) AS n_classes,
           CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT) AS n_below_k,
           CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT) AS rows_at_risk,
           CAST(MIN(n) AS BIGINT) AS min_class_size
    FROM g1
    UNION ALL
    SELECT 'segment_region' AS level,
           CAST(COUNT(*) AS BIGINT), CAST(SUM(CASE WHEN n < 5 THEN 1 ELSE 0 END) AS BIGINT),
           CAST(SUM(CASE WHEN n < 5 THEN n ELSE 0 END) AS BIGINT), CAST(MIN(n) AS BIGINT)
    FROM g2
    """,
    "quality",
    "pii",
)
def k_anonymity_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit (Sweeney 2002, k=5) of the customer table's
    quasi-identifiers at TWO generalization levels — (segment, nation)
    and the coarser (segment, region) — quantifying the standard remedy:
    climb the generalization hierarchy until every equivalence class
    reaches k.  This is the release gate that must accompany
    pii_pseudonymize_consistent: tokenizing direct identifiers does not
    shrink quasi-identifier classes, so rows_at_risk is unchanged by
    pseudonymization and must be audited separately.  One map-combined
    agg per level + O(classes) rollups.  See
    operators/quality.k_anonymity_audit."""
    from comlake_core_spark.operators.quality import k_anonymity_audit

    cust, nat, reg = _t(spark, sf_dir, "customer", "nation", "region")
    enriched = cust.join(
        nat.select(F.col("n_nationkey").alias("c_nationkey"), "n_regionkey"),
        "c_nationkey",
    ).join(reg.select(F.col("r_regionkey").alias("n_regionkey"), "r_regionkey"), "n_regionkey")
    return k_anonymity_audit(
        enriched,
        {
            "segment_nation": ["c_mktsegment", "c_nationkey"],
            "segment_region": ["c_mktsegment", "r_regionkey"],
        },
        k=5,
    )




@workload(
    "curriculum_order_docs",
    r"""
    WITH sized AS (
      SELECT doc_id,
             len(string_split_regex(trim(text), '\s+')) // 50 AS bucket,
             md5(CAST(doc_id AS VARCHAR)) AS h
      FROM documents
    )
    SELECT doc_id, CAST(bucket AS BIGINT) AS bucket,
           CAST(row_number() OVER (ORDER BY bucket ASC, h ASC, doc_id ASC) AS BIGINT) AS position
    FROM sized
    """,
    "sampling",
    "training-data",
)
def curriculum_order_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Length-based curriculum ordering (Shortformer, Press et al. 2021):
    token-count buckets served short→long, content-hash shuffled within a
    bucket — a reproducible training order (re-runs are byte-identical,
    so loss curves stay comparable across data refreshes).  The Spark
    side assigns the GLOBAL position with the distributed
    global_row_number (range shuffle + map-side rank — no
    single-partition window; second consumer after shard_assign_balanced)
    while the oracle states the same total order declaratively.  See
    operators/sampling.curriculum_order."""
    from comlake_core_spark.operators.sampling import curriculum_order
    from comlake_core_spark.operators.text.core import token_count
    from comlake_core_spark.session import ensure_parallelism

    (docs,) = _t(spark, sf_dir, "documents")
    sized = ensure_parallelism(docs).select(
        "doc_id", token_count("text").alias("n_tokens")
    )
    return curriculum_order(sized, bucket_width=50)




@workload(
    "quality_calibration_bins",
    r"""
    WITH tok AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS term
      FROM documents
    ), tok2 AS (
      SELECT doc_id, term FROM tok WHERE term <> ''
    ), w AS (
      SELECT doc_id,
             CAST('0x' || substr(md5('w:' || CAST(
                 CAST('0x' || substr(md5(term), 1, 8) AS BIGINT) % 256
               AS VARCHAR)), 1, 8) AS BIGINT) % 2001 - 1000 AS w
      FROM tok2
    ), lg AS (
      SELECT doc_id, CAST((SUM(w) * 1000000) // COUNT(*) AS BIGINT) AS micro
      FROM w GROUP BY doc_id
    ), gt AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ), lbl AS (
      SELECT doc_id,
             CAST(len(t) BETWEEN 50 AND 100000
                  AND ROUND(CAST(list_sum(list_transform(t, w -> len(w))) AS DOUBLE) / len(t), 6)
                        BETWEEN 3.0 AND 10.0
                  AND ROUND(CAST(len(list_filter(t, w -> regexp_matches(w, '[a-zA-Z]'))) AS DOUBLE) / len(t), 6) >= 0.8
                  AND len(list_filter(t, w -> list_contains(['the','be','to','of','and','that','have','with'], lower(w)))) >= 2
               AS INT) AS y
      FROM gt
    ), pj AS (
      SELECT ROUND(1.0 / (1.0 + exp(-(CAST(micro AS DOUBLE) / 25000000.0))), 9) AS p, y
      FROM lg JOIN lbl USING (doc_id)
    ), binned AS (
      SELECT least(CAST(floor(p * 10) AS BIGINT), 9) AS prob_bin,
             COUNT(*) AS n_docs,
             CAST(SUM(CAST(p AS DECIMAL(20,9))) AS DOUBLE) / COUNT(*) AS avg_predicted,
             CAST(SUM(y) AS DOUBLE) / COUNT(*) AS label_rate
      FROM pj GROUP BY prob_bin
    )
    SELECT prob_bin, n_docs, avg_predicted, label_rate,
           ROUND(abs(avg_predicted - label_rate), 9) AS calibration_gap
    FROM binned
    """,
    "quality",
    "calibration",
    "model",
)
def quality_calibration_bins(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reliability table (the ECE decomposition) for the hashed-feature
    quality classifier against the Gopher rule label: sigmoid of the
    integer micro-logit binned by decile vs the empirical keep rate with
    per-bin gaps — the audit that decides whether a quality score can be
    used as a SAMPLING probability (DataComp-style soft weighting) or
    only as a ranking.  One id-join of two per-doc rollups + one ≤10-key
    aggregate.  See operators/quality.calibration_bins."""
    from comlake_core_spark.operators.quality import calibration_bins, lr_quality_logit
    from comlake_core_spark.operators.text.docquality import gopher_quality
    from comlake_core_spark.session import ensure_parallelism

    (docs,) = _t(spark, sf_dir, "documents")
    docs = ensure_parallelism(docs)
    return calibration_bins(
        lr_quality_logit(docs), gopher_quality(docs), label_col="keep"
    )




@workload(
    "doremi_source_weights",
    r"""
    WITH d0 AS (
      SELECT source, COUNT(*) AS n_docs,
             SUM(CAST(round(1.0/(1.0 + length(text)/1000.0), 9) AS DECIMAL(28,9))) AS lsum
      FROM documents GROUP BY source
    ), g AS (
      SELECT SUM(lsum) AS gsum, SUM(n_docs) AS gn, COUNT(*) AS k FROM d0
    ), base AS (
      SELECT source, n_docs,
             round(CAST(lsum AS DOUBLE)/n_docs, 9) AS mean_loss,
             GREATEST(round(round(CAST(lsum AS DOUBLE)/n_docs, 9)
                            - round(CAST(g.gsum AS DOUBLE)/g.gn, 9), 9), 0.0) AS excess,
             CAST(round(1.0/g.k, 9) AS DECIMAL(20,9)) AS w, g.k AS k
      FROM d0 CROSS JOIN g
    ), u1 AS (
      SELECT *, CAST(round(CAST(w AS DOUBLE)*round(exp(2.0*excess), 9), 9) AS DECIMAL(20,9)) AS u FROM base
    ), r1 AS (
      SELECT source, n_docs, mean_loss, excess, k,
             CAST(round(CAST(1.0-0.02 AS DOUBLE)*(CAST(u AS DOUBLE)/CAST(z AS DOUBLE))
                        + CAST(0.02 AS DOUBLE)/k, 9) AS DECIMAL(20,9)) AS w
      FROM u1 CROSS JOIN (SELECT SUM(u) AS z FROM u1) zz
    ), u2 AS (
      SELECT *, CAST(round(CAST(w AS DOUBLE)*round(exp(2.0*excess), 9), 9) AS DECIMAL(20,9)) AS u FROM r1
    ), r2 AS (
      SELECT source, n_docs, mean_loss, excess, k,
             CAST(round(CAST(1.0-0.02 AS DOUBLE)*(CAST(u AS DOUBLE)/CAST(z AS DOUBLE))
                        + CAST(0.02 AS DOUBLE)/k, 9) AS DECIMAL(20,9)) AS w
      FROM u2 CROSS JOIN (SELECT SUM(u) AS z FROM u2) zz
    ), u3 AS (
      SELECT *, CAST(round(CAST(w AS DOUBLE)*round(exp(2.0*excess), 9), 9) AS DECIMAL(20,9)) AS u FROM r2
    ), r3 AS (
      SELECT source, n_docs, mean_loss, excess, k,
             CAST(round(CAST(1.0-0.02 AS DOUBLE)*(CAST(u AS DOUBLE)/CAST(z AS DOUBLE))
                        + CAST(0.02 AS DOUBLE)/k, 9) AS DECIMAL(20,9)) AS w
      FROM u3 CROSS JOIN (SELECT SUM(u) AS z FROM u3) zz
    )
    SELECT source, n_docs, mean_loss, excess,
           CAST(w*1000000000 AS BIGINT) AS weight_q9, CAST(w AS DOUBLE) AS weight
    FROM r3
    """,
    "sampling",
    "training-data",
    "doremi",
)
def doremi_source_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain reweighting (arXiv:2305.10429 Alg. 1 core)
    under the oracle gate: per-source weights from a deterministic
    per-doc loss proxy (longer docs score "easier"), 3 rounds of
    exponentiated-gradient ascent with per-round uniform smoothing.  The
    oracle UNROLLS all three rounds in SQL — every round's Z total,
    update, and renormalization replayed on the 9-decimal grid — so the
    genuinely iterative schedule is value-hash-verified end to end.
    Scale: ONE map-combined corpus aggregate, then O(domains) arithmetic
    per round with 1-row broadcast totals and checkpoint cuts (the
    17-scans replay bug is plan-pinned in test_r7_pipeline_ops).  See
    operators/sampling.doremi_domain_weights."""
    from comlake_core_spark.operators.sampling import doremi_domain_weights

    (docs,) = _t(spark, sf_dir, "documents")
    loss = F.lit(1.0) / (F.lit(1.0) + F.length("text") / F.lit(1000.0))
    return doremi_domain_weights(
        docs, ["source"], loss, rounds=3, eta=2.0, smoothing=0.02
    )


# ---------------------------------------------------------------------------
# Absolute-token-budget corpus assembly (operators/budget_fill.py) —
# registered r12 after the r11 staging round (oracle proven bit-exact in
# tests/test_r12_staged.py before registration; the r7/r11 staging
# pattern — the test pins this SQL identical to its staged copy).
# ---------------------------------------------------------------------------

_BUDGET_FILL_TOKENS = 12000
_BUDGET_FILL_CAP_FRAC = 0.25


@workload(
    "token_budget_fill",
    f"""
WITH base AS (
  SELECT source, doc_id,
         CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                              x -> x <> '')) AS BIGINT) AS tok,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), src AS (
  SELECT *, SUM(tok) OVER (PARTITION BY source ORDER BY h ASC, doc_id ASC
                           ROWS UNBOUNDED PRECEDING) AS cs
  FROM base
), kept AS (SELECT * FROM src WHERE cs <= {int(_BUDGET_FILL_CAP_FRAC * _BUDGET_FILL_TOKENS)}),
g AS (
  SELECT *, SUM(tok) OVER (ORDER BY h ASC, doc_id ASC
                           ROWS UNBOUNDED PRECEDING) AS cg
  FROM kept
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(tok) AS BIGINT) AS n_tokens
FROM g WHERE cg <= {_BUDGET_FILL_TOKENS} GROUP BY source
""",
    "sampling",
    "training-data",
    "budget",
)
def token_budget_fill_wl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic greedy prefix fill of an absolute token budget with
    per-source caps — the mixture-table contract behind published
    per-source budgets (the Pile / LLaMA / Dolma style).  Priority is
    md5(doc_id) (portable, recomputable in SQL); the per-source cap and
    the global budget are both strict-prefix window rules over integer
    token counts, so the result is exact at any scale.  The global pass
    rides operators/sampling.global_running_sum (range shuffle + O(P)
    offsets + map-only cumsum), NOT a single-partition window.  See
    operators/budget_fill.token_budget_fill."""
    from comlake_core_spark.operators.budget_fill import token_budget_fill

    (docs,) = _t(spark, sf_dir, "documents")
    return token_budget_fill(docs, _BUDGET_FILL_TOKENS, _BUDGET_FILL_CAP_FRAC)
