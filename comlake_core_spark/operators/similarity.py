"""Similarity search over embedding columns (array<float>).

Two paths:
- brute_force_topk — exact cosine top-k of every query against the corpus.
  The query side is broadcast; the corpus is scanned once; per-group top-k
  goes through row_number ≤ k which Spark ≥3.5 rewrites to WindowGroupLimit
  (per-partition heap before the shuffle). Exact and scan-bound: the right
  baseline, and viable at 100 TB when the query set is small.
- ivf_topk — IVF-style approximate search: corpus vectors are assigned to
  the nearest of C seeded centroids (one pass), queries probe the closest
  n_probe centroids, and only those buckets are scored. Cuts the scored
  fraction to ~n_probe/C at the cost of recall.

All dot products are JVM higher-order functions (zip_with + aggregate) over
array<double> — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comlake_core_spark.session import ensure_parallelism


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — deterministic accumulation order,
    so the value is bitwise-reproducible (and matches an oracle that
    accumulates in array order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. queries: (query_id, embedding).

    Plan shape: broadcast nested-loop join (queries are small) → per-row
    cosine (codegen) → WindowGroupLimit top-k per query_id. The corpus is
    read exactly once regardless of |queries|."""
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "nbr_id",
        cosine(F.col("_qv"), F.col("_cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "nbr_id", "cosine", "rn")
    )


def seeded_centroids(corpus: DataFrame, n_centroids: int, vec_col: str, id_col: str) -> DataFrame:
    """Deterministic centroid pick: the n_centroids corpus vectors with the
    smallest xxhash64(id) — a seeded pseudo-random sample, no kmeans state.
    One extra pass; at 100 TB use a persisted codebook instead."""
    w = Window.orderBy(F.xxhash64(F.col(id_col)), F.col(id_col))
    return (
        corpus.select(F.col(id_col), F.col(vec_col).cast("array<double>").alias("_cv"))
        .withColumn("_r", F.row_number().over(w))
        .filter(F.col("_r") <= n_centroids)
        .select(F.col("_r").alias("centroid_id"), F.col("_cv").alias("centroid_vec"))
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k: score only corpus vectors whose nearest centroid is
    among the query's n_probe closest centroids."""
    cents = F.broadcast(seeded_centroids(corpus, n_centroids, vec_col, id_col))

    def assign(df: DataFrame, key: str, vcol: str, out: str, keep: int) -> DataFrame:
        # partition the top-k window by the row KEY only — windowing over
        # the vector column would shuffle and compare the arrays themselves
        scored = df.crossJoin(cents).withColumn("_sim", cosine(F.col(vcol), F.col("centroid_vec")))
        w = Window.partitionBy(key).orderBy(F.desc("_sim"), F.asc("centroid_id"))
        return (
            scored.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") <= keep)
            .select(*df.columns, F.col("centroid_id").alias(out))
        )

    c = corpus.select(F.col(id_col).alias("nbr_id"), F.col(vec_col).cast("array<double>").alias("_cv"))
    q = queries.select(F.col(query_id_col).alias("query_id"), F.col(vec_col).cast("array<double>").alias("_qv"))
    c_assigned = assign(c, "nbr_id", "_cv", "bucket", 1)
    q_assigned = assign(q, "query_id", "_qv", "bucket", n_probe)

    scored = c_assigned.join(F.broadcast(q_assigned), "bucket").select(
        "query_id", "nbr_id", cosine(F.col("_qv"), F.col("_cv")).alias("cosine")
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "nbr_id", "cosine", "rn")
    )
