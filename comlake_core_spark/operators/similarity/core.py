"""Core similarity primitives: deterministic fold dot/norm/cosine, exact
brute-force cosine top-k (broadcast queries + WindowGroupLimit), and the
deterministic seeded centroid pick shared by the IVF/PQ/kmeans family.
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


def seeded_centroids(
    corpus: DataFrame,
    n_centroids: int,
    vec_col: str,
    id_col: str,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Deterministic centroid pick: the n_centroids corpus vectors with the
    smallest hash(id) — a seeded pseudo-random sample, no kmeans state.
    One extra pass; at 100 TB use a persisted codebook instead.
    hasher='md5' orders by the md5 hex string instead — slower, but the
    ordering has an exact DuckDB twin, which makes the downstream IVF
    result SQL-oracle-checkable."""
    if hasher == "xxhash64":
        sort_key = F.xxhash64(F.col(id_col))
    elif hasher == "md5":
        sort_key = F.md5(F.col(id_col).cast("string"))
    else:
        raise ValueError(f"unknown hasher {hasher!r}")
    # orderBy+limit plans TakeOrderedAndProject (map-side top-n per
    # partition, driver merge) — NOT a global sort; the row_number window
    # then runs over only the n_centroids survivors, so the single-partition
    # exchange it needs moves n_centroids rows, never the corpus.
    top = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_cv")
    ).orderBy(sort_key, F.col(id_col)).limit(n_centroids)
    w = Window.orderBy(sort_key, F.col(id_col))
    return (
        top.withColumn("_r", F.row_number().over(w))
        .select(F.col("_r").alias("centroid_id"), F.col("_cv").alias("centroid_vec"))
    )

