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


def hybrid_search_rrf(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: tuple[str, ...],
    query_vec: list[float],
    k: int = 10,
    per_leg: int = 20,
    k_rrf: int = 60,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
) -> DataFrame:
    """Hybrid retrieval: BM25 (lexical) and cosine top-k (vector) legs
    fused by Reciprocal Rank Fusion — score(d) = Σ_legs 1/(k_rrf + rank_d)
    — the standard way to combine keyword and embedding search without
    score calibration (ranks, not raw scores, are what fuse).

    Scale shape: each leg is its own already-scale-shaped operator
    (bm25_search: one explode pass + broadcast stats; brute_force_topk:
    scan-once corpus + WindowGroupLimit — swap in ivf_topk for the ANN
    path at corpus scale); the fusion itself touches only 2×per_leg rows
    (a full outer join of two tiny ranked lists), so its cost is nil. A
    doc missing from one leg simply contributes that leg's zero — the
    COALESCE keeps the sum well-defined.

    Deterministic: both legs tie-break on doc id, and the final order
    tie-breaks (rrf desc, doc id)."""
    from comlake_core_spark.operators.text import bm25_search

    spark = docs.sparkSession
    lex = bm25_search(docs, query_terms, text_col=text_col, id_col=doc_id_col, top_n=per_leg)
    w_lex = Window.orderBy(F.col("score").desc(), F.col(doc_id_col))
    lex_ranked = lex.select(
        F.col(doc_id_col).alias("id"), F.row_number().over(w_lex).alias("_r_lex")
    )

    q = spark.createDataFrame([(0, [float(x) for x in query_vec])], "query_id long, embedding array<double>")
    sem = brute_force_topk(
        embeddings, q, k=per_leg, vec_col=vec_col, id_col=vec_id_col
    ).select(F.col("nbr_id").alias("id"), F.col("rn").alias("_r_sem"))

    rrf = (
        lex_ranked.join(sem, "id", "full_outer")
        .select(
            "id",
            (
                F.coalesce(1.0 / (F.lit(k_rrf) + F.col("_r_lex")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(k_rrf) + F.col("_r_sem")), F.lit(0.0))
            ).alias("rrf"),
            F.col("_r_lex").alias("rank_lexical"),
            F.col("_r_sem").alias("rank_vector"),
        )
        .orderBy(F.col("rrf").desc(), "id")
        .limit(k)
    )
    return rrf


def kmeans_refine(
    corpus: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Spherical k-means refinement of the IVF codebook: Lloyd iterations
    with cosine assignment and normalized-mean updates, starting from the
    deterministic seeded centroids. Returns (centroid_id, centroid_vec)
    ready to plug into ivf_topk's bucket assignment.

    This is the canonical ITERATIVE algorithm shape on Spark, and every
    piece is sized for 100 TB:
    - assignment + partial sums run in ONE mapInPandas pass per iteration:
      each Arrow batch computes argmax(X̂ · Ĉᵀ) against the broadcast
      (k × d) codebook and folds into per-partition (k × d) partial sums —
      the pass emits O(k) rows PER PARTITION, never per vector;
    - the driver reduces O(k × partitions) partials in numpy (a few MB)
      and renormalizes — the only driver-side state is the codebook
      itself, which any k-means must hold somewhere;
    - no DataFrame lineage growth across iterations (each pass reads the
      cached corpus; the loop carries only the numpy codebook).

    Deterministic: seeded init, argmax ties break to the lowest centroid
    id, accumulation order fixed per partition; empty clusters keep their
    previous centroid. The spherical objective (mean cosine to assigned
    centroid) is non-decreasing — pinned in tests/test_kmeans.py."""
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    seed_rows = seeded_centroids(corpus, n_centroids, vec_col, id_col).collect()
    C = np.array([r["centroid_vec"] for r in seed_rows], dtype=np.float64)
    k, d = C.shape
    vecs = corpus.select(F.col(vec_col).cast("array<double>").alias("v"))

    for _ in range(iters):
        bc = spark.sparkContext.broadcast(C)

        def partials(batches, _bc=bc, _k=k, _d=d):
            Cl = _bc.value
            Cn = Cl / np.clip(np.linalg.norm(Cl, axis=1, keepdims=True), 1e-12, None)
            sums = np.zeros((_k, _d))
            counts = np.zeros(_k, dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.vstack(pdf["v"].to_numpy())
                Xn = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True), 1e-12, None)
                a = np.argmax(Xn @ Cn.T, axis=1)
                # accumulate NORMALIZED vectors: the update is then the exact
                # spherical-k-means maximizer, making the mean-cosine
                # objective provably non-decreasing per iteration
                np.add.at(sums, a, Xn)
                np.add.at(counts, a, 1)
            hit = np.nonzero(counts)[0]
            yield pd.DataFrame(
                {"c": hit, "n": counts[hit], "s": [sums[i].tolist() for i in hit]}
            )

        parts = vecs.mapInPandas(partials, "c long, n long, s array<double>").collect()
        sums = np.zeros((k, d))
        counts = np.zeros(k, dtype=np.int64)
        for r in parts:
            sums[r["c"]] += np.asarray(r["s"])
            counts[r["c"]] += r["n"]
        means = np.where(counts[:, None] > 0, sums / np.maximum(counts, 1)[:, None], C)
        C = means / np.clip(np.linalg.norm(means, axis=1, keepdims=True), 1e-12, None)

    return spark.createDataFrame(
        [(i + 1, C[i].tolist()) for i in range(k)],
        "centroid_id long, centroid_vec array<double>",
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
    refine_iters: int = 0,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors whose nearest centroid is
    among the query's n_probe closest centroids. refine_iters > 0 runs that
    many spherical k-means Lloyd passes over the corpus first (kmeans_refine)
    — better-centered buckets, same query plan."""
    if refine_iters > 0:
        cents = F.broadcast(kmeans_refine(corpus, n_centroids, refine_iters, vec_col, id_col))
    else:
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
