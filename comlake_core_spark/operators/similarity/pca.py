"""Distributed PCA by integer power iteration over the exact Gram matrix
— bit-identical across engines (the pagerank discipline applied to
linear algebra).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from comlake_core_spark.session import materialize


def pca_power_iteration(
    emb: DataFrame,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quant: int = 10_000,
    gram_shrink: int = 10_000_000_000,
) -> DataFrame:
    """Distributed PCA: dominant principal component of the (centered)
    embedding matrix by power iteration over the Gram matrix — the
    first step of the PCA-whitening / dimensionality-reduction pass an
    embedding pipeline runs before indexing, and the textbook
    "linear algebra as two aggregates" Spark computation. Returns one
    row per dimension: (dim 1-based, v_q fixed-point ×1e6, loading).

    Exactness — the pagerank discipline applied to linear algebra:
    embeddings are quantized to integers (×`quant`), centering is exact
    (c = n·q − Σq, all integers — no float mean), the d×d Gram matrix
    is exact integer sums in DECIMAL(38,0), and each power-iteration
    round renormalizes with integer division only (v' = s ÷ (max|s| ÷
    1e6 + 1), truncation toward zero — identical in Spark `div` and
    DuckDB `//`, pinned by test). Float PCA cannot be oracle-checked
    (summation order); this one is bit-identical in both engines. The
    Gram entries are pre-shrunk by `gram_shrink` so every subsequent
    matrix-vector product stays inside BIGINT.

    Plan: the Gram matrix is ONE self-equi-join on the row id over the
    (id, dim, value) triplet frame (shuffle ∝ n·d, output n·d² rows
    map-combined down to d² — at 100 TB distribute the d² partial sums,
    never the matrix rows twice); the d²-row matrix and d-row vector
    then iterate entirely in broadcast-sized frames — each round is a
    broadcast join + one tiny aggregate. d is assumed broadcast-small
    (embedding dims, ≤ a few thousand)."""
    n_row = emb.groupBy().agg(F.count(F.lit(1)).alias("_n"))
    vq = emb.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("_p", "_x"),
    ).select(
        "_id",
        (F.col("_p") + 1).cast("long").alias("_i"),
        F.round(F.col("_x") * quant, 0).cast("long").alias("_q"),
    )
    sums = vq.groupBy("_i").agg(F.sum("_q").alias("_s"))
    c = (
        vq.join(F.broadcast(sums), "_i")
        .crossJoin(F.broadcast(n_row))
        .select("_id", "_i", (F.col("_n") * F.col("_q") - F.col("_s")).alias("_c"))
    )
    a = c.select(F.col("_id"), F.col("_i"), F.col("_c").alias("_ca"))
    b = c.select(F.col("_id"), F.col("_i").alias("_j"), F.col("_c").alias("_cb"))
    gram = (
        a.join(b, "_id")
        .groupBy("_i", "_j")
        .agg(
            F.sum(F.col("_ca").cast("decimal(38,0)") * F.col("_cb")).alias("_g38")
        )
        .select(
            "_i",
            "_j",
            F.expr(f"CAST(_g38 div {gram_shrink} AS BIGINT)").alias("_g"),
        )
        .transform(materialize)
    )
    dims = gram.select(F.col("_i").alias("_j")).distinct()
    v = dims.select("_j", F.lit(1_000_000).cast("long").alias("_v"))
    for _ in range(iterations):
        s = (
            gram.join(F.broadcast(v), "_j")
            .groupBy("_i")
            .agg(F.sum(F.col("_g") * F.col("_v")).alias("_sv"))
        )
        m = s.groupBy().agg(F.max(F.abs(F.col("_sv"))).alias("_m"))
        v = (
            s.crossJoin(F.broadcast(m))
            .select(
                F.col("_i").alias("_j"),
                F.expr("CAST(_sv div ((_m div 1000000) + 1) AS BIGINT)").alias("_v"),
            )
        )
    return v.select(
        F.col("_j").alias("dim"),
        F.col("_v").alias("v_q"),
        F.round(F.col("_v") / F.lit(1e6), 6).alias("loading"),
    )

