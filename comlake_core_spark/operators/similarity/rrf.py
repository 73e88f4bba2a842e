"""Hybrid lexical+vector retrieval fused by Reciprocal Rank Fusion.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comlake_core_spark.operators.similarity.core import brute_force_topk


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
    bm25_quantize: int | None = None,
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
    from comlake_core_spark.operators.text.retrieval import bm25_search

    spark = docs.sparkSession
    # bm25_quantize=d makes the lexical scores (and so the ranks the fusion
    # consumes) independent of float summation order — see bm25_search
    lex = bm25_search(
        docs,
        query_terms,
        text_col=text_col,
        id_col=doc_id_col,
        top_n=per_leg,
        quantize=bm25_quantize,
    )
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

