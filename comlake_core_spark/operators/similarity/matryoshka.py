"""Truncated-dimension (Matryoshka, Kusupati et al. 2022) retrieval with
a built-in full-dimension recall audit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comlake_core_spark.operators.similarity.core import dot, norm
from comlake_core_spark.session import ensure_parallelism


def matryoshka_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dims: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Top-k retrieval over the FIRST `dims` dimensions of the embedding
    (Matryoshka Representation Learning, Kusupati et al. 2022): MRL-style
    models pack coarse meaning into the leading coordinates, so a
    truncated prefix retrieves at a fraction of the scan bandwidth —
    dims/D of the bytes per vector, the other knob besides PQ for
    shrinking a 100 TB ANN scan.  Each truncated hit is annotated with
    whether it also appears in the FULL-dimension exact top-k, so
    aggregating `in_full_topk` per query IS the recall measurement that
    decides how small `dims` may go (the same audit discipline as
    ann_recall_at_k).

    Cosine over the slice normalizes by the truncated norms — equivalent
    to renormalizing the truncated vectors.  A zero-norm side (a vector
    whose leading `dims` coordinates are all zero — collapsed encoder
    output, leading-padded embeddings) scores the sentinel -2.0 instead
    of the NaN an unguarded division produces: Spark orders NaN LARGEST,
    so one degenerate row would otherwise seize rank 1 in every query's
    truncated top-k; -2.0 sits below any real cosine, ranking degenerate
    rows deterministically last.  Returns (query_id, nbr_id,
    trunc_cosine, rn, in_full_topk).

    Plan: ONE corpus scan serves both rankings (truncated and full
    cosine are computed side by side on the same broadcast
    nested-loop-join row); both top-k's ride WindowGroupLimit on the
    same query_id partitioning, and the final flag is a self-equi-join
    of two k·|Q|-row lists."""
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    def guarded(a: Column, b: Column) -> Column:
        # bind the denominator ONCE via the expression-level let
        # (transform(array(x), f)[0] — winnow_fingerprints' trick):
        # Catalyst does no CSE across when-branches, so inlining would
        # re-run both norm folds for the condition and the division
        return F.transform(
            F.array(norm(a) * norm(b)),
            lambda den: F.when(den != 0, dot(a, b) / den).otherwise(F.lit(-2.0)),
        )[0]

    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "nbr_id",
        guarded(F.slice("_qv", 1, dims), F.slice("_cv", 1, dims)).alias("trunc_cosine"),
        guarded(F.col("_qv"), F.col("_cv")).alias("_full_cosine"),
    )
    wt = Window.partitionBy("query_id").orderBy(F.desc("trunc_cosine"), F.asc("nbr_id"))
    wf = Window.partitionBy("query_id").orderBy(F.desc("_full_cosine"), F.asc("nbr_id"))
    trunc = (
        scored.withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") <= k)
        .select("query_id", "nbr_id", "trunc_cosine", "rn")
    )
    full = (
        scored.withColumn("_rf", F.row_number().over(wf))
        .filter(F.col("_rf") <= k)
        .select("query_id", "nbr_id", F.lit(True).alias("_hit"))
    )
    return trunc.join(full, ["query_id", "nbr_id"], "left").select(
        "query_id",
        "nbr_id",
        "trunc_cosine",
        "rn",
        F.coalesce(F.col("_hit"), F.lit(False)).alias("in_full_topk"),
    )

