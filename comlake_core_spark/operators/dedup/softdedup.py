"""Soft deduplication: reweight duplicates instead of dropping them
(SoftDeDup — He et al. 2024, "Softdedup: an efficient data reweighting
method for speeding up language model pretraining"; the same idea backs
the duplicate-aware sampling in Muennighoff et al. 2023's data-constrained
scaling laws).  Hard dedup throws away tokens a data-constrained run may
want; soft dedup keeps every copy but scales its sampling weight by the
inverse of its duplication, so the EXPECTED number of times the model
sees each distinct text is one.

Reference scope note: comlake.core has no dedup operators (its surface is
catalog + content store + qast filters); SURVEY.md §2.4 extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from comlake_core_spark.operators.text.core import tokens
from comlake_core_spark.session import ensure_parallelism


def soft_dedup_weights(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document sampling weight 1/s where s is the size of the
    document's EXACT-duplicate cluster (md5 of the whitespace-normalized,
    lowercased text — the same canonical key as ``dedup_exact``).
    Returns (id_col, cluster_size, weight, n_tokens, eff_tokens):
    `weight` is one double division of exact integers, `eff_tokens` =
    n_tokens · weight is the document's expected token contribution
    under weighted sampling — summed over a cluster it recovers exactly
    the cluster's distinct token mass, which is the invariant a
    token-budget planner reads.

    Scale shape: one map-side fingerprint, ONE map-combined aggregate to
    the (fingerprint, size) table, and an equi-join back on the
    fingerprint — the same two-exchange class as exact dedup, with
    nothing corpus-sized shuffling twice.  At 100 TB the fingerprint
    table is the bounded artifact (distinct texts), and the join is
    skew-safe because a hot fingerprint's postings join against a
    single size row, never against each other.
    """
    fp = F.md5(F.concat_ws(" ", tokens(F.lower(F.col(text_col)))))
    base = ensure_parallelism(df).select(
        F.col(id_col),
        F.size(F.filter(tokens(F.col(text_col)), lambda t: t != "")).cast("long").alias(
            "n_tokens"
        ),
        fp.alias("_fp"),
    )
    sizes = base.groupBy("_fp").agg(F.count(F.lit(1)).alias("cluster_size"))
    return (
        base.join(sizes, "_fp")
        .select(
            id_col,
            F.col("cluster_size").cast("long").alias("cluster_size"),
            (F.lit(1.0) / F.col("cluster_size").cast("double")).alias("weight"),
            "n_tokens",
            (
                F.col("n_tokens").cast("double")
                / F.col("cluster_size").cast("double")
            ).alias("eff_tokens"),
        )
    )
