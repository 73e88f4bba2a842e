"""Semantic (embedding-space) decontamination: flag training vectors
whose nearest EVAL-set neighbor is suspiciously close in cosine space —
the contamination tier n-gram matching misses (paraphrases, translations,
formatting-shifted copies).  The n-gram tiers of this engine
(train_test_ngram_leakage, decontaminate_bloom) catch verbatim overlap;
this is the embedding-similarity tier the Llama/GPT decontamination
reports and SemDeDup-style audits run alongside them.

Reference scope note: comlake.core has no similarity operators (its
surface is catalog + content store + qast filters); SURVEY.md §2.4
extension over the deterministic cosine fold of
operators/similarity/core.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from comlake_core_spark.operators.similarity.core import cosine
from comlake_core_spark.session import ensure_parallelism


def semantic_decontaminate(
    df: DataFrame,
    eval_pred,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """For every TRAIN vector (rows where ``eval_pred`` is false), the
    closest EVAL vector (rows where it is true) by cosine, and the
    contamination flag ``max_eval_cosine >= threshold``.  Returns
    (id_col, best_eval_id, max_eval_cosine, contaminated), one row per
    train vector; ties on cosine resolve to the smallest eval id, so the
    result is deterministic and a SQL oracle replays it exactly (the
    cosine is the sequential left-fold of similarity/core — identical
    accumulation order in both engines, hence bitwise-equal doubles).

    Scale shape: eval benchmarks are small BY CONSTRUCTION (thousands of
    rows, not corpus-scale) — that contract is what makes the eval side
    a broadcast: the corpus streams once through a broadcast
    nested-loop join + codegen cosine, then ONE map-combined max-struct
    aggregate per train vector.  No shuffle touches corpus-sized data
    except the final aggregate on the train id, and no per-source state
    exists.  If an eval set ever outgrows a broadcast, bucket both
    sides with the IVF assignment (similarity/ivf.py) and probe only
    matching buckets — same contract as ann_ivf_topk's scale path."""
    ev = df.filter(eval_pred(df)).select(
        F.col(id_col).alias("_eval_id"),
        F.col(vec_col).cast("array<double>").alias("_ev"),
    )
    train = ensure_parallelism(df.filter(~eval_pred(df))).select(
        F.col(id_col),
        F.col(vec_col).cast("array<double>").alias("_tv"),
    )
    scored = train.crossJoin(F.broadcast(ev)).select(
        id_col,
        "_eval_id",
        cosine(F.col("_tv"), F.col("_ev")).alias("_cos"),
    )
    # argmax with deterministic ties: max over (cosine, -eval_id) structs
    # picks the highest cosine, then the SMALLEST eval id among equals
    best = scored.groupBy(id_col).agg(
        F.max(F.struct(F.col("_cos"), (-F.col("_eval_id")).alias("_neg"))).alias("_b")
    )
    return best.select(
        id_col,
        (-F.col("_b._neg")).cast("long").alias("best_eval_id"),
        F.col("_b._cos").alias("max_eval_cosine"),
        (F.col("_b._cos") >= F.lit(float(threshold))).alias("contaminated"),
    )
