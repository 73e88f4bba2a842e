"""Embedding-distribution drift between corpus snapshots: per-label
centroid cosine, exact-decimal so a SQL oracle hash-matches.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def centroid_drift(
    df: DataFrame,
    split: Column,
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int = 64,
    quantize: int = 9,
) -> DataFrame:
    """Embedding-distribution drift between two corpus snapshots: per
    label, the cosine between the split-0 and split-1 centroids (plus
    both counts).  The monitor a training pipeline runs on every refresh
    — a label whose centroid swings (cosine well below 1) means the new
    crawl changed what that class LOOKS like, so downstream thresholds
    (dedup radii, quality cutoffs, retrieval calibrations) need
    re-validation before the refresh ships.

    Determinism (the oracle requirement): per-dimension component sums
    are exact decimals on the ``quantize`` grid, centroids divide once
    in float64, and the three dot products fold rounded products through
    exact decimal addition — no float reassociation anywhere, so the
    cosine hash-matches a SQL oracle.

    Scale shape: ONE map-combined aggregate with 64 decimal-sum columns
    (no explode — shuffle volume is #labels × #splits rows of 64 sums),
    then a #labels-row self-join.  At 100 TB the whole reduction is the
    cost of one scan."""

    def comp(i: int) -> Column:
        return F.round(F.element_at(F.col(vec_col), i + 1).cast("double"), quantize)

    g = df.groupBy(F.col(label_col).alias("label"), split.alias("_par")).agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(comp(i).cast(f"decimal(20,{quantize})")).alias(f"_s{i}")
            for i in range(dim)
        ],
    )

    def side(par: int, tag: str) -> DataFrame:
        c = [
            (F.col(f"_s{i}").cast("double") / F.col("_n")).alias(f"_{tag}{i}")
            for i in range(dim)
        ]
        return g.filter(F.col("_par") == par).select(
            "label", F.col("_n").alias(f"n_{tag}"), *c
        )

    joined = side(0, "a").join(side(1, "b"), "label")

    # Dot products fold through F.sum over exploded per-dimension terms:
    # a CHAINED decimal `+` hits Spark's 38-digit precision cap after a
    # few dozen adds and silently sheds scale (allowPrecisionLoss), while
    # an aggregate sum widens precision without touching scale — the only
    # exact way to add 64 decimals in one expression tree.
    def term(i: int) -> Column:
        def p(x: str, y: str) -> Column:
            return F.round(F.col(f"_{x}{i}") * F.col(f"_{y}{i}"), quantize).cast(
                f"decimal(20,{quantize})"
            )

        return F.struct(p("a", "b").alias("ab"), p("a", "a").alias("aa"), p("b", "b").alias("bb"))

    prods = joined.select(
        "label", "n_a", "n_b", F.explode(F.array(*[term(i) for i in range(dim)])).alias("_p")
    )
    dots = prods.groupBy("label").agg(
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
        F.sum("_p.ab").cast("double").alias("_ab"),
        F.sum("_p.aa").cast("double").alias("_aa"),
        F.sum("_p.bb").cast("double").alias("_bb"),
    )
    return dots.select(
        "label",
        "n_a",
        "n_b",
        F.round(
            F.col("_ab") / (F.sqrt("_aa") * F.sqrt("_bb")), quantize
        ).alias("drift_cosine"),
    )

