"""Mergeable frequent-items (heavy-hitters) summary — Misra-Gries.

The reference has no aggregation surface at all (SURVEY.md §2.4: the qast
registries at ``src/comlake/core/qast.clj:31-50,90-118`` contain no GROUP
BY-like construct); a 100 TB training-data pipeline needs "what are the
dominant domains / licenses / languages / tokens" answered WITHOUT a full
shuffle of the raw column. Misra-Gries is the classic deterministic
summary: ``k`` counters guarantee, for every item, an estimate with

    true_count - n/(k+1)  <=  estimate  <=  true_count

so every item with frequency > n/(k+1) is present in the summary. Agarwal
et al., *Mergeable Summaries* (PODS 2012), prove the summary is fully
mergeable: merging two MG(k) summaries by adding counters and subtracting
the (k+1)-th largest keeps the SAME n/(k+1) bound for the combined stream,
for arbitrary merge trees — which is exactly Spark's partial-aggregation
shape.

Spark-first plan (three stages, one tiny shuffle):
1. map side — ``mapInPandas`` folds each input partition into one MG(k)
   dict (per-batch exact ``value_counts`` merged with prune, the PODS'12
   merge), emitting <= k rows ``(item, weight)`` per partition. The raw
   column never leaves the executor.
2. shuffle — ``groupBy(item).sum(weight)`` over the <= k x P partial rows
   (the "merge without prune" step; bounds add per item).
3. final prune — subtract the (k+1)-th largest merged weight (computed by
   a ``TakeOrdered`` over the tiny merged set, broadcast back), drop
   non-positive: <= k survivors with the global n/(k+1) guarantee.

Shuffle volume is O(k x P), independent of |rows|; driver holds nothing.
With k >= |distinct(col)| no decrement ever fires and the summary IS the
exact group-count — the oracle-gated workload pins that regime against
DuckDB, while the approximate regime's guarantee is pytest-pinned on
skewed data (tests/test_sketches.py).
"""

from __future__ import annotations

from typing import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType, StructField, StructType


def _merge_prune(acc: dict, batch: dict, k: int) -> dict:
    """PODS'12 mergeable-summaries merge: add counters, then if more than k
    survive subtract the (k+1)-th largest weight from all and drop the
    non-positive. Both inputs are valid MG summaries (an exact count dict
    is an MG summary with zero error); the result is a valid MG(k) summary
    whose per-item undercount is bounded by (combined n)/(k+1)."""
    for item, w in batch.items():
        acc[item] = acc.get(item, 0) + int(w)
    if len(acc) > k:
        off = sorted(acc.values(), reverse=True)[k]
        acc = {item: w - off for item, w in acc.items() if w > off}
    return acc


def misra_gries(df: DataFrame, col: str, k: int) -> DataFrame:
    """Distributed Misra-Gries: returns <= k rows ``(col, est_count)`` with
    est_count in [true - n/(k+1), true] for every value of ``col`` (nulls
    excluded). See module docstring for the three-stage plan."""
    item_field = df.schema[col]
    out_schema = StructType(
        [
            StructField(col, item_field.dataType, True),
            StructField("w", LongType(), False),
        ]
    )

    def summarize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        acc: dict = {}
        for pdf in batches:
            counts = pdf[col].dropna().value_counts()
            acc = _merge_prune(acc, counts.to_dict(), k)
        yield pd.DataFrame({col: list(acc.keys()), "w": list(acc.values())})

    partials = df.select(col).mapInPandas(summarize, schema=out_schema)
    merged = partials.groupBy(col).agg(F.sum("w").alias("w"))
    # (k+1)-th largest merged weight, 0 when <= k items survive the merge.
    # TakeOrderedAndProject over the <= k*P-row merged set; 1-row broadcast.
    off = (
        merged.orderBy(F.desc("w"), col)
        .limit(k + 1)
        .agg(
            F.when(F.count(F.lit(1)) > k, F.min("w"))
            .otherwise(F.lit(0))
            .alias("off")
        )
    )
    return (
        merged.join(F.broadcast(off))
        .select(col, (F.col("w") - F.col("off")).alias("est_count"))
        .where(F.col("est_count") > 0)
    )


def kmv_sketch(df: DataFrame, key_col: str, k: int = 256) -> DataFrame:
    """Bottom-k (KMV) distinct-value sketch: the k smallest md5 hashes of
    the column's DISTINCT values, as 32-hex strings (lexicographic order
    ≡ numeric order, split_assignment_portable's argument — so the sketch
    is recomputable bit-for-bit by any engine with md5, unlike HLL whose
    register layout is implementation-private).

    Plans as distinct + TakeOrderedAndProject: each task keeps its local
    bottom-k and the driver merges O(k · P) — the mergeability that makes
    KMV a per-partition/per-shard summary at 100 TB (union two sketches =
    bottom-k of their union).  Beyer et al., ICDE 2007."""
    return (
        df.select(F.col(key_col).cast("string").alias("_k"))
        .distinct()
        .select(F.md5("_k").alias("_h"))
        .orderBy("_h")
        .limit(k)
    )


def _hex_frac(col: Column) -> Column:
    """First 12 hex chars of a 32-hex md5 as a fraction of 16^12 — the
    uniform (0,1) position the KMV estimator divides by."""
    return F.conv(F.substring(col, 1, 12), 16, 10).cast("double") / F.lit(
        float(16**12)
    )


def kmv_join_cardinality(
    left: DataFrame,
    left_key: str,
    right: DataFrame,
    right_key: str,
    k: int = 256,
) -> DataFrame:
    """Sketch-based join-key cardinality estimation — size a join BEFORE
    running it.  KMV estimates each side's distinct keys as
    (k−1)/x_k (x_k = k-th smallest hash fraction); the union sketch is
    the bottom-k of the two sketches' union, and the intersection
    estimate is the Jaccard-style ratio ρ·D̂_∪ where ρ is the fraction of
    union-sketch hashes present in BOTH sketches (Beyer et al. 2007).

    At 100 TB this is the planning primitive: both sketches are O(k)
    rows merged via TakeOrdered (never a shuffle of the key column
    beyond the distinct), the other table is never rescanned, and the
    output carries the EXACT counts next to the estimates plus the
    relative error — the measure-don't-guess audit of the estimator
    itself."""
    a_sk = kmv_sketch(left, left_key, k)
    b_sk = kmv_sketch(right, right_key, k)
    u_sk = a_sk.union(b_sk).distinct().orderBy("_h").limit(k)

    def est_of(sk: DataFrame) -> DataFrame:
        # k-th smallest = max within the sketch; exhaustive sketch (<k
        # rows) means the side had fewer than k distinct keys -> exact
        return sk.agg(
            F.count(F.lit(1)).alias("_n"), F.max("_h").alias("_hk")
        ).select(
            F.when(
                F.col("_n") < k, F.col("_n").cast("double")
            )
            .otherwise(F.round((F.lit(k - 1)) / _hex_frac(F.col("_hk")), 6))
            .alias("_est")
        )

    both = (
        u_sk.join(a_sk.withColumnRenamed("_h", "_ha"), F.col("_h") == F.col("_ha"), "left")
        .join(b_sk.withColumnRenamed("_h", "_hb"), F.col("_h") == F.col("_hb"), "left")
        .agg(
            F.count(F.lit(1)).alias("_ku"),
            F.count_if(F.col("_ha").isNotNull() & F.col("_hb").isNotNull()).alias("_kboth"),
            F.max("_h").alias("_hku"),
        )
    )
    est_u = F.when(F.col("_ku") < k, F.col("_ku").cast("double")).otherwise(
        F.round(F.lit(k - 1) / _hex_frac(F.col("_hku")), 6)
    )
    est_inter = F.round(F.col("_kboth").cast("double") / F.col("_ku") * est_u, 6)

    exact_a = left.agg(F.countDistinct(left_key).alias("exact_a"))
    exact_b = right.agg(F.countDistinct(right_key).alias("exact_b"))
    exact_i = (
        left.select(F.col(left_key).alias("_ka"))
        .distinct()
        .join(right.select(F.col(right_key).alias("_ka")).distinct(), "_ka")
        .agg(F.count(F.lit(1)).alias("exact_intersection"))
    )
    scalars = (
        both.select(est_inter.alias("est_intersection"))
        .crossJoin(F.broadcast(a_sk.transform(est_of).withColumnRenamed("_est", "est_a")))
        .crossJoin(F.broadcast(b_sk.transform(est_of).withColumnRenamed("_est", "est_b")))
        .crossJoin(F.broadcast(exact_a))
        .crossJoin(F.broadcast(exact_b))
        .crossJoin(F.broadcast(exact_i))
    )
    return scalars.select(
        F.lit(k).cast("bigint").alias("k"),
        "est_a",
        "exact_a",
        "est_b",
        "exact_b",
        "est_intersection",
        "exact_intersection",
        # NULL when the true intersection is empty (relative error is
        # undefined; the ANSI divide-by-zero on disjoint key sets was
        # caught by the hypothesis fuzz)
        F.round(
            F.abs(F.col("est_intersection") - F.col("exact_intersection"))
            / F.nullif(F.col("exact_intersection").cast("double"), F.lit(0.0)),
            6,
        ).alias("rel_err_intersection"),
    )
