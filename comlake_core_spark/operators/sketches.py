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
