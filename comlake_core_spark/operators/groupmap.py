"""Grouped-map operators (applyInPandas): per-group computations where the
group must be seen whole — the canonical 'custom operator' escape hatch the
DataFrame API reserves for semantics its built-ins can't express.

Scale note: applyInPandas shuffles each group to one task and materializes
it in pandas, so group size must fit an executor; keys with unbounded
groups need pre-aggregation or salting first. For anything expressible as
window/agg expressions, prefer those (see zscore_events_expr — same
semantics, no Python, oracle-checkable); use the pandas form when the
per-group logic genuinely needs imperative code (model scoring, complex
resampling, per-group model fits).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def zscore_normalize_pandas(df: DataFrame, key_col: str = "user_id", value_col: str = "value") -> DataFrame:
    """Per-key z-score normalization via applyInPandas (grouped map).
    Pandas/numpy float summation differs from exact-decimal arithmetic in
    the last bits, so this variant has no SQL oracle; its expression twin
    below is oracle-checked and the two are asserted approx-equal in
    pytest."""

    def normalize(pdf):
        v = pdf[value_col]
        std = v.std(ddof=1)
        pdf = pdf.assign(zscore=(v - v.mean()) / std if std and std > 0 else 0.0)
        return pdf[[key_col, "event_id", "zscore"]]

    out_schema = f"{key_col} long, event_id long, zscore double"
    return df.groupBy(key_col).applyInPandas(normalize, out_schema)


def zscore_normalize_expr(df: DataFrame, key_col: str = "user_id", value_col: str = "value") -> DataFrame:
    """Same semantics as window expressions with exact decimal power sums:
    mean and sample-std per key from Σx, Σx² (associative ⇒ bitwise-stable
    ⇒ SQL-oracle-checkable), then one per-row double normalization."""
    x = F.col(value_col).cast("decimal(14,4)")
    w = Window.partitionBy(key_col)
    n = F.count(F.lit(1)).over(w)
    sx = F.sum(x).over(w).cast("double")
    sxx = F.sum(x * x).over(w).cast("double")
    mean = sx / n
    var = (n * sxx - sx * sx) / (n * (n - 1))
    return df.select(
        key_col,
        "event_id",
        ((F.col(value_col) - mean) / F.sqrt(var)).alias("zscore"),
    )


def diagnose_skew(df: DataFrame, key_col: str, top: int = 10) -> DataFrame:
    """Key-skew histogram: the top-N heaviest keys with their share of all
    rows — the first thing to run before a big join melts one reducer.
    One partial-agg pass + a tiny top-k."""
    total = df.count()
    counts = df.groupBy(key_col).agg(F.count(F.lit(1)).alias("n"))
    return (
        counts.orderBy(F.desc("n"), F.asc(key_col))
        .limit(top)
        .select(key_col, "n", (F.col("n") / F.lit(total)).alias("share"))
    )
