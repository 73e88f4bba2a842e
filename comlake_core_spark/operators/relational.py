"""Relational scale primitives: salted joins for skew, bucketed co-located
joins, and partition-pruned layouts.

These are the knobs SURVEY.md §4 lists as 'built-in via Catalyst' plus the
ones that need explicit layout decisions at 100 TB. Each has a plan-level
test in tests/test_scale_primitives.py proving the shuffle/pruning behavior,
not just the row results.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_join(
    big: DataFrame,
    skewed_small: DataFrame,
    key: str,
    salt: int = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side's key into `salt` shards and
    replicate the small side across shards, so one hot key spreads over
    `salt` reducers instead of melting one.

    AQE's skew-join split handles *detected* skew after the fact; explicit
    salting is the deterministic form for keys known to be pathological
    (e.g. the null-key flood or a celebrity user_id). Columns are preserved;
    the salt columns are dropped."""
    big_salted = big.withColumn("_salt", (F.rand(seed=42) * salt).cast("int"))
    small_replicated = skewed_small.withColumn(
        "_salt", F.explode(F.array(*[F.lit(i) for i in range(salt)]))
    )
    out = big_salted.join(small_replicated, [key, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(df: DataFrame, table: str, key: str, buckets: int = 8, sort_by: str | None = None) -> None:
    """Persist with hash-bucketed layout: joins/aggregations on `key` between
    tables bucketed the same way need NO shuffle (Catalyst sees the
    bucketing as a satisfied distribution). The 100 TB pattern: bucket the
    fact tables once at ingest, amortize the shuffle over every later
    join."""
    writer = df.write.mode("overwrite").format("parquet").bucketBy(buckets, key)
    if sort_by:
        writer = writer.sortBy(sort_by)
    writer.saveAsTable(table)


def write_date_partitioned(df: DataFrame, path: str, ts_col: str = "ts") -> None:
    """Layout events by date directory partitions: a time-range filter then
    prunes entire partitions at planning time (PartitionFilters in the
    scan) — the difference between reading a day and reading a year."""
    df.withColumn("_date", F.date_format(F.col(ts_col), "yyyy-MM-dd")).write.mode(
        "overwrite"
    ).partitionBy("_date").parquet(path)
