"""Relational scale primitives: salted joins for skew, bucketed co-located
joins, and partition-pruned layouts.

These are the knobs SURVEY.md §4 lists as 'built-in via Catalyst' plus the
ones that need explicit layout decisions at 100 TB. Each has a plan-level
test in tests/test_scale_primitives.py proving the shuffle/pruning behavior,
not just the row results.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
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


def bloom_prune_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    how: str = "inner",
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """Equi-join with an explicit Bloom-filter pre-prune of the fact side.

    The 100 TB case this serves: `dim` is too big (or too late-filtered) for
    Catalyst to broadcast, so the join is a full shuffle of BOTH sides — and
    when the dim side is selective, most fact rows shuffle only to be
    dropped. A Bloom filter of the dim keys costs m_bits/8 bytes broadcast
    (128 KiB at the default 2^20 bits) and drops non-matching fact rows at
    the SCAN, before the exchange, at the price of a false-positive rate of
    ~(1-e^(-kn/m))^k — false positives are then removed by the real join,
    so the result is EXACTLY the plain join (the workload oracle pins this).

    Spark's own runtime bloom filter (spark.sql.optimizer.runtime.
    bloomFilter.enabled) does this automatically but only when its size
    heuristics fire; this operator is the deterministic form, and its
    mechanics are scale-bounded by the FILTER, not the data:

    - build side: the k bit positions are computed JVM-side
      (xxhash64 % m), and only DISTINCT positions are shuffled and
      collected — O(min(n*k, m)) ints to the driver, never the keys;
    - probe side: positions are again computed JVM-side; only the final
      k-bit membership test runs in an Arrow-batched pandas UDF against
      the broadcast numpy bitset.

    Null fact keys hash to the positions of the bare seed literal; they can
    only survive as false positives and no join `how` here emits them.
    Reference: the engine's predicate-pushdown behavior this emulates is
    plain filter pushdown (SURVEY.md §4); bloom join pruning itself follows
    the classic sideways-information-passing literature.
    """
    pruned = fact.filter(bloom_membership(dim, key, m_bits=m_bits, k=k))
    return pruned.join(dim, key, how)


def bloom_membership(dim: DataFrame, key: str, m_bits: int = 1 << 20, k: int = 5) -> Column:
    """Build a Bloom filter of `dim[key]` and return a boolean Column that
    tests membership of a same-named column on the probe side. Split out of
    bloom_prune_join so tests can pin the prune selectivity directly."""

    def positions_for(col: Column) -> list[Column]:
        return [F.pmod(F.xxhash64(col, F.lit(i)), F.lit(m_bits)) for i in range(k)]

    built = (
        dim.select(F.explode(F.array(*positions_for(F.col(key)))).alias("pos"))
        .distinct()
        .collect()
    )
    bitset = np.zeros(m_bits // 8, dtype=np.uint8)
    if built:
        pos_arr = np.array([r["pos"] for r in built], dtype=np.int64)
        np.bitwise_or.at(bitset, pos_arr >> 3, (np.uint8(1) << (pos_arr & 7).astype(np.uint8)))
    bc = dim.sparkSession.sparkContext.broadcast(bitset)

    @F.pandas_udf("boolean")
    def might_contain(pos: pd.Series) -> pd.Series:
        if len(pos) == 0:
            return pd.Series([], dtype=bool)
        bits = bc.value
        arr = np.vstack(pos.to_numpy()).astype(np.int64)
        hit = (bits[arr >> 3] >> (arr & 7).astype(np.uint8)) & 1
        return pd.Series(hit.all(axis=1))

    return might_contain(F.array(*positions_for(F.col(key))))


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


def write_zorder(
    df: DataFrame, path: str, col_x: str, col_y: str, bits: int = 12, files: int = 32
) -> None:
    """Write parquet laid out along a Z-curve over (col_x, col_y), so
    min/max row-group stats prune files for range filters on EITHER
    column — the multi-dimensional clustering a single sort key can't give.

    A layout sorted on x alone answers x-ranges with a few files but makes
    every y-range read ALL files (each file spans the full y domain).
    Z-ordering quantizes both columns to `bits` bits against their global
    min/max (one tiny agg), interleaves the bits JVM-side, and
    range-partitions + sorts by the z-value: each output file then covers a
    small rectangle of (x, y) space, and parquet's ordinary stats-based
    skipping (no special reader support) prunes on both dimensions.
    tests/test_scale_primitives.py measures the actual file-level pruning
    fraction from the parquet footers for both layouts.

    At 100 TB this is the catalog/event-table layout knob: pick the two
    hottest filter columns (e.g. dataset_id × day) and z-order at ingest;
    Delta/Iceberg OPTIMIZE ZORDER is this same transform run as table
    maintenance."""
    lo_x, hi_x, lo_y, hi_y = df.agg(
        F.min(col_x), F.max(col_x), F.min(col_y), F.max(col_y)
    ).first()
    top = (1 << bits) - 1

    def quant(c: str, lo, hi) -> Column:
        span = (hi - lo) or 1
        return F.least(
            F.lit(top),
            F.floor((F.col(c).cast("double") - F.lit(lo)) / F.lit(span) * F.lit(top)),
        ).cast("long")

    with_z = df.withColumn("_z", zorder_value(quant(col_x, lo_x, hi_x), quant(col_y, lo_y, hi_y), bits))
    (
        with_z.repartitionByRange(files, "_z")
        .sortWithinPartitions("_z")
        .drop("_z")
        .write.mode("overwrite")
        .parquet(path)
    )


def compact(
    spark, src_path: str, dst_path: str, target_file_bytes: int = 128 * 1024 * 1024
) -> int:
    """Small-file compaction: rewrite a parquet directory into files of
    ~target_file_bytes. Returns the number of files written.

    The 100 TB reality this serves: streaming sinks and per-batch ingests
    leave thousands of KB-sized files, and every later scan pays a task
    per file (plus a footer read and an object-store request). Compaction
    is the periodic maintenance that restores scan efficiency — same job
    Delta's OPTIMIZE (file-size binpacking) runs.

    Sizing comes from the source's actual on-disk bytes (file listing,
    no data read), so the partition count tracks the real compression
    ratio instead of a row-count guess. The rewrite itself is one
    shuffle-free coalesce when shrinking file count, with order preserved
    per input split."""
    import glob
    import os

    total = sum(os.path.getsize(f) for f in glob.glob(os.path.join(src_path, "*.parquet")))
    n_files = max(1, -(-total // target_file_bytes))  # ceil
    df = spark.read.parquet(src_path)
    df.coalesce(n_files).write.mode("overwrite").parquet(dst_path)
    return len(glob.glob(os.path.join(dst_path, "*.parquet")))


def read_evolved(spark, *paths: str):
    """Read parquet written under EVOLVING schemas as one DataFrame:
    mergeSchema unions the per-file footers (new columns read as NULL in
    old files) — the append-only schema-evolution contract a long-lived
    lake table needs. Column RENAMES and type NARROWING are not covered:
    those need a transactional table format's column-mapping metadata."""
    return spark.read.option("mergeSchema", True).parquet(*paths)


def write_partitioned(
    df: DataFrame,
    path: str,
    partition_cols: list[str],
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Hive-partitioned layout with optional within-file clustering.

    ``partition_cols`` become directory levels — a filter on them prunes
    directories at PLANNING time (PartitionFilters), before any file is
    opened; pick low-cardinality columns. ``sort_cols`` cluster rows inside
    each written file via sortWithinPartitions — a LOCAL sort, no global
    shuffle — so parquet row-group min/max stats become selective for range
    filters on those columns (the one-dimensional sibling of write_zorder
    below)."""
    out = df
    if sort_cols:
        out = out.sortWithinPartitions(*[F.col(c) for c in sort_cols])
    out.write.mode(mode).partitionBy(*partition_cols).parquet(path)


def write_date_partitioned(df: DataFrame, path: str, ts_col: str = "ts") -> None:
    """Layout events by date directory partitions: a time-range filter then
    prunes entire partitions at planning time (PartitionFilters in the
    scan) — the difference between reading a day and reading a year."""
    write_partitioned(
        df.withColumn("_date", F.date_format(F.col(ts_col), "yyyy-MM-dd")), path, ["_date"]
    )


def apply_changelog(
    target: DataFrame,
    changes: DataFrame,
    key: str,
    op_col: str = "_op",
    seq_col: str | None = None,
    assert_unique: bool = True,
) -> DataFrame:
    """CDC MERGE: apply a changelog (one change per key, op ∈ 'U'pdate /
    'I'nsert / 'D'elete) to a target snapshot — the lakehouse MERGE INTO
    shape (Delta/Iceberg), expressed as one full-outer join:

      D → row dropped; U/I → changelog values win; no change → target row.

    Returns the merged snapshot plus an `_action` audit column
    (kept/updated/inserted/deleted-free output keeps only the first
    three; deletions simply vanish). Contract: at most one change per key
    per batch.  The contract is ENFORCED (ADVICE r2 #3 — duplicate keys
    would silently fan out the full-outer join): pass ``seq_col`` to
    pre-compact a multi-change feed to last-change-per-key (max_by on the
    sequence column, the standard CDC compaction), or leave
    ``assert_unique=True`` to fail fast with the offending keys (one
    small count job over the changelog — tiny by contract — at operator
    construction; set False only when the feed is known-compacted).

    Scale: ONE shuffle join on the key (the changelog is usually a tiny
    fraction of the snapshot, so AQE broadcasts it; state never exceeds
    snapshot + changelog). This is the batch twin of the incremental
    matview refresh (operators/matview.py) — apply to rows instead of
    aggregates."""
    if seq_col is not None:
        others = [c for c in changes.columns if c != key]
        changes = (
            changes.groupBy(key)
            .agg(F.max_by(F.struct(*[F.col(c) for c in others]), F.col(seq_col)).alias("_last"))
            .select(key, *[F.col(f"_last.{c}").alias(c) for c in others])
        )
    elif assert_unique:
        dups = [
            r[key]
            for r in changes.groupBy(key)
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > 1)
            .select(key)
            .limit(5)
            .collect()
        ]
        if dups:
            raise ValueError(
                f"apply_changelog: multiple changes for key(s) {dups}; "
                "pass seq_col= to compact to last-change-per-key"
            )
    data_cols = [c for c in target.columns if c != key]
    t = target.alias("t")
    c = changes.alias("c")
    joined = t.join(c, F.col(f"t.{key}") == F.col(f"c.{key}"), "full_outer")
    op = F.col(f"c.{op_col}")
    action = (
        F.when(op.isNull(), F.lit("kept"))
        .when(op == "D", F.lit("deleted"))
        .when(F.col(f"t.{key}").isNull(), F.lit("inserted"))
        .otherwise(F.lit("updated"))
    )
    merged = joined.select(
        F.coalesce(F.col(f"t.{key}"), F.col(f"c.{key}")).alias(key),
        *[
            F.when(op.isin("U", "I"), F.col(f"c.{col}"))
            .otherwise(F.col(f"t.{col}"))
            .alias(col)
            for col in data_cols
        ],
        action.alias("_action"),
    )
    return merged.filter(F.col("_action") != "deleted")


def zorder_value(x: Column, y: Column, bits: int = 5) -> Column:
    """Morton/Z-order interleave of two ``bits``-bit bucket ids — pure
    integer shift/mask arithmetic (codegen'd, and stated identically in
    any SQL engine).  Bit i of x lands at position 2i+1, bit i of y at
    2i, so nearby (x, y) cells share z-prefixes — the layout key that
    turns a 2-dimensional predicate into a compact set of z-ranges.

    The ONE Morton implementation in the engine: both write_zorder (which
    resolves this name at call time) and zorder_audit — and the
    zorder_pruning_audit oracle SQL, which restates this exact formula —
    use it.  (An earlier shadowed twin with the opposite x/y bit order was
    dead code and was removed in r6; interleave order is symmetric for
    locality, but one definition must own the oracle.)"""
    z = F.lit(0).cast("long")
    for i in range(bits):
        z = (
            z
            + F.shiftleft(F.shiftright(x.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i + 1)
            + F.shiftleft(F.shiftright(y.cast("long"), i).bitwiseAND(F.lit(1)), 2 * i)
        )
    return z


def zorder_audit(
    df: DataFrame,
    x: Column,
    y: Column,
    bits: int = 5,
    range_shift: int = 6,
    query_x: tuple[int, int] = (8, 11),
) -> DataFrame:
    """Audit of a Z-order layout: bucket rows by z-range (z >> range_shift
    — one range ≡ one file/row-group under a z-sorted write) and report
    each range's bounding box over both dimensions plus whether a query
    box on x alone could SKIP it on min/max stats.

    This is the measured form of the 100 TB layout argument: under
    row-order layout every file spans the full x-domain (zero skips);
    under z-order each range's x-span is bounded by the curve's locality,
    so the same min/max stats prune most ranges.  The workload gate pins
    the spans and the skip count — the pruning win is verified, not
    asserted.  One map-only projection + one small-key aggregate."""
    lo, hi = query_x
    z = zorder_value(x, y, bits)
    boxed = df.select(
        F.shiftright(z, range_shift).alias("zrange"),
        x.cast("long").alias("_x"),
        y.cast("long").alias("_y"),
    )
    return (
        boxed.groupBy("zrange")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            F.min("_x").alias("x_min"),
            F.max("_x").alias("x_max"),
            F.min("_y").alias("y_min"),
            F.max("_y").alias("y_max"),
        )
        .select(
            "zrange",
            "n_rows",
            "x_min",
            "x_max",
            "y_min",
            "y_max",
            (F.col("x_max") - F.col("x_min") + 1).alias("x_span"),
            ((F.col("x_max") < lo) | (F.col("x_min") > hi)).alias("skipped_by_query"),
        )
    )
