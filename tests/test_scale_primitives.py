"""Plan-level tests for the explicit scale primitives: bucketed co-located
joins (no shuffle), salted skew joins (correct + spread), and partition
pruning (PartitionFilters at the scan)."""

import pytest
from pyspark.sql import functions as F

from comlake_core_spark.operators.relational import (
    bloom_membership,
    bloom_prune_join,
    compact,
    read_evolved,
    salted_join,
    write_bucketed,
    write_date_partitioned,
    write_zorder,
)
from comlake_core_spark.plans import inspect as P


@pytest.fixture(scope="module")
def warehouse(spark, tmp_path_factory):
    return spark  # saveAsTable uses spark's default warehouse (spark-warehouse/)


def test_bucketed_join_has_no_shuffle(spark, t):
    # drop stale tables AND their warehouse dirs (a dir left by a previous
    # session is unknown to this session's in-memory metastore, and
    # saveAsTable refuses to reuse the location)
    import shutil

    for name in ("orders_b", "lineitem_b"):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        shutil.rmtree(f"spark-warehouse/{name}", ignore_errors=True)
    # bucket both sides on the join key; the join must then plan with zero
    # exchanges — the amortize-the-shuffle-at-ingest pattern
    write_bucketed(t["orders"], "orders_b", "o_orderkey", buckets=8)
    write_bucketed(
        t["lineitem"].withColumnRenamed("l_orderkey", "o_orderkey"), "lineitem_b", "o_orderkey", buckets=8
    )
    joined = spark.table("orders_b").join(spark.table("lineitem_b"), "o_orderkey")
    joined.write.mode("overwrite").format("noop").save()
    assert P.count_shuffles(joined) == 0, P.executed_plan(joined)
    # sanity: same row count as the unbucketed join
    plain = t["orders"].join(t["lineitem"], t["orders"].o_orderkey == t["lineitem"].l_orderkey)
    assert joined.count() == plain.count()


def test_salted_join_correct_and_spread(spark):
    # one celebrity key (99% of rows) + uniform rest
    big = spark.range(0, 20000).select(
        F.when(F.col("id") % 100 < 99, F.lit(7)).otherwise(F.col("id") % 50).alias("k"),
        F.col("id").alias("payload"),
    )
    small = spark.createDataFrame([(i, f"dim-{i}") for i in range(50)], "k int, label string")
    out = salted_join(big, small, "k", salt=8)
    # correctness: equals the plain join
    plain = big.join(small, "k")
    assert out.count() == plain.count()
    assert out.agg(F.sum("payload")).first()[0] == plain.agg(F.sum("payload")).first()[0]


def _files_overlapping(path, col, lo, hi):
    """Count parquet files whose footer min/max for `col` intersects
    [lo, hi] — exactly the stats a scan uses to skip whole files."""
    import glob

    import pyarrow.parquet as pq

    total, hit = 0, 0
    for f in glob.glob(f"{path}/*.parquet"):
        md = pq.read_metadata(f)
        idx = md.schema.names.index(col)
        f_lo = min(md.row_group(i).column(idx).statistics.min for i in range(md.num_row_groups))
        f_hi = max(md.row_group(i).column(idx).statistics.max for i in range(md.num_row_groups))
        total += 1
        hit += f_lo <= hi and f_hi >= lo
    return hit, total


def test_zorder_prunes_both_dimensions(spark, tmp_path):
    df = spark.range(0, 100_000).select(
        F.pmod(F.hash("id"), F.lit(1024)).alias("x"),
        F.pmod(F.hash("id", F.lit(1)), F.lit(1024)).alias("y"),
        F.col("id").alias("payload"),
    )
    zpath, xpath = str(tmp_path / "z"), str(tmp_path / "xsort")
    write_zorder(df, zpath, "x", "y", bits=10, files=32)
    # baseline: single-dimension sort on x
    df.repartitionByRange(32, "x").sortWithinPartitions("x").write.parquet(xpath)

    # y-range query: x-sorted layout cannot prune (every file spans all y);
    # z-order must skip most files on the SAME query
    y_hit_z, n_z = _files_overlapping(zpath, "y", 100, 140)
    y_hit_x, n_x = _files_overlapping(xpath, "y", 100, 140)
    assert y_hit_x == n_x  # the single-sort layout reads everything
    assert y_hit_z <= n_z // 2, (y_hit_z, n_z)
    # and x-range queries still prune on the z-order layout
    x_hit_z, _ = _files_overlapping(zpath, "x", 100, 140)
    assert x_hit_z <= n_z // 2, (x_hit_z, n_z)

    # layout is result-transparent
    assert spark.read.parquet(zpath).agg(F.sum("payload")).first()[0] == \
        df.agg(F.sum("payload")).first()[0]


def test_dynamic_partition_pruning(spark, t, tmp_path):
    # a selective dim filter must prune fact PARTITIONS at runtime (DPP):
    # the fact side's PartitionFilters gains a dynamicpruning expression
    # fed by the dim — at 100 TB this is what turns "join a month of
    # partitions" into "read two days"
    path = str(tmp_path / "ev_part")
    t["events"].withColumn("_date", F.date_format("ts", "yyyy-MM-dd")).write.partitionBy(
        "_date"
    ).parquet(path)
    fact = spark.read.parquet(path)
    rows = [(f"2024-01-{d:02d}", "special" if d in (5, 6) else "normal") for d in range(1, 31)]
    dim = spark.createDataFrame(rows, "_date string, tag string").filter(F.col("tag") == "special")
    j = fact.join(dim, "_date").groupBy("tag").count()
    j.write.mode("overwrite").format("noop").save()
    plan = P.executed_plan(j)
    assert "dynamicpruning" in plan.lower(), plan


def test_join_strategy_hints_are_honored(spark, t):
    # the per-join strategy override: hint("shuffle_hash") must replace the
    # default sort-merge (saves both sort passes when one side is much
    # smaller but too big to broadcast)
    big = t["lineitem"].select(F.col("l_orderkey").alias("k"), "l_quantity")
    mid = t["orders"].select(F.col("o_orderkey").alias("k"), "o_totalprice")
    merged = big.join(mid.hint("merge"), "k")
    hashed = big.join(mid.hint("shuffle_hash"), "k")
    assert P.has_sort_merge_join(merged)
    assert "ShuffledHashJoin" in P.executed_plan(hashed), P.executed_plan(hashed)


def test_aqe_splits_skewed_join_partition(spark):
    # AQE's runtime answer to skew (complementing the explicit salted_join):
    # with thresholds at test scale, the hot key's partition must be split —
    # the SortMergeJoin node reports skew=true in the final adaptive plan
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        # keep AQE from converting the SMJ to broadcast at runtime — the
        # point here is the skew-split decision, which only SMJ carries
        "spark.sql.adaptive.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "32KB",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "8KB",
        "spark.sql.adaptive.coalescePartitions.enabled": "false",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        big = spark.range(0, 300_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7)).otherwise(F.col("id") % 1000).alias("k"),
            F.concat(F.lit("payload-"), F.col("id")).alias("pay"),
        )
        mid = spark.range(0, 1000).select(F.col("id").alias("k"), F.col("id").alias("w"))
        j = big.join(mid, "k").groupBy().count()
        # collect() (not a detached write) so THIS DataFrame's adaptive plan
        # finalizes and carries the runtime skew decision
        j.collect()
        plan = P.executed_plan(j)
        assert "isFinalPlan=true" in plan, plan
        assert "skew=true" in plan, plan
    finally:
        for k, v in saved.items():
            if v is not None:
                spark.conf.set(k, v)


def test_compact_small_files(spark, tmp_path):
    import glob

    src, dst = str(tmp_path / "small"), str(tmp_path / "compacted")
    df = spark.range(0, 50_000).select(F.col("id"), F.hash("id").alias("v"))
    df.repartition(64).write.parquet(src)  # the streaming-sink pathology
    assert len(glob.glob(f"{src}/*.parquet")) == 64
    n = compact(spark, src, dst, target_file_bytes=256 * 1024)
    assert 1 <= n < 16
    # content identical
    assert spark.read.parquet(dst).agg(F.sum("v"), F.count("*")).first() == \
        df.agg(F.sum("v"), F.count("*")).first()


def test_read_evolved_schema(spark, tmp_path):
    p1, p2 = str(tmp_path / "v1"), str(tmp_path / "v2")
    spark.range(0, 10).select(F.col("id")).write.parquet(p1)
    spark.range(10, 20).select(F.col("id"), F.lit("new").alias("added")).write.parquet(p2)
    df = read_evolved(spark, p1, p2)
    assert set(df.columns) == {"id", "added"}
    assert df.count() == 20
    # old files surface the new column as NULL
    assert df.filter(F.col("added").isNull()).count() == 10


def test_spark_runtime_bloom_filter_injects(spark, t):
    # Spark's OWN runtime bloom filter (the automatic complement to our
    # explicit bloom_prune_join) must inject a might_contain filter on the
    # fact side when the dim side carries a selective non-pushable filter
    # and the join is a shuffle join. Thresholds are tuned because local
    # sf test files are far below the 10 GB production default.
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    }
    saved = {k: spark.conf.get(k) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        od = t["orders"].filter(F.col("o_totalprice") > 300000)
        j = (
            t["lineitem"]
            .join(od, F.col("l_orderkey") == F.col("o_orderkey"))
            .groupBy("o_orderpriority")
            .count()
        )
        plan = j._jdf.queryExecution().optimizedPlan().toString()
        assert "bloom_filter_agg" in plan, plan
        assert "might_contain" in plan, plan
    finally:
        for k, v in saved.items():
            spark.conf.set(k, v)


def test_bloom_membership_prunes_before_join(spark):
    # dim keys 0..49, fact keys 0..999: the bloom predicate alone must keep
    # every true match and prune (almost) everything else — at 2^20 bits /
    # 50 keys the false-positive rate is ~0, so the pruned count should be
    # exactly the true-match count here
    fact = spark.range(0, 10000).select((F.col("id") % 1000).alias("k"), F.col("id").alias("v"))
    dim = spark.range(0, 50).select(F.col("id").alias("k"), (F.col("id") * 10).alias("w"))
    pruned = fact.filter(bloom_membership(dim, "k"))
    true_matches = 10000 // 1000 * 50
    n = pruned.count()
    assert true_matches <= n <= true_matches + 50, n


def test_bloom_prune_join_equals_plain_join(spark):
    fact = spark.range(0, 5000).select((F.col("id") % 500).alias("k"), F.col("id").alias("v"))
    dim = spark.range(0, 500, 7).select(F.col("id").alias("k"))  # every 7th key
    out = bloom_prune_join(fact, dim, "k")
    plain = fact.join(dim, "k")
    assert out.count() == plain.count()
    assert out.agg(F.sum("v")).first()[0] == plain.agg(F.sum("v")).first()[0]


def test_bloom_membership_empty_dim(spark):
    fact = spark.range(0, 100).select(F.col("id").alias("k"))
    dim = spark.range(0, 0).select(F.col("id").alias("k"))
    assert fact.filter(bloom_membership(dim, "k")).count() == 0


def test_partition_pruning(spark, t, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("events_part"))
    write_date_partitioned(t["events"], path)
    df = spark.read.parquet(path).filter(F.col("_date") == "2024-01-05")
    plan = P.executed_plan(df)
    # the date filter must land in PartitionFilters (pruned at planning),
    # not in the row-level data filters
    assert "PartitionFilters" in plan
    seg = plan.split("PartitionFilters")[1][:200]
    assert "_date" in seg
    assert df.count() > 0


def test_write_partitioned_prunes_and_clusters(spark, t, tmp_path_factory):
    from comlake_core_spark.operators.relational import write_partitioned

    path = str(tmp_path_factory.mktemp("events_bytype"))
    write_partitioned(t["events"], path, ["event_type"], sort_cols=["user_id"])
    # category filter prunes directories at planning time...
    df = spark.read.parquet(path).filter(F.col("event_type") == "click")
    plan = P.executed_plan(df)
    assert "PartitionFilters" in plan
    assert "event_type" in plan.split("PartitionFilters")[1][:200]
    full_files = spark.read.parquet(path).select("_metadata.file_path").distinct().count()
    pruned_files = df.select("_metadata.file_path").distinct().count()
    assert 0 < pruned_files < full_files
    # ...and the user_id clustering reaches the scan as a pushed filter
    rdf = spark.read.parquet(path).filter(F.col("user_id") < 100)
    rplan = P.executed_plan(rdf)
    assert "PushedFilters" in rplan
    assert "user_id" in rplan.split("PushedFilters")[1][:200]
