"""Reproducibility under reconfiguration: the engine's results must be
BITWISE identical when the physical execution changes — different shuffle
partition counts, different input partitioning. This is the property that
makes the decimal-sum discipline (workloads package doc) real: a 32-core
laptop and a 1000-executor cluster produce the same bytes."""

import pytest

from comlake_core_spark.session import tables
from comlake_core_spark.workloads import REGISTRY

SF = "/root/testdata/sf0.001"

CASES = ["agg_pricing_summary", "agg_stats_manual", "join_revenue_by_nation", "window_running_sum"]


def rows_of(df):
    return sorted([tuple(r) for r in df.collect()], key=repr)


@pytest.mark.parametrize("name", CASES)
def test_result_invariant_to_shuffle_partitions(spark, name):
    fn = REGISTRY[name].fn
    orig = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        spark.conf.set("spark.sql.shuffle.partitions", "3")
        a = rows_of(fn(spark, SF))
        spark.conf.set("spark.sql.shuffle.partitions", "17")
        b = rows_of(fn(spark, SF))
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", orig)
    assert a == b


def test_result_invariant_to_input_partitioning(spark, tmp_path):
    # rewrite lineitem as 7 shards; the aggregate must not change a bit
    li = tables(spark, SF, ("lineitem",))["lineitem"]
    sharded_path = str(tmp_path / "li7")
    li.repartition(7).write.parquet(sharded_path)

    from pyspark.sql import functions as F

    def agg(df):
        q = F.col("l_quantity").cast("decimal(12,2)")
        return rows_of(
            df.groupBy("l_returnflag").agg(
                F.sum(q).cast("double").alias("s"), F.count(F.lit(1)).alias("n")
            )
        )

    assert agg(li) == agg(spark.read.parquet(sharded_path))
