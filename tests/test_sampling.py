"""Sampling primitives: determinism, exact quotas, split disjointness and
fraction bounds — the properties a reproducible training pipeline depends
on."""

import math

from pyspark.sql import functions as F

from comlake_core_spark.operators.sampling import (
    hash_split,
    sample_fraction_bounds,
    stratified_cap,
    stratified_sample,
    uniform_sample_n,
)


def _classes(spark, n=3000):
    # three imbalanced classes: 70% / 25% / 5%
    return spark.range(0, n).select(
        F.col("id"),
        F.when(F.col("id") % 20 < 14, "big")
        .when(F.col("id") % 20 < 19, "mid")
        .otherwise("rare")
        .alias("cls"),
    )


def test_stratified_cap_exact_and_deterministic(spark):
    df = _classes(spark)
    out = stratified_cap(df, "cls", "id", 50)
    counts = {r["cls"]: r["n"] for r in out.groupBy("cls").agg(F.count("*").alias("n")).collect()}
    assert counts == {"big": 50, "mid": 50, "rare": 50}
    # deterministic: the FIRST 50 ids of each class, twice in a row
    first = sorted(r["id"] for r in out.filter(F.col("cls") == "big").collect())
    again = sorted(
        r["id"] for r in stratified_cap(df, "cls", "id", 50).filter(F.col("cls") == "big").collect()
    )
    assert first == again
    assert first == sorted(
        r["id"] for r in df.filter(F.col("cls") == "big").orderBy("id").limit(50).collect()
    )


def test_stratified_sample_proportional_quota(spark):
    df = _classes(spark)
    totals = {r["cls"]: r["n"] for r in df.groupBy("cls").agg(F.count("*").alias("n")).collect()}
    out = stratified_sample(df, "cls", "id", 0.1)
    counts = {r["cls"]: r["n"] for r in out.groupBy("cls").agg(F.count("*").alias("n")).collect()}
    assert counts == {c: math.ceil(totals[c] * 0.1) for c in totals}


def test_hash_split_disjoint_complete_stable(spark):
    df = spark.range(0, 20000).select(F.concat(F.lit("doc-"), F.col("id")).alias("key"))
    train, test = hash_split(df, "key", 0.1)
    n_train, n_test = train.count(), test.count()
    assert n_train + n_test == 20000
    assert train.join(test, "key").count() == 0
    lo, hi = sample_fraction_bounds(0.1, 20000)
    assert lo <= n_test / 20000 <= hi
    # stability: same assignment on a re-created frame
    _, test2 = hash_split(df, "key", 0.1)
    assert test2.exceptAll(test).count() == 0 and test.exceptAll(test2).count() == 0
    # monotone: the 5% test set is a subset of the 10% one (growing eval
    # sets never reshuffle previously-assigned keys)
    _, test5 = hash_split(df, "key", 0.05)
    assert test5.exceptAll(test).count() == 0


def test_uniform_sample_n_exact_and_deterministic(spark):
    df = spark.range(0, 5000).select(F.col("id"), (F.col("id") * 2).alias("v"))
    s1 = uniform_sample_n(df, 100, key="id")
    assert s1.count() == 100
    ids1 = sorted(r["id"] for r in s1.collect())
    ids2 = sorted(r["id"] for r in uniform_sample_n(df, 100, key="id").collect())
    assert ids1 == ids2
    # n larger than the frame: returns everything
    assert uniform_sample_n(df, 10000, key="id").count() == 5000


def test_stratified_sample_plan_uses_window_group_limit(spark):
    from comlake_core_spark.plans import inspect as P

    df = _classes(spark, 10000)
    out = stratified_cap(df, "cls", "id", 10)
    assert "WindowGroupLimit" in P.executed_plan(out)


def test_weighted_sample_deterministic_and_capped(spark):
    from comlake_core_spark.operators.sampling import weighted_sample

    rows = [(i, "s1", 10) for i in range(1, 21)] + [(i, "s2", 10) for i in range(21, 41)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w int")
    out = weighted_sample(df, "w", 5, "source").collect()
    by_src = {}
    for r in out:
        by_src.setdefault(r["source"], []).append(r)
    assert sorted(by_src) == ["s1", "s2"]
    for src, rs in by_src.items():
        assert sorted(r["sample_rank"] for r in rs) == [1, 2, 3, 4, 5]
        keys = [r["es_key"] for r in sorted(rs, key=lambda r: r["sample_rank"])]
        assert keys == sorted(keys, reverse=True)  # rank follows the ES key
    # rerun is byte-identical (u derives from md5(doc_id), no RNG state)
    again = weighted_sample(df, "w", 5, "source").collect()
    assert sorted(map(tuple, out)) == sorted(map(tuple, again))


def test_weighted_sample_prefers_heavy_weights(spark):
    from comlake_core_spark.operators.sampling import weighted_sample

    # one document with overwhelming weight among weight-1 peers: its key
    # ln(u)/w is ~0 while every peer needs u within 1e-6 of 1.0 to beat it
    rows = [(i, "s", 1) for i in range(1, 50)] + [(99, "s", 1_000_000)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w int")
    out = weighted_sample(df, "w", 1, "source").collect()
    assert len(out) == 1 and out[0]["doc_id"] == 99


def test_weighted_sample_plan_uses_window_group_limit(spark):
    from comlake_core_spark.operators.sampling import weighted_sample
    from comlake_core_spark.plans import inspect as P

    rows = [(i, "s%d" % (i % 3), i % 7 + 1) for i in range(1, 300)]
    df = spark.createDataFrame(rows, "doc_id long, source string, w int")
    out = weighted_sample(df, "w", 5, "source")
    assert "WindowGroupLimit" in P.executed_plan(out)
