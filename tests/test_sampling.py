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
