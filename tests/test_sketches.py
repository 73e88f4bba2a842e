"""Misra-Gries heavy-hitters: exact regime ≡ GROUP BY, approximate regime
obeys the deterministic n/(k+1) undercount bound for every merge tree."""

import numpy as np
import pytest

from pyspark.sql import functions as F

from comlake_core_spark.operators.sketches import _merge_prune, misra_gries


def test_exact_regime_equals_group_by(t):
    """k >= |distinct| means no decrement ever fires: the sketch IS the
    exact group count (the regime the oracle-gated workload pins)."""
    ev = t["events"]
    got = {
        r["event_type"]: r["est_count"]
        for r in misra_gries(ev, "event_type", 16).collect()
    }
    want = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == want


@pytest.mark.parametrize("n_parts", [1, 7])
def test_guarantee_on_skewed_data(spark, n_parts):
    """Zipf-skewed stream, k far below |distinct|: every estimate is in
    [true - n/(k+1), true], at most k survivors, and every item more
    frequent than n/(k+1) is present — regardless of partitioning (the
    PODS'12 mergeability result; partitioning = the merge tree)."""
    rng = np.random.default_rng(42)
    items = rng.zipf(1.5, size=20_000)
    items = items[items < 10_000].astype("int64")
    n = len(items)
    k = 20
    df = spark.createDataFrame(
        [(int(x),) for x in items], "item long"
    ).repartition(n_parts)

    est = {r["item"]: r["est_count"] for r in misra_gries(df, "item", k).collect()}
    true = {}
    for x in items.tolist():
        true[x] = true.get(x, 0) + 1

    bound = n / (k + 1)
    assert len(est) <= k
    for item, e in est.items():
        assert e <= true[item]
        assert true[item] - e <= bound
    for item, c in true.items():
        if c > bound:
            assert item in est, f"heavy hitter {item} (count {c}) missing"


def test_nulls_excluded(spark):
    df = spark.createDataFrame(
        [("a",), (None,), ("a",), ("b",), (None,)], "item string"
    )
    got = {r["item"]: r["est_count"] for r in misra_gries(df, "item", 8).collect()}
    assert got == {"a": 2, "b": 1}


def test_merge_prune_is_valid_mg_merge():
    """Driver-side check of the core merge: combined summary undercounts by
    at most (combined n)/(k+1) against exact addition."""
    k = 3
    a = {1: 10, 2: 6, 3: 2}
    b = {2: 5, 4: 4, 5: 3}
    merged = _merge_prune(dict(a), b, k)
    exact = {1: 10, 2: 11, 3: 2, 4: 4, 5: 3}
    n = sum(exact.values())
    assert len(merged) <= k
    for item, w in merged.items():
        assert w <= exact[item]
    for item, c in exact.items():
        assert c - merged.get(item, 0) <= n / (k + 1)
