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


def test_gk_rank_check_tolerates_duplicates_straddling_target(spark, tmp_path):
    """ADVICE r3: when the returned quantile value is duplicated more than
    eps*n times AND its run straddles the target rank, the value's true rank
    is a RANGE [cum - count + 1, cum]; GK guarantees only that some rank in
    the range is within eps*n.  A check using the top of the range alone
    would spuriously fail this data: 10k rows of a single price (rank range
    [1001, 11000] around the p50 target 5500+, top endpoint 11000 far from
    it).  The rank-range intersection check must stay TRUE — matching the
    oracle's pinned TRUE — on heavy duplicates."""
    from comlake_core_spark.workloads import REGISTRY

    rows = [("A", 50.0)] * 1_000 + [("A", 100.0)] * 10_000 + [("A", 200.0)] * 500
    df = spark.createDataFrame(rows, "l_returnflag string, l_extendedprice double")
    df.coalesce(1).write.mode("overwrite").parquet(str(tmp_path / "lineitem.parquet"))
    out = REGISTRY["approx_quantiles_prices"].fn(spark, str(tmp_path)).collect()
    assert len(out) == 1
    r = out[0]
    assert r["n_rows"] == 11_500
    assert r["p50_exact"] == 100.0
    assert r["p50_within_rank_eps"] is True
    assert r["p95_within_rank_eps"] is True
