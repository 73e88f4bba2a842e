"""Data-quality checker: violation semantics (not-TRUE = violation),
single-scan evaluation, uniqueness and FK counting."""

from pyspark.sql import functions as F

from comlake_core_spark.operators.quality import (
    Rule,
    check,
    fk_violations,
    in_domain,
    in_range,
    matches,
    not_null,
    unique_key,
)
from comlake_core_spark.plans import inspect as P


def _df(spark):
    rows = [
        (1, 10.0, "A", "ok-1"),
        (2, -5.0, "B", "ok-2"),   # range violation
        (3, None, "A", "bad"),    # null value → range violation; shape violation
        (4, 50.0, "C", "ok-4"),   # domain violation
        (4, 60.0, "A", "ok-5"),   # duplicate id
    ]
    return spark.createDataFrame(rows, "id int, v double, cat string, label string")


def test_check_counts_and_null_semantics(spark):
    df = _df(spark)
    out = {
        r["rule"]: r["n_violations"]
        for r in check(
            df,
            [
                not_null("v"),
                in_range("v", 0, 100),
                in_domain("cat", ("A", "B")),
                matches("label", "^ok-"),
            ],
        ).collect()
    }
    assert out == {
        "not_null_v": 1,
        "range_v": 2,  # -5 out of range AND null not provably in range
        "domain_cat": 1,
        "shape_label": 1,
    }


def test_check_is_single_scan(spark):
    df = _df(spark)
    plan = P.executed_plan(
        check(df, [not_null("v"), in_range("v", 0, 100), in_domain("cat", ("A", "B"))])
    )
    # one aggregate over one source; no joins/unions of repeated scans
    assert plan.count("Scan") <= 1, plan


def test_unique_and_fk(spark):
    df = _df(spark)
    uk = unique_key(df, "id").first()
    assert (uk["rule"], uk["n_violations"]) == ("unique_id", 1)
    dim = spark.createDataFrame([(1,), (2,), (3,)], "k int")
    fk = fk_violations(df, "id", dim, "k").first()
    assert (fk["rule"], fk["n_violations"]) == ("fk_id", 2)  # the two id=4 rows


def test_observed_check_rides_the_action(spark, tmp_path):
    from comlake_core_spark.operators.quality import observed_check

    df = _df(spark)
    out, obs = observed_check(df, [not_null("v"), in_range("v", 0, 100)])
    # the pipeline's OWN action (a write) produces the metrics — no audit scan
    out.write.mode("overwrite").parquet(str(tmp_path / "sink"))
    got = obs.get
    assert got["_rows"] == 5
    assert got["not_null_v"] == 1
    assert got["range_v"] == 2
    # and the written data is untouched by observation
    assert spark.read.parquet(str(tmp_path / "sink")).count() == 5


def test_custom_rule_and_empty_frame(spark):
    df = _df(spark).filter(F.lit(False))
    out = check(df, [Rule("v_gt_cat_len", F.col("v") > F.length("cat"))]).first()
    assert out["n_violations"] == 0  # empty frame: sum() is null → 0 via cast path


def test_mad_outliers_robust_to_heavy_tail(spark):
    from comlake_core_spark.operators.quality import mad_outliers

    # group "a": 1..9 plus one extreme value.  median = 5.5, deviations
    # 0.5..4.5 plus 94.5 -> MAD = 2.5; only the extreme exceeds 3*MAD.
    # The stddev z-score would be inflated BY the outlier (~3.0 sigma cut
    # barely flags it); MAD flags exactly it.
    rows = [("a", float(v)) for v in range(1, 10)] + [("a", 100.0)]
    rows += [("b", 2.0), ("b", 2.5), ("b", 3.0)]
    df = spark.createDataFrame(rows, "grp string, value double")
    out = {r["grp"]: r for r in mad_outliers(df, "value", "grp").collect()}
    assert out["a"]["n"] == 10
    assert out["a"]["med_value"] == 5.5
    assert out["a"]["mad_value"] == 2.5
    assert out["a"]["n_outliers"] == 1
    # b: med 2.5, MAD 0.5, no deviation exceeds 1.5
    assert out["b"]["n_outliers"] == 0
