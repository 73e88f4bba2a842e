"""Property-based checks for the corpus-statistics operators against
pure-Python references: random small corpora executed by Spark and by an
obviously-correct Python model, compared exactly.

The DuckDB oracles pin each workload's registered shape; these fuzz the
OPERATORS across input space — empty docs, single-token docs, docs shorter
than the gram order / MATTR window, all-duplicate vocabularies — where
empty-token filtering, short-doc branches, and tie-breaking live."""

from __future__ import annotations

import math
import re
from collections import Counter

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

WORDS = ["a", "bb", "ccc", "dd", "e", "ffff"]
doc_strategy = st.lists(st.sampled_from(WORDS), min_size=0, max_size=20).map(" ".join)
corpus_strategy = st.lists(doc_strategy, min_size=1, max_size=6)

SLOW = settings(
    max_examples=12,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow, HealthCheck.function_scoped_fixture],
)


def _toks(text: str) -> list[str]:
    return [t for t in re.split(r"\s+", text.strip().lower()) if t]


def _frame(spark, docs):
    return spark.createDataFrame(
        [(i, t, "s") for i, t in enumerate(docs)], "doc_id long, text string, source string"
    )


@given(corpus_strategy)
@SLOW
def test_ngram_diversity_matches_reference(spark, docs):
    from comlake_core_spark.operators.text.corpus_stats import ngram_diversity

    got = {r["n"]: (r["distinct_grams"], r["total_grams"]) for r in ngram_diversity(_frame(spark, docs)).collect()}
    for n in (1, 2, 3):
        grams = []
        for d in docs:
            t = _toks(d)
            grams += [" ".join(t[i : i + n]) for i in range(len(t) - n + 1)]
        if grams:
            assert got[n] == (len(set(grams)), len(grams))
        else:
            assert n not in got


@given(corpus_strategy, st.integers(min_value=1, max_value=5))
@SLOW
def test_mattr_matches_reference(spark, docs, window):
    from comlake_core_spark.operators.text.corpus_stats import mattr

    per_doc = []
    for d in docs:
        t = _toks(d)
        if not t:
            continue
        if len(t) < window:
            per_doc.append(len(set(t)) / len(t))
        else:
            n_w = len(t) - window + 1
            per_doc.append(
                sum(len(set(t[i : i + window])) for i in range(n_w)) / (n_w * window)
            )
    rows = mattr(_frame(spark, docs), window=window).collect()
    if not per_doc:
        assert rows == []
        return
    got = rows[0]
    assert got["n_docs"] == len(per_doc)
    expect = sum(round(m, 9) for m in per_doc) / len(per_doc)
    assert got["avg_mattr"] == pytest.approx(expect, abs=1e-9)


@given(corpus_strategy)
@SLOW
def test_vocab_coverage_matches_reference(spark, docs):
    from comlake_core_spark.operators.text.corpus_stats import vocab_coverage

    counts = Counter()
    for d in docs:
        counts.update(_toks(d))
    rows = vocab_coverage(_frame(spark, docs)).collect()
    got = {r["threshold"]: (r["vocab_needed"], r["coverage"]) for r in rows}
    if not counts:
        assert all(v == (None, None) for v in got.values())
        return
    ordered = sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))
    total = sum(counts.values())
    cum, shares = 0, []
    for _, c in ordered:
        cum += c
        shares.append(cum / total)
    for thr in (0.5, 0.9, 0.95, 0.99):
        rank = next(i + 1 for i, s in enumerate(shares) if s >= thr)
        assert got[thr][0] == rank
        assert got[thr][1] == pytest.approx(shares[rank - 1], abs=1e-12)


@given(st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=60),
       st.lists(st.integers(min_value=0, max_value=500), min_size=1, max_size=60))
@SLOW
def test_kmv_exhaustive_matches_exact_counts(spark, a_keys, b_keys):
    from comlake_core_spark.operators.sketches import kmv_join_cardinality

    a = spark.createDataFrame([(k,) for k in a_keys], "ka long")
    b = spark.createDataFrame([(k,) for k in b_keys], "kb long")
    row = kmv_join_cardinality(a, "ka", b, "kb", k=1024).collect()[0]
    da, db = len(set(a_keys)), len(set(b_keys))
    di = len(set(a_keys) & set(b_keys))
    assert (row["exact_a"], row["exact_b"], row["exact_intersection"]) == (da, db, di)
    # < k distinct on both sides: sketches exhaustive, estimates exact
    assert row["est_a"] == float(da) and row["est_b"] == float(db)
    assert row["est_intersection"] == pytest.approx(float(di))
    if di == 0:
        # relative error is undefined on an empty true intersection
        assert row["rel_err_intersection"] is None


@given(st.lists(st.tuples(st.integers(0, 31), st.integers(0, 31)), min_size=1, max_size=80))
@SLOW
def test_zorder_audit_matches_reference(spark, pts):
    from comlake_core_spark.operators.relational import zorder_audit

    df = spark.createDataFrame(pts, "x long, y long")
    rows = zorder_audit(df, F.col("x"), F.col("y"), bits=5, range_shift=6).collect()

    def z(x, y):
        v = 0
        for i in range(5):
            v |= ((x >> i) & 1) << (2 * i + 1)
            v |= ((y >> i) & 1) << (2 * i)
        return v

    expect = {}
    for x, y in pts:
        zr = z(x, y) >> 6
        cur = expect.setdefault(zr, [0, x, x, y, y])
        cur[0] += 1
        cur[1], cur[2] = min(cur[1], x), max(cur[2], x)
        cur[3], cur[4] = min(cur[3], y), max(cur[4], y)
    got = {r["zrange"]: (r["n_rows"], r["x_min"], r["x_max"], r["y_min"], r["y_max"]) for r in rows}
    assert got == {k: tuple(v) for k, v in expect.items()}
