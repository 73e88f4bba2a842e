"""Behavioral tests for the r5 post-window LLM-pipeline operators
(per-source boilerplate stripping, Bloom decontamination, LSH +
Levenshtein verify, vocabulary OOV rate, stupid-backoff bigram LM,
hard-negative mining, balanced shard assignment, matryoshka retrieval).

The driver-contract mirror (test_driver_contract.py) proves Spark ≡
DuckDB on the real tables; these tests pin the SEMANTICS on small
planted inputs where the right answer is known by construction — the
property the oracle alone can't state (both engines could agree on a
wrong algorithm).
"""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# boilerplate stripping
# ---------------------------------------------------------------------------


def test_strip_boilerplate_removes_high_df_lines_per_source(spark):
    from comlake_core_spark.operators.dedup import strip_boilerplate

    # source A: 3 docs sharing the banner line "cookie banner"; source B:
    # one doc with the SAME line — must survive there (per-source scope).
    rows = [
        (1, "cookie banner alpha beta", "A"),
        (2, "cookie banner gamma delta", "A"),
        (3, "cookie banner epsilon zeta", "A"),
        (4, "cookie banner eta theta", "B"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    out = {
        r["doc_id"]: r
        for r in strip_boilerplate(df, words_per_line=2, min_docs=3).collect()
    }
    assert out[1]["n_lines"] == 2 and out[1]["n_kept"] == 1
    assert out[4]["n_kept"] == 2  # same line, different source: kept
    # the surviving text of doc 1 is exactly its second line
    assert out[1]["kept_text_md5"] == hashlib.md5(b"alpha beta").hexdigest()
    assert out[4]["kept_text_md5"] == hashlib.md5(b"cookie banner eta theta").hexdigest()


def test_strip_boilerplate_in_doc_repeat_votes_once(spark):
    from comlake_core_spark.operators.dedup import strip_boilerplate

    # one doc repeats the line 5 times — df is DISTINCT docs, so with
    # min_docs=2 a single doc can never turn its own refrain into
    # boilerplate
    df = spark.createDataFrame(
        [(1, " ".join(["x y"] * 5), "A")], "doc_id long, text string, source string"
    )
    (row,) = strip_boilerplate(df, words_per_line=2, min_docs=2).collect()
    assert row["n_kept"] == row["n_lines"] == 5


# ---------------------------------------------------------------------------
# bloom decontamination
# ---------------------------------------------------------------------------


def test_bloom_decontaminate_counts_and_fp_audit(spark):
    from comlake_core_spark.operators.dedup import bloom_decontaminate

    eval_df = spark.createDataFrame(
        [(100, "the quick brown fox jumps")], "doc_id long, text string"
    )
    train = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over"),  # grams 1&2; gram 1 is eval's
            (2, "совершенно unrelated words here entirely now"),
        ],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r for r in bloom_decontaminate(train, eval_df, n=5).collect()}
    assert out[1]["n_grams"] == 2
    assert out[1]["n_true_hits"] == 1
    # bloom must contain every true hit (no false negatives, ever)
    assert out[1]["n_bloom_hits"] >= out[1]["n_true_hits"]
    assert out[1]["n_false_pos"] == out[1]["n_bloom_hits"] - out[1]["n_true_hits"]
    assert out[2]["n_true_hits"] == 0


def test_bloom_no_false_negatives_many_grams(spark):
    from comlake_core_spark.operators.dedup import bloom_decontaminate

    # train doc 0 IS the eval doc (verbatim leak): every gram must hit
    text = " ".join(f"w{i}" for i in range(40))
    eval_df = spark.createDataFrame([(0, text)], "doc_id long, text string")
    train = spark.createDataFrame([(1, text)], "doc_id long, text string")
    (row,) = bloom_decontaminate(train, eval_df, n=5).collect()
    assert row["n_grams"] == 36
    assert row["n_true_hits"] == 36
    assert row["n_bloom_hits"] == 36 and row["n_false_pos"] == 0


# ---------------------------------------------------------------------------
# LSH + levenshtein verify
# ---------------------------------------------------------------------------


def test_lsh_edit_verify_scores_candidates(spark):
    from comlake_core_spark.operators.dedup import lsh_edit_verify

    base = " ".join(f"tok{i}" for i in range(40))
    near = base.replace("tok7", "tokX")  # one-token revision
    far = " ".join(f"other{i}" for i in range(40))
    df = spark.createDataFrame(
        [(1, base), (2, near), (3, far)], "doc_id long, text string"
    )
    rows = lsh_edit_verify(df, threshold=0.5, prefix=500).collect()
    assert [(r["id_a"], r["id_b"]) for r in rows] == [(1, 2)]
    (r,) = rows
    assert r["lev_prefix"] == 1  # '7' -> 'x' in the lowercased prefix
    assert r["edit_sim"] == pytest.approx(1 - 1 / len(base), abs=1e-6)
    assert 0.5 <= r["jaccard"] < 1.0


# ---------------------------------------------------------------------------
# OOV rate
# ---------------------------------------------------------------------------


def test_oov_rate_against_pruned_vocab(spark):
    from comlake_core_spark.operators.text.corpus_stats import oov_rate

    rows = [
        (1, "a a a b b c", "s1"),   # freq: a=3(+2 below)=5? counts are global
        (2, "a a rare1 rare2", "s2"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string, source string")
    # global counts: a=5, b=2, c=1, rare1=1, rare2=1 -> top2 = {a, b}
    out = {r["source"]: r for r in oov_rate(df, vocab_size=2).collect()}
    assert out["s1"]["n_tokens"] == 6 and out["s1"]["n_oov"] == 1  # 'c'
    assert out["s1"]["n_distinct_oov"] == 1
    assert out["s2"]["n_oov"] == 2 and out["s2"]["n_distinct_oov"] == 2
    assert out["s2"]["oov_rate"] == pytest.approx(0.5)


def test_oov_rate_tie_breaks_on_token(spark):
    from comlake_core_spark.operators.text.corpus_stats import oov_rate

    # b and c tie at 2; vocab_size=2 must pick {a, b} (token asc)
    df = spark.createDataFrame(
        [(1, "a a a b b c c", "s")], "doc_id long, text string, source string"
    )
    (row,) = oov_rate(df, vocab_size=2).collect()
    assert row["n_oov"] == 2  # the two c's


# ---------------------------------------------------------------------------
# stupid-backoff bigram LM
# ---------------------------------------------------------------------------


def test_bigram_backoff_paths(spark):
    from comlake_core_spark.operators.text.lm import bigram_backoff_logprob

    lm = spark.createDataFrame([(0, "x y x y")], "doc_id long, text string")
    # LM: uni x=2 y=2 N=4 V=2; bigrams: (x,y)=2, (y,x)=1
    score = spark.createDataFrame([(1, "x y z")], "doc_id long, text string")
    (row,) = bigram_backoff_logprob(score, lm).collect()
    assert row["n_tokens"] == 3
    # token 1 'x': first -> ln(P1(x)) = ln(3/7)
    # token 2 'y' after x: bigram hit -> ln(2/2) = 0
    # token 3 'z' after y: no bigram (y,z) -> backoff ln(0.4 * P1(z)) = ln(0.4 * 1/7)
    assert row["n_backoff"] == 1
    expected = (
        round(math.log(3 / 7), 9) + 0.0 + round(math.log(0.4 * 1 / 7), 9)
    ) / 3
    assert row["avg_logprob"] == pytest.approx(expected, abs=1e-9)


def test_bigram_backoff_self_scoring_never_backs_off(spark):
    from comlake_core_spark.operators.text.lm import bigram_backoff_logprob

    df = spark.createDataFrame(
        [(0, "p q r p q"), (1, "q r p")], "doc_id long, text string"
    )
    rows = bigram_backoff_logprob(df, df).collect()
    # scoring the LM's own corpus: every adjacent pair was counted
    assert all(r["n_backoff"] == 0 for r in rows)


# ---------------------------------------------------------------------------
# matryoshka retrieval
# ---------------------------------------------------------------------------


def test_matryoshka_truncation_changes_ranking_and_flags_recall(spark):
    from comlake_core_spark.operators.similarity import matryoshka_topk

    # 4-dim vectors, truncate to first 2: a's truncated prefix matches q
    # exactly; b only wins on the full vector
    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),        # query
        (1, [1.0, 0.0, 5.0, 0.0]),        # prefix-aligned, full cosine low
        (2, [0.9, 0.1, 0.0, 0.0]),        # close in both
        (3, [0.0, 1.0, 0.0, 0.0]),        # orthogonal
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = {r["nbr_id"]: r for r in matryoshka_topk(emb, q, k=2, dims=2).collect()}
    # truncated: self (vec 0) and vec 1's prefix [1,0] both at cosine 1.0;
    # tie-break on nbr_id -> self rank 1, vec 1 rank 2
    assert out[0]["rn"] == 1
    assert out[1]["rn"] == 2 and out[1]["trunc_cosine"] == pytest.approx(1.0)
    # full-dim top-2 is {0 (self), 2}: vec 1's third component drags its
    # full cosine down — the flag records exactly that disagreement
    assert out[0]["in_full_topk"] is True
    assert out[1]["in_full_topk"] is False


# ---------------------------------------------------------------------------
# hard negatives
# ---------------------------------------------------------------------------


def test_hard_negatives_excludes_near_duplicates(spark):
    from comlake_core_spark.operators.similarity import hard_negatives

    rows = [
        (1, [1.0, 0.0, 0.0]),
        (2, [1.0, 0.0, 0.0]),      # exact duplicate of 1
        (3, [0.8, 0.6, 0.0]),      # close to 1/2 but below 0.9? cos=0.8
        (4, [0.0, 0.0, 1.0]),      # far from everything
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {(r["id_a"], r["id_b"]) for r in hard_negatives(emb, k=2, dup_threshold=0.9).collect()}
    assert (1, 2) not in got           # duplicate pair removed
    assert (1, 3) in got and (2, 3) in got  # hard negatives survive


# ---------------------------------------------------------------------------
# global row number / shard assignment
# ---------------------------------------------------------------------------


def test_global_row_number_matches_total_order(spark):
    from comlake_core_spark.operators.sampling import global_row_number

    import random

    rng = random.Random(3)
    rows = [(i, rng.randint(0, 50)) for i in range(500)]
    df = spark.createDataFrame(rows, "id long, w long")
    ranked = global_row_number(
        df, [F.col("w").desc(), F.col("id").asc()], out="rank", num_partitions=7
    )
    got = {r["id"]: r["rank"] for r in ranked.collect()}
    expect = {
        rid: i + 1
        for i, (rid, _) in enumerate(sorted(rows, key=lambda t: (-t[1], t[0])))
    }
    assert got == expect


def test_global_row_number_has_no_single_partition_window(spark):
    from comlake_core_spark.operators.sampling import global_row_number

    df = spark.range(100).select(F.col("id"), (F.col("id") * 7 % 13).alias("w"))
    ranked = global_row_number(df, [F.col("w").desc(), F.col("id").asc()])
    plan = ranked._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "rank must be map-side, not a global window"


def test_assign_shards_balances_and_partitions_fully(spark):
    from comlake_core_spark.operators.sampling import assign_shards

    rows = [(i, (i * 37) % 100 + 1) for i in range(160)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = assign_shards(df, n_shards=8).collect()
    assert len(out) == 8
    assert sum(r["n_docs"] for r in out) == 160
    assert all(r["n_docs"] == 20 for r in out)
    totals = [r["total_tokens"] for r in out]
    # round-robin over the size-sorted order keeps shards tight: the
    # spread is bounded by the largest doc size
    assert max(totals) - min(totals) <= 100


# ---------------------------------------------------------------------------
# consistent pseudonymization
# ---------------------------------------------------------------------------


def test_pseudonymize_stable_and_domain_separated(spark):
    from comlake_core_spark.operators.text.pii import pseudonymize

    df = spark.createDataFrame(
        [(1, "alice"), (2, "alice"), (3, "bob")], "k long, name string"
    )
    out = pseudonymize(df, {"name": "name"}, secret="s").collect()
    toks = {r["k"]: r["name"] for r in out}
    assert toks[1] == toks[2] != toks[3]          # consistent
    assert "alice" not in toks[1] and len(toks[1]) == 12
    # same value under a different domain yields a different token
    other = pseudonymize(df, {"name": "other"}, secret="s").collect()[0]["name"]
    assert other != toks[1]
    # rotating the secret re-keys everything
    rot = pseudonymize(df, {"name": "name"}, secret="s2").collect()[0]["name"]
    assert rot != toks[1]


def test_pseudonymize_preserves_joins(spark):
    from comlake_core_spark.operators.text.pii import pseudonymize

    left = spark.createDataFrame([(1, "x"), (2, "y")], "ck long, v string")
    right = spark.createDataFrame([(1, 10), (1, 20), (2, 5)], "ck long, amt long")
    pl = pseudonymize(left, {"ck": "custkey"})
    pr = pseudonymize(right, {"ck": "custkey"})
    got = {
        r["v"]: r["s"]
        for r in pl.join(pr, "ck").groupBy("v").agg(F.sum("amt").alias("s")).collect()
    }
    assert got == {"x": 30, "y": 5}


# ---------------------------------------------------------------------------
# review regressions (r5 post-window code review findings)
# ---------------------------------------------------------------------------


def test_hard_negatives_excludes_dups_lsh_would_miss(spark):
    """A cosine-0.931 pair that hyperplane LSH buckets apart must still
    be excluded: the operator filters the edge's own exact cosine, not
    an LSH-recalled dup set (review finding #1)."""
    from comlake_core_spark.operators.similarity import hard_negatives

    a = [1.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    b = [0.93, 0.3676955262170047, 0.0, 0.0, 0.0, 0.0, 0.0, 0.0]  # cos(a,b)=0.93
    far = [0.0, 0.0, 1.0, 0.0, 0.0, 0.0, 0.0, 0.0]
    emb = spark.createDataFrame(
        [(1, a), (2, b), (3, far)], "vec_id long, embedding array<double>"
    )
    got = {(r["id_a"], r["id_b"]) for r in hard_negatives(emb, k=2, dup_threshold=0.9).collect()}
    assert (1, 2) not in got


def test_pseudonymize_null_stays_null(spark):
    from comlake_core_spark.operators.text.pii import pseudonymize

    df = spark.createDataFrame(
        [(1, "x"), (2, None), (3, None)], "k long, v string"
    )
    toks = {r["k"]: r["v"] for r in pseudonymize(df, {"v": "d"}).collect()}
    assert toks[2] is None and toks[3] is None  # no shared NULL token
    assert toks[1] is not None
    # and a join on the pseudonymized column must NOT match NULL keys
    left = pseudonymize(df, {"v": "d"})
    assert left.join(left.withColumnRenamed("k", "k2"), "v").filter(
        F.col("k") != F.col("k2")
    ).count() == 0


def test_matryoshka_zero_prefix_ranks_last(spark):
    from comlake_core_spark.operators.similarity import matryoshka_topk

    rows = [
        (0, [1.0, 0.0, 0.0, 0.0]),
        (1, [0.0, 0.0, 7.0, 7.0]),  # zero 2-dim prefix: NaN without the guard
        (2, [0.9, 0.1, 0.0, 0.0]),
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    q = emb.filter(F.col("vec_id") == 0).select(
        F.col("vec_id").alias("query_id"), "embedding"
    )
    out = {r["nbr_id"]: r for r in matryoshka_topk(emb, q, k=3, dims=2).collect()}
    assert out[1]["trunc_cosine"] == -2.0      # sentinel, not NaN
    assert out[1]["rn"] == 3                   # degenerate row ranks LAST
    assert out[0]["rn"] == 1 and out[2]["rn"] == 2


def test_bfs_depth_attribution_preserves_string_ids(spark):
    from comlake_core_spark.operators.dedup import bfs_depth

    pairs = spark.createDataFrame(
        [("a", "b"), ("b", "c")], "id_a string, id_b string"
    )
    got = {
        r["node"]: r["nearest_seed"]
        for r in bfs_depth(
            pairs, lambda n: n == F.lit("a"), iterations=2, attribute_seed=True
        ).collect()
    }
    assert got == {"a": "a", "b": "a", "c": "a"}  # not silently NULL


def test_strip_boilerplate_and_oov_explode_corpus_once(spark):
    """Review findings #5/#6: the corpus must be scanned+exploded exactly
    once — the df side must not re-derive the token/line stream."""
    from comlake_core_spark.operators.dedup import strip_boilerplate
    from comlake_core_spark.operators.text.corpus_stats import oov_rate

    df = spark.createDataFrame(
        [(1, "a b c d", "s"), (2, "a b x y", "s")],
        "doc_id long, text string, source string",
    )
    plan = strip_boilerplate(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Generate") == 1
    # oov_rate: the explode lives only inside the materialized (source,
    # term) count relation — since r14 a lazy localCheckpoint cut rather
    # than a cache (OPTIMIZATION_r14.md Change 5), so it appears as a
    # Scan ExistingRDD read twice, and NO Generate survives in the final
    # plan (the one explode runs behind the cut, exactly once)
    plan2 = oov_rate(df)._jdf.queryExecution().executedPlan().toString()
    assert plan2.count("Scan ExistingRDD") == 2, plan2
    assert plan2.count("Generate") == 0, plan2


# ---------------------------------------------------------------------------
# temperature mixture
# ---------------------------------------------------------------------------


def test_temperature_alpha_flattens_quotas(spark):
    from comlake_core_spark.operators.sampling import mixture_resample

    # head domain has 9x the tokens of the tail; quotas out of 100:
    # alpha=1 -> proportional (90/10); alpha=0 -> uniform (50/50);
    # alpha=0.3 sits between, far flatter than proportional
    rows = [("head", i, 90) for i in range(100)] + [("tail", 1000 + i, 10) for i in range(100)]
    df = spark.createDataFrame(rows, "lang string, doc_id long, n_tokens long")

    def quotas(alpha):
        out = mixture_resample(df, ["lang"], target_docs=100, alpha=alpha)
        return {r["lang"]: r["quota"] for r in out.collect()}

    q1 = quotas(1.0)
    assert q1 == {"head": 90, "tail": 10}
    q0 = quotas(0.0)
    assert q0 == {"head": 50, "tail": 50}
    q03 = quotas(0.3)
    assert 50 < q03["head"] < 90 and q03["head"] + q03["tail"] == 100
    # default stays the sqrt special case: 3:1 weight ratio -> 75/25
    q05 = quotas(0.5)
    assert q05 == {"head": 75, "tail": 25}


# ---------------------------------------------------------------------------
# winsorization
# ---------------------------------------------------------------------------


def test_winsorize_clips_tails_only(spark):
    from comlake_core_spark.operators.quality import winsorize_groups

    # 20 values 1..19 plus one huge outlier; p=0.05 -> k_lo=1, k_hi=19:
    # lo = min, hi = 19th smallest (=19), the outlier clips to 19
    rows = [("g", float(v)) for v in range(1, 20)] + [("g", 1000.0)]
    df = spark.createDataFrame(rows, "grp string, value double")
    (r,) = winsorize_groups(df, "value", "grp", p=0.05).collect()
    assert r["n"] == 20
    assert r["lo_value"] == 1.0 and r["hi_value"] == 19.0
    assert r["n_clipped_low"] == 0 and r["n_clipped_high"] == 1
    # winsorized mean: (sum(1..19) + 19) / 20 = (190 + 19) / 20 = 10.45
    assert r["winsorized_mean"] == pytest.approx(10.45)


def test_winsorize_nearest_rank_no_interpolation(spark):
    from comlake_core_spark.operators.quality import winsorize_groups

    # 10 values: ceil(0.05*10)=1 -> lo = min; ceil(0.95*10)=10 -> hi = max
    # (nearest-rank semantics: nothing clips for n=10 at p=0.05)
    rows = [("g", float(v)) for v in [5, 1, 9, 3, 7, 2, 8, 4, 6, 10]]
    df = spark.createDataFrame(rows, "grp string, value double")
    (r,) = winsorize_groups(df, "value", "grp", p=0.05).collect()
    assert r["lo_value"] == 1.0 and r["hi_value"] == 10.0
    assert r["n_clipped_low"] == r["n_clipped_high"] == 0


# ---------------------------------------------------------------------------
# k-anonymity
# ---------------------------------------------------------------------------


def test_k_anonymity_generalization_reduces_risk(spark):
    from comlake_core_spark.operators.quality import k_anonymity_audit

    # fine level: (seg, city) has two singleton classes; coarse level
    # (seg only) merges them into classes of >= k
    rows = (
        [("A", "x", i) for i in range(4)]
        + [("A", "y", 100)]            # singleton at fine level
        + [("B", "z", i) for i in range(5)]
    )
    df = spark.createDataFrame(rows, "seg string, city string, uid long")
    out = {
        r["level"]: r
        for r in k_anonymity_audit(
            df, {"fine": ["seg", "city"], "coarse": ["seg"]}, k=5
        ).collect()
    }
    assert out["fine"]["n_classes"] == 3
    assert out["fine"]["n_below_k"] == 2          # (A,x)=4 and (A,y)=1
    assert out["fine"]["rows_at_risk"] == 5
    assert out["fine"]["min_class_size"] == 1
    assert out["coarse"]["n_below_k"] == 0        # A=5, B=5 both reach k
    assert out["coarse"]["rows_at_risk"] == 0


# ---------------------------------------------------------------------------
# curriculum ordering
# ---------------------------------------------------------------------------


def test_curriculum_orders_buckets_short_to_long(spark):
    from comlake_core_spark.operators.sampling import curriculum_order

    rows = [(1, 10), (2, 260), (3, 40), (4, 120), (5, 70)]
    df = spark.createDataFrame(rows, "doc_id long, n_tokens long")
    out = sorted(curriculum_order(df, bucket_width=50).collect(), key=lambda r: r["position"])
    # buckets: 10//50=0, 40//50=0, 70//50=1, 120//50=2, 260//50=5
    assert [r["bucket"] for r in out] == [0, 0, 1, 2, 5]
    assert [r["position"] for r in out] == [1, 2, 3, 4, 5]
    # short bucket first regardless of hash, long doc strictly last
    assert out[-1]["doc_id"] == 2
    # rerun is byte-identical (deterministic shuffle)
    again = sorted(curriculum_order(df, bucket_width=50).collect(), key=lambda r: r["position"])
    assert [tuple(r) for r in again] == [tuple(r) for r in out]
