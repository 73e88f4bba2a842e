"""r8 operator units: forward as-of join, prefix-filtered containment,
Gopher top-gram fractions — small known-answer frames (the sf oracle
gate covers the corpus-scale behavior; these pin the semantics)."""

from __future__ import annotations

import datetime as dt

import pytest
from pyspark.sql import functions as F

from comlake_core_spark.operators.dedup import containment_pairs_prefix
from comlake_core_spark.operators.temporal import asof_join


def _ts(s: str):
    return dt.datetime.fromisoformat(s)


@pytest.fixture()
def lr(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "a"),
         (2, _ts("2024-01-01T12:00:00"), "a"),
         (3, _ts("2024-01-01T23:00:00"), "a"),
         (4, _ts("2024-01-01T10:30:00"), "b")],
        "id long, ts timestamp_ntz, k string",
    )
    right = spark.createDataFrame(
        [(_ts("2024-01-01T12:00:00"), "a", 100),
         (_ts("2024-01-01T15:00:00"), "a", 200),
         (_ts("2024-01-01T09:00:00"), "b", 300)],
        "ts timestamp_ntz, k string, v int",
    )
    return left, right


def test_asof_forward_picks_nearest_at_or_after(lr):
    left, right = lr
    out = {
        r["id"]: (r["asof_ts"], r["v"])
        for r in asof_join(left, right, on="k", direction="forward").collect()
    }
    assert out[1] == (_ts("2024-01-01T12:00:00"), 100)  # nearest later
    assert out[2] == (_ts("2024-01-01T12:00:00"), 100)  # inclusive at equality
    assert out[3] == (None, None)                       # nothing after 23:00
    assert out[4] == (None, None)                       # b's only row is EARLIER


def test_asof_forward_inner_drops_unmatched(lr):
    left, right = lr
    ids = {r["id"] for r in asof_join(left, right, on="k", direction="forward",
                                      how="inner").collect()}
    assert ids == {1, 2}


def test_asof_backward_unchanged(lr):
    left, right = lr
    out = {
        r["id"]: r["v"]
        for r in asof_join(left, right, on="k").collect()
    }
    assert out == {1: None, 2: 100, 3: 200, 4: 300}


def test_asof_rejects_unknown_direction(lr):
    left, right = lr
    with pytest.raises(ValueError, match="direction"):
        asof_join(left, right, on="k", direction="sideways")


def test_containment_catches_lsh_blind_spot(spark):
    """A short doc embedded verbatim in a much longer one: containment
    1.0 but Jaccard far below any banding threshold — the case the
    operator exists for."""
    quote = "the quick brown fox jumps over the lazy dog"
    filler = " ".join(f"filler{i} token{i} pad{i}" for i in range(30))
    docs = spark.createDataFrame(
        [(1, quote), (2, f"{filler} {quote} {filler}"),
         (3, "an unrelated document about columnar storage engines")],
        "doc_id long, text string",
    )
    got = {
        (r["src_id"], r["dst_id"]): r["containment"]
        for r in containment_pairs_prefix(docs, threshold=0.8).collect()
    }
    assert got.get((1, 2)) == 1.0     # the quote is fully contained
    assert (2, 1) not in got          # big doc is NOT contained in the quote
    assert all(3 not in pair for pair in got)


def test_containment_prefix_is_exact_vs_bruteforce(spark):
    """Prefix filtering must lose nothing: compare against the brute
    force over all ordered pairs on a mixed corpus."""
    rows = [
        (i, " ".join(f"w{(i * 7 + j) % 23}" for j in range(5 + i % 9)))
        for i in range(24)
    ] + [(100, "w1 w2 w3 w4 w5 w6"), (101, "w0 w1 w2 w3 w4 w5 w6 w7 w8 w9")]
    docs = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        (r["src_id"], r["dst_id"]): round(r["containment"], 9)
        for r in containment_pairs_prefix(docs, threshold=0.6).collect()
    }
    from comlake_core_spark.operators.dedup import shingles

    sh = {
        r["doc_id"]: set(r["s"])
        for r in docs.select("doc_id", shingles(F.col("text"), 3).alias("s")).collect()
    }
    want = {}
    for a, sa in sh.items():
        for b, sb in sh.items():
            if a != b and sa and len(sa & sb) / len(sa) >= 0.6:
                want[(a, b)] = round(len(sa & sb) / len(sa), 9)
    assert got == want


def test_containment_max_df_bounds_candidates_and_stays_exact(spark):
    """VERDICT r8 #3: a boilerplate gram shared by every doc meets a
    corpus-sized posting list without the cap; with max_df the gram
    leaves the shingle universe, candidate volume collapses, and the
    result is EXACT containment over the capped universe."""
    from comlake_core_spark.operators.dedup import containment_candidates, shingles

    # pure-boilerplate docs are the worst case: frequency-ascending
    # prefixes can't dodge hot grams when EVERY gram is hot, so each
    # prefix gram meets a corpus-sized posting list
    boiler = "copyright acme corp all rights reserved do not redistribute"
    n = 30
    rows = [(i, boiler) for i in range(n)]
    rows += [
        (200, "unique7 body7 tail7 extra7 alpha beta"),
        (201, "unique7 body7 tail7 extra7 alpha beta more words here"),
    ]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    uncapped = containment_candidates(docs, threshold=0.8).count()
    capped = containment_candidates(docs, threshold=0.8, max_df=5).count()
    # boilerplate family: n×(n−1) ordered candidate pairs without the cap;
    # with it those grams leave the universe and only the unique family
    # generates candidates
    assert uncapped >= n * (n - 1)
    assert capped < n

    got = {
        (r["src_id"], r["dst_id"]): round(r["containment"], 9)
        for r in containment_pairs_prefix(docs, threshold=0.8, max_df=5).collect()
    }
    # brute-force oracle over the SAME capped universe
    sh = {
        r["doc_id"]: set(r["s"])
        for r in docs.select("doc_id", shingles(F.col("text"), 3).alias("s")).collect()
    }
    from collections import Counter

    df_count = Counter(g for s in sh.values() for g in s)
    capped_sh = {i: {g for g in s if df_count[g] <= 5} for i, s in sh.items()}
    want = {}
    for a, sa in capped_sh.items():
        for b, sb in capped_sh.items():
            if a != b and sa and len(sa & sb) / len(sa) >= 0.8:
                want[(a, b)] = round(len(sa & sb) / len(sa), 9)
    assert got == want and (200, 201) in got

    # hot_strategy='join' (the shuffle-bounded shape for corpus-scale
    # hot sets, review r10 #5) must produce the identical capped answer
    # on a BINDING cap — and on a non-binding one
    got_join = {
        (r["src_id"], r["dst_id"]): round(r["containment"], 9)
        for r in containment_pairs_prefix(
            docs, threshold=0.8, max_df=5, hot_strategy="join"
        ).collect()
    }
    assert got_join == want
    nb_b = {tuple(r) for r in containment_pairs_prefix(docs, threshold=0.8, max_df=500).collect()}
    nb_j = {
        tuple(r)
        for r in containment_pairs_prefix(
            docs, threshold=0.8, max_df=500, hot_strategy="join"
        ).collect()
    }
    assert nb_b == nb_j
    with pytest.raises(ValueError, match="hot_strategy"):
        containment_pairs_prefix(docs, threshold=0.8, max_df=5, hot_strategy="nope").collect()


def test_containment_exact_threshold_pair_survives_float_ceil(spark):
    """ADVICE r8: a pair at EXACTLY the threshold must be found — the
    epsilon-guarded ceil keeps the prefix long enough even when the
    double product t*gc rounds above the exact integer."""
    # src has 10 grams, dst shares exactly 7 → containment 0.7 exactly
    src_words = [f"s{i} s{i} s{i}" for i in range(0)]  # placeholder
    # build docs from explicit 3-gram-disjoint word runs: with k=3,
    # "a0 a0 a0 b1 b1 b1 ..." is hard to control; use single-gram docs
    # via 3-token runs instead: each 3 identical tokens give 1 gram run
    # — simpler: craft texts whose shingle sets we verify directly
    from comlake_core_spark.operators.dedup import shingles as _sh

    t1 = " ".join(f"w{i}" for i in range(12))          # 10 grams w0..w9
    t2 = " ".join(f"w{i}" for i in range(9)) + " x y z w"  # shares 7 grams
    docs = spark.createDataFrame([(1, t1), (2, t2)], "doc_id long, text string")
    sets = {r["doc_id"]: set(r["s"]) for r in docs.select("doc_id", _sh(F.col("text"), 3).alias("s")).collect()}
    inter = len(sets[1] & sets[2])
    thr = inter / len(sets[1])  # exactly at threshold for src=1
    got = {
        (r["src_id"], r["dst_id"])
        for r in containment_pairs_prefix(docs, threshold=thr).collect()
    }
    assert (1, 2) in got
