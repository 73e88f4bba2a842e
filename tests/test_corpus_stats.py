"""Behavioral tests for the r5 corpus-statistics operators (distinct-n
diversity, Zipf OLS fit, tokenizer coverage curve, MATTR) and the
global_running_sum primitive they build on.

The driver-contract mirror proves Spark ≡ DuckDB on the real tables;
these pin the SEMANTICS on small planted inputs where the right answer
is known by construction.
"""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F


# ---------------------------------------------------------------------------
# global_running_sum
# ---------------------------------------------------------------------------


def test_global_running_sum_exact_and_ranked(spark):
    from comlake_core_spark.operators.sampling import global_running_sum

    rows = [(i, (i * 7919) % 100 + 1) for i in range(500)]
    df = spark.createDataFrame(rows, "k long, v long").repartition(13)
    out = global_running_sum(
        df, [F.col("v").desc(), F.col("k").asc()], "v", out="cum", rank_out="rank",
        num_partitions=7,
    ).collect()
    expect = sorted(rows, key=lambda r: (-r[1], r[0]))
    by_rank = sorted(out, key=lambda r: r["rank"])
    acc = 0
    for i, (r, (k, v)) in enumerate(zip(by_rank, expect), start=1):
        acc += v
        assert r["rank"] == i and r["k"] == k and r["cum"] == acc


def test_global_running_sum_no_single_partition_window(spark):
    from comlake_core_spark.operators.sampling import global_running_sum

    df = spark.range(100).select(F.col("id").alias("k"), F.lit(1).alias("v"))
    out = global_running_sum(df, [F.col("k").asc()], "v", out="cum", num_partitions=8)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, "prefix sum must not fall back to a window"


# ---------------------------------------------------------------------------
# ngram diversity
# ---------------------------------------------------------------------------


def test_ngram_diversity_hand_case(spark):
    from comlake_core_spark.operators.text.corpus_stats import ngram_diversity

    # "a b a b": unigrams a,b,a,b -> 2/4; bigrams "a b","b a","a b" -> 2/3;
    # trigrams "a b a","b a b" -> 2/2
    df = spark.createDataFrame([(1, "a b a b", "s")], "doc_id long, text string, source string")
    got = {r["n"]: r for r in ngram_diversity(df).collect()}
    assert (got[1]["distinct_grams"], got[1]["total_grams"]) == (2, 4)
    assert (got[2]["distinct_grams"], got[2]["total_grams"]) == (2, 3)
    assert (got[3]["distinct_grams"], got[3]["total_grams"]) == (2, 2)
    assert got[2]["diversity"] == pytest.approx(2 / 3, abs=1e-9)


def test_ngram_diversity_short_doc_emits_no_long_grams(spark):
    from comlake_core_spark.operators.text.corpus_stats import ngram_diversity

    df = spark.createDataFrame([(1, "solo", "s")], "doc_id long, text string, source string")
    got = {r["n"]: r for r in ngram_diversity(df).collect()}
    assert got[1]["total_grams"] == 1 and 2 not in got and 3 not in got


# ---------------------------------------------------------------------------
# Zipf fit
# ---------------------------------------------------------------------------


def test_zipf_fit_recovers_planted_slope(spark):
    from comlake_core_spark.operators.text.corpus_stats import zipf_fit

    # counts c(r) = round(1000 * r^-1): ln c ~ ln 1000 - 1 * ln r, so the
    # OLS slope over the exact planted points sits near -1.
    words = []
    for r in range(1, 21):
        words += [f"w{r:02d}"] * round(1000 * r**-1.0)
    df = spark.createDataFrame([(1, " ".join(words), "s")], "doc_id long, text string, source string")
    row = zipf_fit(df, top_r=20).collect()[0]
    assert row["n_ranked"] == 20
    assert row["zipf_slope"] == pytest.approx(-1.0, abs=0.02)
    assert row["zipf_intercept"] == pytest.approx(math.log(1000), abs=0.05)


# ---------------------------------------------------------------------------
# vocabulary coverage
# ---------------------------------------------------------------------------


def test_vocab_coverage_crossings(spark):
    from comlake_core_spark.operators.text.corpus_stats import vocab_coverage

    # freqs 50, 30, 15, 5 (total 100): shares .5, .8, .95, 1.0
    text = " ".join(["a"] * 50 + ["b"] * 30 + ["c"] * 15 + ["d"] * 5)
    df = spark.createDataFrame([(1, text, "s")], "doc_id long, text string, source string")
    got = {r["threshold"]: r for r in vocab_coverage(df).collect()}
    assert got[0.5]["vocab_needed"] == 1 and got[0.5]["coverage"] == pytest.approx(0.5)
    assert got[0.9]["vocab_needed"] == 3 and got[0.9]["coverage"] == pytest.approx(0.95)
    assert got[0.95]["vocab_needed"] == 3
    assert got[0.99]["vocab_needed"] == 4 and got[0.99]["coverage"] == pytest.approx(1.0)


# ---------------------------------------------------------------------------
# MATTR
# ---------------------------------------------------------------------------


def test_mattr_short_doc_equals_ttr(spark):
    from comlake_core_spark.operators.text.corpus_stats import mattr

    df = spark.createDataFrame([(1, "x y x", "s")], "doc_id long, text string, source string")
    row = mattr(df, window=50).collect()[0]
    assert row["avg_mattr"] == pytest.approx(2 / 3, abs=1e-9)
    assert row["avg_ttr"] == pytest.approx(2 / 3, abs=1e-9)


def test_mattr_windows_average(spark):
    from comlake_core_spark.operators.text.corpus_stats import mattr

    # window=2 over "a a b": windows (a,a)->1/2, (a,b)->2/2; mattr = 3/4.
    # plain TTR = 2/3 — the two diverge exactly as designed.
    df = spark.createDataFrame([(1, "a a b", "s")], "doc_id long, text string, source string")
    row = mattr(df, window=2).collect()[0]
    assert row["avg_mattr"] == pytest.approx(0.75, abs=1e-9)
    assert row["avg_ttr"] == pytest.approx(2 / 3, abs=1e-9)


def test_mattr_repetition_detected_where_ttr_saturates(spark):
    from comlake_core_spark.operators.text.corpus_stats import mattr

    # looped generation: 30 distinct tokens repeated 10x. Plain TTR = 0.1
    # only because the doc is long; MATTR(window=10) stays high (each
    # 10-window sees mostly distinct tokens) — a diverse-but-looped doc.
    # A truly degenerate doc ("x" * 300) collapses BOTH.
    loop = " ".join([f"t{i}" for i in range(30)] * 10)
    degen = " ".join(["x"] * 300)
    df = spark.createDataFrame(
        [(1, loop, "loop"), (2, degen, "degen")], "doc_id long, text string, source string"
    )
    got = {r["source"]: r for r in mattr(df, window=10).collect()}
    assert got["loop"]["avg_mattr"] == pytest.approx(1.0, abs=1e-9)
    assert got["degen"]["avg_mattr"] == pytest.approx(1 / 10, abs=1e-9)
    assert got["degen"]["avg_ttr"] == pytest.approx(1 / 300, abs=1e-9)


# ---------------------------------------------------------------------------
# portable-MinHash diagnostics
# ---------------------------------------------------------------------------


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_lsh_bucket_skew_flags_degenerate_bucket(spark):
    from comlake_core_spark.operators.dedup import lsh_bucket_skew

    # 20 identical docs + 5 distinct ones: every band has one 20-doc
    # bucket contributing C(20,2)=190 of the pairs.
    rows = [(i, "alpha beta gamma delta epsilon zeta") for i in range(20)]
    rows += [(100 + i, f"unique{i} words here nothing shared {i} x{i} y{i}") for i in range(5)]
    out = lsh_bucket_skew(_docs(spark, rows)).collect()
    assert len(out) == 4
    for r in out:
        assert r["max_bucket"] == 20
        assert r["candidate_pairs"] >= 190
        assert r["top_bucket_pair_share"] >= 190 / (190 + 10)


def test_minhash_calibration_exact_duplicates_land_in_top_bin(spark):
    from comlake_core_spark.operators.dedup import minhash_calibration

    rows = [(1, "one two three four five six seven"), (2, "one two three four five six seven")]
    rows += [(10 + i, f"filler{i} tokens that are all different {i} a{i} b{i}") for i in range(4)]
    out = {r["est_bin"]: r for r in minhash_calibration(_docs(spark, rows)).collect()}
    # the identical pair: estimate 1.0 -> bin 9, true jaccard 1.0, mae 0
    assert 9 in out
    top = out[9]
    assert top["avg_estimate"] == pytest.approx(1.0)
    assert top["avg_true_jaccard"] == pytest.approx(1.0)
    assert top["mae"] == pytest.approx(0.0)


def test_minhash_calibration_estimator_is_plausible_mid_range(spark):
    from comlake_core_spark.operators.dedup import minhash_calibration

    # two docs sharing roughly half their shingles: the estimate must land
    # within 3/12 of the true jaccard (12 hashes -> coarse but unbiased)
    shared = "common one common two common three common four"
    a = shared + " left only tokens here"
    b = shared + " right different suffix now"
    rows = [(1, a), (2, b)]
    out = minhash_calibration(_docs(spark, rows), bands=12, num_hashes=12).collect()
    # bands=12 (1 row/band) guarantees the pair is a candidate
    assert len(out) >= 1
    total_pairs = sum(r["n_pairs"] for r in out)
    assert total_pairs == 1
    r = out[0]
    assert abs(r["avg_estimate"] - r["avg_true_jaccard"]) <= 0.25 + 1e-9


# ---------------------------------------------------------------------------
# KMV join-cardinality sketch
# ---------------------------------------------------------------------------


def test_kmv_exhaustive_sketch_is_exact(spark):
    from comlake_core_spark.operators.sketches import kmv_join_cardinality

    a = spark.range(100).select(F.col("id").alias("ka"))
    b = spark.range(50, 150).select(F.col("id").alias("kb"))
    row = kmv_join_cardinality(a, "ka", b, "kb", k=256).collect()[0]
    # both sides have < k distinct keys: sketches are exhaustive and every
    # estimate must be EXACT
    assert row["est_a"] == 100.0 and row["exact_a"] == 100
    assert row["est_b"] == 100.0 and row["exact_b"] == 100
    assert row["est_intersection"] == 50.0 and row["exact_intersection"] == 50
    assert row["rel_err_intersection"] == 0.0


def test_kmv_estimates_within_sampling_error(spark):
    from comlake_core_spark.operators.sketches import kmv_join_cardinality

    # 4000 vs 3000 keys with 2000 shared; k=256 -> rel std err ~1/sqrt(k)
    # ~6%; assert within 4 sigma (25%)
    a = spark.range(4000).select(F.col("id").alias("ka"))
    b = spark.range(2000, 5000).select(F.col("id").alias("kb"))
    row = kmv_join_cardinality(a, "ka", b, "kb", k=256).collect()[0]
    assert abs(row["est_a"] - 4000) / 4000 < 0.25
    assert abs(row["est_b"] - 3000) / 3000 < 0.25
    assert abs(row["est_intersection"] - 2000) / 2000 < 0.3
    assert row["exact_intersection"] == 2000


# ---------------------------------------------------------------------------
# Z-order audit
# ---------------------------------------------------------------------------


def test_zorder_bounds_both_dims_and_skips(spark):
    from comlake_core_spark.operators.relational import zorder_audit

    # full 32x32 grid: with range_shift=6 every z-range covers exactly a
    # 8x8 tile (64 z-values = 3 low bit-pairs), so both spans are 8 and a
    # query on x in [8,11] skips every range whose tile misses x 8..15...
    grid = spark.range(1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    out = zorder_audit(grid, F.col("x"), F.col("y"), bits=5, range_shift=6).collect()
    assert len(out) == 16
    for r in out:
        assert r["n_rows"] == 64
        assert r["x_span"] == 8 and (r["y_max"] - r["y_min"] + 1) == 8
    # x in [8,11] intersects only the tiles with x_min == 8: 4 of 16 survive
    assert sum(0 if r["skipped_by_query"] else 1 for r in out) == 4


def test_zorder_row_order_layout_never_skips(spark):
    from comlake_core_spark.operators.relational import zorder_audit

    # contrast: bucket by ROW ORDER (y alone), every bucket spans all of x
    grid = spark.range(1024).select(
        (F.col("id") % 32).alias("x"), (F.col("id") / 32).cast("long").alias("y")
    )
    rows = (
        grid.groupBy((F.col("y") / 2).cast("long").alias("bucket"))
        .agg(F.min("x").alias("x_min"), F.max("x").alias("x_max"))
        .collect()
    )
    assert all(r["x_min"] == 0 and r["x_max"] == 31 for r in rows)


# ---------------------------------------------------------------------------
# calibration bins
# ---------------------------------------------------------------------------


def test_calibration_bins_perfectly_calibrated_and_miscalibrated(spark):
    from comlake_core_spark.operators.quality import calibration_bins

    # logits chosen so sigmoid(micro/25e6) lands mid-bin; labels set to the
    # predicted rate in one group (gap ~0) and inverted in the other
    import math

    def micro_for(p):
        return int(round(-25_000_000 * math.log(1 / p - 1)))

    rows_scores, rows_labels = [], []
    doc = 0
    for p, n_pos, n in [(0.85, 17, 20), (0.15, 3, 20)]:
        for i in range(n):
            rows_scores.append((doc, micro_for(p)))
            rows_labels.append((doc, 1 if i < n_pos else 0))
            doc += 1
    s = spark.createDataFrame(rows_scores, "doc_id long, avg_logit_micro long")
    l = spark.createDataFrame(rows_labels, "doc_id long, keep int")
    out = {r["prob_bin"]: r for r in calibration_bins(s, l).collect()}
    assert out[8]["n_docs"] == 20 and out[8]["label_rate"] == pytest.approx(0.85)
    assert out[8]["calibration_gap"] == pytest.approx(0.0, abs=1e-6)
    assert out[1]["label_rate"] == pytest.approx(0.15)
    assert out[1]["calibration_gap"] == pytest.approx(0.0, abs=1e-6)


# ---------------------------------------------------------------------------
# session paths
# ---------------------------------------------------------------------------


def test_session_paths_gap_splits_and_orders(spark):
    from comlake_core_spark.streaming.windows import session_paths

    rows = [
        # user 1: view>click then (after 2h gap) purchase
        (1, "2024-01-01 10:00:00", 1, "view"),
        (2, "2024-01-01 10:10:00", 1, "click"),
        (3, "2024-01-01 13:00:00", 1, "purchase"),
        # user 2: the same view>click shape
        (4, "2024-01-01 09:00:00", 2, "view"),
        (5, "2024-01-01 09:30:00", 2, "click"),
    ]
    df = spark.createDataFrame(
        rows, "event_id long, ts string, user_id long, event_type string"
    ).withColumn("ts", F.to_timestamp("ts"))
    out = {r["path"]: r["n_sessions"] for r in session_paths(df, gap="1 hour").collect()}
    assert out == {"view>click": 2, "purchase": 1}


# ---------------------------------------------------------------------------
# perceptual aHash
# ---------------------------------------------------------------------------


def _png_frame(spark, imgs):
    import pandas as pd

    from comlake_core_spark.operators.codecs import png_encode

    rows = [(str(i), bytearray(png_encode(img, filter_type=1)), {"mime": "image/png", "n_bytes": 0})
            for i, img in enumerate(imgs)]
    return spark.createDataFrame(
        rows, "id string, content binary, meta struct<mime string, n_bytes long>"
    )


def test_ahash_brightness_invariant_structure_sensitive(spark):
    import numpy as np

    from comlake_core_spark.operators.multimodal import perceptual_ahash

    x = np.arange(16)[:, None] + np.zeros(16, dtype=np.int64)[None, :]
    grad = (x + x.T).astype(np.uint8)
    imgs = [grad, (grad + 40).astype(np.uint8), np.abs(x - x.T).astype(np.uint8)]
    out = {r["id"]: r["ahash"] for r in perceptual_ahash(_png_frame(spark, imgs)).collect()}
    assert out["0"] == out["1"], "brightness shift must not change the aHash"
    assert out["0"] != out["2"], "different structure must change the aHash"
    assert len(out["0"]) == 16  # 64 bits as 16 hex chars


# ---------------------------------------------------------------------------
# centroid drift
# ---------------------------------------------------------------------------


def test_centroid_drift_identical_halves_cosine_one(spark):
    from comlake_core_spark.operators.similarity import centroid_drift

    # both halves drawn identically: centroids equal -> cosine 1
    rows = [(i, [float((i // 2) % 5), 1.0, -2.0, 0.5], 0) for i in range(40)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = centroid_drift(df, split=F.col("vec_id") % 2, dim=4).collect()[0]
    assert out["n_a"] == 20 and out["n_b"] == 20
    assert out["drift_cosine"] == pytest.approx(1.0, abs=1e-8)


def test_centroid_drift_orthogonal_halves_cosine_zero(spark):
    from comlake_core_spark.operators.similarity import centroid_drift

    rows = [(i, [1.0, 0.0] if i % 2 == 0 else [0.0, 1.0], 7) for i in range(10)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = centroid_drift(df, split=F.col("vec_id") % 2, dim=2).collect()[0]
    assert out["drift_cosine"] == pytest.approx(0.0, abs=1e-9)


def test_centroid_drift_exact_decimal_sums_no_precision_loss(spark):
    from comlake_core_spark.operators.similarity import centroid_drift

    # 64 dims with tiny components: the chained-decimal formulation lost
    # scale past ~30 adds (caught by the sf0.001 oracle); pin 9-decimal
    # precision survives the full 64-term fold
    import math

    vec_a = [0.000123456 * ((i % 7) + 1) for i in range(64)]
    vec_b = [0.000234567 * ((i % 5) + 1) for i in range(64)]
    rows = [(0, vec_a, 1), (1, vec_b, 1)]
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>, label int")
    out = centroid_drift(df, split=F.col("vec_id") % 2, dim=64).collect()[0]
    num = sum(round(a * b, 9) for a, b in zip(vec_a, vec_b))
    den = math.sqrt(sum(round(a * a, 9) for a in vec_a)) * math.sqrt(
        sum(round(b * b, 9) for b in vec_b)
    )
    assert out["drift_cosine"] == pytest.approx(round(num / den, 9), abs=2e-9)


# ---------------------------------------------------------------------------
# sparse cosine top-k
# ---------------------------------------------------------------------------


def test_sparse_cosine_identical_docs_score_one(spark):
    from comlake_core_spark.operators.text.retrieval import sparse_cosine_topk

    rows = [
        (0, "alpha beta gamma delta"),
        (1, "alpha beta gamma delta"),
        (2, "totally different words here"),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sparse_cosine_topk(df, df.filter(F.col("doc_id") == 0), k=2).collect()
    top = sorted(out, key=lambda r: -r["cosine"])[0]
    assert top["doc_id"] == 1 and top["cosine"] == pytest.approx(1.0, abs=1e-9)


def test_sparse_cosine_df_cap_drops_stopword_only_pairs(spark):
    from comlake_core_spark.operators.text.retrieval import sparse_cosine_topk

    # 'the' appears in every doc; with max_df=2 it is dropped, so docs
    # sharing ONLY 'the' are never candidates
    rows = [(0, "the alpha"), (1, "the beta"), (2, "the alpha")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = sparse_cosine_topk(df, df.filter(F.col("doc_id") == 0), k=3, max_df=2).collect()
    assert [r["doc_id"] for r in out] == [2]


# ---------------------------------------------------------------------------
# burst detection
# ---------------------------------------------------------------------------


def test_burst_detection_counts_sliding_window(spark):
    from comlake_core_spark.workloads import REGISTRY  # noqa: F401  (window expr is inline)

    # user 1: 3 events within 10 min, then a gap, then 1 more; user 2: spread out
    rows = [
        (1, "2024-01-01 10:00:00", 1), (2, "2024-01-01 10:04:00", 1),
        (3, "2024-01-01 10:09:00", 1), (4, "2024-01-01 12:00:00", 1),
        (5, "2024-01-01 09:00:00", 2), (6, "2024-01-01 11:00:00", 2),
    ]
    df = spark.createDataFrame(rows, "event_id long, ts string, user_id long").withColumn(
        "ts", F.to_timestamp("ts")
    )
    from pyspark.sql.window import Window as W

    w = W.partitionBy("user_id").orderBy(F.unix_micros("ts")).rangeBetween(-599_999_999, 0)
    got = {
        r["user_id"]: r["mb"]
        for r in df.select("user_id", F.count(F.lit(1)).over(w).alias("burst"))
        .groupBy("user_id")
        .agg(F.max("burst").alias("mb"))
        .collect()
    }
    assert got == {1: 3, 2: 1}


# ---------------------------------------------------------------------------
# codec parity: WAV / Y4M closed forms on planted inputs
# ---------------------------------------------------------------------------


def test_wav_square_wave_rms_is_exact_amplitude(spark):
    import numpy as np

    from comlake_core_spark.operators.codecs import wav_decode, wav_encode
    from comlake_core_spark.operators.multimodal import audio_stats

    a = 1700
    sign = np.where(np.arange(800) % 2 == 0, 1, -1)
    wav = wav_encode((sign * a).astype("<i2"), 16000)
    rate, samples = wav_decode(wav)
    assert rate == 16000 and samples.shape == (800, 1)
    df = spark.createDataFrame(
        [("x", bytearray(wav), {"mime": "audio/wav", "n_bytes": 0})],
        "id string, content binary, meta struct<mime string, n_bytes long>",
    )
    row = audio_stats(df, codec="wav").collect()[0]
    assert row["n_samples"] == 800
    assert row["duration_sec"] == 0.05
    assert row["rms"] == float(a)  # |x| constant -> RMS exactly a


def test_y4m_sampled_frame_means_closed_form(spark):
    import numpy as np

    from comlake_core_spark.operators.codecs import y4m_encode
    from comlake_core_spark.operators.multimodal import sample_frames

    frames = np.stack([np.full((16, 16), 10 * f + 3, dtype=np.uint8) for f in range(6)])
    df = spark.createDataFrame(
        [("v", bytearray(y4m_encode(frames, fps=30)), {"mime": "video/x-yuv4mpeg", "n_bytes": 0})],
        "id string, content binary, meta struct<mime string, n_bytes long>",
    )
    out = sorted(sample_frames(df, every_n=2, codec="y4m").collect(), key=lambda r: r["frame_idx"])
    assert [r["frame_idx"] for r in out] == [0, 2, 4]
    assert [r["pts_sec"] for r in out] == [0.0, 2 / 30, 4 / 30]
    import numpy as _np

    for r in out:
        buf = _np.frombuffer(bytes(r["frame_bytes"]), dtype=_np.uint8)
        assert buf.size == 256 and float(buf.mean()) == 10 * r["frame_idx"] + 3


# ---------------------------------------------------------------------------
# engagement / distribution quartet
# ---------------------------------------------------------------------------


def test_pareto_share_reuses_running_sum_correctly(spark):
    from comlake_core_spark.operators.sampling import global_running_sum

    # direct check of the curve math the workload reads: 10 customers,
    # revenue 100,90,...,10 cents -> top 20% (2 customers) hold 190/550
    rows = [(i, (10 - i) * 10) for i in range(10)]
    rev = spark.createDataFrame(rows, "c long, cents long")
    cum = global_running_sum(
        rev, [F.col("cents").desc(), F.col("c").asc()], "cents", out="cum", rank_out="rank"
    )
    got = {r["rank"]: r["cum"] for r in cum.collect()}
    assert got[2] == 190 and got[10] == 550


def test_dedup_exact_normalized_collapses_variants(spark):
    from comlake_core_spark.workloads import REGISTRY
    import pyspark.sql.functions as _F

    docs = spark.createDataFrame(
        [(0, "Hello, World!"), (1, "  hello   world  "), (2, "HELLO WORLD."), (3, "other text")],
        "doc_id long, text string",
    )
    nt = _F.regexp_replace(
        _F.regexp_replace(_F.lower(_F.trim(_F.col("text"))), "[^a-z0-9 ]", ""), " +", " "
    )
    groups = (
        docs.select("doc_id", _F.md5(nt).alias("h"))
        .groupBy("h")
        .agg(_F.min("doc_id").alias("canon"), _F.count(_F.lit(1)).alias("n"))
        .collect()
    )
    got = {r["canon"]: r["n"] for r in groups}
    assert got == {0: 3, 3: 1}


def test_segment_entropy_uniform_and_degenerate(spark):
    import math

    from comlake_core_spark.workloads import REGISTRY

    # nation 0: 4 segments x 5 customers (uniform -> ln 4); nation 1: one segment -> 0
    rows = [(0, f"S{i % 4}") for i in range(20)] + [(1, "ONLY")] * 7
    cu = spark.createDataFrame(rows, "c_nationkey int, c_mktsegment string")
    # drive through the registered fn by pointing _t at a temp dir? simpler:
    # replicate the expression path via the workload body's own logic
    seg = cu.groupBy(F.col("c_nationkey").alias("nk"), "c_mktsegment").agg(F.count(F.lit(1)).alias("c"))
    tot = seg.groupBy("nk").agg(F.sum("c").alias("n"))
    p = F.col("c").cast("double") / F.col("n")
    term = F.round(-p * F.log(p), 9).cast("decimal(20,9)")
    got = {
        r["nk"]: r["e"]
        for r in seg.join(tot, "nk").groupBy("nk").agg(F.sum(term).cast("double").alias("e")).collect()
    }
    assert got[0] == pytest.approx(math.log(4), abs=1e-8)
    assert got[1] == pytest.approx(0.0, abs=1e-12)
