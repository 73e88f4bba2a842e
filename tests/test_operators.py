"""Behavioral tests for the LLM-pipeline operators: recall/precision on
constructed near-duplicates (the properties the SQL oracles can't check)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from comlake_core_spark.operators import dedup, similarity, text

BASE = (
    "the quick brown fox jumps over the lazy dog while the sun sets slowly "
    "behind the distant mountains and the river flows quietly through the valley"
)


@pytest.fixture(scope="module")
def near_dup_df(spark):
    rows = [
        Row(doc_id=1, text=BASE),
        Row(doc_id=2, text=BASE.replace("quick", "swift")),  # near-dup of 1
        Row(doc_id=3, text=BASE),  # exact dup of 1
        Row(doc_id=4, text="completely different content about spark dataframes and parquet files and shuffles"),
        Row(doc_id=5, text="another unrelated document discussing minhash banding and lsh bucket joins here"),
    ]
    return spark.createDataFrame(rows)


def test_exact_dedup_groups(spark, near_dup_df):
    out = dedup.exact_dedup(near_dup_df).collect()
    groups = {r["keep_id"]: r["n_copies"] for r in out}
    assert groups[1] == 2  # docs 1 and 3 collapse
    assert len(out) == 4


def test_dedup_lines_removes_cross_doc_duplicates(spark):
    import hashlib

    boiler = "cookie banner accept all terms apply now"  # 8 words -> one line
    rows = [
        Row(doc_id=1, text=boiler),                      # first owner keeps it
        Row(doc_id=2, text=boiler),                      # dup line -> removed
        Row(doc_id=3, text="totally original body here"),
    ]
    out = {r["doc_id"]: r for r in dedup.dedup_lines(spark.createDataFrame(rows), words_per_line=8).collect()}
    assert out[1]["n_lines"] == 1 and out[1]["n_kept"] == 1
    assert out[2]["n_lines"] == 1 and out[2]["n_kept"] == 0
    assert out[3]["n_kept"] == 1
    assert out[1]["kept_text_md5"] == hashlib.md5(boiler.encode()).hexdigest()
    # fully-deduped doc fingerprints the empty string (matches the SQL
    # oracle's coalesce(string_agg(...), ''))
    assert out[2]["kept_text_md5"] == hashlib.md5(b"").hexdigest()


def test_dedup_lines_spans_and_order(spark):
    # 20 words -> two 10-word lines; doc 2 repeats doc 1's SECOND line as
    # its FIRST: removal must preserve the survivor's original order
    a = " ".join(f"w{i}" for i in range(10))
    b = " ".join(f"x{i}" for i in range(10))
    c = " ".join(f"y{i}" for i in range(10))
    rows = [Row(doc_id=1, text=a + " " + b), Row(doc_id=2, text=b + " " + c)]
    out = {r["doc_id"]: r for r in dedup.dedup_lines(spark.createDataFrame(rows)).collect()}
    assert out[1]["n_lines"] == 2 and out[1]["n_kept"] == 2
    assert out[2]["n_lines"] == 2 and out[2]["n_kept"] == 1
    import hashlib

    assert out[2]["kept_text_md5"] == hashlib.md5(c.encode()).hexdigest()


def test_minhash_finds_near_dups(spark, near_dup_df):
    pairs = dedup.minhash_lsh_pairs(near_dup_df, threshold=0.5, num_hashes=32, bands=16).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 2) in found and (1, 3) in found and (2, 3) in found
    # unrelated docs must not pair
    assert not any(4 in p or 5 in p for p in found)


def test_ngram_jaccard_exact(spark, near_dup_df):
    pairs = dedup.ngram_jaccard_pairs(near_dup_df, threshold=0.5).collect()
    found = {(r["id_a"], r["id_b"]): r["jaccard"] for r in pairs}
    assert found[(1, 3)] == 1.0  # identical docs
    assert 0.5 <= found[(1, 2)] < 1.0


def test_simhash_near_dups_close(spark, near_dup_df):
    sigs = {r["doc_id"]: r["simhash"] for r in dedup.simhash(near_dup_df).collect()}
    assert sigs[1] == sigs[3]  # identical text → identical signature
    ham_12 = bin((sigs[1] ^ sigs[2]) & (2**64 - 1)).count("1")
    ham_14 = bin((sigs[1] ^ sigs[4]) & (2**64 - 1)).count("1")
    assert ham_12 < ham_14  # near-dup closer than unrelated


def test_simhash_pairs(spark, near_dup_df):
    pairs = dedup.simhash_dedup_pairs(near_dup_df, max_hamming=8).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (1, 3) in found


@pytest.fixture(scope="module")
def emb_df(spark):
    import numpy as np

    rng = np.random.default_rng(7)
    base = rng.normal(size=(20, 16)).astype("float32")
    rows = []
    for i, v in enumerate(base):
        rows.append(Row(vec_id=i, embedding=[float(x) for x in v]))
    # vec 20 = near-dup of vec 0 (tiny perturbation)
    rows.append(Row(vec_id=20, embedding=[float(x + 0.01) for x in base[0]]))
    return rows


def test_embedding_dedup_pairs(spark, emb_df):
    df = spark.createDataFrame(emb_df)
    pairs = dedup.embedding_dedup_pairs(df, threshold=0.95).collect()
    found = {(r["id_a"], r["id_b"]) for r in pairs}
    assert (0, 20) in found


def test_embedding_dedup_methods_agree(spark, emb_df):
    """The codegen fold path and the Arrow pandas-UDF path are the same
    operator: identical buckets (same sign convention) and cosines to
    float tolerance, so the pair sets must match exactly."""
    df = spark.createDataFrame(emb_df)
    jvm = dedup.embedding_dedup_pairs(df, threshold=0.9, method="jvm").collect()
    pd_ = dedup.embedding_dedup_pairs(df, threshold=0.9, method="pandas").collect()
    jp = {(r["id_a"], r["id_b"]) for r in jvm}
    pp = {(r["id_a"], r["id_b"]) for r in pd_}
    assert jp == pp
    cj = {(r["id_a"], r["id_b"]): r["cosine"] for r in jvm}
    cp = {(r["id_a"], r["id_b"]): r["cosine"] for r in pd_}
    for k in cj:
        assert abs(cj[k] - cp[k]) < 1e-9


def test_brute_force_topk_self_is_nearest(spark, emb_df):
    df = spark.createDataFrame(emb_df)
    queries = df.filter(F.col("vec_id") < 3).select(F.col("vec_id").alias("query_id"), "embedding")
    out = similarity.brute_force_topk(df, queries, k=3).collect()
    top1 = {r["query_id"]: r["nbr_id"] for r in out if r["rn"] == 1}
    assert top1 == {0: 0, 1: 1, 2: 2}  # each query's nearest neighbor is itself


def test_ivf_recall_vs_brute_force(spark, emb_df):
    df = spark.createDataFrame(emb_df)
    queries = df.filter(F.col("vec_id") < 5).select(F.col("vec_id").alias("query_id"), "embedding")
    exact = similarity.brute_force_topk(df, queries, k=3).collect()
    approx = similarity.ivf_topk(df, queries, k=3, n_centroids=4, n_probe=4).collect()
    # n_probe == n_centroids → all buckets probed → must equal brute force
    e = {(r["query_id"], r["nbr_id"]) for r in exact}
    a = {(r["query_id"], r["nbr_id"]) for r in approx}
    assert e == a


def test_lang_id_markers(spark):
    rows = [
        Row(doc_id=1, text="the cat and the dog is here"),
        Row(doc_id=2, text="der hund und die katze ist hier"),
        Row(doc_id=3, text="le chien et la vache est ici"),
        Row(doc_id=4, text="你好 世界"),
        Row(doc_id=5, text="xyzzy plugh"),
    ]
    df = spark.createDataFrame(rows)
    out = {r["doc_id"]: r["lang"] for r in df.select("doc_id", text.lang_id("text").alias("lang")).collect()}
    assert out == {1: "en", 2: "de", 3: "fr", 4: "zh", 5: "und"}


def test_fingerprint_normalizes_whitespace(spark):
    df = spark.createDataFrame([Row(a="Hello   World"), Row(a="  hello world ")])
    fps = [r["fp"] for r in df.select(text.fingerprint("a").alias("fp")).collect()]
    assert fps[0] == fps[1]


def test_quality_score_range(spark, t):
    docs = t["documents"]
    stats = docs.select(text.quality_score("text").alias("q")).agg(
        F.min("q").alias("lo"), F.max("q").alias("hi")
    ).first()
    assert 0.0 <= stats["lo"] <= stats["hi"] <= 1.0


def test_approx_distinct_within_bound(spark, t):
    # promoted workload emits the accuracy claim itself (within_2pct) plus
    # the exact count; the standalone exact twin must agree
    from comlake_core_spark.workloads import REGISTRY
    import os
    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    rows = {r["event_type"]: r for r in REGISTRY["approx_distinct_users"].fn(spark, sf).collect()}
    exact = {r["event_type"]: r["n_users"] for r in REGISTRY["distinct_event_users"].fn(spark, sf).collect()}
    for et, ex in exact.items():
        assert rows[et]["exact_users"] == ex
        assert rows[et]["within_2pct"] is True, (et, rows[et])


def test_zscore_pandas_matches_expr(spark, t):
    from comlake_core_spark.operators.groupmap import zscore_normalize_expr, zscore_normalize_pandas

    ev = t["events"]
    expr = {(r["user_id"], r["event_id"]): r["zscore"] for r in zscore_normalize_expr(ev).collect()}
    pandas = {(r["user_id"], r["event_id"]): r["zscore"] for r in zscore_normalize_pandas(ev).collect()}
    assert set(expr) == set(pandas)
    for k, v in expr.items():
        assert pandas[k] == pytest.approx(v, rel=1e-9, abs=1e-9), k


def test_diagnose_skew(spark):
    from pyspark.sql import functions as F

    from comlake_core_spark.operators.groupmap import diagnose_skew

    df = spark.range(0, 1000).select(
        F.when(F.col("id") % 10 < 9, F.lit(42)).otherwise(F.col("id")).alias("k")
    )
    top = diagnose_skew(df, "k", top=3).collect()
    assert top[0]["k"] == 42 and top[0]["n"] == 900
    assert top[0]["share"] == pytest.approx(0.9)


def test_udaf_weighted_mean_close_to_exact(spark):
    import os

    from pyspark.sql import functions as F

    from comlake_core_spark.session import tables
    from comlake_core_spark.workloads import REGISTRY, dec

    sf = os.environ.get("SPARK_GRAFT_TEST_SF_DIR", "/root/testdata/sf0.001")
    udaf = {r["l_returnflag"]: r["wmean_price"] for r in REGISTRY["udaf_weighted_mean"].fn(spark, sf).collect()}
    li = tables(spark, sf, ("lineitem",))["lineitem"]
    exact_df = li.groupBy("l_returnflag").agg(
        (F.sum(dec("l_extendedprice") * dec("l_quantity")).cast("double")
         / F.sum(dec("l_quantity")).cast("double")).alias("w")
    )
    exact = {r["l_returnflag"]: r["w"] for r in exact_df.collect()}
    for k, v in exact.items():
        assert udaf[k] == pytest.approx(v, rel=1e-9)


# ---------------------------------------------------------------------------
# temporal joins
# ---------------------------------------------------------------------------

from datetime import datetime

from comlake_core_spark.operators import temporal


def _ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_picks_latest_at_or_before(spark):
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), "a"),
         (1, _ts("2024-01-01T12:00:00"), "b"),
         (2, _ts("2024-01-01T09:00:00"), "c")],
        "k int, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T09:30:00"), 10.0),
         (1, _ts("2024-01-01T11:00:00"), 20.0),
         (2, _ts("2024-01-01T09:00:00"), 30.0)],  # exact tie → inclusive
        "k int, ts timestamp, v double",
    )
    out = {r["tag"]: (r["asof_ts"], r["v"]) for r in temporal.asof_join(left, right, on="k").collect()}
    assert out["a"] == (_ts("2024-01-01T09:30:00"), 10.0)
    assert out["b"] == (_ts("2024-01-01T11:00:00"), 20.0)
    assert out["c"] == (_ts("2024-01-01T09:00:00"), 30.0)  # ts equality matches


def test_asof_join_left_row_before_any_right(spark):
    left = spark.createDataFrame([(1, _ts("2024-01-01T08:00:00"), "early")], "k int, ts timestamp, tag string")
    right = spark.createDataFrame([(1, _ts("2024-01-01T09:00:00"), 1.0)], "k int, ts timestamp, v double")
    rows = temporal.asof_join(left, right, on="k").collect()
    assert len(rows) == 1 and rows[0]["asof_ts"] is None and rows[0]["v"] is None
    assert temporal.asof_join(left, right, on="k", how="inner").count() == 0


def test_asof_join_null_right_field_not_mixed_across_rows(spark):
    # the matched right row has v=NULL; an earlier right row has v=5.0 —
    # the carried payload must come atomically from the MATCHED row
    left = spark.createDataFrame([(1, _ts("2024-01-01T12:00:00"), "x")], "k int, ts timestamp, tag string")
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:00:00"), 5.0), (1, _ts("2024-01-01T11:00:00"), None)],
        "k int, ts timestamp, v double",
    )
    row = temporal.asof_join(left, right, on="k").collect()[0]
    assert row["asof_ts"] == _ts("2024-01-01T11:00:00")
    assert row["v"] is None  # NOT 5.0 leaked from the earlier right row


def test_range_join_boundaries_and_bucket_spanning(spark):
    # interval 10:30:00 → 11:30:00 spans an hour-bucket boundary; points on
    # both boundaries pin start-inclusive / end-exclusive, and the pair that
    # meets in the second bucket must appear exactly once
    points = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:30:00"), "start_edge"),
         (1, _ts("2024-01-01T11:15:00"), "second_bucket"),
         (1, _ts("2024-01-01T11:30:00"), "end_edge"),
         (2, _ts("2024-01-01T10:45:00"), "other_key")],
        "k int, ts timestamp, tag string",
    )
    intervals = spark.createDataFrame(
        [(1, _ts("2024-01-01T10:30:00"), _ts("2024-01-01T11:30:00"), 100)],
        "k int, start_ts timestamp, end_ts timestamp, iv_id int",
    )
    rows = temporal.range_join_points_to_intervals(points, intervals, on="k").collect()
    tags = sorted(r["tag"] for r in rows)
    assert tags == ["second_bucket", "start_edge"]  # end-exclusive, key-scoped, no dup


# ---------------------------------------------------------------------------
# Winnowing fingerprints (operators/text.winnow_fingerprints)
# ---------------------------------------------------------------------------


def _winnow(spark, texts, k=8, w=4):
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in enumerate(texts)])
    rows = df.select(
        "doc_id", text.winnow_fingerprints("text", k=k, w=w).alias("fps")
    ).collect()
    return {r["doc_id"]: r["fps"] for r in rows}


def test_winnow_shared_passage_guarantee(spark):
    # the winnowing guarantee: a shared normalized run of >= w+k-1 chars
    # (here far longer) must yield at least one shared fingerprint, even
    # embedded in otherwise-disjoint documents
    passage = "the rain in spain stays mainly in the plain"
    fps = _winnow(
        spark,
        [
            "totally unrelated preamble text first " + passage,
            passage + " followed by a different conclusion entirely",
            "no overlap with the others in any way whatsoever here",
        ],
    )
    assert set(fps[0]) & set(fps[1])
    assert not (set(fps[0]) & set(fps[2]))
    assert not (set(fps[1]) & set(fps[2]))


def test_winnow_edge_lengths(spark):
    # shorter than k after normalization -> no fingerprints; between k and
    # k+w-1 k-grams -> exactly one (the global min); case/punct-insensitive
    fps = _winnow(spark, ["ab", "abcdefgh", "AB, cd-EF gh!", "abcdefgh"], k=8, w=4)
    assert fps[0] == []
    assert len(fps[1]) == 1
    assert fps[2] == fps[1]  # normalizes to the same 8 chars
    assert fps[3] == fps[1]  # deterministic


def test_connected_components_transitive_closure(spark):
    # components: {1,2,3} via chain, {4,5}, chain 7-8-9-10 (diameter > 1)
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (4, 5), (7, 8), (8, 9), (9, 10)], "id_a long, id_b long"
    )
    got = {r["node"]: r["component"] for r in dedup.connected_components(pairs).collect()}
    assert got == {1: 1, 2: 1, 3: 1, 4: 4, 5: 4, 7: 7, 8: 7, 9: 7, 10: 7}


def test_connected_components_on_lsh_pairs(spark, near_dup_df):
    pairs = dedup.minhash_lsh_pairs(near_dup_df)
    comp = dedup.connected_components(pairs)
    by_comp = {}
    for r in comp.collect():
        by_comp.setdefault(r["component"], set()).add(r["node"])
    # docs 1, 2, 3 (exact + near dups) collapse into one cluster led by 1
    assert {1, 2, 3} <= by_comp.get(1, set())


def test_gapfill_locf_fills_missing_buckets(spark):
    from datetime import datetime

    from comlake_core_spark.operators.temporal import gapfill_locf

    rows = [
        ("a", datetime(2024, 1, 1, 0, 30), 10.0),
        ("a", datetime(2024, 1, 1, 0, 45), 20.0),
        # hours 1-2 missing for key a
        ("a", datetime(2024, 1, 1, 3, 10), 40.0),
        ("b", datetime(2024, 1, 1, 5, 0), 7.0),
    ]
    df = spark.createDataFrame(rows, "k string, ts timestamp, v double")
    out = gapfill_locf(df, "ts", "k", {"avg_v": F.avg("v")})
    got = {(r["key"], r["bucket_ts"].hour): (r["avg_v"], r["observed"]) for r in out.collect()}
    assert got[("a", 0)] == (15.0, True)
    assert got[("a", 1)] == (15.0, False)  # filled, carries hour-0 average
    assert got[("a", 2)] == (15.0, False)
    assert got[("a", 3)] == (40.0, True)
    assert got[("b", 5)] == (7.0, True)
    # grid spans each key's OWN range: no b rows before hour 5
    assert ("b", 4) not in got and len(got) == 5


def test_winnow_dedup_pairs_finds_planted_passage(spark):
    boiler = "subscribe to our newsletter for updates terms of service apply"
    passage = (
        "in the beginning the universe was created this has made a lot of "
        "people very angry and been widely regarded as a bad move"
    )
    rows = [
        Row(doc_id=1, text="article one intro " + passage + " outro one " + boiler),
        Row(doc_id=2, text=boiler + " piece two begins " + passage + " and ends"),
        Row(doc_id=3, text="entirely distinct essay about spark shuffles " + boiler),
        Row(doc_id=4, text="fourth text on parquet encodings and page indexes"),
    ]
    df = spark.createDataFrame(rows)
    pairs = {
        (r["id_a"], r["id_b"])
        for r in dedup.winnow_dedup_pairs(df, min_shared=3).collect()
    }
    assert (1, 2) in pairs  # shared passage detected
    assert (1, 4) not in pairs and (2, 4) not in pairs and (3, 4) not in pairs
    # max_df boilerplate cap: fingerprints in >max_df docs are dropped, so
    # sharing ONLY the boilerplate (doc 3) can still pair only via it
    pairs_capped = {
        (r["id_a"], r["id_b"])
        for r in dedup.winnow_dedup_pairs(df, min_shared=3, max_df=2).collect()
    }
    assert (1, 2) in pairs_capped
    assert (1, 3) not in pairs_capped and (2, 3) not in pairs_capped


def test_chunk_documents_coverage(spark):
    from comlake_core_spark.operators import text as T

    rows = [
        Row(doc_id=1, text="a" * 1234),
        Row(doc_id=2, text="b" * 500),
        Row(doc_id=3, text="c" * 10),
        Row(doc_id=4, text=""),
    ]
    out = T.chunk_documents(spark.createDataFrame(rows), chunk_chars=500, overlap=100).collect()
    by_doc = {}
    for r in out:
        by_doc.setdefault(r["doc_id"], []).append(r)
    # starts every 400: doc 1 (1234 chars) -> starts 1,401,801,1201 = 4 chunks
    assert len(by_doc[1]) == 4
    assert [r["chunk_len"] for r in sorted(by_doc[1], key=lambda r: r["chunk_idx"])] == [
        500, 500, 434, 34,
    ]
    # consecutive chunks overlap by 100 chars
    c0, c1 = sorted(by_doc[1], key=lambda r: r["chunk_idx"])[:2]
    assert c0["chunk_text"][-100:] == c1["chunk_text"][:100]
    # full coverage: concatenating de-overlapped chunks reproduces the doc
    chunks = sorted(by_doc[1], key=lambda r: r["chunk_idx"])
    rebuilt = chunks[0]["chunk_text"] + "".join(c["chunk_text"][100:] for c in chunks[1:])
    assert rebuilt == "a" * 1234
    assert len(by_doc[2]) == 2  # starts 1 and 401 (401 <= 500)
    assert len(by_doc[3]) == 1 and by_doc[3][0]["chunk_len"] == 10
    assert len(by_doc[4]) == 1 and by_doc[4][0]["chunk_len"] == 0  # empty doc kept


def test_pack_sequences_capacity(spark):
    from comlake_core_spark.operators import text as T

    rows = [Row(doc_id=i, n_tokens=600) for i in range(10)]
    out = T.pack_sequences(spark.createDataFrame(rows), budget=2048).collect()
    packs = {}
    for r in out:
        packs.setdefault(r["pack_id"], []).append(r)
    # 600-token docs, 2048 budget: tokens_before of doc i = 600i;
    # pack switches when 600i crosses a 2048 boundary -> sizes 4,3,3
    assert sorted(len(v) for v in packs.values()) == [3, 3, 4]
    # every doc STARTS within its pack's budget window (fractional-bin contract)
    for pid, docs in packs.items():
        for r in docs:
            assert pid * 2048 <= r["tokens_before"] < (pid + 1) * 2048


def test_pii_redact_categories(spark):
    from comlake_core_spark.operators import text as T

    rows = [
        Row(doc_id=1, text="mail me at a.b@x.io or call 12-345-678-9012 from 10.0.0.1"),
        Row(doc_id=2, text="nothing sensitive here"),
    ]
    out = {r["doc_id"]: r for r in T.pii_redact(spark.createDataFrame(rows)).collect()}
    assert (out[1]["n_email"], out[1]["n_phone"], out[1]["n_ipv4"]) == (1, 1, 1)
    assert "a.b@x.io" not in out[1]["redacted"] and "[PII]" in out[1]["redacted"]
    assert (out[2]["n_email"], out[2]["n_phone"], out[2]["n_ipv4"]) == (0, 0, 0)
    assert out[2]["redacted"] == "nothing sensitive here"


def test_ngram_novelty_bounds_and_shared_passage(spark):
    # doc 1 and 2 share a long passage; doc 3 is fully unique ⇒ novelty 1.0
    shared = "alpha beta gamma delta epsilon zeta eta theta iota kappa"
    rows = [
        Row(doc_id=1, text=shared + " one two three four five six seven eight"),
        Row(doc_id=2, text=shared + " nine ten eleven twelve thirteen fourteen fifteen sixteen"),
        Row(doc_id=3, text="totally fresh words nobody else uses anywhere in this corpus today"),
    ]
    out = {r["doc_id"]: r for r in text.ngram_novelty(spark.createDataFrame(rows), n=8).collect()}
    assert all(0.0 <= r["novelty"] <= 1.0 for r in out.values())
    assert out[3]["novelty"] == 1.0
    # the shared 10-token prefix contributes three common 8-grams to each
    assert out[1]["novelty"] < 1.0 and out[2]["novelty"] < 1.0
    assert out[1]["n_unique"] < out[1]["n_grams"]


def test_jaccard_topk_ranks_near_dup_first(spark, near_dup_df):
    queries = near_dup_df.filter(F.col("doc_id") == 1)
    out = dedup.jaccard_topk_similar(near_dup_df, queries, k=2, shingle_k=3).collect()
    assert [r["nbr_id"] for r in out] == [3, 2]  # exact dup first, near-dup second
    assert out[0]["jaccard"] == 1.0
    assert 0.5 < out[1]["jaccard"] < 1.0


def test_quantize_int8_reconstruction_bound(spark):
    rows = [
        Row(vec_id=1, embedding=[0.5, -1.0, 0.25, 0.125]),
        Row(vec_id=2, embedding=[0.0, 0.0, 0.0, 0.0]),  # amax=0 edge
        Row(vec_id=3, embedding=[127.0, -64.0, 1.0, 0.0]),
    ]
    df = spark.createDataFrame(rows)
    out = {r["vec_id"]: r for r in similarity.quantize_embeddings_int8(df).collect()}
    # codes stay in int8 range: |q_i| <= 127 ⇒ L1 <= 127*dim
    assert all(r["q_l1"] <= 127 * r["dim"] for r in out.values())
    assert out[2]["q_l1"] == 0 and out[2]["q_checksum"] == 0
    # reconstruction: q_i * amax/127 within half a step of the original
    import numpy as np
    v = np.array(rows[0].embedding)
    amax = out[1]["amax"]
    q = np.floor(v * (127.0 / amax) + 0.5)
    assert np.max(np.abs(q * amax / 127.0 - v)) <= amax / 127.0 / 2 + 1e-12


def test_canonical_docs_keep_rule(spark):
    docs = spark.createDataFrame(
        [Row(doc_id=i, n_chars=c) for i, c in [(1, 10), (2, 30), (3, 30), (4, 7), (9, 99)]]
    )
    pairs = spark.createDataFrame(
        [Row(id_a=1, id_b=2), Row(id_a=2, id_b=3)]  # one cluster {1,2,3}; 4 and 9 unpaired
    )
    out = dedup.canonical_docs(docs, pairs).collect()
    assert len(out) == 1
    r = out[0]
    # longest wins; tie (2 vs 3, both 30 chars) broken to the SMALLER id
    assert r["keep_doc_id"] == 2 and r["keep_len"] == 30 and r["n_members"] == 3


def test_apply_changelog_matches_python_model(spark):
    """Hypothesis fuzz: apply_changelog ≡ a dict-based reference merge for
    random snapshots and changelogs (U/I/D over overlapping key spaces)."""
    from hypothesis import HealthCheck, given, settings
    from hypothesis import strategies as st

    from comlake_core_spark.operators.relational import apply_changelog

    keys = st.integers(min_value=0, max_value=30)
    snapshot_st = st.dictionaries(keys, st.integers(-100, 100), max_size=12)
    change_st = st.dictionaries(
        keys, st.tuples(st.sampled_from(["U", "I", "D"]), st.integers(-100, 100)), max_size=8
    )

    @settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
    @given(snapshot_st, change_st)
    def run(snap, chg):
        expected = {}
        for k, v in snap.items():
            op = chg.get(k, (None,))[0]
            if op == "D":
                continue
            if op in ("U", "I"):
                expected[k] = (chg[k][1], "updated")
            else:
                expected[k] = (v, "kept")
        for k, (op, v) in chg.items():
            if k not in snap and op in ("U", "I"):
                expected[k] = (v, "inserted")
        target = spark.createDataFrame(
            [(k, v) for k, v in snap.items()] or [(None, None)], "k long, val long"
        ).filter(F.col("k").isNotNull())
        changes = spark.createDataFrame(
            [(k, op, v) for k, (op, v) in chg.items()] or [(None, None, None)],
            "k long, _op string, val long",
        ).filter(F.col("k").isNotNull())
        got = {
            r["k"]: (r["val"], r["_action"])
            for r in apply_changelog(target, changes, key="k").collect()
        }
        assert got == expected, (snap, chg)

    run()


def test_apply_changelog_rejects_duplicate_keys(spark):
    """ADVICE r2 #3: duplicate changelog keys would silently fan out the
    full-outer join — the guard fails fast, seq_col compacts instead."""
    from comlake_core_spark.operators.relational import apply_changelog

    target = spark.createDataFrame([(1, "a"), (2, "b")], "k int, v string")
    dup = spark.createDataFrame(
        [(1, "x", "U", 10), (1, "y", "U", 20)], "k int, v string, _op string, seq int"
    )
    with pytest.raises(ValueError, match="multiple changes"):
        apply_changelog(target, dup.drop("seq"), key="k")
    # seq_col compacts to the LAST change per key (max seq wins)
    out = {r["k"]: r["v"] for r in apply_changelog(target, dup, key="k", seq_col="seq").collect()}
    assert out == {1: "y", 2: "b"}


def test_mixture_quota_sums_to_target(spark):
    """ADVICE r2 #2: largest-remainder apportionment — Σquota must equal
    target_docs exactly, for targets that don't divide evenly."""
    from comlake_core_spark.operators.sampling import mixture_resample

    rows = [(f"d{i % 7}", i, 1 + (i * 13) % 50) for i in range(300)]
    df = spark.createDataFrame(rows, "domain string, doc_id int, n_tokens int")
    for target in (10, 97, 200, 299):
        out = mixture_resample(df, ["domain"], target_docs=target)
        assert out.agg(F.sum("quota")).collect()[0][0] == target, target


def test_pq_and_banding_guards(spark):
    """ADVICE r2 #1: nibble overflow / dropped dims / dropped hashes must
    raise, not corrupt silently."""
    from comlake_core_spark.operators.dedup import minhash_lsh_pairs_incremental
    from comlake_core_spark.operators.similarity import pq_quantize

    emb = spark.createDataFrame([(1, [0.1] * 8), (2, [0.2] * 8)], "vec_id int, embedding array<double>")
    with pytest.raises(ValueError, match="n_centroids"):
        pq_quantize(emb, m=2, n_centroids=17)
    with pytest.raises(ValueError, match="dim % m"):
        pq_quantize(emb, m=3, n_centroids=2)
    docs = spark.createDataFrame([(1, "a b c d e")], "doc_id int, text string")
    with pytest.raises(ValueError, match="divisible"):
        minhash_lsh_pairs_incremental(docs, docs, num_hashes=30, bands=8)


def test_leakage_safe_split_keeps_clusters_together(spark):
    from comlake_core_spark.operators.sampling import leakage_safe_split

    docs = spark.createDataFrame([(i,) for i in range(1, 101)], "doc_id int")
    # chain 1-2-3 plus pair 10-11: all must co-locate with their cluster
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (10, 11)], "id_a int, id_b int"
    )
    out = leakage_safe_split(docs, pairs, test_fraction=0.5)
    rows = {r["split"]: r for r in out.collect()}
    assert set(rows) <= {"train", "test"}
    assert sum(r["n_docs"] for r in rows.values()) == 100
    # the leakage metric is computed and must be zero by construction
    assert all(r["cross_split_pairs"] == 0 for r in rows.values())
    # clustered docs counted: 2,3 follow 1; 11 follows 10 → 3 non-representative docs
    assert sum(r["n_in_clusters"] for r in rows.values()) == 3


def test_semantic_dedup_prunes_planted_identicals(spark):
    from comlake_core_spark.operators.dedup import semantic_dedup

    base = [
        (i, [float(((i * 2654435761 + d * 40503) % 1009) - 504) for d in range(8)])
        for i in range(1, 21)
    ]
    planted = [(i + 1000, v) for i, v in base if i % 5 == 0]  # 4 identical copies
    emb = spark.createDataFrame(base + planted, "vec_id int, embedding array<double>")
    out = semantic_dedup(emb, n_clusters=4, threshold=0.999)
    total_vecs = sum(r["n_vectors"] for r in out.collect())
    total_surv = sum(r["n_survivors"] for r in out.collect())
    assert total_vecs == 24
    # every planted identical collapses onto its original (cosine=1 >= .999)
    assert total_surv == 20
    # survivor checksum = sum of min-ids per component + singletons ⇒ the
    # originals' ids, never the planted 1000+ ids
    assert all((r["survivor_id_sum"] or 0) < 1000 * r["n_survivors"] for r in out.collect())


def test_semantic_dedup_depth_cap_is_last_resort(spark):
    from comlake_core_spark.operators.dedup import semantic_dedup

    rows = [(i, [1.0, 0.0]) for i in range(1, 8)]  # all identical → one cluster
    emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
    capped = semantic_dedup(emb, n_clusters=1, threshold=0.9, max_cluster=3)
    rs = capped.collect()
    # identical vectors can never split: every refinement round re-forms one
    # oversized cluster, so after max_depth the exclusion fallback applies
    assert sum(r["n_vectors"] for r in rs) == 7
    assert sum(r["n_survivors"] for r in rs) == 7


def test_semantic_dedup_reclusters_oversized_and_prunes(spark):
    """VERDICT r3 #4: an oversized cluster must be re-clustered (fresh
    per-cluster codebook), not exempted — its planted duplicates must be
    provably pruned after refinement."""
    from comlake_core_spark.operators.dedup import semantic_dedup

    base = [
        (i, [float(((i * 2654435761 + d * 40503) % 1009) - 504) for d in range(8)])
        for i in range(1, 25)
    ]
    dup = [(i + 1000, v) for i, v in base]  # every vector duplicated once
    emb = spark.createDataFrame(base + dup, "vec_id int, embedding array<double>")
    # one top-level cluster of 48 rows >> max_cluster=12 → refinement must
    # split it with 8 sub-centroids before pruning can run
    out = semantic_dedup(
        emb, n_clusters=1, threshold=0.999, max_cluster=12, recluster_clusters=8
    ).collect()
    assert sum(r["n_vectors"] for r in out) == 48
    # refinement happened: more than the single top-level bucket reported
    assert len(out) > 1
    # duplicates are exact copies → always co-assigned; every pruned pair
    # keeps the original (min id), so survivors are exactly the 24 originals
    # in every cluster small enough to prune
    pruned = [r for r in out if r["n_survivors"] < r["n_vectors"]]
    assert pruned, "no cluster was pruned — refinement failed to split"
    surv = sum(r["n_survivors"] for r in out)
    assert surv < 48
    for r in pruned:
        assert r["n_survivors"] * 2 == r["n_vectors"]  # dup collapses per pair
        assert (r["survivor_id_sum"] or 0) < 1000 * r["n_survivors"]


def test_normalize_url_canonicalization(spark):
    from comlake_core_spark.operators.text.core import normalize_url

    cases = [
        # www + tracking params stripped, case folded, real param kept
        ("https://WWW.Site.COM/a?utm_source=x&ref=feed&id=7", "https://site.com/a?id=7"),
        # all params were tracking -> dangling '?' trimmed
        ("http://www.site.com/b?utm_campaign=c", "http://site.com/b"),
        # no tracking params -> only case folding
        ("HTTP://Site.com/c?page=2", "http://site.com/c?page=2"),
        # tracking param in the middle
        ("https://site.com/d?a=1&utm_medium=m&b=2", "https://site.com/d?a=1&b=2"),
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], ["url"])
    got = [r["n"] for r in df.select(normalize_url("url").alias("n")).collect()]
    assert got == [want for _, want in cases]


def test_gopher_quality_rules_flag_planted_docs(spark):
    from comlake_core_spark.operators.text.docquality import gopher_quality

    good = "the quick brown fox jumps over that lazy dog with style " * 6  # 66 words
    short = "too short to pass the floor"                 # < 50 words
    no_stop = "alpha beta gamma delta epsilon zeta eta theta iota kappa " * 6
    df = spark.createDataFrame(
        [(1, good), (2, short), (3, no_stop)], ["doc_id", "text"]
    )
    rows = {r["doc_id"]: r for r in gopher_quality(df).collect()}
    assert rows[1]["keep"] == 1
    assert rows[1]["word_count"] == 66 and rows[1]["stop_hits"] >= 2
    assert rows[2]["keep"] == 0          # word-count floor
    assert rows[3]["keep"] == 0          # stopword floor
    assert rows[3]["stop_hits"] == 0
    assert rows[3]["alpha_word_frac"] == 1.0


def test_semantic_dedup_refinement_releases_prior_round_cache(spark):
    """ADVICE r4 dedup.py:882: each refinement round must unpersist the
    previous round's cached assignment — otherwise executor storage grows
    by one cached assignment copy PER ROUND in exactly the oversized-head
    scenario the refinement targets.  Identical vectors never split, so
    every round re-forms one oversized cluster and runs to max_depth:
    the persistent-RDD delta must NOT grow with the round count (the
    final assignment's own cache and bounded slack are allowed; a
    per-round leak shows up as delta growing by ~max_depth).

    Measurement discipline (two flakiness sources seen in-suite):
    (a) Spark's CacheManager dedups by canonicalized plan, so each call
    gets DISTINCT ids and vector values — otherwise a call's frames alias
    caches left by other tests and its delta reads 0; (b) only NEW,
    NAMED persistent RDDs are counted: cache entries are named with their
    plan string and held strongly by the CacheManager (exactly what
    persist()/unpersist() manage), while connected_components'
    localCheckpoint RDDs are unnamed and reclaimed ASYNCHRONOUSLY by the
    ContextCleaner, so raw getPersistentRDDs().size() deltas wobble with
    GC timing."""
    from comlake_core_spark.operators.dedup import semantic_dedup

    jsc = spark.sparkContext._jsc

    def cached_named_ids() -> set:
        out = set()
        it = jsc.getPersistentRDDs().entrySet().iterator()
        while it.hasNext():
            e = it.next()
            if e.getValue().name() is not None:
                out.add(e.getKey())
        return out

    deltas = {}
    for depth in (1, 3):
        rows = [(1000 * depth + i, [float(depth), 0.5]) for i in range(1, 16)]
        emb = spark.createDataFrame(rows, "vec_id int, embedding array<double>")
        before = cached_named_ids()
        out = semantic_dedup(
            emb, n_clusters=1, threshold=0.9, max_cluster=3, max_depth=depth
        )
        out.count()  # materialize the full pipeline
        deltas[depth] = len(cached_named_ids() - before)
    assert deltas[3] <= deltas[1] + 1, (
        f"cached-frame delta grew with refinement depth ({deltas}) — "
        "rounds are leaking their predecessors' persist()"
    )


def test_pagerank_integer_fixed_point_path_graph(spark):
    # path 1-2-3: the middle node is the hub.  All arithmetic is integer
    # fixed-point, so the expected values are hand-computable exactly:
    # r0 = 1e12 each; each round r' = 0.15e12 + (85 * sum(r div deg)) div 100.
    pairs = spark.createDataFrame([(1, 2), (2, 3)], "id_a long, id_b long")
    from comlake_core_spark.operators.dedup import pagerank

    out = {r["node"]: r for r in pagerank(pairs, iterations=3).collect()}
    assert out[2]["degree"] == 2 and out[1]["degree"] == 1
    assert out[1]["rank_q"] == 629_187_500_000
    assert out[2]["rank_q"] == 1_741_625_000_000
    assert out[3]["rank_q"] == 629_187_500_000
    # determinism: a second run is bit-identical (no float summation)
    again = {r["node"]: r["rank_q"] for r in pagerank(pairs, iterations=3).collect()}
    assert again == {n: r["rank_q"] for n, r in out.items()}
