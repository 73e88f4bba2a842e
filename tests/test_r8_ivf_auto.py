"""r8: two-level IVF as the DEFAULT above a corpus-size threshold
(VERDICT r6 #6 / r7 "Next round" #4).

`resolve_ivf_assignment` routes 'auto' to two_level exactly when the
codebook is corpus-scaled (n_centroids > sqrt(n)); small fixed codebooks
stay flat without paying a row count.  Because the default coarse probe
covers every coarse bucket, the switch is bit-invisible in results —
these tests pin the policy, the ivf_topk two-level equality, and the
literal-free plan shape of the auto-selected path.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from comlake_core_spark.operators.similarity import (
    ivf_topk,
    mutual_knn_graph,
    resolve_ivf_assignment,
)
from comlake_core_spark.session import tables

SF_DIR = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return tables(spark, SF_DIR)["embeddings"]


def test_auto_policy_resolution():
    calls = []

    def n_rows():
        calls.append(1)
        return 2000

    # explicit strategies pass through untouched, count never consulted
    assert resolve_ivf_assignment("flat", 10_000, n_rows) == "flat"
    assert resolve_ivf_assignment("two_level", 4, n_rows) == "two_level"
    assert not calls
    # small fixed codebook: flat WITHOUT the row count (100 TB: a count()
    # per query would be a full scan)
    assert resolve_ivf_assignment("auto", 16, n_rows) == "flat"
    assert resolve_ivf_assignment("auto", 32, n_rows) == "flat"
    assert not calls
    # corpus-scaled: C > sqrt(n) → two_level; C <= sqrt(n) → flat
    assert resolve_ivf_assignment("auto", 63, n_rows) == "two_level"  # 63² > 2000
    assert resolve_ivf_assignment("auto", 44, n_rows) == "flat"       # 44² < 2000
    assert len(calls) == 2


def test_ivf_topk_two_level_equals_flat(emb):
    """With the default full coarse probe, ivf_topk's two-level route
    must reproduce the flat literal-codebook result bit-for-bit — the
    equality pin that makes 'auto' a plan-shape decision."""
    queries = emb.select(
        F.col("vec_id").alias("query_id"), "embedding"
    ).filter(F.col("query_id") % 7 == 0)
    kwargs = dict(k=5, n_centroids=16, n_probe=4, seed_hasher="md5")
    flat = ivf_topk(emb, queries, assignment="flat", **kwargs)
    two = ivf_topk(emb, queries, assignment="two_level", **kwargs)
    key = lambda df: {
        (r["query_id"], r["nbr_id"], r["rn"]): r["cosine"] for r in df.collect()
    }
    assert key(flat) == key(two)


def test_ivf_topk_auto_small_codebook_stays_flat(emb):
    """n_centroids=16 (every registered ANN workload) must resolve to the
    flat literal plan — same executed shape as before the default change,
    so ann_ivf_topk / ann_ivf_kmeans_topk driver evidence carries over."""
    queries = emb.select(F.col("vec_id").alias("query_id"), "embedding").limit(5)
    df = ivf_topk(emb, queries, k=3, n_centroids=16, n_probe=4, seed_hasher="md5")
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the flat path bakes the 16-entry codebook literal into the plan;
    # each entry renders as "[<cid>,[<v1>,..." in the executed-plan text
    assert len(re.findall(r"\[\d+,\[-?\d", plan)) >= 16


def test_knn_auto_corpus_scaled_routes_two_level(emb):
    """target_bucket_size with a small bucket makes C > sqrt(n) at
    sf0.001 (n=500, bucket=4 → C=125 > 22), so the DEFAULT assignment
    must route two-level: literal-free fine codebook (coarse literal is
    O(sqrt(C)) ≈ 12 entries, far under C) — and the result must still
    equal the explicit flat assignment (full coarse probe equality)."""
    auto = mutual_knn_graph(
        emb, k=4, candidate="ivf", n_probe=8, seed_hasher="md5", target_bucket_size=4
    )
    plan = auto._jdf.queryExecution().executedPlan().toString()
    # codebook literal entries render as "[<cid>,[<v1>,..." in plan text;
    # two-level localCheckpoints cut the coarse stage out of the final
    # plan entirely, while a flat C=125 collect would embed >=125 entries
    n_literals = len(re.findall(r"\[\d+,\[-?\d", plan))
    assert n_literals < 40, (
        f"auto plan embeds {n_literals} codebook literals — a flat collect "
        "of the corpus-scaled fine codebook"
    )
    flat = mutual_knn_graph(
        emb, k=4, candidate="ivf", n_probe=8, seed_hasher="md5",
        target_bucket_size=4, assignment="flat",
    )
    key = lambda df: {
        (r["id_a"], r["id_b"], r["rank_ab"], r["rank_ba"]): r["cosine"]
        for r in df.collect()
    }
    assert key(auto) == key(flat)
