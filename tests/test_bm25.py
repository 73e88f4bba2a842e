"""BM25: scores and ranking vs an independent pure-Python computation."""

import math

import pytest
from pyspark.sql import functions as F

from comlake_core_spark.operators.text.retrieval import bm25_search

DOCS = [
    (1, "spark shuffle join join join"),
    (2, "spark window sort"),
    (3, "hash table scan merge sort batch"),
    (4, "join"),
    (5, "stream stream stream stream stream stream stream stream"),
]


def py_bm25(query, k1=1.2, b=0.75):
    toks = {d: t.split() for d, t in DOCS}
    n = len(toks)
    avgdl = sum(len(t) for t in toks.values()) / n
    scores = {}
    for d, t in toks.items():
        s = 0.0
        for q in query:
            tf = t.count(q)
            if tf == 0:
                continue
            df = sum(1 for tt in toks.values() if q in tt)
            idf = math.log(1 + (n - df + 0.5) / (df + 0.5))
            s += idf * tf * (k1 + 1) / (tf + k1 * (1 - b + b * len(t) / avgdl))
        if s > 0:
            scores[d] = s
    return scores


@pytest.mark.parametrize("query", [("join",), ("spark", "sort"), ("stream", "join", "hash")])
def test_bm25_matches_reference_impl(spark, query):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    got = {r["doc_id"]: r["score"] for r in bm25_search(df, query).collect()}
    exp = py_bm25(query)
    assert set(got) == set(exp)
    for d in exp:
        assert got[d] == pytest.approx(exp[d], rel=1e-9), (d, query)
    # ranking order identical
    assert sorted(got, key=lambda d: (-got[d], d)) == sorted(exp, key=lambda d: (-exp[d], d))


def test_bm25_no_match_returns_empty(spark):
    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    assert bm25_search(df, ("zebra",)).count() == 0


def test_hybrid_rrf_fuses_both_legs(spark):
    from comlake_core_spark.operators.similarity import hybrid_search_rrf

    docs = spark.createDataFrame(DOCS, "doc_id int, text string")
    # embeddings engineered so the VECTOR leg prefers doc 3, the LEXICAL
    # leg (query "join") prefers doc 1; doc 4 appears in both legs
    vecs = [
        (1, [1.0, 0.0, 0.3]),
        (2, [0.0, 1.0, 0.0]),
        (3, [0.0, 0.1, 1.0]),
        (4, [0.5, 0.0, 0.9]),
        (5, [0.0, 1.0, 0.1]),
    ]
    emb = spark.createDataFrame(vecs, "vec_id int, embedding array<double>")
    out = hybrid_search_rrf(docs, emb, ("join",), [0.0, 0.1, 1.0], k=5, per_leg=3)
    rows = out.collect()
    ids = [r["id"] for r in rows]
    # doc 4: strong in the vector leg AND matches 'join' lexically → must
    # outrank docs that appear in only one leg
    both_legs = [r for r in rows if r["rank_lexical"] is not None and r["rank_vector"] is not None]
    assert both_legs, rows
    top_both = min(both_legs, key=lambda r: -r["rrf"])
    single_leg = [r for r in rows if (r["rank_lexical"] is None) != (r["rank_vector"] is None)]
    for r in single_leg:
        assert top_both["rrf"] > r["rrf"], rows
    # deterministic rerun
    ids2 = [r["id"] for r in hybrid_search_rrf(docs, emb, ("join",), [0.0, 0.1, 1.0], k=5, per_leg=3).collect()]
    assert ids == ids2


def test_bm25_plan_takes_ordered_and_broadcasts(spark):
    from comlake_core_spark.plans import inspect as P

    df = spark.createDataFrame(DOCS, "doc_id int, text string")
    out = bm25_search(df, ("join", "spark"))
    assert P.has_take_ordered(out)
    assert P.has_broadcast_join(out)
