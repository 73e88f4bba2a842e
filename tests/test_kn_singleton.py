"""kn_singleton_stats: trigram count-of-counts + Chen & Goodman discount
estimate, the count-1 fold of the r12 Kneser-Ney reshape (VERDICT r11
"Next round" #2).  Twinned against a brute-force Python count."""

from __future__ import annotations

from collections import Counter

from comlake_core_spark.operators.text.kneser_ney import kn_singleton_stats

DOCS = [
    (1, "the cat sat on the mat"),
    (2, "the cat sat on the hat"),
    (3, "the dog sat on the mat today"),
    (4, "one two"),          # bigram only — no trigram rows
    (5, "single"),           # too short — contributes nothing
    (6, ""),                 # empty
    (7, "red fish blue fish swim"),   # trigrams unique to docs 7/8 ...
    (8, "red fish blue fish sleep"),  # ... (red,fish,blue)x2 = an N2 type
]


def _py_stats(rows):
    c = Counter()
    for _, text in rows:
        toks = [t for t in text.lower().split() if t]
        for i in range(len(toks) - 2):
            c[tuple(toks[i : i + 3])] += 1
    n1 = sum(1 for v in c.values() if v == 1)
    n2 = sum(1 for v in c.values() if v == 2)
    return (
        n1,
        n2,
        len(c),
        sum(c.values()),
        n1 / (n1 + 2 * n2),
    )


def test_kn_singleton_stats_matches_bruteforce(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    row = kn_singleton_stats(df).collect()[0]
    got = (
        row["n1_types"],
        row["n2_types"],
        row["total_types"],
        row["total_tokens"],
        row["discount_estimate"],
    )
    assert got == _py_stats(DOCS)
    # the fixture exercises both count classes
    assert row["n1_types"] > 0 and row["n2_types"] > 0


def test_kn_singleton_stats_real_corpus(spark):
    from comlake_core_spark.session import tables

    docs = tables(spark, "/root/testdata/sf0.001", ["documents"])["documents"]
    row = kn_singleton_stats(docs).collect()[0]
    rows = [(r["doc_id"], r["text"]) for r in docs.select("doc_id", "text").collect()]
    assert (
        row["n1_types"],
        row["n2_types"],
        row["total_types"],
        row["total_tokens"],
        row["discount_estimate"],
    ) == _py_stats(rows)
    # web-text regularity the operator exists to measure: the singleton
    # tail is the dominant share of the type table
    assert row["n1_types"] / row["total_types"] > 0.3


def test_kn_singleton_stats_degenerate_corpus_yields_null(spark):
    """ADVICE r12: a corpus with N1 + 2*N2 = 0 (every trigram type occurs
    >= 3 times, or no trigrams at all) must yield a well-defined NULL
    discount_estimate, not a NaN / division-by-zero artifact."""
    # one trigram type repeated 3x across docs -> N1 = N2 = 0
    df = spark.createDataFrame(
        [(1, "a b c"), (2, "a b c"), (3, "a b c")], "doc_id long, text string"
    )
    row = kn_singleton_stats(df).collect()[0]
    assert (row["n1_types"], row["n2_types"], row["total_types"]) == (0, 0, 1)
    assert row["discount_estimate"] is None

    # no trigrams at all: the count-of-counts frame is EMPTY
    empty = spark.createDataFrame([(1, "a b"), (2, "x")], "doc_id long, text string")
    row = kn_singleton_stats(empty).collect()[0]
    assert row["total_types"] == 0
    assert row["discount_estimate"] is None
