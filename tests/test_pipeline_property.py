"""Property-based checks for the r5 pipeline operators against pure-Python
references: random small corpora / graphs / value sets, executed by Spark
and by an obviously-correct Python model, compared exactly.

The fixed DuckDB oracles pin each workload's single registered shape;
these fuzz the OPERATORS across input space — empty docs, all-duplicate
corpora, disconnected graphs, single-row groups — where keep-first
ordering, integer division, and quantized-median edge cases live."""

from __future__ import annotations

import hashlib
import math
from collections import defaultdict

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from comlake_core_spark.operators.dedup import dedup_lines, pagerank
from comlake_core_spark.operators.quality import mad_outliers

# -- dedup_lines ------------------------------------------------------------

WORDS = ["alpha", "beta", "gamma", "delta", "eps", "zeta"]
doc_strategy = st.lists(st.sampled_from(WORDS), min_size=0, max_size=25).map(" ".join)
corpus_strategy = st.lists(doc_strategy, min_size=2, max_size=7)


def _ref_dedup_lines(docs: list[tuple[int, str]], wpl: int) -> dict:
    import re

    lines_per_doc = {}
    for did, text in docs:
        toks = re.split(r"\s+", text.strip())
        n = max(math.ceil(len(toks) / wpl), 1)
        lines_per_doc[did] = [" ".join(toks[i * wpl : (i + 1) * wpl]) for i in range(n)]
    first: dict = {}
    for did in sorted(lines_per_doc):
        for idx, line in enumerate(lines_per_doc[did]):
            first.setdefault(line, (did, idx))
    out = {}
    for did, lines in lines_per_doc.items():
        kept = [l for i, l in enumerate(lines) if first[l] == (did, i)]
        out[did] = (
            len(lines),
            len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(corpus_strategy, st.sampled_from([3, 5, 10]))
def test_dedup_lines_matches_python_reference(spark, texts, wpl):
    docs = list(enumerate(texts, start=1))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_lines"], r["n_kept"], r["kept_text_md5"])
        for r in dedup_lines(df, words_per_line=wpl).collect()
    }
    assert got == _ref_dedup_lines(docs, wpl)


# -- pagerank ---------------------------------------------------------------

edge_strategy = st.lists(
    st.tuples(st.integers(1, 7), st.integers(1, 7)).filter(lambda t: t[0] < t[1]),
    min_size=1,
    max_size=10,
    unique=True,
)


def _ref_pagerank(pairs, iters=3, scale=10**12, dpct=85) -> dict:
    adj = defaultdict(list)
    for a, b in pairs:
        adj[a].append(b)
        adj[b].append(a)
    deg = {n: len(v) for n, v in adj.items()}
    r = {n: scale for n in deg}
    base = scale * (100 - dpct) // 100
    for _ in range(iters):
        c: dict = defaultdict(int)
        for n, nbrs in adj.items():
            for m in nbrs:
                c[m] += r[n] // deg[n]
        r = {n: base + (dpct * c[n]) // 100 for n in deg}
    return r


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(edge_strategy, st.sampled_from([1, 3]))
def test_pagerank_matches_python_reference(spark, edges, iters):
    df = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["rank_q"] for r in pagerank(df, iterations=iters).collect()}
    assert got == _ref_pagerank(edges, iters=iters)


# -- mad_outliers -----------------------------------------------------------

# values are exact multiples of 0.01, so value*1e6 is an exact integer in
# double and the quantization rounding has no float-boundary cases
value_strategy = st.lists(
    st.integers(min_value=-99_999, max_value=99_999).map(lambda i: i / 100),
    min_size=1,
    max_size=20,
)


def _ref_mad(values: list[float], k: int = 3, q: int = 10**6) -> tuple:
    vq = [int(round(v * q)) for v in values]  # exact: inputs are i/100

    def med2x(xs: list[int]) -> int:
        s = sorted(xs)
        n = len(s)
        return 2 * s[n // 2] if n % 2 else s[n // 2 - 1] + s[n // 2]

    med2 = med2x(vq)
    dev2 = [abs(2 * x - med2) for x in vq]
    mad4 = med2x(dev2)
    n_out = sum(1 for d in dev2 if 2 * d > k * mad4)
    return len(vq), med2, mad4, n_out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(value_strategy, value_strategy)
def test_mad_outliers_matches_python_reference(spark, va, vb):
    rows = [("a", v) for v in va] + [("b", v) for v in vb]
    df = spark.createDataFrame(rows, "grp string, value double")
    got = {r["grp"]: r for r in mad_outliers(df, "value", "grp").collect()}
    for grp, vals in (("a", va), ("b", vb)):
        n, med2, mad4, n_out = _ref_mad(vals)
        assert got[grp]["n"] == n
        assert got[grp]["n_outliers"] == n_out
        assert got[grp]["med_value"] == pytest.approx(med2 / 2e6, abs=1e-6)
        assert got[grp]["mad_value"] == pytest.approx(mad4 / 4e6, abs=1e-6)
