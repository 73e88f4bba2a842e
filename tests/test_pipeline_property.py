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


# -- bfs_depth ---------------------------------------------------------------

bfs_edge_strategy = st.lists(
    st.tuples(st.integers(0, 7), st.integers(0, 7)).filter(lambda e: e[0] != e[1]),
    min_size=1,
    max_size=14,
)


def _ref_bfs(edges, seed_mod, iters):
    adj = defaultdict(set)
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
    depth = {n: 0 for n in adj if n % seed_mod == 0}
    frontier = set(depth)
    for d in range(1, iters + 1):
        frontier = {m for n in frontier for m in adj[n] if m not in depth}
        for m in frontier:
            depth[m] = d
    return depth


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(bfs_edge_strategy, st.sampled_from([2, 3]), st.sampled_from([1, 3]))
def test_bfs_depth_matches_python_reference(spark, edges, seed_mod, iters):
    from comlake_core_spark.operators.dedup import bfs_depth

    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {
        r["node"]: r["depth"]
        for r in bfs_depth(pairs, lambda n: n % seed_mod == 0, iterations=iters).collect()
    }
    assert got == _ref_bfs(edges, seed_mod, iters)


# -- common_span_coverage -----------------------------------------------------

span_corpus_strategy = st.lists(
    st.lists(st.sampled_from(WORDS[:4]), min_size=0, max_size=12).map(" ".join),
    min_size=2,
    max_size=6,
)


def _ref_spans(docs, span):
    import re

    toks = {d: re.split(r"\s+", t.strip()) for d, t in docs}
    grams = {
        d: [(" ".join(ts[i : i + span]), i) for i in range(len(ts) - span + 1)]
        if len(ts) >= span
        else []
        for d, ts in toks.items()
    }
    owners = defaultdict(set)
    for d, gs in grams.items():
        for g, _ in gs:
            owners[g].add(d)
    dup = {g for g, o in owners.items() if len(o) >= 2}
    out = {}
    for d, ts in toks.items():
        hits = sorted(i for g, i in grams[d] if g in dup)
        cov, prev = 0, None
        for i in hits:
            cov += span if prev is None else min(span, i - prev)
            prev = i
        out[d] = (len(ts), len(hits), cov, cov * 2 >= len(ts))
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(span_corpus_strategy, st.sampled_from([2, 3]))
def test_common_span_coverage_matches_python_reference(spark, texts, span):
    from comlake_core_spark.operators.dedup import common_span_coverage

    docs = list(enumerate(texts, start=1))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["n_tokens"], r["n_dup_spans"], r["covered_tokens"], bool(r["mostly_dup"])
        )
        for r in common_span_coverage(df, span=span).collect()
    }
    assert got == _ref_spans(docs, span)


# -- bpe_merges ---------------------------------------------------------------

bpe_corpus_strategy = st.lists(
    st.lists(
        st.text(alphabet="ab", min_size=1, max_size=4), min_size=1, max_size=5
    ).map(" ".join),
    min_size=1,
    max_size=5,
)


def _ref_bpe(texts, merges):
    import re
    from collections import Counter

    words = Counter()
    for t in texts:
        for w in re.split(r"\s+", t.strip().lower()):
            if w:
                words[w] += 1
    vocab = [[list(w) + ["</w>"], c] for w, c in words.items()]
    out = []
    for rank in range(1, merges + 1):
        pc = Counter()
        for syms, c in vocab:
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), cnt = min(pc.items(), key=lambda kv: (-kv[1], kv[0][0] + " " + kv[0][1]))
        for v in vocab:
            syms, ns, i = v[0], [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    ns.append(a + b)
                    i += 2
                else:
                    ns.append(syms[i])
                    i += 1
            v[0] = ns
        out.append((rank, f"{a} {b}", a + b, cnt))
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(bpe_corpus_strategy, st.sampled_from([1, 2, 3]))
def test_bpe_merges_matches_python_reference(spark, texts, merges):
    from comlake_core_spark.operators.text.bpe import bpe_merges

    df = spark.createDataFrame(list(enumerate(texts, 1)), "doc_id long, text string")
    got = [
        (r["merge_rank"], r["pair"], r["new_symbol"], r["pair_count"])
        for r in bpe_merges(df, merges=merges).orderBy("merge_rank").collect()
    ]
    assert got == _ref_bpe(texts, merges)


# -- lr_quality_logit ----------------------------------------------------------


def _ref_lr(texts, buckets=256, ws=1000):
    import re

    out = {}
    for did, t in texts:
        toks = [w for w in re.split(r"\s+", t.strip().lower()) if w]
        if not toks:
            continue
        logit = 0
        for w in toks:
            b = int(hashlib.md5(w.encode()).hexdigest()[:8], 16) % buckets
            logit += int(hashlib.md5(f"w:{b}".encode()).hexdigest()[:8], 16) % (2 * ws + 1) - ws
        n = len(toks)
        avg = abs(logit * 1_000_000) // n * (1 if logit >= 0 else -1)  # trunc toward 0
        out[did] = (n, logit, avg, logit > 0)
    return out


@settings(max_examples=10, deadline=None, suppress_health_check=list(HealthCheck))
@given(st.lists(doc_strategy, min_size=1, max_size=6))
def test_lr_quality_logit_matches_python_reference(spark, texts):
    from comlake_core_spark.operators.quality import lr_quality_logit

    docs = list(enumerate(texts, start=1))
    df = spark.createDataFrame(docs, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["logit_q"], r["avg_logit_micro"], bool(r["admit"]))
        for r in lr_quality_logit(df).collect()
    }
    assert got == _ref_lr(docs)


# -- pca_power_iteration ------------------------------------------------------

pca_matrix_strategy = st.lists(
    st.lists(st.integers(-40, 40).map(lambda m: m / 8.0), min_size=4, max_size=4),
    min_size=3,
    max_size=12,
)


def _ref_pca(vecs, iters, quant=10_000, shrink=10_000_000_000):
    # all values are exact multiples of 1/8, so x*quant is an exact
    # integer — no rounding-mode ambiguity anywhere
    n, d = len(vecs), len(vecs[0])
    q = [[round(x * quant) for x in v] for v in vecs]
    s = [sum(q[r][j] for r in range(n)) for j in range(d)]
    c = [[n * q[r][j] - s[j] for j in range(d)] for r in range(n)]
    tz = lambda a, b: (abs(a) // b) * (1 if a >= 0 else -1)  # noqa: E731
    g = [
        [tz(sum(c[r][i] * c[r][j] for r in range(n)), shrink) for j in range(d)]
        for i in range(d)
    ]
    v = [10**6] * d
    for _ in range(iters):
        sv = [sum(g[i][j] * v[j] for j in range(d)) for i in range(d)]
        k = max(abs(x) for x in sv) // 10**6 + 1
        v = [tz(x, k) for x in sv]
    return {j + 1: v[j] for j in range(d)}


@settings(max_examples=8, deadline=None, suppress_health_check=list(HealthCheck))
@given(pca_matrix_strategy, st.sampled_from([1, 3]))
def test_pca_power_matches_integer_reference(spark, vecs, iters):
    from comlake_core_spark.operators.similarity import pca_power_iteration

    rows = [(i, v) for i, v in enumerate(vecs)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    got = {
        r["dim"]: r["v_q"]
        for r in pca_power_iteration(emb, iterations=iters).collect()
    }
    assert got == _ref_pca(vecs, iters)
