"""r12 STAGING: operators built after the r11 window froze ship as code +
pytest and register in r12 (the r7/r11 staging pattern).

- ``langseg_quality_route`` (operators/langseg.py) — CCNet's
  segment → per-segment quality filter → reassemble composition;
- ``token_budget_fill`` (operators/budget_fill.py) — deterministic
  greedy prefix fill of an absolute token budget with per-source caps.

The DuckDB oracles staged at the bottom are proven bit-exact here so the
r12 registration is copy-paste once CORRECTNESS_r11 lands.
"""

from __future__ import annotations

import hashlib
import re

import pytest
from pyspark.sql import functions as F

from comlake_core_spark.operators.budget_fill import token_budget_fill
from comlake_core_spark.operators.langseg import langseg_quality_route

SF_DIR = "/root/testdata/sf0.001"
MIN_MEAN = 3.0


# ---------------------------------------------------------------------------
# brute-force Python twins (synthetic rows, every edge on purpose)
# ---------------------------------------------------------------------------

ROUTE_DOCS = [
    # en body around a thin de line: the de run dies on the token floor
    (1, "the cat and the dog sat\nthe end of the story here\nder hund\nthe cat returns to the house"),
    # fr kept, es kept, blank line ('und') dropped
    (2, "le chat et le chien dort\n\nel gato y el perro corre"),
    # all-und doc: routed out entirely (no output row)
    (3, "xyzzy plugh\n\nqwerty asdf"),
    # single thin line: dropped -> no output row
    (4, "the cat"),
    (5, ""),
    # zh line (CJK regex) is exactly one token wide -> fails the floor
    (6, "一句中文\nthe dog and the cat ran far"),
]


def _tok(s: str) -> list[str]:
    return [t for t in re.split(r"[ \t\n\x0b\f\r]+", s.strip(" ")) if t != ""]


def _py_route(rows, min_mean=MIN_MEAN):
    from tests.test_langseg import _py_segments

    out = {}
    for doc_id, text in rows:
        segs = _py_segments(doc_id, text)
        kept = [
            s
            for s in segs
            if s[2] != "und" and len(_tok(s[6])) >= min_mean * s[5]
        ]
        total = sum(s[5] for s in segs)
        kept_lines = sum(s[5] for s in kept)
        if kept_lines > 0:
            out[doc_id] = (
                len({s[2] for s in kept}),
                kept_lines,
                total,
                kept_lines / total,
                "\n".join(s[6] for s in sorted(kept, key=lambda s: s[1])),
            )
    return out


def test_langseg_quality_route_matches_bruteforce(spark):
    df = spark.createDataFrame(ROUTE_DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (
            r["kept_langs"],
            r["kept_lines"],
            r["total_lines"],
            r["kept_line_frac"],
            r["clean_text"],
        )
        for r in langseg_quality_route(df).collect()
    }
    want = _py_route(ROUTE_DOCS)
    assert got == want
    assert 3 not in got and 4 not in got and 5 not in got  # routed out
    assert got[1][0] == 1 and "der hund" not in got[1][4]  # thin de run dropped
    assert got[2][0] == 2  # fr + es both kept, blank line dropped


def _py_budget_fill(rows, budget, cap_frac):
    cap = int(cap_frac * budget)
    pri = sorted(
        (
            (hashlib.md5(str(d).encode()).hexdigest(), d, s, len(_tok(t)))
            for d, s, t in rows
        ),
    )
    # Per-source cap is a WINDOW rule like the global pass: the cumulative
    # sum advances over ALL of the source's docs in (md5, id) order and a
    # row is kept only while cumsum <= cap — the first overflowing doc ends
    # the source's take (later smaller docs do NOT sneak back in).  Mirrors
    # the Spark window filter and the staged DuckDB `cs <= cap` exactly
    # (ADVICE r11: the old skip-and-continue twin diverged on ~35% of
    # random fixtures).
    cum_src: dict[str, int] = {}
    kept = []
    for h, d, s, tok in pri:
        cum_src[s] = cum_src.get(s, 0) + tok
        if cum_src[s] <= cap:
            kept.append((h, d, s, tok))
    out: dict[str, list[int]] = {}
    cum = 0
    for h, d, s, tok in kept:  # already in global priority order
        if cum + tok > budget:
            break  # prefix rule: the overflowing doc ends the take
        cum += tok
        agg = out.setdefault(s, [0, 0])
        agg[0] += 1
        agg[1] += tok
    return {s: tuple(v) for s, v in out.items()}


BUDGET_ROWS = [
    (i, ["web", "books", "code"][i % 3], " ".join(f"w{i}x{j}" for j in range(4 + i % 7)))
    for i in range(40)
] + [(100, "web", ""), (101, "books", "   ")]  # zero-token docs ride free


def test_token_budget_fill_matches_bruteforce(spark):
    df = spark.createDataFrame(BUDGET_ROWS, "doc_id long, source string, text string")
    budget, cap_frac = 120, 0.4
    got = {
        r["source"]: (r["n_docs"], r["n_tokens"])
        for r in token_budget_fill(df, budget, cap_frac).collect()
    }
    want = _py_budget_fill(BUDGET_ROWS, budget, cap_frac)
    assert got == want
    # both constraints actually bind on this fixture
    assert sum(v[1] for v in got.values()) <= budget
    assert all(v[1] <= int(cap_frac * budget) for v in got.values())
    total_all = sum(len(_tok(t)) for _, _, t in BUDGET_ROWS)
    assert sum(v[1] for v in got.values()) < total_all  # something was cut


def test_token_budget_fill_random_fixtures_match_twin(spark):
    # The r11 twin diverged from the window semantics on ~35% of random
    # fixtures (ADVICE r11) and the single committed fixture matched by
    # luck.  Pin the agreement on seeded random corpora where both the
    # per-source cap and the global budget bind, including overflow-then-
    # smaller-doc orderings the skip-and-continue twin got wrong.
    import random

    rng = random.Random(1207)
    for trial in range(6):
        rows = [
            (
                trial * 1000 + i,
                rng.choice(["web", "books", "code", "wiki"]),
                " ".join(f"t{trial}w{i}x{j}" for j in range(rng.randrange(0, 12))),
            )
            for i in range(rng.randrange(15, 45))
        ]
        budget = rng.randrange(30, 140)
        cap_frac = rng.choice([0.2, 0.35, 0.5, 0.8])
        df = spark.createDataFrame(rows, "doc_id long, source string, text string")
        got = {
            r["source"]: (r["n_docs"], r["n_tokens"])
            for r in token_budget_fill(df, budget, cap_frac).collect()
        }
        want = _py_budget_fill(rows, budget, cap_frac)
        assert got == want, (trial, budget, cap_frac)


def test_token_budget_fill_prefix_rule_is_strict(spark):
    # one source, two docs: priority order is md5-determined; the first
    # doc fits, the second overflows and must END the take even though a
    # later (nonexistent here) smaller doc could have fit — prefix, not
    # knapsack, so the SQL twin is a pure window filter
    rows = [(1, "s", "a b c"), (2, "s", "d e f g h")]
    df = spark.createDataFrame(rows, "doc_id long, source string, text string")
    got = {r["source"]: (r["n_docs"], r["n_tokens"]) for r in token_budget_fill(df, 6, 1.0).collect()}
    want = _py_budget_fill([(d, s, t) for d, s, t in rows], 6, 1.0)
    assert got == want


# ---------------------------------------------------------------------------
# staged DuckDB oracles: proven bit-exact vs the Spark side on the real
# documents table BEFORE registration (r11), and now that the pair IS
# registered (r12) the registry copies are pinned identical to these
# staged originals — the same discipline the langseg pair used in r11.
# ---------------------------------------------------------------------------


def _segments_oracle() -> str:
    from comlake_core_spark.workloads import REGISTRY

    return REGISTRY["language_segments"].oracle


def staged_route_sql() -> str:
    return f"""
WITH segs AS ({_segments_oracle()}),
flagged AS (
  SELECT *,
         (lang <> 'und' AND
          CAST(len(list_filter(string_split_regex(trim(seg_text), '\\s+'),
                               x -> x <> '')) AS DOUBLE)
            >= {MIN_MEAN} * CAST(n_lines AS DOUBLE)) AS keep
  FROM segs
), agg AS (
  SELECT doc_id,
         CAST(COUNT(DISTINCT CASE WHEN keep THEN lang END) AS BIGINT) AS kept_langs,
         CAST(SUM(CASE WHEN keep THEN n_lines ELSE 0 END) AS BIGINT) AS kept_lines,
         CAST(SUM(n_lines) AS BIGINT) AS total_lines,
         string_agg(CASE WHEN keep THEN seg_text END, chr(10) ORDER BY seg_no) AS clean_text
  FROM flagged GROUP BY doc_id
)
SELECT doc_id, kept_langs, kept_lines, total_lines,
       CAST(kept_lines AS DOUBLE) / total_lines AS kept_line_frac, clean_text
FROM agg WHERE kept_lines > 0
"""


BUDGET_TOKENS = 12000
CAP_FRAC = 0.25


def staged_budget_sql() -> str:
    cap = int(CAP_FRAC * BUDGET_TOKENS)
    return f"""
WITH base AS (
  SELECT source, doc_id,
         CAST(len(list_filter(string_split_regex(trim(text), '\\s+'),
                              x -> x <> '')) AS BIGINT) AS tok,
         md5(CAST(doc_id AS VARCHAR)) AS h
  FROM documents
), src AS (
  SELECT *, SUM(tok) OVER (PARTITION BY source ORDER BY h ASC, doc_id ASC
                           ROWS UNBOUNDED PRECEDING) AS cs
  FROM base
), kept AS (SELECT * FROM src WHERE cs <= {cap}),
g AS (
  SELECT *, SUM(tok) OVER (ORDER BY h ASC, doc_id ASC
                           ROWS UNBOUNDED PRECEDING) AS cg
  FROM kept
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs, CAST(SUM(tok) AS BIGINT) AS n_tokens
FROM g WHERE cg <= {BUDGET_TOKENS} GROUP BY source
"""


def test_registered_oracles_match_staged_copies():
    from comlake_core_spark.workloads import REGISTRY

    assert REGISTRY["langseg_quality_route"].oracle == staged_route_sql()
    assert REGISTRY["token_budget_fill"].oracle == staged_budget_sql()


def test_staged_duckdb_oracles_bit_exact(spark):
    import duckdb

    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")

    got = sorted(tuple(r) for r in langseg_quality_route(docs).collect())
    want = sorted(tuple(r) for r in con.sql(staged_route_sql()).fetchall())
    assert len(got) > 0
    assert got == want

    got_b = sorted(
        tuple(r) for r in token_budget_fill(docs, BUDGET_TOKENS, CAP_FRAC).collect()
    )
    want_b = sorted(tuple(r) for r in con.sql(staged_budget_sql()).fetchall())
    assert len(got_b) > 0
    assert got_b == want_b
