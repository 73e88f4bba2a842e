"""r13 STAGING: operators built after the r12 window froze ship as code +
pytest and register in r13 (the r7/r11/r12 staging pattern).

- ``exact_substring_cut`` (operators/dedup/spans.py) — Lee et al. 2022
  ExactSubstr span CUTTING: excise every token covered by a duplicated
  span-token run except in the run's canonical-owner document;
- ``kn_discount_estimate`` (operators/text/kneser_ney.py
  kn_singleton_stats) — trigram count-of-counts N1/N2 + the
  Chen & Goodman discount estimate.

The DuckDB oracles staged at the bottom are proven bit-exact here so the
r13 registration is copy-paste once CORRECTNESS_r12 lands.
"""

from __future__ import annotations

import re
from collections import defaultdict

from comlake_core_spark.operators.dedup.spans import exact_substring_cut
from comlake_core_spark.operators.text.kneser_ney import kn_singleton_stats

SF_DIR = "/root/testdata/sf0.001"

CUT_SPAN = 8
CUT_MIN_DOCS = 2


def _tok(s: str) -> list[str]:
    return [t for t in re.split(r"[ \t\n\x0b\f\r]+", s.strip(" ")) if t != ""]


# ---------------------------------------------------------------------------
# brute-force Python twin
# ---------------------------------------------------------------------------


def _py_cut(rows, span, min_docs):
    toksd = {d: _tok(t) for d, t in rows}
    occ: dict[str, set] = defaultdict(set)
    for d, ts in toksd.items():
        for s in range(len(ts) - span + 1):
            occ[" ".join(ts[s : s + span])].add(d)
    owner = {g: min(ds) for g, ds in occ.items() if len(ds) >= min_docs}
    out = {}
    for d, ts in toksd.items():
        cov: set[int] = set()
        for s in range(len(ts) - span + 1):
            g = " ".join(ts[s : s + span])
            if g in owner and owner[g] != d:
                cov.update(range(s, s + span))
        kept = [t for p, t in enumerate(ts) if p not in cov]
        n, n_cut = len(ts), len(ts) - len(kept)
        out[d] = (n, n_cut, 0.0 if n == 0 else n_cut / n, " ".join(kept))
    return out


SHARED = "alpha bravo charlie delta echo foxtrot golf hotel"  # exactly 8 tokens

CUT_DOCS = [
    # doc 1 owns the shared run (min doc_id): keeps it verbatim
    (1, f"intro one {SHARED} outro one"),
    # doc 2 quotes it: the run is cut, its own prose survives
    (2, f"totally different words {SHARED} and a unique tail here"),
    # doc 3 is NOTHING BUT the shared run: cut to empty
    (3, SHARED),
    # doc 4: unique text, nothing cut
    (4, "the quick brown fox jumps over the lazy dog today"),
    # doc 5: shorter than the span — can never be cut
    (5, "short doc"),
    (6, ""),
    # docs 7/8 share a DIFFERENT run; 7 owns it
    (7, "x1 x2 x3 x4 x5 x6 x7 x8 x9 x10"),
    (8, "pre x2 x3 x4 x5 x6 x7 x8 x9 post"),
]


def test_exact_substring_cut_matches_bruteforce(spark):
    df = spark.createDataFrame(CUT_DOCS, "doc_id long, text string")
    got = {
        r["doc_id"]: (r["n_tokens"], r["n_cut"], r["cut_frac"], r["clean_text"])
        for r in exact_substring_cut(df, span=CUT_SPAN, min_docs=CUT_MIN_DOCS).collect()
    }
    want = _py_cut(CUT_DOCS, CUT_SPAN, CUT_MIN_DOCS)
    assert got == want
    # semantics pins, independent of the twin
    assert SHARED in got[1][3]          # owner keeps the passage
    assert "alpha" not in got[2][3]     # quoting doc loses it ...
    assert "unique tail" in got[2][3]   # ... but keeps its own prose
    assert got[3] == (8, 8, 1.0, "")    # all-dup doc cut to empty
    assert got[4][1] == 0 and got[5][1] == 0
    assert got[6] == (0, 0, 0.0, "")
    assert got[7][1] == 0 and got[8][1] > 0  # 8-token window inside 7/8


def test_exact_substring_cut_random_fixtures_match_twin(spark):
    # the r11 budget-fill lesson (ADVICE r11): verify the twin on seeded
    # random corpora, not just the one hand-built fixture — planted
    # shared runs at random offsets exercise owner ties, overlapping
    # coverage, and partial-window edges the fixture may miss by luck
    import random

    rng = random.Random(1301)
    vocab = [f"w{i}" for i in range(30)]
    for trial in range(5):
        shared_runs = [
            [rng.choice(vocab) for _ in range(rng.randrange(4, 7))] for _ in range(3)
        ]
        rows = []
        for d in range(1, rng.randrange(8, 14)):
            words = [rng.choice(vocab) for _ in range(rng.randrange(0, 15))]
            for run in shared_runs:
                if rng.random() < 0.5:
                    at = rng.randrange(0, len(words) + 1)
                    words = words[:at] + run + words[at:]
            rows.append((trial * 100 + d, " ".join(words)))
        span = rng.choice([4, 5])
        df = spark.createDataFrame(rows, "doc_id long, text string")
        got = {
            r["doc_id"]: (r["n_tokens"], r["n_cut"], r["cut_frac"], r["clean_text"])
            for r in exact_substring_cut(df, span=span, min_docs=2).collect()
        }
        want = _py_cut(rows, span, 2)
        assert got == want, (trial, span)


def test_exact_substring_cut_total_and_deterministic(spark):
    df = spark.createDataFrame(CUT_DOCS, "doc_id long, text string")
    out = exact_substring_cut(df, span=CUT_SPAN, min_docs=CUT_MIN_DOCS)
    assert out.count() == len(CUT_DOCS)  # total: one row per input doc
    a = sorted(tuple(r) for r in out.collect())
    b = sorted(tuple(r) for r in exact_substring_cut(
        df.repartition(7), span=CUT_SPAN, min_docs=CUT_MIN_DOCS
    ).collect())
    assert a == b  # partitioning-independent


# ---------------------------------------------------------------------------
# staged DuckDB oracles (r13 registration): bit-exact vs the Spark side on
# the real documents table
# ---------------------------------------------------------------------------


def staged_cut_sql() -> str:
    return f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS ts
  FROM documents
), grams AS (
  SELECT doc_id,
         UNNEST(range(len(ts) - {CUT_SPAN} + 1)) AS s,
         UNNEST(list_transform(range(len(ts) - {CUT_SPAN} + 1),
                i -> array_to_string(ts[i+1 : i+{CUT_SPAN}], ' '))) AS g
  FROM base WHERE len(ts) >= {CUT_SPAN}
), gt AS (
  SELECT g, MIN(doc_id) AS owner
  FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= {CUT_MIN_DOCS}
), covered AS (
  SELECT DISTINCT doc_id, p FROM (
    SELECT gr.doc_id, UNNEST(range(gr.s, gr.s + {CUT_SPAN})) AS p
    FROM grams gr JOIN gt ON gr.g = gt.g
    WHERE gt.owner <> gr.doc_id
  )
), tokpos AS (
  SELECT doc_id, UNNEST(ts) AS tok, UNNEST(range(len(ts))) AS p FROM base
), kept AS (
  SELECT t.doc_id, t.tok, t.p FROM tokpos t
  WHERE NOT EXISTS (SELECT 1 FROM covered c WHERE c.doc_id = t.doc_id AND c.p = t.p)
), rebuilt AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(tok, ' ' ORDER BY p) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(len(b.ts) AS BIGINT) AS n_tokens,
       CAST(len(b.ts) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_cut,
       CASE WHEN len(b.ts) = 0 THEN 0.0
            ELSE CAST(len(b.ts) - COALESCE(r.n_kept, 0) AS DOUBLE) / len(b.ts)
       END AS cut_frac,
       COALESCE(r.clean_text, '') AS clean_text
FROM base b LEFT JOIN rebuilt r ON b.doc_id = r.doc_id
"""


def staged_kn_discount_sql() -> str:
    return """
WITH base AS (
  SELECT list_filter(string_split_regex(trim(lower(text)), '\\s+'),
                     x -> x <> '') AS ts
  FROM documents
), tri AS (
  SELECT UNNEST(list_transform(range(len(ts) - 2),
                i -> array_to_string(ts[i+1 : i+3], ' '))) AS g
  FROM base WHERE len(ts) >= 3
), c AS (SELECT g, COUNT(*) AS c FROM tri GROUP BY g)
SELECT CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n1_types,
       CAST(SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END) AS BIGINT) AS n2_types,
       CAST(COUNT(*) AS BIGINT) AS total_types,
       CAST(SUM(c) AS BIGINT) AS total_tokens,
       CASE WHEN (SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                  + 2 * SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END)) > 0
            THEN CAST(SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS DOUBLE)
                 / (SUM(CASE WHEN c = 1 THEN 1 ELSE 0 END)
                    + 2 * SUM(CASE WHEN c = 2 THEN 1 ELSE 0 END))
            ELSE NULL END AS discount_estimate
FROM c
"""


def test_staged_duckdb_oracles_bit_exact(spark):
    import duckdb

    from comlake_core_spark.session import tables

    docs = tables(spark, SF_DIR, ["documents"])["documents"]
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{SF_DIR}/documents.parquet'")

    got = sorted(
        tuple(r)
        for r in exact_substring_cut(docs, span=CUT_SPAN, min_docs=CUT_MIN_DOCS).collect()
    )
    want = sorted(tuple(r) for r in con.sql(staged_cut_sql()).fetchall())
    assert len(got) > 0
    assert got == want
    # the operator must actually bind on the synthetic near-dup corpus
    assert any(r[2] > 0 for r in got), "no spans cut at sf0.001 — pick a binding span"

    got_k = sorted(tuple(r) for r in kn_singleton_stats(docs).collect())
    want_k = sorted(tuple(r) for r in con.sql(staged_kn_discount_sql()).fetchall())
    assert got_k == want_k


def test_registered_oracles_match_staged_copies():
    """r13 registration pin: the registry copies of the staged oracles
    must stay byte-identical to the versions proven bit-exact above —
    the same discipline the r11/r12 staged pairs used."""
    from comlake_core_spark.workloads import REGISTRY

    assert REGISTRY["exact_substring_cut"].oracle == staged_cut_sql()
    assert REGISTRY["kn_discount_estimate"].oracle == staged_kn_discount_sql()


def test_cut_and_kn_duckdb_fuzz_random_corpora(spark):
    """Oracle-level fuzz (beyond the Python-twin fuzz above): seeded
    random corpora with planted shared runs, loaded into BOTH engines,
    must hash-agree under the exact registered SQL — catches DuckDB
    dialect divergence the fixed documents table could miss by luck."""
    import random

    import duckdb
    import pandas as pd

    rng = random.Random(1302)
    vocab = [f"w{i}" for i in range(40)]
    for trial in range(3):
        runs = [
            [rng.choice(vocab) for _ in range(rng.randrange(8, 11))]
            for _ in range(2)
        ]
        rows = []
        for d in range(1, rng.randrange(10, 16)):
            words = [rng.choice(vocab) for _ in range(rng.randrange(0, 20))]
            for run in runs:
                if rng.random() < 0.4:
                    at = rng.randrange(0, len(words) + 1)
                    words = words[:at] + run + words[at:]
            rows.append((trial * 1000 + d, " ".join(words)))
        df = spark.createDataFrame(rows, "doc_id long, text string")
        con = duckdb.connect()
        con.register(
            "documents", pd.DataFrame(rows, columns=["doc_id", "text"])
        )
        got = sorted(
            tuple(r)
            for r in exact_substring_cut(
                df, span=CUT_SPAN, min_docs=CUT_MIN_DOCS
            ).collect()
        )
        want = sorted(tuple(r) for r in con.sql(staged_cut_sql()).fetchall())
        assert got == want, trial
        got_k = sorted(tuple(r) for r in kn_singleton_stats(df).collect())
        want_k = sorted(tuple(r) for r in con.sql(staged_kn_discount_sql()).fetchall())
        assert got_k == want_k, trial
