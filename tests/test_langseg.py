"""Per-line language segmentation (operators/langseg.py).

Staged during r10 (code + pytest, the r6/r7 pattern) and REGISTERED in
r11 once CORRECTNESS_r10 landed: the DuckDB oracles proven bit-exact at
the bottom are now the registry oracles verbatim
(test_registered_oracle_matches_staged pins the copy-paste)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from comlake_core_spark.operators.langseg import dominant_language_share, language_segments
from comlake_core_spark.operators.text.core import LANG_MARKERS


def _py_lang_id(line: str) -> str:
    """Python twin of operators/text.lang_id for the brute-force oracle.

    Tokenization is pinned to ASCII whitespace (Java's \\s) after a
    space-only trim, matching the engine's F.trim + split exactly — a
    Python-Unicode \\s here would disagree on lines containing NBSP /
    U+2028-class whitespace even though both readings are 'correct'."""
    if re.search(r"[一-鿿]", line):
        return "zh"
    toks = re.split(r"[ \t\n\x0b\f\r]+", line.strip(" "))
    hits = {
        lang: sum(1 for t in toks if t.lower() in set(LANG_MARKERS[lang]))
        for lang in ("en", "de", "fr", "es")
    }
    best = max(hits.values())
    if best == 0:
        return "und"
    for lang in ("en", "de", "fr", "es"):  # the expression's tie order
        if hits[lang] == best:
            return lang


def _py_segments(doc_id, text, min_lines=1):
    lines = text.split("\n")
    langs = [_py_lang_id(ln) for ln in lines]
    runs = []
    for i, (ln, lang) in enumerate(zip(lines, langs)):
        if runs and runs[-1][0] == lang and runs[-1][2] == i - 1:
            runs[-1][2] = i
            runs[-1][3].append(ln)
        else:
            runs.append([lang, i, i, [ln]])
    out = []
    for seg_no, (lang, start, end, seg_lines) in enumerate(runs, 1):
        if len(seg_lines) >= min_lines:
            out.append(
                (doc_id, seg_no, lang, start, end, len(seg_lines), "\n".join(seg_lines))
            )
    return out


DOCS = [
    (1, "the cat and the dog\nthe end of the story\nder hund und die katze\nthe cat returns"),
    (2, "le chat et le chien\nle chien est la\nel gato y el perro"),
    (3, "一句中文\nthe cat and the dog\n\nxyzzy plugh"),
    (4, "single line of the story"),
    (5, ""),
    (6, "der hund ist das\nder hund und\nthe dog and the\nder hund"),
]


def test_language_segments_matches_bruteforce(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sorted(tuple(r) for r in language_segments(df).collect())
    want = sorted(seg for i, t in DOCS for seg in _py_segments(i, t))
    assert got == want
    # runs are maximal: no two adjacent segments of one doc share a language
    by_doc = {}
    for r in got:
        by_doc.setdefault(r[0], []).append(r)
    for segs in by_doc.values():
        segs.sort(key=lambda r: r[1])
        for a, b in zip(segs, segs[1:]):
            assert a[2] != b[2] or a[4] + 1 != b[3]
        # coverage is total at min_lines=1: bounds tile the line range
        assert segs[0][3] == 0
        for a, b in zip(segs, segs[1:]):
            assert b[3] == a[4] + 1


def test_language_segments_min_lines_filters_after_numbering(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = sorted(tuple(r) for r in language_segments(df, min_lines=2).collect())
    want = sorted(seg for i, t in DOCS for seg in _py_segments(i, t, min_lines=2))
    assert got == want
    assert any(r[1] > 1 for r in got)  # numbering survives the filter


def test_dominant_language_share(spark):
    df = spark.createDataFrame(DOCS, "doc_id long, text string")
    got = {r["doc_id"]: (r["n_langs"], r["dominant_lang"], round(r["dominant_line_share"], 9))
           for r in dominant_language_share(df).collect()}
    assert got[1] == (2, "en", round(3 / 4, 9))
    assert got[2] == (2, "fr", round(2 / 3, 9))
    # doc 3: zh, en, und(blank), und(xyzzy...) -> und has 2 lines but a
    # real language must win dominance ties over 'und'
    assert got[3][1] in ("en", "zh") and got[3][0] == 3
    assert got[4] == (1, "en", 1.0)
    assert got[5] == (1, "und", 1.0)  # only 'und' present -> it wins
    assert got[6] == (2, "de", round(3 / 4, 9))


# ---------------------------------------------------------------------------
# staged DuckDB oracle (r11 registration): bit-exact vs the Spark side on
# the real documents table
# ---------------------------------------------------------------------------


def _markers_sql(lang: str) -> str:
    return "[" + ", ".join("'" + m + "'" for m in LANG_MARKERS[lang]) + "]"


STAGED_ORACLE_SQL = f"""
WITH lines AS (
  SELECT doc_id,
         UNNEST(string_split(text, chr(10))) AS line,
         UNNEST(range(1, len(string_split(text, chr(10))) + 1)) - 1 AS ln
  FROM documents
), langd AS (
  SELECT doc_id, ln, line,
         CASE
           WHEN regexp_matches(line, '[一-鿿]') THEN 'zh'
           ELSE (
             WITH h AS (
               SELECT
                 len(list_filter(string_split_regex(trim(line), '\\s+'),
                     t -> list_contains({_markers_sql("en")}, lower(t)))) AS en,
                 len(list_filter(string_split_regex(trim(line), '\\s+'),
                     t -> list_contains({_markers_sql("de")}, lower(t)))) AS de,
                 len(list_filter(string_split_regex(trim(line), '\\s+'),
                     t -> list_contains({_markers_sql("fr")}, lower(t)))) AS fr,
                 len(list_filter(string_split_regex(trim(line), '\\s+'),
                     t -> list_contains({_markers_sql("es")}, lower(t)))) AS es
             )
             SELECT CASE
               WHEN greatest(en, de, fr, es) = 0 THEN 'und'
               WHEN en = greatest(en, de, fr, es) THEN 'en'
               WHEN de = greatest(en, de, fr, es) THEN 'de'
               WHEN fr = greatest(en, de, fr, es) THEN 'fr'
               ELSE 'es' END
             FROM h
           )
         END AS lang
  FROM lines
), runs AS (
  SELECT doc_id, ln, line, lang,
         ln - row_number() OVER (PARTITION BY doc_id, lang ORDER BY ln) AS island
  FROM langd
), segs AS (
  SELECT doc_id, lang,
         MIN(ln) AS start_line, MAX(ln) AS end_line,
         CAST(COUNT(*) AS BIGINT) AS n_lines,
         string_agg(line, chr(10) ORDER BY ln) AS seg_text
  FROM runs GROUP BY doc_id, lang, island
)
SELECT doc_id,
       CAST(row_number() OVER (PARTITION BY doc_id ORDER BY start_line) AS INT) AS seg_no,
       lang, start_line, end_line, n_lines, seg_text
FROM segs
"""


STAGED_DOMINANCE_SQL = f"""
WITH segs AS ({STAGED_ORACLE_SQL}),
per_lang AS (
  SELECT doc_id, lang, SUM(n_lines) AS n
  FROM segs GROUP BY doc_id, lang
), tot AS (
  SELECT doc_id, SUM(n) AS total, CAST(COUNT(*) AS BIGINT) AS n_langs
  FROM per_lang GROUP BY doc_id
), ranked AS (
  SELECT doc_id, lang, n,
         row_number() OVER (
           PARTITION BY doc_id
           ORDER BY CASE WHEN lang = 'und' THEN 1 ELSE 0 END ASC,
                    n DESC, lang ASC) AS rk
  FROM per_lang
)
SELECT r.doc_id, t.n_langs, r.lang AS dominant_lang,
       CAST(r.n AS DOUBLE) / t.total AS dominant_line_share
FROM ranked r JOIN tot t ON r.doc_id = t.doc_id
WHERE r.rk = 1
"""


def test_registered_oracle_matches_staged():
    """r11 registration is the copy-paste of the staged oracles: pin the
    registry strings to the proven-bit-exact ones so they cannot drift."""
    from comlake_core_spark.workloads import REGISTRY

    assert REGISTRY["language_segments"].oracle.strip() == STAGED_ORACLE_SQL.strip()
    assert (
        REGISTRY["dominant_language_share"].oracle.strip()
        == STAGED_DOMINANCE_SQL.strip()
    )


def test_staged_duckdb_oracle_bit_exact(spark):
    import duckdb

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    got = sorted(tuple(r) for r in language_segments(docs).collect())
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM '{sf_dir}/documents.parquet'")
    want = sorted(tuple(r) for r in con.sql(STAGED_ORACLE_SQL).fetchall())
    assert len(got) > 0
    assert got == want
    got_dom = sorted(tuple(r) for r in dominant_language_share(docs).collect())
    want_dom = sorted(tuple(r) for r in con.sql(STAGED_DOMINANCE_SQL).fetchall())
    assert len(got_dom) == docs.count()
    assert got_dom == want_dom
