"""Scalar text Columns shared by every text family: tokenization, token
counting, ratio heuristics, quality score, language-ID, document
fingerprint, URL canonicalization, and the one-pass per-doc stats frame.

All expressions are JVM built-ins (whole-stage codegen eligible) — no
Python UDFs — so they run at full scan speed on 100 TB of documents.
The reference has no text operators at all (SURVEY.md §2.4); these extend
its extract path (reference extract/data.clj:29-37) with the operations an
LLM data pipeline needs over a `documents(text)` table.

Engine-agreement note: everything here is per-row arithmetic on identical
inputs, so results match a SQL oracle bitwise (see workloads package doc).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


# Tiny deterministic stopword list per language bucket; enough for a
# ratio-based heuristic without shipping a model.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# Marker words for the n-gram/keyword language-ID heuristic. Real pipelines
# plug fasttext/cld3 here via mapInPandas; the heuristic keeps the operator
# dependency-free and deterministic.
LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "die", "und", "ist"),
    "fr": ("le", "la", "et", "est"),
    "es": ("el", "la", "y", "es"),
    "zh": (),  # CJK detected by script, not stopwords
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of trimmed text (split on runs of spaces)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Approximate subword token count: words plus digit runs plus
    punctuation marks, the usual ~heuristic for budgeting LLM token costs
    without a tokenizer dependency."""
    c = F.col(text) if isinstance(text, str) else text
    words = F.size(F.split(F.trim(c), r"\s+"))
    # every 4 chars beyond the first of a long word adds ~1 subword token
    extra = (F.length(c) - words) / F.lit(16.0)
    return (words + F.floor(extra)).cast("long")


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    toks = tokens(text)
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    return n_sw.cast("double") / F.size(toks)


def punct_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(c, r"[.,;:!?'\"()\[\]{}-]", "")
    return (F.length(c) - F.length(stripped)).cast("double") / F.length(c)


def avg_token_len(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.size(toks)


def quality_score(text: Column | str) -> Column:
    """Composite heuristic quality score in [0, 1]: rewards mid-length docs
    with natural stopword density and low punctuation noise.  Weights are
    arbitrary but fixed; pipelines filter on a threshold."""
    c = F.col(text) if isinstance(text, str) else text
    n = token_count(c).cast("double")
    length_term = F.least(n / F.lit(100.0), F.lit(1.0))
    sw_term = F.least(stopword_ratio(c) * 4, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(c) * 10, F.lit(1.0))
    return (length_term * 0.4 + sw_term * 0.3 + punct_term * 0.3).alias("quality")


def lang_id(text: Column | str) -> Column:
    """Marker-word / script language-ID heuristic → 2-letter code or 'und'.

    CJK by Unicode-script regex; otherwise the language whose marker words
    hit most tokens wins (ties broken by fixed language order)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)

    def hits(lang: str) -> Column:
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        return F.size(F.filter(toks, lambda t: F.array_contains(markers, F.lower(t))))

    is_cjk = c.rlike(r"[一-鿿]")
    en, de, fr, es = hits("en"), hits("de"), hits("fr"), hits("es")
    best = F.greatest(en, de, fr, es)
    return (
        F.when(is_cjk, F.lit("zh"))
        .when(best == 0, F.lit("und"))
        .when(en == best, F.lit("en"))
        .when(de == best, F.lit("de"))
        .when(fr == best, F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    lowercased text.  md5 is identical across Spark and any SQL oracle,
    making this the canonical exact-dedup key."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass per-document stats frame — single scan, codegen'd, no
    shuffle; at 100 TB this is a map-only job."""
    return df.select(
        id_col,
        token_count(text_col).alias("n_tokens"),
        F.length(text_col).alias("n_chars_computed"),
        avg_token_len(text_col).alias("avg_token_len"),
        stopword_ratio(text_col).alias("stopword_ratio"),
        punct_ratio(text_col).alias("punct_ratio"),
        fingerprint(text_col).alias("fingerprint"),
    )


def normalize_url(url: Column | str) -> Column:
    """Canonicalize a URL for exact URL-level deduplication (the first
    dedup stage of every web-corpus pipeline — CCNet/RefinedWeb dedup by
    normalized URL before any content pass): lowercase, drop the
    `www.` host prefix, strip tracking query parameters (`utm_*`,
    `ref`), and trim dangling `?`/`&` separators.  Pure per-row string
    ops — codegen'd, shuffle-free; the groupBy on the normalized key is
    the only exchange a URL-dedup pass needs."""
    c = F.col(url) if isinstance(url, str) else url
    u = F.lower(c)
    u = F.regexp_replace(u, r"://www\.", "://")
    u = F.regexp_replace(u, r"(utm_[a-z]+|ref)=[^&]*&?", "")
    return F.regexp_replace(u, r"[?&]+$", "")


def _clean_tokens(text: Column | str) -> Column:
    """Lowercased whitespace tokens with empties dropped — the shared
    tokenization of the corpus-statistics family (same convention as
    unigram_logprob's explode + filter, kept row-local here)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(tokens(F.lower(c)), lambda t: t != "")
