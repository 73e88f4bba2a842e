"""Per-document quality rules: Gopher-style filter rules (Rae et al.
2021, arXiv:2112.11446 §A1.1) and within-document repetition metrics —
the keep/drop gates a pretraining pipeline applies before paying for
dedup or packing on rejected documents."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from comlake_core_spark.operators.text.core import tokens


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style within-document repetition metrics: token count,
    distinct-token count, the most frequent token's count, and a
    repetition flag (over half the tokens are repeats, or one token is
    more than 20% of the document). All metrics are integers and the flag
    is integer cross-multiplication — no FP, so the SQL oracle matches
    bitwise.

    Scale shape: explode → (doc, token) count with map-side partial
    aggregation (the combine collapses each partition's duplicates before
    the shuffle, so shuffle volume is per-partition-distinct tokens, not
    raw tokens), then a doc-level roll-up whose input is already tiny.
    A row-local alternative (aggregate over array_distinct) avoids both
    shuffles but is O(n²) per document — wrong for long documents.
    """
    tok = df.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.trim(F.col(text_col))))).alias("_tok"),
    ).filter(F.col("_tok") != "")
    per = tok.groupBy(id_col, "_tok").agg(F.count(F.lit(1)).alias("_c"))
    return per.groupBy(id_col).agg(
        F.sum("_c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("_c").alias("max_token_count"),
        (
            (2 * F.count(F.lit(1)) < F.sum("_c"))
            | (5 * F.max("_c") > F.sum("_c"))
        ).alias("is_repetitive"),
    )


# Gopher document-quality stop set (Rae et al. 2021, arXiv:2112.11446
# §A1.1): a document must contain at least 2 of these to pass the
# "contains common English words" rule.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021,
    arXiv:2112.11446 §A1.1; the same family FineWeb/Dolma apply before
    pretraining): per-document word count bounds, mean word length
    bounds, alphabetic-word fraction, and a common-stopword floor, plus
    the composite keep decision.

    All rules are per-row Column arithmetic over one whitespace
    tokenization — map-only, whole-stage codegen, zero shuffles: at
    100 TB this runs at scan speed and the keep flag prunes the corpus
    before any downstream (dedup/pack) stage pays for rejected docs.
    Thresholds follow the paper: 50 <= words <= 100_000,
    3 <= mean_word_len <= 10, >= 80% words with an alphabetic char,
    >= 2 distinct hits... counted as TOTAL stopword occurrences here
    (both engines agree; the paper is ambiguous and total-hits is the
    common reimplementation).  `keep` is INT 0/1 so the driver
    canonicalizer sees a scalar."""
    t = tokens(text_col)
    wc = F.size(t)
    sum_len = F.aggregate(
        F.transform(t, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
    )
    mean_wl = F.round(sum_len.cast("double") / wc, 6)
    alpha = F.size(F.filter(t, lambda w: w.rlike("[a-zA-Z]")))
    alpha_frac = F.round(alpha.cast("double") / wc, 6)
    stop_hits = F.size(
        F.filter(t, lambda w: F.lower(w).isin(*GOPHER_STOPWORDS))
    )
    keep = (
        wc.between(50, 100_000)
        & mean_wl.between(3.0, 10.0)
        & (alpha_frac >= 0.8)
        & (stop_hits >= 2)
    )
    return df.select(
        F.col(id_col),
        wc.alias("word_count"),
        mean_wl.alias("mean_word_len"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.cast("int").alias("stop_hits"),
        keep.cast("int").alias("keep"),
    )
