"""Dedup survivorship funnel: the per-tier accounting report a corpus
dedup run publishes — how many documents and tokens each dedup tier
(exact document, paragraph, duplicated-span) would keep, on the same
input corpus.

This is the number a data-engineering team reads BEFORE committing to a
dedup recipe (Lee et al. 2022 report exactly this table for C4/RealNews;
Dolma's datasheet publishes the same per-tier removal rates): each tier
is measured INDEPENDENTLY on the raw corpus, so the rows answer "what
would this tier alone remove", not a pipeline composition — removal
rates of chained tiers are not additive, and the independent framing is
the one the papers tabulate.

Reference scope note: comlake.core has no dedup operators; SURVEY.md
§2.4 extension composing paragraphs.py / spans.py / the exact-dedup
fingerprint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from comlake_core_spark.operators.dedup.paragraphs import paragraph_dedup
from comlake_core_spark.operators.dedup.spans import exact_substring_cut
from comlake_core_spark.operators.text.core import tokens
from comlake_core_spark.session import ensure_parallelism


def dedup_survivorship_funnel(
    df: DataFrame,
    span: int = 8,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Three-row report (stage, docs_in, docs_kept, tokens_in,
    tokens_kept, token_kept_frac):

    - ``exact``     — whole-document exact dedup on the whitespace-
      normalized lowercased fingerprint (``dedup_exact``'s key): one
      canonical document (min id) survives per cluster;
    - ``paragraph`` — ``paragraph_dedup``: documents keep their
      non-duplicate paragraphs; kept docs are those with a non-empty
      reassembly;
    - ``span``      — ``exact_substring_cut``: documents keep tokens not
      covered by a foreign-owned duplicated span run.

    All counts are exact integers over the SAME whitespace tokenizer
    (operators/text/core.tokens on the original text), and
    token_kept_frac is one double division — SQL-oracle exact.

    Scale shape: each tier is its own bounded plan (documented in its
    operator); the funnel adds only three 1-row aggregates and a 3-row
    union — nothing beyond the tiers' own exchanges.
    """
    toks = F.filter(tokens(F.col(text_col)), lambda t: t != "")
    ntok = F.size(toks).cast("long")

    def row(stage: str, agg: DataFrame) -> DataFrame:
        return agg.select(
            F.lit(stage).alias("stage"),
            F.col("docs_in").cast("long").alias("docs_in"),
            F.col("docs_kept").cast("long").alias("docs_kept"),
            F.col("tokens_in").cast("long").alias("tokens_in"),
            F.col("tokens_kept").cast("long").alias("tokens_kept"),
            F.when(F.col("tokens_in") > 0,
                   F.col("tokens_kept").cast("double") / F.col("tokens_in"))
            .otherwise(F.lit(0.0))
            .alias("token_kept_frac"),
        )

    base = ensure_parallelism(df).select(
        F.col(id_col).alias("_id"),
        ntok.alias("_nt"),
        F.md5(F.concat_ws(" ", tokens(F.lower(F.col(text_col))))).alias("_fp"),
    )
    canon = base.groupBy("_fp").agg(F.min("_id").alias("_keep"))
    exact = (
        base.join(canon, "_fp")
        .agg(
            F.count(F.lit(1)).alias("docs_in"),
            F.sum(F.when(F.col("_id") == F.col("_keep"), 1).otherwise(0)).alias(
                "docs_kept"
            ),
            F.sum("_nt").alias("tokens_in"),
            F.sum(F.when(F.col("_id") == F.col("_keep"), F.col("_nt")).otherwise(0)).alias(
                "tokens_kept"
            ),
        )
    )

    para = paragraph_dedup(df, text_col=text_col, id_col=id_col)
    kept_toks = F.size(
        F.filter(tokens(F.col("clean_text")), lambda t: t != "")
    ).cast("long")
    para_agg = (
        para.join(
            df.select(F.col(id_col), ntok.alias("_nt")), id_col
        )
        .agg(
            F.count(F.lit(1)).alias("docs_in"),
            F.sum(F.when(F.col("clean_text") != "", 1).otherwise(0)).alias("docs_kept"),
            F.sum("_nt").alias("tokens_in"),
            F.sum(kept_toks).alias("tokens_kept"),
        )
    )

    cut = exact_substring_cut(
        df, span=span, min_docs=min_docs, text_col=text_col, id_col=id_col
    )
    cut_agg = cut.agg(
        F.count(F.lit(1)).alias("docs_in"),
        F.sum(F.when(F.col("clean_text") != "", 1).otherwise(0)).alias("docs_kept"),
        F.sum("n_tokens").alias("tokens_in"),
        F.sum(F.col("n_tokens") - F.col("n_cut")).alias("tokens_kept"),
    )

    return (
        row("exact", exact)
        .unionByName(row("paragraph", para_agg))
        .unionByName(row("span", cut_agg))
    )
