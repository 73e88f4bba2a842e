"""CCNet-style perplexity tiers: rank every document within its source by
LM fluency and split each source into head / middle / tail thirds — the
bucketing CCNet (Wenzek et al. 2020) ships as its quality signal, where
downstream recipes keep "head", sample "middle", and drop or audit
"tail" per source.

Reference scope note: comlake.core has no text-quality operators (its
surface is catalog + content store + qast filters); this is a SURVEY.md
§2.4 extension composing the corpus-trained unigram fluency score
(operators/text/lm.unigram_logprob — the engine's CCNet score stand-in)
with the distributed global-rank primitive.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from comlake_core_spark.operators.sampling import global_row_number
from comlake_core_spark.operators.text.lm import unigram_logprob


def perplexity_tiers(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Per-document CCNet tier within its source: documents are ranked by
    fluency (avg_logprob DESC — highest average token log-probability =
    lowest perplexity = best — ties broken on id_col), and the rank r of
    n source documents maps to ``head`` (3r <= n), ``middle``
    (3r <= 2n), else ``tail`` — exact integer arithmetic, no float
    thirds.  Returns (id_col, source_col, n_tokens, avg_logprob,
    src_rank, tier), one row per document that HAS tokens (token-less
    documents have no LM score and no tier — CCNet has nothing to rank).

    Scale shape: the fluency score is unigram_logprob's one-explode plan
    (ln on the 9-decimal grid + exact decimal sums, so both the score
    and therefore the ranks/tiers hash-match a SQL oracle).  The
    per-source rank is NOT a ``row_number() OVER (PARTITION BY source)``
    window — at 100 TB a single source holds billions of documents and
    a per-source window funnels each source through one task.  Instead
    ONE global rank over (source, score DESC, id) via
    ``global_row_number`` (range shuffle + O(P) offset table, map-only
    rank) is converted to per-source ranks by subtracting each source's
    minimum global rank — an S-row broadcast join.  The same join
    carries the S-row source counts for the tier split."""
    scored = unigram_logprob(df, text_col=text_col, id_col=id_col).join(
        df.select(F.col(id_col), F.col(source_col)), id_col
    )
    ranked = global_row_number(
        scored,
        [F.asc(source_col), F.desc("avg_logprob"), F.asc(id_col)],
        out="_grk",
    )
    per_src = ranked.groupBy(source_col).agg(
        F.min("_grk").alias("_off"), F.count(F.lit(1)).alias("_n")
    )
    rk = F.col("_grk") - F.col("_off") + F.lit(1)
    return (
        ranked.join(F.broadcast(per_src), source_col)
        .select(
            F.col(id_col),
            F.col(source_col),
            "n_tokens",
            "avg_logprob",
            rk.cast("long").alias("src_rank"),
            F.when(rk * 3 <= F.col("_n"), F.lit("head"))
            .when(rk * 3 <= 2 * F.col("_n"), F.lit("middle"))
            .otherwise(F.lit("tail"))
            .alias("tier"),
        )
    )
