"""Cross-source n-gram overlap matrix — the corpus-composition audit that
tells a pretraining-data team which sources are near-copies of each other
(mirror sites, re-crawls, dataset laundering) BEFORE mixture weights are
chosen.

Reference scope note: comlake.core has no corpus-analysis operators (its
surface is catalog + content store + qast filters); this is a SURVEY.md
§2.4 extension in the family of Dolma's source-overlap audits (Soldaini
et al. 2024) and the cross-dataset contamination matrices of Elazar et
al. 2024 ("What's In My Big Data?") — pairwise TYPE-set containment is
the standard first look because it is insensitive to source size skew
in a way raw token overlap is not.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from comlake_core_spark.operators.text.core import tokens
from comlake_core_spark.session import ensure_parallelism


def source_ngram_overlap(
    df: DataFrame,
    n: int = 3,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Ordered-pair n-gram TYPE containment between sources: for every
    (src_a, src_b) with src_a != src_b and at least one shared gram
    type, containment C(a→b) = |types(a) ∩ types(b)| / |types(a)| —
    the fraction of a's distinct (lowercased, whitespace-tokenized)
    n-grams that also occur anywhere in b.  Output (src_a, src_b,
    types_a, shared_types, containment) is at most S·(S−1) rows for S
    sources; containment is one double division of exact integers, so a
    SQL oracle replays it bit-for-bit.

    Scale shape: gram explode → ONE map-combined distinct to the
    (source, gram) TYPE table (the bounded artifact: types saturate at
    web scale while tokens grow), a gram-keyed self-join whose worst
    bucket is S² rows per gram type (S = #sources, tiny), one
    map-combined pair count, and a broadcast join of the S-row per-source
    type counts.  Nothing corpus-sized shuffles twice, and no all-pairs
    document stage exists anywhere.
    """
    if n < 1:
        raise ValueError("n must be >= 1")
    toks = F.filter(tokens(F.lower(F.col(text_col))), lambda x: x != "")
    ts = toks.alias("_ts")
    grams = F.transform(
        F.sequence(F.lit(0), F.size(ts) - n),
        lambda i: F.array_join(F.slice(ts, i + 1, n), " "),
    )
    types = (
        ensure_parallelism(df)
        .filter(F.size(toks) >= n)
        .select(F.col(source_col).alias("_src"), F.explode(grams).alias("_g"))
        .distinct()
    )
    per_source = types.groupBy("_src").agg(F.count(F.lit(1)).alias("types_a"))
    a = types.select(F.col("_src").alias("src_a"), "_g")
    b = types.select(F.col("_src").alias("src_b"), "_g")
    shared = (
        a.join(b, "_g")
        .filter(F.col("src_a") != F.col("src_b"))
        .groupBy("src_a", "src_b")
        .agg(F.count(F.lit(1)).alias("shared_types"))
    )
    return (
        shared.join(
            F.broadcast(per_source.select(F.col("_src").alias("src_a"), "types_a")),
            "src_a",
        )
        .select(
            "src_a",
            "src_b",
            F.col("types_a").cast("long").alias("types_a"),
            F.col("shared_types").cast("long").alias("shared_types"),
            (F.col("shared_types").cast("double") / F.col("types_a")).alias(
                "containment"
            ),
        )
    )
