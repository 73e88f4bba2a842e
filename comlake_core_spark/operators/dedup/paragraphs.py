"""Paragraph-granularity corpus dedup (the Dolma/C4 preprocessing tier
between whole-document dedup and span cutting).

Reference scope note: comlake.core has no dedup operators at all (its
surface is catalog + content store + qast filters); this family is the
SURVEY.md §2.4 pretraining-pipeline extension, aligned with the
paragraph-level dedup Dolma (Soldaini et al. 2024, §4) and C4 (Raffel et
al. 2020, the three-sentence span rule's coarser cousin) apply before
training: boilerplate paragraphs (nav chrome, license blocks, share
footers) recur across millions of pages, and removing repeats at the
paragraph boundary preserves document flow where line-level dedup
(``dedup_lines_corpus``) is too fine and document-level too coarse.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from comlake_core_spark.session import ensure_parallelism


def paragraph_dedup(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Corpus-wide exact paragraph dedup, first occurrence wins: split
    each document into paragraphs (runs separated by >= 2 newlines,
    space-trimmed, empties dropped), keep exactly ONE occurrence of each
    distinct paragraph corpus-wide — the occurrence with the smallest
    (id_col, position) — and reassemble every document from its
    surviving paragraphs in original order.  Within-document repeats of
    a paragraph dedup under the same rule (only the first survives).

    Returns one row per input document (total): (id_col, n_paras,
    n_kept, kept_frac, clean_text) with clean_text the surviving
    paragraphs joined by a blank line, '' when nothing survives, and
    kept_frac one double division of exact integers (0.0 for
    paragraph-less documents) — so a SQL oracle replays the operator
    bit-for-bit.

    Scale shape: one paragraph explode (row-local), ONE paragraph-keyed
    aggregate for the canonical occurrence (min struct — no window, so
    no skew pivot on hot boilerplate paragraphs beyond the aggregate's
    map-side combine), an equi-join back on the paragraph key filtered
    to the owner occurrence, and a doc-keyed rebuild aggregate — every
    exchange is keyed on the paragraph hash or the doc id.  At 100 TB
    the paragraph-type table is the bounded artifact (boilerplate
    saturates); the rebuild shuffle carries each surviving paragraph
    once, the same class as the chunking / language-segmentation /
    exact-substring rebuilds.
    """
    paras_arr = F.filter(
        F.transform(F.split(F.col(text_col), "\n{2,}"), lambda s: F.trim(s)),
        lambda s: s != "",
    )
    base = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("_id"), paras_arr.alias("_ps"))
        .persist()  # feeds the occurrence explode, the rebuild, and stats
    )
    occ = base.select("_id", F.posexplode("_ps").alias("_pos", "_para"))
    # canonical occurrence per paragraph: min (doc, position) — (id, pos)
    # is unique, so the total order has no ties and the choice is exact
    own = occ.groupBy("_para").agg(
        F.min(F.struct(F.col("_id"), F.col("_pos"))).alias("_own")
    )
    kept = (
        occ.join(own, "_para")
        .filter((F.col("_own._id") == F.col("_id")) & (F.col("_own._pos") == F.col("_pos")))
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("_n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_pos", "_para"))),
                    lambda s: s["_para"],
                ),
                "\n\n",
            ).alias("clean_text"),
        )
    )
    n = F.size("_ps")
    return (
        base.select("_id", n.cast("long").alias("n_paras"))
        .join(kept, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_paras",
            F.coalesce(F.col("_n_kept"), F.lit(0)).cast("long").alias("n_kept"),
            F.when(F.col("n_paras") == 0, F.lit(0.0))
            .otherwise(
                F.coalesce(F.col("_n_kept"), F.lit(0)).cast("double")
                / F.col("n_paras")
            )
            .alias("kept_frac"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )
