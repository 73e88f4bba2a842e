"""Exact deduplication: fingerprint hash-agg, line-level (C4/RefinedWeb)
sub-document dedup, and the cluster-survivor pick (canonical_docs).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comlake_core_spark.operators.dedup.graph import connected_components
from comlake_core_spark.operators.text.core import fingerprint


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per normalized-text fingerprint.

    Hash aggregate with partial (map-side) combine: the shuffle carries one
    row per distinct document, so 100 TB with 50% dups shuffles 50 TB of
    *keys+ids*, not documents."""
    return (
        df.select(fingerprint(text_col).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_line: int = 10,
) -> DataFrame:
    """Sub-document line-level dedup (C4 §2.2 / RefinedWeb): every line that
    occurs more than once ANYWHERE in the corpus is kept only at its first
    occurrence (smallest (doc_id, line_idx)) and removed everywhere else —
    the stage that strips boilerplate (nav bars, cookie banners, license
    headers) that document-level dedup can never see. The corpus here has
    no newlines, so a "line" is a fixed span of `words_per_line` whitespace
    tokens — the operator is span-identity dedup either way.

    Returns one row per document: (doc_id, n_lines, n_kept, kept_text_md5)
    where kept_text_md5 fingerprints the surviving text in original line
    order (md5 so a SQL oracle can recompute it bit-for-bit).

    Shape at 100 TB: map-only explode (fanout = #lines), ONE hash shuffle
    on the line value for the keep-first window, one keyed shuffle back to
    doc_id for reassembly. Never all-pairs. The window partitions by full
    line text — a viral line (e.g. an empty span) concentrates its
    occurrences on one task; if that bounds throughput, pre-aggregate
    min(struct(doc_id, line_idx)) per line (map-side combine collapses the
    viral key) and join the winner back instead of sorting it."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_lines = F.greatest(
        F.ceil(F.size(toks) / F.lit(float(words_per_line))), F.lit(1)
    ).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - F.lit(1)),
        lambda i: F.array_join(
            F.slice(toks, i * words_per_line + F.lit(1), words_per_line), " "
        ),
    )
    exploded = df.select(
        F.col(id_col), F.posexplode(lines).alias("line_idx", "line")
    )
    w = Window.partitionBy("line").orderBy(F.col(id_col).asc(), F.col("line_idx").asc())
    flagged = exploded.withColumn("keep", F.row_number().over(w) == F.lit(1))
    kept_struct = F.when(F.col("keep"), F.struct(F.col("line_idx"), F.col("line")))
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda s: s["line"]
                ),
                " ",
            )
        ).alias("kept_text_md5"),
    )


def canonical_docs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    length_col: str = "n_chars",
) -> DataFrame:
    """Cluster near-dup pairs into components and pick ONE survivor per
    cluster — the keep/drop decision a dedup pipeline actually ships.
    Keep-rule: longest document wins (ties → smallest id), an exact
    integer argmax so the choice is engine-agreement deterministic.

    Plan: component labels from min-label propagation (O(diameter)
    rounds); the survivor pick is one max_by per component. Components
    are dup near-cliques so the groupBy key count ≈ cluster count —
    no skew beyond the largest dup clique, which the upstream pair
    stage already bounds (max_df / max_bucket caps)."""
    comp = connected_components(pairs, max_iter=15)
    member = comp.join(
        df.select(F.col(id_col).alias("node"), F.col(length_col).alias("_len")), "node"
    )
    return (
        member.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max_by("node", F.struct(F.col("_len"), -F.col("node"))).alias("keep_doc_id"),
            F.max("_len").alias("keep_len"),
        )
        .select("component", "keep_doc_id", F.col("keep_len").cast("long").alias("keep_len"), "n_members")
    )

