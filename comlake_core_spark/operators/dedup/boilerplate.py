"""Per-source boilerplate stripping (CCNet / C4-style): lines repeated
across >= min_docs documents of one source are removed everywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comlake_core_spark.session import ensure_parallelism


def strip_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    words_per_line: int = 2,
    min_docs: int = 5,
) -> DataFrame:
    """Per-source boilerplate removal: a line occurring in >= `min_docs`
    DISTINCT documents of the same source is boilerplate (nav bars,
    cookie banners, license headers — content that repeats across a
    site's pages) and is stripped from EVERY document of that source.
    Contrast with :func:`dedup_lines`, which keeps a duplicated line's
    first occurrence corpus-wide; boilerplate keeps none, and the df
    threshold is scoped per source so one site's banner never suppresses
    another site's legitimate prose. This is the CCNet/C4 cleanup stage
    that runs BEFORE document-level dedup.

    The corpus here has no newlines, so a "line" is a fixed span of
    `words_per_line` whitespace tokens (same convention as dedup_lines).

    Returns one row per document: (doc_id, n_lines, n_kept,
    kept_text_md5) — md5 of the surviving text in original line order so
    a SQL oracle can recompute it bit-for-bit.

    Shape at 100 TB: map-only explode (fanout = #lines), then the
    per-line df comes from ONE windowed pass over (source, line) — the
    count-distinct-via-window idiom, max(dense_rank ordered by doc) over
    the same partition keys, so both windows share a single
    sort-exchange and a line repeated WITHIN one doc still votes once —
    and one keyed shuffle back to doc_id for reassembly.  Never
    all-pairs, and the corpus is exploded exactly once (the first draft
    aggregated and joined the exploded frame against itself, which
    re-scanned and re-exploded every document).  Caveat shared with
    dedup_lines: a viral line concentrates its occurrences on one task;
    if that bounds throughput, fall back to the agg + join-back shape
    over a PERSISTED exploded frame."""
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
    exploded = ensure_parallelism(df).select(
        F.col(id_col), F.col(source_col), F.posexplode(lines).alias("line_idx", "line")
    )
    w_ord = Window.partitionBy(source_col, "line").orderBy(F.col(id_col).asc())
    w_all = Window.partitionBy(source_col, "line")
    flagged = (
        exploded.withColumn("_dr", F.dense_rank().over(w_ord))
        .withColumn("_df", F.max("_dr").over(w_all))
        .withColumn("keep", F.col("_df") < min_docs)
    )
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

