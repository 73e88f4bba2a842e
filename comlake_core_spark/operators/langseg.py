"""Per-line language segmentation of multilingual documents.

Web corpora routinely interleave languages inside one document
(navigation chrome around body text, quoted passages, code-switching
forums); corpus pipelines split such documents into contiguous
same-language runs and filter/route each run independently — the
paragraph-level language splitting CCNet applies before its LM quality
filter (Wenzek et al., "CCNet: Extracting High Quality Monolingual
Datasets from Web Crawl Data", LREC 2020).  The reference has no text
analysis at all (extension surface, SURVEY.md §2.4); the language
heuristic is the engine's own ``lang_id`` (operators/text/core.py) applied
per LINE instead of per document, so doc- and segment-level decisions
can never disagree about what a language "is".

Spark shape — one shuffle, never all-pairs:

1. ``posexplode`` the line split (map-side; line numbers are the split
   positions, so no window is needed to assign them);
2. line-level ``lang_id`` (pure Column expression — marker-word hits +
   CJK script regex, no UDF);
3. gaps-and-islands run grouping: ``island = line_no − row_number()
   OVER (PARTITION BY doc, lang ORDER BY line_no)`` is constant exactly
   along a contiguous same-language run — the standard
   islands idiom, ONE sort-exchange on doc_id;
4. per-(doc, lang, island) aggregate rebuilds the segment text and
   bounds; the final per-doc segment numbering is a second window over
   the SAME doc_id partitioning (no extra exchange under Catalyst's
   subset rule).

At 100 TB: segments ∝ lines, the only exchange is hash(doc_id), and a
skewed giant document concentrates one partition's worth of lines —
the same bound every per-doc window in the engine carries (AQE skew
split applies).  Blank lines are kept and classify 'und', so the
operator is total and its DuckDB oracle (same split, same markers, same
windows — staged in tests/test_langseg.py for r11 registration) is
bit-exact.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comlake_core_spark.operators.text.core import lang_id
from comlake_core_spark.session import ensure_parallelism


def language_segments(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_lines: int = 1,
) -> DataFrame:
    """Contiguous same-language line runs per document.

    Returns (id_col, seg_no, lang, start_line, end_line, n_lines,
    seg_text): seg_no is 1-based in document order, start/end_line are
    0-based inclusive line indexes, seg_text re-joins the run's lines
    with '\\n'.  ``min_lines`` drops runs shorter than the floor AFTER
    numbering, so surviving seg_no values still reveal their position
    among all runs (callers filtering chrome usually keep the numbering
    of what they kept — pass the default 1 for the total segmentation).
    """
    lines = (
        ensure_parallelism(df)
        .select(
            F.col(id_col).alias("_id"),
            F.posexplode(F.split(F.col(text_col), "\n")).alias("_ln", "_line"),
        )
        .withColumn("_lang", lang_id(F.col("_line")))
    )
    run = Window.partitionBy("_id", "_lang").orderBy("_ln")
    segs = (
        lines.withColumn("_island", F.col("_ln") - F.row_number().over(run))
        .groupBy("_id", "_lang", "_island")
        .agg(
            F.min("_ln").alias("start_line"),
            F.max("_ln").alias("end_line"),
            F.count(F.lit(1)).alias("n_lines"),
            # line order within a group is not guaranteed by groupBy —
            # sort the collected (pos, line) structs so seg_text is
            # deterministic under any partitioning
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_ln", "_line"))),
                    lambda s: s["_line"],
                ),
                "\n",
            ).alias("seg_text"),
        )
    )
    number = Window.partitionBy("_id").orderBy("start_line")
    return (
        segs.withColumn("seg_no", F.row_number().over(number))
        .filter(F.col("n_lines") >= int(min_lines))
        .select(
            F.col("_id").alias(id_col),
            "seg_no",
            F.col("_lang").alias("lang"),
            "start_line",
            "end_line",
            "n_lines",
            "seg_text",
        )
    )


def dominant_language_share(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document language mixture summary over the LINE segmentation:
    (id_col, n_langs, dominant_lang, dominant_line_share) — the routing
    statistic corpus pipelines threshold to decide 'monolingual enough'
    vs 'segment and route'.  Ties on line count break by language code
    ascending (deterministic, oracle-mirrorable).  Blank/'und' lines
    count toward the total but never win dominance unless nothing else
    is present."""
    segs = language_segments(df, text_col=text_col, id_col=id_col)
    per_lang = segs.groupBy(id_col, "lang").agg(F.sum("n_lines").alias("_n"))
    total = per_lang.groupBy(id_col).agg(
        F.sum("_n").alias("_total"),
        F.count(F.lit(1)).alias("n_langs"),
    )
    ranked = Window.partitionBy(id_col).orderBy(
        # 'und' loses every tie (and only wins alone): rank real
        # languages first, then by line count desc, then code asc
        F.when(F.col("lang") == "und", F.lit(1)).otherwise(F.lit(0)).asc(),
        F.col("_n").desc(),
        F.col("lang").asc(),
    )
    return (
        per_lang.withColumn("_rk", F.row_number().over(ranked))
        .filter(F.col("_rk") == 1)
        .join(total, id_col)
        .select(
            id_col,
            "n_langs",
            F.col("lang").alias("dominant_lang"),
            (F.col("_n").cast("double") / F.col("_total")).alias("dominant_line_share"),
        )
    )


def langseg_quality_route(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_mean_tokens_per_line: float = 3.0,
) -> DataFrame:
    """CCNet's segment-then-filter composition closed into one operator
    (Wenzek et al., LREC 2020 §3: language-split paragraphs are quality-
    filtered independently, and only the surviving runs feed the corpus):
    segment each document with :func:`language_segments`, drop runs that
    are unidentifiable ('und' — blank or marker-free lines) or too thin
    (mean whitespace tokens per line below the floor), and reassemble
    what survives in segment order.

    Returns one row per document that keeps at least one segment:
    (id_col, kept_langs, kept_lines, total_lines, kept_line_frac,
    clean_text).  ``kept_line_frac`` is the routing statistic — a doc
    whose clean fraction is low is chrome/boilerplate-dominated and a
    candidate for dropping outright.

    Spark shape: the segmentation's one doc-keyed exchange, a map-side
    token-count filter on the segment rows, and one per-doc aggregate
    over the SAME doc_id partitioning (no extra exchange under
    Catalyst's subset rule).  The thin-segment rule compares integer
    token counts against min*n_lines (no float-division threshold), so
    the DuckDB oracle (staged in tests/test_r12_staged.py for the r12
    registration) is bit-exact."""
    segs = language_segments(df, text_col=text_col, id_col=id_col)
    seg_tok = F.size(
        F.filter(F.split(F.trim(F.col("seg_text")), r"\s+"), lambda x: x != "")
    )
    flagged = segs.withColumn(
        "_keep",
        (F.col("lang") != "und")
        & (
            seg_tok.cast("double")
            >= F.lit(float(min_mean_tokens_per_line)) * F.col("n_lines").cast("double")
        ),
    )
    return (
        flagged.groupBy(id_col)
        .agg(
            F.count_distinct(F.when(F.col("_keep"), F.col("lang"))).alias("kept_langs"),
            F.sum(F.when(F.col("_keep"), F.col("n_lines")).otherwise(F.lit(0))).alias(
                "kept_lines"
            ),
            F.sum("n_lines").alias("total_lines"),
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(
                            F.when(F.col("_keep"), F.struct("seg_no", "seg_text"))
                        )
                    ),
                    lambda s: s["seg_text"],
                ),
                "\n",
            ).alias("clean_text"),
        )
        .filter(F.col("kept_lines") > 0)
        .select(
            id_col,
            "kept_langs",
            "kept_lines",
            "total_lines",
            (F.col("kept_lines").cast("double") / F.col("total_lines")).alias(
                "kept_line_frac"
            ),
            "clean_text",
        )
    )
