"""Substring/passage-level dedup: winnowing fingerprints (copied-passage
pairs) and ExactSubstr-style duplicated-span coverage (Lee et al. 2022).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comlake_core_spark.session import ensure_parallelism, materialize


def winnow_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    w: int = 16,
    min_shared: int = 2,
    max_df: int = 100,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Substring-level near-dup pairs via winnowing fingerprints
    (operators/text.winnow_fingerprints): documents sharing >= min_shared
    selected k-gram hashes. Complements MinHash/SimHash (whole-document
    similarity) by catching copied *passages* inside otherwise-different
    documents — the winnowing guarantee makes any shared normalized run of
    w+k-1 characters produce a shared fingerprint.

    Scale design: the sketch itself is map-only; the candidate join inverts
    it into (fingerprint, doc) postings and self-joins on the fingerprint —
    the same plan shape as the MinHash band join, shuffling only 16-byte
    postings rows. `max_df` drops fingerprints appearing in more than that
    many documents (boilerplate n-grams), the standard posting-list cap that
    bounds the worst bucket to max_df^2 candidate pairs and keeps the
    self-join skew-free at 100 TB."""
    from comlake_core_spark.operators.text.winnow import winnow_fingerprints

    # persist: the postings feed the df-cap aggregate AND both sides of the
    # fingerprint self-join — without it the O(n·w) winnowing sketch is
    # re-evaluated three times (same discipline as the MinHash/SimHash
    # signature frames above; at 100 TB write the postings as a table).
    postings = (
        ensure_parallelism(df)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(winnow_fingerprints(text_col, k=k, w=w, hasher=hasher)).alias("_fp"),
        )
        .persist()
    )
    # fingerprints are distinct within a doc, so count(*) = document frequency
    rare = (
        postings.groupBy("_fp")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("_fp")
    )
    pruned = postings.join(rare, "_fp")
    b = pruned.select(F.col("_fp"), F.col("_id").alias("_id_b"))
    return (
        pruned.join(b, "_fp")
        .filter(F.col("_id") < F.col("_id_b"))
        .groupBy("_id", "_id_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
        .select(F.col("_id").alias("id_a"), F.col("_id_b").alias("id_b"), "shared_fps")
    )


def common_span_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span: int = 10,
    min_docs: int = 2,
    key: str = "text",
) -> DataFrame:
    """ExactSubstr-style duplicated-span accounting (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): a span
    of `span` consecutive tokens that appears in >= `min_docs` DISTINCT
    documents is duplicated text; per document, report how many token
    positions are covered by at least one duplicated span. This is the
    sub-document signal that motivates span CUTTING rather than document
    dropping — a news article quoting a press release is 20% duplicated,
    not a duplicate.

    Returns one row per document: (doc_id, n_tokens, n_dup_spans,
    covered_tokens, mostly_dup = covered*2 >= n_tokens).

    Exactness: coverage is the union length of fixed-length integer
    intervals — computed as sum(min(span, pos - lag(pos))) over
    positions sorted per doc, all integer arithmetic.

    Plan: map-side sliding-window explode (transform over a sequence —
    no UDF), ONE hash shuffle on the span text to count distinct owner
    docs (map-combined), one join back to positions on the span key, a
    per-doc window + aggregate sharing one doc_id exchange. Shuffle
    volume is O(total token positions) — the suffix-array original is
    O(n log n) single-machine; this banded form is the standard
    distributed approximation (span granularity = the window stride).
    At 100 TB pass key='xxhash64': the span text is hashed to a 64-bit
    fingerprint BEFORE the exchange, so the shuffle carries 8-byte keys
    instead of ~60-byte strings (same candidate semantics up to hash
    collisions, ~n²/2⁶⁴ expected false dup positions — negligible
    against the span threshold). key='text' keeps raw span text so the
    DuckDB oracle can replicate the computation exactly; both modes are
    pinned result-identical on the test corpora."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    starts = F.when(
        n >= span, F.sequence(F.lit(0), n - span)
    ).otherwise(F.array().cast("array<int>"))
    gram_text = lambda i: F.array_join(F.slice(toks, i + 1, span), " ")  # noqa: E731
    if key == "text":
        gram_key = gram_text
    elif key == "xxhash64":
        gram_key = lambda i: F.xxhash64(gram_text(i))  # noqa: E731
    else:
        raise ValueError(f"unknown span key mode {key!r}")
    grams = F.transform(
        starts, lambda i: F.struct(
            i.cast("long").alias("pos"),
            gram_key(i).alias("gram"),
        )
    )
    base = df.select(F.col(id_col), n.cast("long").alias("n_tokens"), grams.alias("_g"))
    # cut: positions feed both the distinct-owner count and the join back
    # — without it the corpus-wide sliding-window explode runs twice
    # (the jaccard persist-dependence lesson, VERDICT r4)
    pos = (
        base.select(F.col(id_col), F.explode("_g").alias("_e"))
        .select(F.col(id_col), F.col("_e.pos").alias("pos"), F.col("_e.gram").alias("gram"))
        .transform(materialize)
    )
    dup = (
        pos.groupBy("gram")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("gram")
    )
    hits = pos.join(dup, "gram").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    cov = hits.withColumn(
        "_inc",
        F.when(F.lag("pos").over(w).isNull(), F.lit(span)).otherwise(
            F.least(F.lit(span), F.col("pos") - F.lag("pos").over(w))
        ),
    )
    agg = cov.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum("_inc").alias("covered_tokens"),
    )
    return (
        base.select(id_col, "n_tokens")
        .join(agg, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce(F.col("n_dup_spans"), F.lit(0)).cast("long").alias("n_dup_spans"),
            F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("long").alias("covered_tokens"),
            (F.coalesce(F.col("covered_tokens"), F.lit(0)) * 2 >= F.col("n_tokens")).alias("mostly_dup"),
        )
    )



def exact_substring_cut(
    df: DataFrame,
    span: int = 10,
    min_docs: int = 2,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """ExactSubstr-style duplicated-span CUTTING (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better" §4.1 —
    the remove-the-substring variant their suffix-array pipeline ships):
    where ``common_span_coverage`` only ACCOUNTS for duplicated text,
    this operator performs the dedup action — every token covered by a
    duplicated ``span``-token run is excised from the document UNLESS
    the document is that run's canonical owner (min ``id_col`` among the
    documents containing it), so exactly one copy of each duplicated
    passage survives corpus-wide and quoting documents keep their
    original prose around the cut.

    Returns one row per document: (id_col, n_tokens, n_cut, cut_frac,
    clean_text) — total over the input (nothing cut → the original
    token stream; empty doc → empty text, cut_frac 0.0).  Token runs
    are case-sensitive original tokens ("exact" means verbatim), and
    ownership/coverage are pure integer/string decisions, so a SQL
    oracle replays the operator bit-for-bit (cut_frac is one double
    division of identical integers).

    Scale shape: one sliding-window gram explode (∝ tokens, row-local
    construction), ONE gram-keyed aggregate for (distinct-doc count,
    owner), a join back on the gram, position-range expansion of the
    foreign hits only (duplicated text is the minority at any healthy
    corpus), and a doc-keyed rebuild aggregate — every exchange is
    keyed on the gram or the doc, no all-pairs stage.  At 100 TB the
    gram table is the bounded artifact (types saturate); the rebuild
    shuffle carries the corpus once, the same class as the chunking /
    language-segmentation rebuilds.

    Cache lifetime (same contract as ``containment_pairs_prefix``): the
    doc-level token-array base is persisted for the build's duration —
    it feeds the gram explode, the position rebuild, and the stats join,
    so there is no safe point inside this function to release it (the
    returned frame still reads it lazily).  The blocks are dropped when
    the returned DataFrame goes unreachable (ContextCleaner); a
    long-lived session rebuilding repeatedly should bound growth with
    ``spark.catalog.clearCache()`` between builds."""
    if span < 1:
        raise ValueError("span must be >= 1")
    toks = F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != "")
    base = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("_id"), toks.alias("_ts"))
        .persist()  # feeds the gram explode, the token rebuild, and stats
    )
    n = F.size("_ts")
    gram_structs = F.transform(
        F.sequence(F.lit(0), n - span),
        lambda s: F.struct(
            s.cast("long").alias("s"),
            F.array_join(F.slice("_ts", s + 1, span), " ").alias("g"),
        ),
    )
    grams = (
        base.filter(n >= span)
        .select("_id", F.explode(gram_structs).alias("_e"))
        .select("_id", F.col("_e.s").alias("_s"), F.col("_e.g").alias("_g"))
    )
    gt = (
        grams.groupBy("_g")
        .agg(F.count_distinct("_id").alias("_nd"), F.min("_id").alias("_owner"))
        .filter(F.col("_nd") >= int(min_docs))
        .select("_g", "_owner")
    )
    covered = (
        grams.join(gt, "_g")
        .filter(F.col("_owner") != F.col("_id"))
        .select("_id", F.explode(F.sequence(F.col("_s"), F.col("_s") + span - 1)).alias("_p"))
        .distinct()
    )
    tokpos = base.select("_id", F.posexplode("_ts").alias("_p", "_tok"))
    kept = (
        tokpos.join(covered, ["_id", "_p"], "left_anti")
        .groupBy("_id")
        .agg(
            F.count(F.lit(1)).alias("_n_kept"),
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(F.struct("_p", "_tok"))),
                    lambda s: s["_tok"],
                ),
                " ",
            ).alias("clean_text"),
        )
    )
    return (
        base.select("_id", n.cast("long").alias("n_tokens"))
        .join(kept, "_id", "left")
        .select(
            F.col("_id").alias(id_col),
            "n_tokens",
            (F.col("n_tokens") - F.coalesce(F.col("_n_kept"), F.lit(0)))
            .cast("long")
            .alias("n_cut"),
            F.when(F.col("n_tokens") == 0, F.lit(0.0))
            .otherwise(
                (F.col("n_tokens") - F.coalesce(F.col("_n_kept"), F.lit(0))).cast("double")
                / F.col("n_tokens")
            )
            .alias("cut_frac"),
            F.coalesce(F.col("clean_text"), F.lit("")).alias("clean_text"),
        )
    )
