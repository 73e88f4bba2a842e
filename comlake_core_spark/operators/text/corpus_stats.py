"""Corpus-level lexical statistics: distinct-n diversity, Zipf-slope
fit, vocabulary-coverage curve, MATTR/TTR, per-source OOV rate, and
sub-document n-gram novelty — the numbers a corpus curator reads before
committing a vocabulary or mixture for a 100 TB corpus.

Shared scale shape: one explode → map-combined (group, term/gram)
counts; every downstream metric is a rollup of that small table, never
a corpus re-scan; global curves ride global_running_sum (range shuffle
+ map-only Arrow cumsum), not a single-partition window."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comlake_core_spark.operators.text.core import _clean_tokens, tokens
from comlake_core_spark.session import ensure_parallelism, materialize


def ngram_novelty(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sub-document novelty: the fraction of a document's distinct word
    n-grams that occur in NO other document — the pretraining-corpus
    signal behind 'dedup at paragraph granularity' (a doc full of
    boilerplate n-grams scores near 0 even when no whole-doc near-dup
    exists; RefinedWeb / Gopher both filter on it).

    Plan: grams stay row-local (sequence+transform, no UDF) until ONE
    explode. The trick that kills the join-back: a gram with df == 1 has
    exactly ONE owner, so carrying min(doc_id) through the same
    document-frequency aggregation identifies it — the big exploded frame
    shuffles ONCE (the df agg); everything after operates on per-gram and
    per-doc frames. n_grams is a map-only array size. At 100 TB: the df
    agg is map-combined on a near-uniform key (the gram), the unique-gram
    frame re-aggregates to |docs| rows, and the final join is per-doc ×
    per-doc — a first draft that joined the exploded frame back to the
    df table measured 7.0 s at sf0.1; this shape runs ~2×."""
    from comlake_core_spark.session import ensure_parallelism

    df = ensure_parallelism(df)
    toks = tokens(F.col(text_col))
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    grams = F.array_distinct(F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " ")))
    sizes = df.select(F.col(id_col), F.size(grams).alias("n_grams"))
    uniq = (
        df.select(F.col(id_col), F.explode(grams).alias("_g"))
        .groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_df"), F.min(id_col).alias("_owner"))
        .filter(F.col("_df") == 1)
        .groupBy(F.col("_owner").alias(id_col))
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )
    return sizes.join(uniq, id_col, "left").select(
        id_col,
        "n_grams",
        F.coalesce(F.col("n_unique"), F.lit(0)).cast("long").alias("n_unique"),
        (
            F.coalesce(F.col("n_unique"), F.lit(0)).cast("double") / F.col("n_grams")
        ).alias("novelty"),
    )


def oov_rate(
    df: DataFrame,
    vocab_size: int = 20,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Out-of-vocabulary rate per source against a frequency-pruned
    vocabulary: build the top-`vocab_size` tokens by global count
    (deterministic tie-break on the token string), then measure what
    fraction of each source's token stream falls outside it — the number
    a tokenizer/vocab decision is validated with before committing a
    vocabulary for a 100 TB corpus (a source with a high OOV rate will
    fragment into subwords or <unk>s).

    Returns (source, n_tokens, n_oov, n_distinct_oov, oov_rate) with
    oov_rate = n_oov/n_tokens rounded to 6 decimals (single double
    division — engine-identical).

    Plan: the corpus is exploded ONCE, map-combined straight into
    (source, term) counts and persisted — that table is O(vocab ×
    sources) rows, a vanishing fraction of the token stream, and
    EVERYTHING downstream works off it: the global vocab counts are its
    rollup, top-V is a TakeOrdered over that rollup broadcast back, and
    the per-source metrics re-aggregate the same small table (n_oov sums
    the counts, n_distinct_oov counts its rows — one row per (source,
    term) by construction, no distinct-agg state).  One corpus-sized
    shuffle total; re-deriving the metrics from the raw token stream
    (the first draft) scanned and exploded the corpus twice."""
    per = (
        ensure_parallelism(df)
        .select(
            F.col(source_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("_t")
        )
        .filter(F.col("_t") != "")
        .groupBy(source_col, "_t")
        .agg(F.count(F.lit(1)).alias("_c"))
        # lazy localCheckpoint, not persist (r14 A/B: the columnar cache
        # write is overhead for once-per-run readers; the cut also
        # truncates both readers' plans)
        .transform(materialize)
    )
    top = (
        per.groupBy("_t")
        .agg(F.sum("_c").alias("_gc"))
        .orderBy(F.col("_gc").desc(), F.col("_t").asc())
        .limit(vocab_size)
        .select("_t", F.lit(True).alias("_iv"))
    )
    oov = F.col("_iv").isNull()
    return (
        per.join(F.broadcast(top), "_t", "left")
        .groupBy(source_col)
        .agg(
            F.sum("_c").cast("bigint").alias("n_tokens"),
            F.sum(F.when(oov, F.col("_c")).otherwise(0)).cast("bigint").alias("n_oov"),
            F.sum(F.when(oov, 1).otherwise(0)).cast("bigint").alias("n_distinct_oov"),
        )
        .select(
            source_col,
            "n_tokens",
            "n_oov",
            "n_distinct_oov",
            F.round(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov_rate"),
        )
    )


def ngram_diversity(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    ns: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """Distinct-n diversity (distinct n-grams / total n-grams) per group —
    the standard corpus self-repetition metric (distinct-1/2/3 of the NLG
    literature).  Low diversity at n=2/3 flags template/boilerplate-heavy
    sources worth down-weighting before pretraining.

    Scale shape: ONE scan builds every n's gram list row-locally
    (sequence+transform — no UDF), a single explode feeds ONE
    (group, n, gram)-keyed count with map-side combine, and the
    distinct/total division happens on the tiny per-(group, n) rollup.
    Exact distinct counts by design (it is the headline number); swap the
    final rollup for approx_count_distinct when ±2% is acceptable and the
    gram space is web-scale."""
    toks = _clean_tokens(text_col)

    def grams(n: int) -> Column:
        if n == 1:
            src = toks
        else:
            src = F.when(
                F.size(toks) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                    lambda i: F.array_join(F.slice(toks, i, n), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        return F.transform(src, lambda g: F.struct(F.lit(n).cast("long").alias("n"), g.alias("gram")))

    exploded = df.select(
        F.col(group_col), F.explode(F.flatten(F.array(*[grams(n) for n in ns]))).alias("_g")
    ).select(group_col, F.col("_g.n").alias("n"), F.col("_g.gram").alias("gram"))
    per_gram = exploded.groupBy(group_col, "n", "gram").agg(F.count(F.lit(1)).alias("_c"))
    return per_gram.groupBy(group_col, "n").agg(
        F.count(F.lit(1)).alias("distinct_grams"),
        F.sum("_c").alias("total_grams"),
    ).select(
        group_col,
        "n",
        "distinct_grams",
        "total_grams",
        F.round(F.col("distinct_grams") / F.col("total_grams"), 9).alias("diversity"),
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    top_r: int = 500,
    quantize: int = 9,
) -> DataFrame:
    """Zipf's-law fit per group: OLS slope of ln(frequency) on ln(rank)
    over the top ``top_r`` tokens.  Natural text sits near slope −1;
    a much flatter slope flags key-smashing/ID-heavy sources, a much
    steeper one flags tiny-vocabulary boilerplate — a one-number corpus
    fingerprint used alongside the diversity metrics.

    Scale shape: token counts are one map-combined agg; the rank window
    is PARTITIONED by group over the (group, term, count) rollup (never
    the corpus — per-group vocab is window-local), and WindowGroupLimit
    applies the top_r cut map-side.  The ln values land on a
    ``quantize``-decimal grid and all four OLS sums are exact decimals,
    so slope/intercept are partial-agg-order-independent and
    hash-comparable to a SQL oracle (unigram_logprob's discipline)."""
    toks = df.select(F.col(group_col), F.explode(_clean_tokens(text_col)).alias("term"))
    vocab = toks.groupBy(group_col, "term").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy(group_col).orderBy(F.col("c").desc(), F.col("term").asc())
    ranked = vocab.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= top_r)
    x = F.round(F.log(F.col("r").cast("double")), quantize)
    y = F.round(F.log(F.col("c").cast("double")), quantize)
    dsum = lambda col, p=22: F.sum(col.cast(f"decimal({p},{quantize})")).cast("double")  # noqa: E731
    s = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_ranked"),
        dsum(x).alias("_sx"),
        dsum(y).alias("_sy"),
        dsum(F.round(x * y, quantize), 24).alias("_sxy"),
        dsum(F.round(x * x, quantize), 24).alias("_sxx"),
    )
    slope = (F.col("n_ranked") * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / (
        F.col("n_ranked") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    )
    return s.select(
        group_col,
        "n_ranked",
        slope.alias("zipf_slope"),
        ((F.col("_sy") - slope * F.col("_sx")) / F.col("n_ranked")).alias("zipf_intercept"),
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    thresholds: tuple[float, ...] = (0.5, 0.9, 0.95, 0.99),
) -> DataFrame:
    """Vocabulary size needed to cover X% of corpus tokens — the curve a
    tokenizer-budget decision reads (how many types until 99% of running
    text is in-vocabulary).  Output: one row per threshold with the
    minimal frequency-ranked vocabulary size and the coverage actually
    attained there.

    Scale shape: token counts (one map-combined agg), then the
    cumulative-share curve over (count desc, term asc) via
    global_running_sum — range shuffle + map-only Arrow cumsum, NO
    single-partition window however large the vocabulary — and the
    threshold crossings collapse in ONE pass of conditional MINs (the
    share is monotone in rank, so min-rank-over-threshold is exact)."""
    from comlake_core_spark.operators.sampling import global_running_sum

    vocab = (
        df.select(F.explode(_clean_tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cum = global_running_sum(
        vocab,
        [F.col("c").desc(), F.col("term").asc()],
        "c",
        out="_cum",
        rank_out="_rank",
    )
    # the grand total is a 1-row broadcast (the share predicate needs it
    # BEFORE aggregation, so it can't be folded into the same agg pass)
    one = vocab.agg(F.sum("c").alias("_total"))
    hits = cum.crossJoin(F.broadcast(one))
    aggs = []
    for i, t in enumerate(thresholds):
        hit = (F.col("_cum").cast("double") / F.col("_total").cast("double")) >= F.lit(t)
        aggs.append(F.min(F.when(hit, F.col("_rank"))).alias(f"_v{i}"))
        aggs.append(
            F.min(F.when(hit, F.col("_cum").cast("double") / F.col("_total").cast("double"))).alias(
                f"_c{i}"
            )
        )
    row = hits.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(t).alias("threshold"),
                F.col(f"_v{i}").alias("vocab_needed"),
                F.col(f"_c{i}").alias("coverage"),
            )
            for i, t in enumerate(thresholds)
        ]
    )
    return row.select(F.explode(pairs).alias("_p")).select(
        F.col("_p.threshold").alias("threshold"),
        F.col("_p.vocab_needed").alias("vocab_needed"),
        F.col("_p.coverage").alias("coverage"),
    )


def mattr(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    window: int = 50,
    quantize: int = 9,
) -> DataFrame:
    """Moving-Average Type-Token Ratio (Covington & McFall 2010) per
    group, plus plain TTR for contrast.  Plain TTR collapses as documents
    grow (types saturate); MATTR slides a fixed ``window`` over the token
    sequence and averages per-window TTR, giving a length-independent
    lexical-diversity score — the repetition signal that catches looped
    generations and boilerplate that per-corpus distinct-n misses.

    Scale shape: entirely ROW-LOCAL array arithmetic (sequence +
    aggregate over array_distinct slices — no UDF, no explode): each doc
    costs O(len·window) inside codegen, and the group rollup is one
    map-combined agg on ``quantize``-decimal-grid values (exact sums,
    hash-comparable)."""
    toks = _clean_tokens(text_col)
    n = F.size(toks)
    n_windows = n - (window - 1)
    win_sum = F.aggregate(
        F.sequence(F.lit(1), n_windows),
        F.lit(0).cast("long"),
        lambda acc, i: acc + F.size(F.array_distinct(F.slice(toks, i, window))),
    )
    doc_mattr = F.when(
        n < window, F.size(F.array_distinct(toks)).cast("double") / n
    ).otherwise(win_sum.cast("double") / (n_windows * window).cast("double"))
    doc_ttr = F.size(F.array_distinct(toks)).cast("double") / n
    per_doc = df.select(
        F.col(group_col),
        F.round(doc_mattr, quantize).alias("_m"),
        F.round(doc_ttr, quantize).alias("_t"),
    ).filter(F.size(toks) > 0)
    dsum = lambda c: F.sum(F.col(c).cast(f"decimal(20,{quantize})")).cast("double")  # noqa: E731
    return per_doc.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        (dsum("_m") / F.count(F.lit(1))).alias("avg_mattr"),
        (dsum("_t") / F.count(F.lit(1))).alias("avg_ttr"),
    )
