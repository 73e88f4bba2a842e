"""Interpolated Kneser-Ney trigram LM scoring (Kneser & Ney 1995; Chen
& Goodman 1999) — the model class behind the KenLM perplexity filter in
CCNet/LLaMA-style pipelines.  See kneser_ney_trigram_logprob for the
model equations and the engine-agreement discipline."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from comlake_core_spark.operators.text.core import tokens
from comlake_core_spark.session import ensure_parallelism, materialize


def _kn_trigram_scores(
    score_df: DataFrame,
    lm_df: DataFrame,
    text_col: str,
    id_col: str,
    discount: float,
    quantize: int,
    floor: float,
) -> DataFrame:
    """Scored trigram frame behind kneser_ney_trigram_logprob: one row per
    scoring-side trigram with the interpolated-KN probability (quantized)
    and its log.  Split out so tests can audit token-level probabilities
    (e.g. sum-to-one over a context) without re-deriving the pipeline."""
    lowered = F.lower(F.col(text_col))
    toks_arr = F.filter(tokens(lowered), lambda x: x != "")
    D = float(discount)

    def grams(df: DataFrame, n: int, names: list[str]) -> DataFrame:
        ts = toks_arr.alias("_ts")
        idx = F.sequence(F.lit(0), F.size(ts) - n)
        g = F.transform(idx, lambda i: F.struct(*[ts[i + j].alias(names[j]) for j in range(n)]))
        return (
            df.filter(F.size(toks_arr) >= n)
            .select(F.col(id_col), F.explode(g).alias("_g"))
            .select(F.col(id_col), *[F.col(f"_g.{c}").alias(c) for c in names])
        )

    lm = ensure_parallelism(lm_df)
    # ONE corpus explode serves BOTH n-gram orders (r12 fold; the r11
    # shape ran a second, separate bigram-type explode over the whole
    # corpus — 0.70 s next to the 0.75 s trigram pass at sf0.1,
    # SCALING.md r11): position i of every >=2-token document emits
    # (w1=t[i], w2=t[i+1], w3=t[i+2] or NULL at the document edge).
    # Every bigram occurrence is some row's (w1, w2) and every trigram
    # is a w3-non-null row, so the single aggregate below carries both
    # orders and the bigram-type table becomes a TYPE-LEVEL rollup
    # instead of a corpus re-scan.
    ts2 = toks_arr.alias("_ts")
    pgrams = F.transform(
        F.sequence(F.lit(0), F.size(ts2) - 2),
        lambda i: F.struct(
            ts2[i].alias("w1"),
            ts2[i + 1].alias("w2"),
            # branch-guarded: CaseWhen evaluates the value only when the
            # condition holds, so the doc-edge row never indexes past the
            # array (which would throw under ANSI)
            F.when(i + 2 < F.size(ts2), ts2[i + 2]).alias("w3"),
        ),
    )
    base = (
        lm.filter(F.size(toks_arr) >= 2)
        .select(F.explode(pgrams).alias("_g"))
        .select("_g.w1", "_g.w2", "_g.w3")
    )
    # the combined type table — one row per distinct (w1, w2,
    # w3-or-NULL); EVERY model table below is a rollup of this aggregate,
    # and the persist guarantees the one corpus explode materializes ONCE
    # regardless of whether Catalyst's exchange-reuse happens to dedupe
    # the repeated subtree.  At web scale this is the one singleton-
    # dominated frame (count-1 trigram types rule the Zipf tail): it is
    # O(distinct n-grams) — big, but the bounded artifact an LM build
    # materializes anyway (at 100 TB: write it as a table and reuse
    # across scoring runs).  Everything derived from it is a TYPE-COUNT
    # rollup whose output is vocabulary- or context-sized, so the
    # singleton tail is scanned exactly once per rollup and never
    # re-materialized (the count-1 fold; kn_singleton_stats exposes the
    # count-of-counts from the same aggregate).
    # lazy localCheckpoint, not persist (r14 A/B, median-of-3 at sf0.1:
    # persist 3.04 s vs checkpoint 2.17 s for the full scoring query):
    # the deserialized columnar cache write is pure overhead for a frame
    # every rollup scans exactly once per run, and the lineage cut also
    # stops the rollups' plans from re-inlining the corpus explode.  The
    # materialize-once guarantee is unchanged — stronger, in fact: a
    # checkpoint cannot be silently recomputed under cache eviction.
    cw = base.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("_c3")).transform(materialize)
    c3 = cw.filter(F.col("w3").isNotNull())
    # highest-order context totals + distinct-continuation counts (both
    # rollups of the already-aggregated c3 — no second corpus pass)
    ctx = c3.groupBy("w1", "w2").agg(
        F.sum("_c3").alias("_c2tot"), F.count(F.lit(1)).alias("_n1fw12")
    )
    # middle order works on trigram TYPES (Kneser-Ney continuation counts)
    mid = c3.groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("_n1mid_bc"))
    midtot = mid.groupBy("w2").agg(
        F.sum("_n1mid_bc").alias("_n1mid_tot"), F.count(F.lit(1)).alias("_n1fw_mid")
    )
    # unigram continuation from bigram TYPES — a distinct-agg rollup of
    # the persisted combined table (distinct (w1, w2) over ALL rows,
    # NULL-w3 rows included, is exactly the bigram type set), replacing
    # the r11 corpus re-explode + distinct; the bigram-type total is in
    # turn a rollup of the continuation counts (Σ_b N1+(·b) = |types|)
    cont = (
        cw.groupBy(F.col("w2").alias("w3c"))
        .agg(F.count_distinct(F.col("w1")).alias("_n1bw"))
        .transform(materialize)  # same rationale as cw above
    )
    n1all = cont.agg(F.sum("_n1bw").cast("double").alias("_n1all"))

    # score TYPES, not tokens (VERDICT r8 #7): the corpus-sized scoring
    # stream previously rode through all five model joins — five big
    # shuffles.  Distinct scoring trigram types are vocab-sized (they
    # saturate as the corpus grows), so the five keyed model joins now
    # run on the type table and the big stream shuffles ONCE, in the
    # final type→token join.  Per-type arithmetic is unchanged, so the
    # quantized probabilities (and the SQL oracle) are identical.
    # parallelize the SCORING side too (r14): the LM side always went
    # through ensure_parallelism, but score_df arrived raw — a small
    # single-file parquet read is ONE partition, so the whole scoring
    # explode (and the distinct's map side) ran on one core.  Measured at
    # sf0.1: the stream explode alone was 4.5 s serial vs 0.5 s spread
    # (the LM-side explode of the same corpus half).  At real scale the
    # input has splits and this is a no-op (ensure_parallelism only
    # repartitions when partitions < slots).
    stream = grams(ensure_parallelism(score_df), 3, ["w1", "w2", "w3"])
    stypes = stream.select("w1", "w2", "w3").distinct()
    scored = (
        stypes.join(c3, ["w1", "w2", "w3"], "left")
        .join(ctx, ["w1", "w2"], "left")
        .join(mid, ["w2", "w3"], "left")
        .join(midtot, ["w2"], "left")
        .join(cont, F.col("w3") == F.col("w3c"), "left")
        .drop("w3c")
        .crossJoin(F.broadcast(n1all))
    )
    pcont = F.coalesce(F.col("_n1bw"), F.lit(0)).cast("double") / F.col("_n1all")
    p2 = F.when(
        F.coalesce(F.col("_n1mid_tot"), F.lit(0)) > 0,
        (
            F.greatest(F.coalesce(F.col("_n1mid_bc"), F.lit(0)).cast("double") - F.lit(D), F.lit(0.0))
            + F.lit(D) * F.col("_n1fw_mid").cast("double") * pcont
        )
        / F.col("_n1mid_tot").cast("double"),
    ).otherwise(pcont)
    p3 = F.when(
        F.coalesce(F.col("_c2tot"), F.lit(0)) > 0,
        (
            F.greatest(F.coalesce(F.col("_c3"), F.lit(0)).cast("double") - F.lit(D), F.lit(0.0))
            + F.lit(D) * F.col("_n1fw12").cast("double") * p2
        )
        / F.col("_c2tot").cast("double"),
    ).otherwise(p2)
    p9 = F.round(p3, quantize)
    typed = scored.select(
        "w1",
        "w2",
        "w3",
        p9.alias("p"),
        F.round(F.log(F.greatest(p9, F.lit(float(floor)))), quantize).alias("lp"),
        (F.coalesce(F.col("_c2tot"), F.lit(0)) == 0).cast("int").alias("_bo"),
    )
    # inner join is lossless: typed was built from stream's own distinct
    return stream.join(typed, ["w1", "w2", "w3"]).select(
        F.col(id_col), "w1", "w2", "w3", "p", "lp", "_bo"
    )


def kneser_ney_trigram_logprob(
    score_df: DataFrame,
    lm_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    quantize: int = 9,
    floor: float = 1e-9,
) -> DataFrame:
    """Per-document average trigram log-probability under an interpolated
    Kneser-Ney LM (Kneser & Ney 1995; Chen & Goodman 1999 eq. 4.x family,
    single discount D) trained on `lm_df` — the model class behind the
    KenLM perplexity filter in CCNet/LLaMA-style data pipelines, one
    order and one discount up from bigram_backoff_logprob:

        P(c|a,b) = (max(c(abc)-D,0) + D·N1+(ab·)·P(c|b)) / c(ab·)
        P(c|b)   = (max(N1+(·bc)-D,0) + D·N1+(b·)·Pcont(c)) / N1+(·b·)
        Pcont(c) = N1+(·c) / N1+(··)        (over bigram TYPES)

    with hard backoff to the next order when a denominator is absent
    (unseen context), and a probability floor before ln for the
    never-seen-anywhere tail.  The continuation counts are what make KN
    the strong smoother: a word's unigram weight is how many CONTEXTS it
    completes, not how often it occurs ("San Francisco" inflates
    c(francisco) but not N1+(·francisco)).

    Engine-agreement discipline as everywhere: all counts are exact
    integers from aggregates; each interpolated probability is one
    double expression of identical inputs, rounded to the
    `quantize`-decimal grid before ln, which lands on the grid again;
    the per-doc sum is exact decimal — replayable by a SQL oracle
    (registers in r7; built under the r6 registry freeze).

    Plan: ONE trigram agg over the LM slice; every other model table
    (context totals, continuation counts) is a rollup of that
    aggregated frame, never a corpus re-scan; bigram types add one
    distinct.  Scoring is a map-only trigram explode + five keyed joins
    onto model tables (web-scale vocab shuffles, it does not broadcast)
    + a 1-row broadcast total.  Returns (doc_id, n_trigrams,
    n_backoff_ctx, avg_logprob)."""
    scored = _kn_trigram_scores(
        score_df, lm_df, text_col, id_col, discount, quantize, floor
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum("_bo").cast("long").alias("n_backoff_ctx"),
            F.sum(F.col("lp").cast(f"decimal(28,{quantize})")).alias("_s"),
        )
        .select(
            id_col,
            "n_trigrams",
            "n_backoff_ctx",
            (F.col("_s").cast("double") / F.col("n_trigrams")).alias("avg_logprob"),
        )
    )


def kn_singleton_stats(
    lm_df: DataFrame,
    text_col: str = "text",
) -> DataFrame:
    """Count-of-counts over the trigram TYPE table: N1 (types occurring
    exactly once), N2 (exactly twice), total types/tokens, and the
    Chen & Goodman (1999) leave-one-out discount estimate
    D = N1 / (N1 + 2·N2) — the number that replaces the fixed
    ``discount=0.75`` when fitting KN to a real corpus.  This is the
    count-1 fold made first-class: at web scale singleton trigram types
    dominate the Zipf tail, so N1 both drives the discount estimate and
    measures how much of the type table the tail is.

    Exact integers plus one double division, so the result is
    SQL-oracle-exact.  Degenerate corpora are well-defined (ADVICE r12):
    when N1 + 2·N2 = 0 — every trigram type occurs >= 3 times, or the
    corpus has no trigrams at all — the estimate is NULL rather than a
    NaN/0-division artifact, signalling "no leave-one-out evidence; keep
    the fixed 0.75 default".  Plan: the same one-explode (w1, w2,
    nullable-w3) aggregate as scoring, then ONE count-of-counts rollup —
    the singleton-dominated frame is scanned once and reduced to a 1-row
    summary; nothing corpus-sized shuffles twice."""
    lowered = F.lower(F.col(text_col))
    toks_arr = F.filter(tokens(lowered), lambda x: x != "")
    ts = toks_arr.alias("_ts")
    pgrams = F.transform(
        F.sequence(F.lit(0), F.size(ts) - 2),
        lambda i: F.struct(
            ts[i].alias("w1"),
            ts[i + 1].alias("w2"),
            F.when(i + 2 < F.size(ts), ts[i + 2]).alias("w3"),
        ),
    )
    cw = (
        ensure_parallelism(lm_df)
        .filter(F.size(toks_arr) >= 2)
        .select(F.explode(pgrams).alias("_g"))
        .select("_g.w1", "_g.w2", "_g.w3")
        .groupBy("w1", "w2", "w3")
        .agg(F.count(F.lit(1)).alias("_c"))
        .filter(F.col("w3").isNotNull())
    )
    return cw.agg(
        F.sum(F.when(F.col("_c") == 1, 1).otherwise(0)).cast("long").alias("n1_types"),
        F.sum(F.when(F.col("_c") == 2, 1).otherwise(0)).cast("long").alias("n2_types"),
        F.count(F.lit(1)).cast("long").alias("total_types"),
        F.sum("_c").cast("long").alias("total_tokens"),
    ).select(
        "n1_types",
        "n2_types",
        "total_types",
        "total_tokens",
        F.when(
            (F.col("n1_types") + 2 * F.col("n2_types")) > 0,
            F.col("n1_types").cast("double")
            / (F.col("n1_types") + 2 * F.col("n2_types")).cast("double"),
        )
        .otherwise(F.lit(None).cast("double"))
        .alias("discount_estimate"),
    )
