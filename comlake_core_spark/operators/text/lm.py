"""Corpus-trained fluency scores: unigram log-probability (CCNet-style)
and stupid-backoff bigram LM scoring (Brants et al., EMNLP 2007).  Both
quantize every ln onto a fixed decimal grid and sum exactly in decimal,
so per-doc scores hash-match a SQL oracle; see kneser_ney.py for the
trigram Kneser-Ney member of the family."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from comlake_core_spark.operators.text.core import tokens
from comlake_core_spark.session import ensure_parallelism, materialize


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quantize: int = 9,
) -> DataFrame:
    """Per-document average token log-probability under the corpus's own
    unigram language model — the CCNet-style fluency/quality signal
    (documents full of rare junk tokens score far below well-formed prose;
    filter or re-weight by it before pretraining).

    score(doc) = (1/|doc|) Σ_t ln(count(t)/total_tokens)

    Scale shape: ONE explode pass feeds both the vocab count agg and the
    per-doc re-agg; the token→vocab join is on the term itself (near-
    uniform key, no broadcast needed — vocab at web scale exceeds a
    broadcast). The ln lands on a ``quantize``-decimal grid and the
    per-doc sum is exact decimal, so the result is independent of
    partial-aggregation order and hash-comparable to a SQL oracle (same
    discipline as bm25_search's quantize)."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    ).filter(F.col("term") != "")
    # r14: lazy localCheckpoint, not persist (cache write is overhead
    # for once-per-run readers; cut truncates the scoring join's plan)
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("_c")).transform(materialize)
    total = vocab.agg(F.sum("_c").cast("double").alias("_t"))
    contrib = F.round(F.log(F.col("_c").cast("double") / F.col("_t")), quantize).cast(
        f"decimal(20,{quantize})"
    )
    return (
        toks.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(contrib).alias("_lp"),
        )
        .select(
            id_col,
            "n_tokens",
            (F.col("_lp").cast("double") / F.col("n_tokens")).alias("avg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# stupid-backoff bigram language model
# ---------------------------------------------------------------------------


def bigram_backoff_logprob(
    score_df: DataFrame,
    lm_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
    quantize: int = 9,
) -> DataFrame:
    """Per-document average log-score under a stupid-backoff bigram LM
    (Brants et al., EMNLP 2007 — "Large Language Models in Machine
    Translation") trained on `lm_df` and applied to `score_df` — the
    CCNet recipe: an LM over a curated slice scores candidate documents,
    and the score buckets drive keep/drop/re-weight decisions.  A bigram
    model separates word-salad from prose far better than the unigram
    fluency score (unigram_logprob), and stupid backoff needs no
    discounting state — exactly why it won at web scale.

        S(w|v) = c(vw)/c(v)            if c(vw) > 0
               = alpha * P1(w)         otherwise
        P1(w)  = (c(w)+1)/(N+V+1)      (add-one over the LM vocab; handles OOV)

    First tokens score ln(P1) with no penalty.  Every ln lands on a
    `quantize`-decimal grid and the per-doc sum is exact decimal
    (unigram_logprob's discipline), so the result hash-matches a SQL
    oracle.

    Returns (doc_id, n_tokens, n_backoff, avg_logprob) where n_backoff
    counts scored tokens that fell through to the unigram path.

    Plan: token/bigram count aggs over the LM slice (map-combined, keyed
    on the term — web-scale vocab shuffles, it does not broadcast); the
    scoring side is a MAP-ONLY (pos, term, prev) explode (prev comes
    from the token array itself, no lag window) + three keyed joins onto
    the count tables; totals ride a 1-row broadcast."""
    lowered = F.lower(F.col(text_col))
    toks_arr = F.filter(tokens(lowered), lambda x: x != "")

    lm_toks = ensure_parallelism(lm_df).select(F.explode(toks_arr).alias("_w"))
    uni = lm_toks.groupBy("_w").agg(F.count(F.lit(1)).alias("_c")).transform(materialize)  # r14: same rationale as unigram_logprob's vocab cut
    totals = uni.agg(
        F.sum("_c").cast("double").alias("_n"),
        F.count(F.lit(1)).cast("double").alias("_v"),
    )
    lm_pairs = (
        lm_df.select(toks_arr.alias("_ts"))
        .filter(F.size("_ts") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_ts") - 1),
                    lambda i: F.struct(
                        F.element_at("_ts", i).alias("_prev"),
                        F.element_at("_ts", i + 1).alias("_w"),
                    ),
                )
            ).alias("_bg")
        )
        .select("_bg._prev", "_bg._w")
    )
    bi = lm_pairs.groupBy("_prev", "_w").agg(F.count(F.lit(1)).alias("_cb"))

    scored_toks = (
        score_df.select(F.col(id_col), toks_arr.alias("_ts"))
        .filter(F.size("_ts") >= 1)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_ts")),
                    lambda i: F.struct(
                        (i - 1).alias("_pos"),
                        F.element_at("_ts", i).alias("_w"),
                        F.when(i > 1, F.element_at("_ts", i - 1)).alias("_prev"),
                    ),
                )
            ).alias("_tk"),
        )
        .select(id_col, "_tk._pos", "_tk._w", "_tk._prev")
    )
    up = uni.select(F.col("_w").alias("_prev"), F.col("_c").alias("_cp"))
    joined = (
        scored_toks.join(uni, "_w", "left")
        .join(up, "_prev", "left")
        .join(bi, ["_prev", "_w"], "left")
        .crossJoin(F.broadcast(totals))
    )
    p1 = (F.coalesce(F.col("_c"), F.lit(0)).cast("double") + 1.0) / (
        F.col("_n") + F.col("_v") + 1.0
    )
    contrib = F.round(
        F.when(F.col("_pos") == 0, F.log(p1))
        .when(
            F.col("_cb").isNotNull(),
            F.log(F.col("_cb").cast("double") / F.col("_cp").cast("double")),
        )
        .otherwise(F.log(F.lit(alpha) * p1)),
        quantize,
    ).cast(f"decimal(20,{quantize})")
    backoff = F.when(
        (F.col("_pos") > 0) & F.col("_cb").isNull(), 1
    ).otherwise(0)
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(backoff).cast("bigint").alias("n_backoff"),
            F.sum(contrib).alias("_lp"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_backoff",
            (F.col("_lp").cast("double") / F.col("n_tokens")).alias("avg_logprob"),
        )
    )
