"""Token-budgeted corpus assembly with per-source caps.

Pretraining data mixes are assembled to a TOKEN budget, not a document
count: "fill N tokens, with no source contributing more than a capped
share" is the operation behind every published mixture table (the
Pile's per-set epochs, LLaMA's sampling proportions, Dolma's source
budgets).  The reference has no sampling operators at all (extension
surface, SURVEY.md §2.4); this one closes the gap between the engine's
RATE-based mixers (temperature_mixture / mixture_resample, which pick a
fraction per source) and the absolute-budget contract a training run
actually has.

Semantics — deterministic greedy prefix fill:

1. every document gets a portable priority ``md5(doc_id)`` (the
   engine's seeded-draw idiom: uniform, reproducible, recomputable
   bit-for-bit by any SQL engine);
2. per source, documents are taken in priority order while the
   source's cumulative token count stays within ``cap_frac * budget``
   (the cap is materialized as an integer token count — no float
   threshold);
3. the capped survivors are taken in the SAME global priority order
   while the global cumulative count stays within ``budget``.

Both passes are PREFIX rules (a document that would overflow ends the
take), so the result is a pure function of (corpus, budget, cap_frac)
— no RNG state, no driver-side iteration — and the DuckDB oracle
(staged in tests/test_r12_staged.py for the r12 registration) mirrors
it with two window cumulative sums.

Spark shape at 100 TB: one map pass for token counts + priorities, one
hash exchange on source for the per-source window, and the global pass
uses :func:`~comlake_core_spark.operators.sampling.global_running_sum`
— range shuffle + O(P) offsets + map-only Arrow cumsum — NOT the
single-partition window a naive ``sum().over(Window.orderBy(...))``
degenerates to.  Token counts accumulate as integers, so the prefix
sums are exact at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comlake_core_spark.operators.sampling import global_running_sum
from comlake_core_spark.session import ensure_parallelism


def token_budget_fill(
    df: DataFrame,
    budget_tokens: int,
    cap_frac: float = 0.5,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
) -> DataFrame:
    """Select documents to fill ``budget_tokens`` whitespace tokens with
    no source exceeding ``int(cap_frac * budget_tokens)`` tokens, both
    by deterministic greedy prefix in md5-priority order.  Returns the
    per-source assembly summary (source, n_docs, n_tokens) — the
    mixture table of the selected set."""
    budget = int(budget_tokens)
    cap = int(cap_frac * budget)
    n_tok = F.size(
        F.filter(F.split(F.trim(F.col(text_col)), r"\s+"), lambda x: x != "")
    )
    base = ensure_parallelism(df).select(
        F.col(source_col).alias("_src"),
        F.col(id_col).alias("_id"),
        n_tok.cast("long").alias("_tok"),
        F.md5(F.col(id_col).cast("string")).alias("_h"),
    )
    w_src = (
        Window.partitionBy("_src")
        .orderBy(F.col("_h").asc(), F.col("_id").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept = base.withColumn("_cs", F.sum("_tok").over(w_src)).filter(
        F.col("_cs") <= F.lit(cap)
    )
    filled = global_running_sum(
        kept, [F.col("_h").asc(), F.col("_id").asc()], "_tok", out="_cg"
    ).filter(F.col("_cg") <= F.lit(budget))
    return filled.groupBy(F.col("_src").alias(source_col)).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("_tok").alias("n_tokens"),
    )
