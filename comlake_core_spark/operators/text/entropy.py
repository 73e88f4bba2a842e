"""Per-document character-entropy quality scoring — the compressibility
proxy tier of a pretraining quality stack (low-entropy text is
boilerplate/template/spam; implausibly high entropy is encoded binary or
key mash).

Reference scope note: comlake.core has no text-quality operators (its
surface is catalog + content store + qast filters); this is a SURVEY.md
§2.4 extension in the family of Gopher's repetition rules (Rae et al.
2021) and the entropy/compression filters of CCNet & RefinedWeb — a
character-distribution statistic computable WITHOUT a compressor
dependency, which is what makes it shippable inside the engine.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from comlake_core_spark.session import ensure_parallelism

#: decimal grid for the per-character entropy terms: both engines round
#: the SAME p·log2(p) double to this grid before the exact decimal sum,
#: so one potential final-ulp divergence between java.lang.Math.log and
#: C libm cannot reach the hash (the standard quantize bridge; the grid
#: is ~6 orders above the worst-case ulp drift of a double log2)
_Q = 12


def char_entropy(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Shannon entropy (bits/char) of each document's character
    distribution, computed ROW-LOCALLY: the distinct characters of the
    text (sorted, so both engines fold the same term order), each
    character's count via the length-difference trick
    (len(text) − len(replace(text, c))), and the entropy as the exact
    decimal sum of per-character −p·log2(p) terms quantized to the
    1e-12 grid.  Returns (id_col, n_chars, distinct_chars, entropy_bits)
    with entropy_bits = 0.0 for empty or single-character documents.

    Scale shape: map-only — no explode, no shuffle, no per-doc state
    anywhere outside the row.  Cost per row is O(distinct_chars ×
    length); natural-language text holds distinct_chars under ~200.
    The higher-order aggregate/transform expressions are interpreted
    (Catalyst does not codegen ArrayAggregate), but the stage remains a
    single JVM-side map over the scan with zero exchanges — the ONLY
    shuffle in a typical filter pipeline is whatever consumes it.
    """
    text = F.col(text_col)
    n = F.length(text)
    chars = F.array_sort(F.array_distinct(F.split(text, "")))
    # F.split(text, "") keeps a trailing empty element (split's default
    # limit=-1 preserves it: "abc" -> ["a","b","c",""]), and an empty
    # document splits to [""] — this filter guards BOTH, so it is load-
    # bearing, not redundant (ADVICE r13 fixed the comment that said
    # Spark drops the empty tail; the CODE was always right)
    chars = F.filter(chars, lambda c: c != "")

    def term(c: Column) -> Column:
        cnt = n - F.length(F.replace(text, c, F.lit("")))
        p = cnt.cast("double") / n.cast("double")
        # quantized −p·log2(p) term; log2 via log(2, x)
        return F.round(-p * F.log(2.0, p), _Q).cast(f"decimal(24,{_Q})")

    ent = F.aggregate(
        chars,
        F.lit(0).cast(f"decimal(24,{_Q})"),
        # re-cast: decimal + widens to (25,12), but the merge lambda must
        # return the accumulator's exact type; (24,12) cannot overflow
        # here (entropy <= log2(distinct) < 64 bits)
        lambda acc, c: (acc + term(c)).cast(f"decimal(24,{_Q})"),
    )
    return ensure_parallelism(df).select(
        F.col(id_col),
        n.cast("long").alias("n_chars"),
        F.size(chars).cast("long").alias("distinct_chars"),
        F.when(n > 0, ent.cast("double")).otherwise(F.lit(0.0)).alias("entropy_bits"),
    )
