"""Python user-defined TABLE functions (Spark 4 `@udtf`): the row-fanout
extensibility surface — a UDTF yields MANY rows per input row, joined
laterally, where a scalar UDF yields one value.

The reference has no user-defined function surface at all; this module
demonstrates the Spark-native one with an arrow-optimized top-terms
expander. Contract notes for 100 TB use:
- a Python UDTF is the SLOW PATH (per-row Python, like any non-arrow
  UDF). Every operator in this repo with a hot-path need uses codegen'd
  built-ins instead (text.py top_bigrams / tfidf are the JVM twins of
  this exact computation). Reach for a UDTF only when the fanout logic
  genuinely cannot be expressed with explode/transform — and then it
  still partitions perfectly (pure per-row function, no state).
- determinism: output order within a row's expansion is pinned
  (count desc, term asc) so results are oracle-comparable.
"""

from __future__ import annotations

from collections import Counter

from pyspark.sql.functions import udtf


@udtf(returnType="term string, cnt bigint")
class TopTermsUDTF:
    """Top-k most frequent tokens of one document, ties broken by term.

    eval() receives one input ROW; each yield emits one output row —
    the lateral-join fanout. Tokenization mirrors text.tokens (trim +
    whitespace-run split + lowercase) so the SQL oracle can reproduce it
    with string_split_regex."""

    def eval(self, text: str, k: int):
        if text is None:
            return
        counts = Counter(t for t in text.strip().lower().split() if t)
        for term, cnt in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[: k]:
            yield term, cnt


def register_udtfs(spark) -> None:
    """Register all module UDTFs for SQL LATERAL use."""
    spark.udtf.register("top_terms", TopTermsUDTF)
