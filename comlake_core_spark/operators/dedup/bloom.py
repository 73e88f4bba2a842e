"""Bloom-filter decontamination: the O(m)-bits broadcast alternative to
shipping the eval n-gram set, with an exact false-positive audit.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comlake_core_spark.operators.text.core import tokens


def bloom_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    m_bits: int = 65536,
    k_hashes: int = 3,
) -> DataFrame:
    """Decontamination via a Bloom filter over the eval set's word
    n-grams, with the filter's answers audited against the exact
    broadcast-join check: per train document, how many of its distinct
    n-grams HIT the bloom filter, how many are TRUE eval grams, and the
    difference (the filter's false positives — deterministic, since the
    bloom is a pure function of the eval grams and md5).

    Why a bloom when :func:`decontaminate_ngrams` already broadcasts the
    gram set: the broadcast is O(|eval grams| x bytes-per-gram); a giant
    eval suite (every benchmark ever published, 10^8+ grams) stops
    fitting, while the bloom is O(m) BITS regardless — `m_bits` bounds
    both the broadcast and the driver memory by construction, because
    only DISTINCT bit positions (<= m) are ever collected. The false-
    positive columns are the accuracy audit you run at small scale to
    size m before trusting the filter at 100 TB (k=3, m/n≈13 here →
    FP≈1.8% per gram).

    Hash family: position_j(g) = int(md5(j ':' g)[:12], 16) mod m — md5
    so a SQL oracle reproduces every bit exactly ([[oracle-discipline]]:
    md5 is the one hash with a bit-identical DuckDB twin).

    Returns (doc_id, n_grams, n_bloom_hits, n_true_hits, n_false_pos)
    for every train doc with >= 1 gram."""
    lowered = lambda c: F.lower(F.trim(F.col(c)))  # noqa: E731

    def grams(df: DataFrame) -> DataFrame:
        toks = tokens(lowered(text_col))
        sz = F.size(toks)
        idx = F.sequence(F.lit(1), sz - (n - 1))
        g = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
        return df.filter(sz >= n).select(
            F.col(id_col), F.explode(F.array_distinct(g)).alias("_g")
        )

    def positions(gram: Column) -> Column:
        return F.array(
            *[
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"{j}:"), gram)), 1, 12), 16, 10
                ).cast("long")
                % m_bits
                for j in range(k_hashes)
            ]
        )

    eval_grams = grams(eval_df).select("_g").distinct()
    # DISTINCT positions only: the collect is bounded by m_bits rows no
    # matter how large the eval suite is — that bound is the operator's
    # entire point (documented O(m) driver pass, not O(|eval|)).
    set_bits = sorted(
        r[0]
        for r in eval_grams.select(F.explode(positions(F.col("_g"))).alias("p"))
        .distinct()
        .collect()
    )
    words = [0] * ((m_bits + 63) // 64)
    for p in set_bits:
        words[p // 64] |= 1 << (p % 64)
    # two's-complement into signed longs for the plan literal
    bitmap = F.array(*[F.lit(w - (1 << 64) if w >= (1 << 63) else w) for w in words])

    tg = grams(train)
    pos = positions(F.col("_g"))
    bit_set = lambda p: (  # noqa: E731
        F.bit_get(
            F.element_at(bitmap, (p / F.lit(64)).cast("int") + 1), (p % 64).cast("int")
        )
        == 1
    )
    hit = F.forall(pos, bit_set)
    flagged = tg.join(
        F.broadcast(eval_grams.select(F.col("_g"), F.lit(True).alias("_true"))),
        "_g",
        "left",
    ).select(
        id_col,
        hit.cast("int").alias("_bloom"),
        F.coalesce(F.col("_true"), F.lit(False)).cast("int").alias("_exact"),
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("_bloom").cast("bigint").alias("n_bloom_hits"),
        F.sum("_exact").cast("bigint").alias("n_true_hits"),
        (F.sum("_bloom") - F.sum("_exact")).cast("bigint").alias("n_false_pos"),
    )

