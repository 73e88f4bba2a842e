"""Hashed-feature corpus vectorization: the hashing-trick fixed-width
sparse vectors (Weinberger et al., ICML 2009) and hashed-unigram
Jensen-Shannon drift per group (the DSIR feature space) — both O(groups
× buckets) whatever the vocabulary size, the property that makes them
computable at 100 TB."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from comlake_core_spark.session import materialize

from comlake_core_spark.operators.text.core import tokens


def feature_hashing(
    df: DataFrame,
    n_features: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashing-trick vectorization (Weinberger et al., ICML 2009; sklearn
    HashingVectorizer): token → bucket = md5(token) mod D, counts per
    bucket — the fixed-width sparse feature vector a downstream linear
    model or clustering step consumes, with no vocabulary to build,
    broadcast, or keep consistent across 100 TB (THE reason the trick
    exists at scale: vectorization becomes embarrassingly parallel).

    md5 (not xxhash64) so bucket assignment has an exact DuckDB/PostgreSQL
    twin — same portability argument as sampling.split_assignment_portable.
    Emits per-doc summary scalars of the sparse vector (nnz, l1, exact l2²
    and a bucket-weighted checksum) rather than the vector itself — the
    driver canonicalizer hashes scalars, and the summaries pin every bucket
    count exactly.

    Plan: explode → map-combined shuffle on (doc, bucket) → per-doc
    re-agg (second, much smaller exchange: ≤ D rows per doc). No
    vocabulary state anywhere."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("_t")
    ).filter(F.col("_t") != "")
    bucket = F.conv(F.substring(F.md5("_t"), 1, 15), 16, 10).cast("long") % n_features
    per_bucket = toks.select(F.col(id_col), bucket.alias("_b")).groupBy(id_col, "_b").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    return per_bucket.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("nnz"),
        F.sum("_cnt").cast("long").alias("l1"),
        F.sum(F.col("_cnt") * F.col("_cnt")).cast("long").alias("l2_sq"),
        F.sum(F.col("_b") * F.col("_cnt")).cast("long").alias("checksum"),
    )


def js_divergence_by_group(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    scale: int = 10**12,
) -> DataFrame:
    """Distribution drift per group: Jensen-Shannon divergence between
    each group's hashed-unigram token distribution and the whole
    corpus's — the mixture-weighting / domain-shift diagnostic a corpus
    curator reads before setting sampling ratios (a source whose JS is
    near 0 adds nothing new; a high-JS source shifts the mix). JS (not
    KL) because it is symmetric, bounded by ln 2, and defined even where
    a group is missing tokens the corpus has.

    Token distributions are over `buckets` hashed unigram buckets (the
    DSIR feature space): the comparison is O(groups × buckets) whatever
    the vocabulary size — the property that makes this computable at
    100 TB, where a raw-vocab JS would join every group against a
    billion-term dictionary.

    Returns (group, n_tokens, js_q, js) with js_q the divergence in
    1/`scale` units (nats).

    Exactness bridge: each (group, bucket) contribution
    0.5·[p·ln(p/m) + q·ln(q/m)] is computed from integer counts (the
    doubles p, q, m are exact-rational-derived, identical in both
    engines) and quantized to an integer immediately, so the per-group
    sum is exact integer addition — order-free, oracle-reproducible.

    Plan: one map-combined aggregate to (group, bucket) counts (≤
    groups×buckets rows), one to bucket totals (≤ buckets rows,
    broadcast), the group×bucket frame is built by joining the dense
    bucket list (broadcast) so zero-count buckets contribute q·ln 2
    correctly, then one map-combined sum per group. No corpus-sized
    shuffle anywhere — the exchanges carry count tables only."""
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    tok = df.select(F.col(group_col).alias("_g"), F.explode(toks).alias("_term")).withColumn(
        "_b",
        F.pmod(
            F.conv(F.substring(F.md5(F.col("_term")), 1, 8), 16, 10).cast("long"),
            F.lit(buckets),
        ),
    )
    # ONE corpus pass builds the (group, bucket) count table; bucket
    # totals, group totals, and the grand total are all rollups of that
    # groups×buckets-row table (a naive four-aggregate version scans the
    # corpus four times)
    gb = tok.groupBy("_g", "_b").agg(F.count(F.lit(1)).alias("_c")).transform(materialize)
    bt = gb.groupBy("_b").agg(F.sum("_c").alias("_cb"))
    gt = gb.groupBy("_g").agg(F.sum("_c").alias("_ng"))
    n_all = gb.groupBy().agg(F.sum("_c").alias("_n"))
    # dense (group × corpus-bucket) frame: absent cells have p = 0 but a
    # real q — they still contribute 0.5·q·ln 2 to the divergence
    frame = gt.crossJoin(F.broadcast(bt)).crossJoin(F.broadcast(n_all))
    cells = frame.join(gb, ["_g", "_b"], "left").select(
        "_g",
        "_ng",
        (F.coalesce(F.col("_c"), F.lit(0)) / F.col("_ng")).alias("_p"),
        (F.col("_cb") / F.col("_n")).alias("_q"),
    )
    m = (F.col("_p") + F.col("_q")) / 2
    contrib = (
        F.when(F.col("_p") > 0, F.col("_p") * F.log(F.col("_p") / m)).otherwise(F.lit(0.0))
        + F.col("_q") * F.log(F.col("_q") / m)
    ) / 2
    return (
        cells.select("_g", "_ng", F.round(contrib * scale, 0).cast("long").alias("_jq"))
        .groupBy("_g", "_ng")
        .agg(F.sum("_jq").alias("js_q"))
        .select(
            F.col("_g").alias(group_col),
            F.col("_ng").cast("long").alias("n_tokens"),
            "js_q",
            F.round(F.col("js_q") / F.lit(float(scale)), 9).alias("js"),
        )
    )
