"""Engine-portable MinHash (md5-seeded) — the auditable twin of
minhash.minhash_signature.  xxhash64 is the hot-path hash (one JVM
intrinsic per shingle) but exists only in Spark; these md5 signatures are
bit-identical in Spark, DuckDB, and PostgreSQL, which is what lets the LSH
infrastructure itself — bucket skew, the estimator's calibration — be
value-hash-verified by a SQL oracle rather than trusted.  Hex-string MIN
is numeric MIN ([0-9a-f] lexicographic order), so no hex-to-int conversion
is needed anywhere.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comlake_core_spark.operators.dedup.minhash import shingles
from comlake_core_spark.session import ensure_parallelism


def _portable_hash(i: int):
    """Seeded md5 over a shingle, as a unary-lambda factory (a default-arg
    closure would receive the ARRAY POSITION as the seed — the
    minhash_signature bug class)."""
    return lambda g: F.md5(F.concat_ws("|", F.lit(str(i)), g))


def minhash_signature_portable(shingle_col: Column, num_hashes: int = 12) -> Column:
    """num_hashes seeded md5 min-hashes (32-hex strings) over the shingle
    set — recomputable bit-for-bit by any engine with md5."""
    return F.array(
        *[F.array_min(F.transform(shingle_col, _portable_hash(i))) for i in range(num_hashes)]
    )


def lsh_banded_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """(_id, _band, _bkey) rows of the portable-signature LSH banding —
    the bucket layout both diagnostics below aggregate over."""
    rows = num_hashes // bands
    base = ensure_parallelism(df).select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"))
    docs = base.select("_id", shingles("_txt", k_shingle).alias("_sh")).select(
        "_id", minhash_signature_portable(F.col("_sh"), num_hashes).alias("_sig")
    )
    return docs.select(
        "_id",
        F.posexplode(
            F.array(
                *[
                    F.md5(F.array_join(F.slice("_sig", b * rows + 1, rows), ","))
                    for b in range(bands)
                ]
            )
        ).alias("_band", "_bkey"),
    )


def lsh_bucket_skew(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """Per-band LSH bucket-skew audit: the numbers to read BEFORE running
    the candidate self-join at 100 TB.  Candidate pairs per band are
    Σ C(bucket,2) — a single degenerate bucket (empty docs, a boilerplate
    shingle set, a hash pathology) turns the join quadratic, and this
    audit is how that is caught as a report instead of as a dead executor.
    Emits per band: bucket count, max bucket, total candidate pairs, and
    the share of pairs contributed by the largest bucket.

    Cost: the signature scan plus ONE (band,bucket)-keyed count and a
    band-keyed rollup — strictly cheaper than the join it audits."""
    buckets = (
        lsh_banded_portable(df, text_col, id_col, k_shingle, num_hashes, bands)
        .groupBy("_band", "_bkey")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    pairs = F.col("_n") * (F.col("_n") - 1) / 2
    return (
        buckets.groupBy("_band")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("_n").alias("max_bucket"),
            F.sum(pairs).cast("bigint").alias("candidate_pairs"),
            F.max(pairs).cast("bigint").alias("top_bucket_pairs"),
        )
        .select(
            F.col("_band").cast("bigint").alias("band"),
            "n_buckets",
            "max_bucket",
            "candidate_pairs",
            F.round(
                F.col("top_bucket_pairs") / F.nullif(F.col("candidate_pairs").cast("double"), F.lit(0.0)),
                9,
            ).alias("top_bucket_pair_share"),
        )
    )


def minhash_calibration(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    quantize: int = 9,
) -> DataFrame:
    """MinHash estimator calibration over the LSH candidate pairs:
    signature agreement (matching components / num_hashes — the unbiased
    Jaccard estimator) binned into deciles against EXACT shingle Jaccard.
    Per bin: pair count, mean estimate, mean true Jaccard, mean absolute
    error.  This is the measured answer to "how many hashes do I need?"
    — the same measure-don't-guess discipline as ann_recall_at_k, applied
    to the dedup family's own estimator.

    Scale shape: candidates come from the banded bucket join (never
    all-pairs); signatures and shingle sets are joined back only for
    candidate ids (a vanishing corpus fraction); the bin rollup is
    map-combined on ≤10 keys with exact decimal sums."""
    base = ensure_parallelism(df).select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"))
    docs = base.select("_id", shingles("_txt", k_shingle).alias("_sh")).select(
        "_id", "_sh", minhash_signature_portable(F.col("_sh"), num_hashes).alias("_sig")
    )
    banded = lsh_banded_portable(df, text_col, id_col, k_shingle, num_hashes, bands)
    cand = (
        banded.alias("l")
        .join(banded.alias("r"), ["_band", "_bkey"])
        .filter(F.col("l._id") < F.col("r._id"))
        .select(F.col("l._id").alias("_ida"), F.col("r._id").alias("_idb"))
        .distinct()
    )
    a = docs.select(F.col("_id").alias("_ida"), F.col("_sh").alias("_sha"), F.col("_sig").alias("_siga"))
    b = docs.select(F.col("_id").alias("_idb"), F.col("_sh").alias("_shb"), F.col("_sig").alias("_sigb"))
    matches = F.size(
        F.filter(F.zip_with("_siga", "_sigb", lambda x, y: x == y), lambda t: t)
    )
    est = matches.cast("double") / num_hashes
    true_j = F.size(F.array_intersect("_sha", "_shb")).cast("double") / F.size(
        F.array_union("_sha", "_shb")
    )
    scored = (
        cand.join(a, "_ida")
        .join(b, "_idb")
        .select(
            F.least(F.floor(est * 10).cast("long"), F.lit(9)).alias("est_bin"),
            F.round(est, quantize).alias("_e"),
            F.round(true_j, quantize).alias("_t"),
            F.round(F.abs(est - true_j), quantize).alias("_ae"),
        )
    )
    dsum = lambda c: F.sum(F.col(c).cast(f"decimal(20,{quantize})")).cast("double")  # noqa: E731
    return scored.groupBy("est_bin").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        (dsum("_e") / F.count(F.lit(1))).alias("avg_estimate"),
        (dsum("_t") / F.count(F.lit(1))).alias("avg_true_jaccard"),
        (dsum("_ae") / F.count(F.lit(1))).alias("mae"),
    )

