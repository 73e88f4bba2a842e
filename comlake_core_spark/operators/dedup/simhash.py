"""SimHash near-dup: 64-bit signature (vectorized Pandas UDF) + banded
bucket join with exact Hamming verify.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comlake_core_spark.session import ensure_parallelism


def simhash(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", bits: int = 64) -> DataFrame:
    """64-bit SimHash per document via a vectorized Pandas UDF
    (functions/udfs.py — the engine's documented 'genuinely needs Python'
    case; everything else in this module is JVM built-ins)."""
    from comlake_core_spark.functions.udfs import make_simhash_udf

    _simhash = make_simhash_udf(bits)
    return ensure_parallelism(df).select(F.col(id_col), _simhash(F.col(text_col)).alias("simhash"))


def simhash_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    band_bits: int = 16,
) -> DataFrame:
    """Near-dup pairs by SimHash: band the 64-bit signature into 64/band_bits
    chunks (pigeonhole: any pair within max_hamming shares ≥1 exact chunk
    when bands > max_hamming), bucket-join on chunks, verify Hamming."""
    # persist: the banded frame feeds BOTH sides of the self-join — without
    # it the Pandas-UDF signature pass runs twice
    sigs = simhash(df, text_col, id_col).localCheckpoint(eager=False)  # r14: checkpoint, not cache — one Pandas-UDF pass either way, no cache-write
    n_bands = 64 // band_bits
    banded = sigs.select(
        F.col(id_col).alias("_id"),
        "simhash",
        # mask, NOT `%`: Spark's % is a signed remainder, so on a negative
        # signature `shiftrightunsigned(sig, 0) % 2^16` is negative and the
        # band-0 chunk would never equi-join against a positive-signature
        # doc sharing the same low 16 bits — silently voiding the pigeonhole
        # guarantee across the sign boundary (caught by the SQL oracle)
        F.posexplode(
            F.array(
                *[
                    F.shiftrightunsigned("simhash", b * band_bits)
                    .bitwiseAND(F.lit(2**band_bits - 1))
                    .cast("long")
                    for b in range(n_bands)
                ]
            )
        ).alias("_band", "_chunk"),
    )
    a, b = banded.alias("a"), banded.alias("b")
    pairs = (
        a.join(
            b,
            (F.col("a._band") == F.col("b._band"))
            & (F.col("a._chunk") == F.col("b._chunk"))
            & (F.col("a._id") < F.col("b._id")),
        )
        .select(
            F.col("a._id").alias("id_a"),
            F.col("b._id").alias("id_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .distinct()
        .filter(F.col("hamming") <= max_hamming)
    )
    return pairs

