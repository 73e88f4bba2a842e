"""LSH candidate generation + exact edit-distance verify: Levenshtein
over lowercase prefixes scores each MinHash candidate pair.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comlake_core_spark.operators.dedup.minhash import minhash_lsh_pairs


def lsh_edit_verify(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    threshold: float = 0.8,
    num_hashes: int = 64,
    bands: int = 16,
    prefix: int = 120,
) -> DataFrame:
    """Candidate-generation + exact-verify, the production near-dup
    pattern stated explicitly: MinHash/LSH proposes candidate pairs
    (set-similarity, order-blind), then an EDIT-DISTANCE verify pass
    scores each surviving pair with Levenshtein over a `prefix`-char
    lowercase prefix — the order-sensitive signal that separates true
    re-crawls/revisions from bag-of-words coincidences that Jaccard
    alone cannot tell apart.

    Returns (id_a, id_b, jaccard, lev_prefix, edit_sim) where edit_sim =
    1 - lev/max(len_a, len_b) on the compared prefixes, rounded to 6
    decimals (one double division — bit-identical in both engines, as is
    levenshtein itself: verified integer-equal against DuckDB).

    Shape at 100 TB: the O(n²) risk lives entirely in candidate
    generation, already banded/bucketed by minhash_lsh_pairs; the verify
    adds two id-keyed joins to fetch the prefixes (co-partitioned hash
    joins on the doc id) and an O(prefix²) per-pair Levenshtein — cost
    ∝ |candidates|, never corpus². `prefix` caps the quadratic DP so a
    pathological 10 MB document cannot stall a task."""
    pairs = minhash_lsh_pairs(
        df, text_col=text_col, id_col=id_col, threshold=threshold,
        num_hashes=num_hashes, bands=bands,
    )
    pfx = df.select(
        F.col(id_col).alias("_pid"),
        F.substring(F.lower(F.trim(F.col(text_col))), 1, prefix).alias("_ptxt"),
    )
    a = pfx.select(F.col("_pid").alias("id_a"), F.col("_ptxt").alias("_ta"))
    b = pfx.select(F.col("_pid").alias("id_b"), F.col("_ptxt").alias("_tb"))
    lev = F.levenshtein("_ta", "_tb")
    return (
        pairs.join(a, "id_a").join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            "jaccard",
            lev.cast("bigint").alias("lev_prefix"),
            F.round(
                F.lit(1.0)
                - lev / F.greatest(F.length("_ta"), F.length("_tb")),
                6,
            ).alias("edit_sim"),
        )
    )

