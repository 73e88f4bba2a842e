"""Shingling + MinHash signatures + LSH banding: the batch pair operator,
the shared signature/banding stages (also used by streaming/neardup.py),
and the incremental new-vs-corpus variant.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comlake_core_spark.operators.text.core import tokens
from comlake_core_spark.session import ensure_parallelism, materialize


def shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct word k-grams as strings. Built from sequence+transform —
    no UDF, no explode (the array stays row-local until the LSH explode)."""
    toks = tokens(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))
    return F.array_distinct(grams)


def minhash_signature(shingle_col: Column | str, num_hashes: int = 32) -> Column:
    """num_hashes seeded xxhash64 min-hashes over the shingle set.

    xxhash64(shingle, seed_i) is a JVM intrinsic — the whole signature is
    one codegen'd expression per row.

    When given a column NAME the expression is built as ONE parsed SQL
    string (r14): the Column-API construction made ~6 py4j round trips
    per hash function — ~0.44 s of driver latency per LSH plan at 64
    hashes (cProfile on pagerank_dedup_graph's fn) — for an identical
    expression tree.  The SQL literal seed is an IntegerType literal,
    exactly what F.lit(i) produced, so signatures are bit-identical.

    The per-hash lambda MUST be unary (Column path) / single-argument
    (SQL path): F.transform passes the element index as a second
    argument when the lambda accepts two, so a ``lambda s, i=i`` closure
    silently receives the ARRAY POSITION as ``i`` and every "hash"
    collapses to one position-dependent function (found via the
    dedup_minhash_lsh brute-force oracle in round 2)."""
    if isinstance(shingle_col, str):
        from comlake_core_spark.session import sql_ident

        sq = sql_ident(shingle_col)  # ADVICE r14: quote the interpolated identifier
        mins = ", ".join(
            f"array_min(transform({sq}, s -> xxhash64(s, {i})))"
            for i in range(num_hashes)
        )
        return F.expr(f"array({mins})")

    def _hash_with_seed(i: int):
        return lambda s: F.xxhash64(s, F.lit(i))

    return F.array(
        *[F.array_min(F.transform(shingle_col, _hash_with_seed(i))) for i in range(num_hashes)]
    )


def minhash_lsh_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.6,
) -> DataFrame:
    """Near-duplicate pairs via MinHash banding + exact Jaccard verify.

    Pipeline (each stage scale-safe):
      1. per-row signature (map-only, codegen);
      2. explode to `bands` rows, bucket key = hash(band slice) → groupBy-
         style self-join on (band, key): only docs sharing a bucket meet;
      3. distinct candidate pairs (dedup across bands);
      4. verify with exact Jaccard over shingle sets (join pairs back to
         the shingle arrays; intersection/union are array ops).

    Returns (id_a, id_b, jaccard) with id_a < id_b and jaccard ≥ threshold.
    """
    rows_per_band = num_hashes // bands
    base = ensure_parallelism(df).select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"))
    # Two explicit select stages + persist: (a) the inner select stops
    # Catalyst's projection collapse from inlining the shingle expression
    # into all 32 minhash expressions (CollapseProject declines when a
    # non-cheap alias is referenced many times), (b) the persisted frame is
    # read twice downstream (both band-join sides) — at 100 TB this persist
    # is a deliberate materialization of the signature index. Only
    # (_id, _sig) is persisted — 32 longs per doc, NOT the shingle arrays:
    # the verify step below recomputes shingles for candidate docs only,
    # which at scale is a vanishing fraction of the corpus (and locally
    # cuts the cache-write cost of materializing fat arrays).
    docs = (
        base.select("_id", shingles("_txt", k_shingle).alias("_sh"))
        .select("_id", minhash_signature("_sh", num_hashes).alias("_sig"))
        # r14: lazy localCheckpoint, not persist — same deliberate
        # materialization of the signature index, minus the columnar
        # cache-write overhead (measured pattern: market_basket A/B
        # persist 2.49 s / checkpoint 1.73 s)
        .transform(materialize)
    )

    banded = docs.select(
        "_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(F.array_join(F.slice("_sig", b * rows_per_band + 1, rows_per_band), ","))
                    for b in range(bands)
                ]
            )
        ).alias("_band", "_bkey"),
    )

    left = banded.alias("l")
    right = banded.alias("r")
    candidates = (
        left.join(
            right,
            (F.col("l._band") == F.col("r._band"))
            & (F.col("l._bkey") == F.col("r._bkey"))
            & (F.col("l._id") < F.col("r._id")),
        )
        .select(F.col("l._id").alias("id_a"), F.col("r._id").alias("id_b"))
        .distinct()
        # r14: cut — consumed by the id fanout below AND the verify join;
        # each reference would otherwise re-run the banded self-join
        .transform(materialize)
    )

    # exact-Jaccard verify over candidate docs only: semi-join the corpus
    # down to ids appearing in a candidate pair, THEN shingle — at 100 TB
    # this re-reads the text of ~|candidates| docs instead of caching every
    # document's shingle set
    cand_ids = candidates.select(
        F.explode(F.array(F.col("id_a"), F.col("id_b"))).alias("_id")
    ).distinct()
    sh = base.join(cand_ids, "_id", "left_semi").select(
        "_id", shingles("_txt", k_shingle).alias("_sh")
    )
    verified = (
        candidates.join(sh.withColumnsRenamed({"_id": "id_a", "_sh": "_sh_a"}), "id_a")
        .join(sh.withColumnsRenamed({"_id": "id_b", "_sh": "_sh_b"}), "id_b")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sh_a", "_sh_b")).cast("double")
            / F.size(F.array_union("_sh_a", "_sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("id_a", "id_b", "jaccard")
    )
    return verified


def minhash_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id", **kw) -> DataFrame:
    """Documents to DROP: the larger id of every near-dup pair (greedy
    keep-first policy). connected-components clustering is the exhaustive
    alternative; greedy is the standard large-scale choice."""
    pairs = minhash_lsh_pairs(df, text_col, id_col, **kw)
    return pairs.select(F.col("id_b").alias("drop_id")).distinct()


def lsh_doc_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_hashes: int = 32,
) -> DataFrame:
    """Shared signature stage of the LSH pipeline: one row per doc with
    its shingle set and MinHash signature — (_id, _sh, _sig).  The ONE
    implementation behind both the batch incremental operator and the
    streaming index (streaming/neardup.py); keeping them on one code path
    is what makes their bit-for-bit parity a structural property instead
    of a hope (review r6 #4)."""
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_txt")
    )
    return base.select("_id", shingles("_txt", k_shingle).alias("_sh")).select(
        "_id", "_sh", minhash_signature("_sh", num_hashes).alias("_sig")
    )


def lsh_band_keys(sigs: DataFrame, num_hashes: int, bands: int) -> DataFrame:
    """Shared banding stage: signature rows → (_id, _band, _bkey), one
    xxhash64 bucket key per band (num_hashes must divide evenly;
    validated by the callers so the error names their parameter)."""
    rpb = num_hashes // bands
    return sigs.select(
        "_id",
        F.posexplode(
            F.array(
                *[
                    F.xxhash64(F.array_join(F.slice("_sig", b * rpb + 1, rpb), ","))
                    for b in range(bands)
                ]
            )
        ).alias("_band", "_bkey"),
    )


def minhash_lsh_pairs_incremental(
    old_df: DataFrame,
    new_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.6,
) -> DataFrame:
    """Incremental near-dup detection: match a NEW batch against the
    EXISTING corpus index without re-pairing the corpus with itself — the
    production dedup shape (a crawl snapshot lands; only new×old and
    new×new pairs are in question, and old×old was settled when old was
    ingested).

    Same signature/banding/verify pipeline as minhash_lsh_pairs, but the
    band join is new-side × (old ∪ new) instead of a full self-join: band
    buckets from the OLD side are exactly what a persisted signature index
    provides, so at 100 TB the old side is a pre-banded table read, not a
    recompute, and per-batch cost scales with |new| × bucket-hit-rate, not
    |corpus|². Returns (new_id, match_id, jaccard) where match_id is an
    old doc or an earlier-id new doc (new×new dups are still caught).
    """
    if num_hashes % bands != 0:
        # banding would silently drop the trailing hashes from every
        # signature, weakening recall with no warning (ADVICE r2 #1)
        raise ValueError(f"num_hashes ({num_hashes}) must be divisible by bands ({bands})")

    def _banded(df: DataFrame) -> DataFrame:
        sigs = lsh_doc_signatures(df, text_col, id_col, k_shingle, num_hashes)
        return lsh_band_keys(sigs.drop("_sh"), num_hashes, bands)

    old_b = _banded(old_df).withColumnRenamed("_id", "_oid")
    # lazy localCheckpoint, not persist (r14: the KN A/B measured the
    # columnar cache write as pure overhead for once-per-run readers,
    # and the cut keeps the downstream plans from re-inlining the
    # signature cascade per reference)
    new_b = _banded(new_df).transform(materialize)

    # new × old: every bucket collision across the index boundary
    vs_old = new_b.join(
        old_b,
        (new_b._band == old_b._band) & (new_b._bkey == old_b._bkey),
    ).select(F.col("_id").alias("new_id"), F.col("_oid").alias("match_id"))
    # new × new: ordered self-join within the batch only
    r = new_b.select(
        F.col("_id").alias("_nid2"), F.col("_band").alias("_band2"), F.col("_bkey").alias("_bkey2")
    )
    vs_new = new_b.join(
        r,
        (new_b._band == F.col("_band2"))
        & (new_b._bkey == F.col("_bkey2"))
        & (new_b._id < F.col("_nid2")),
    ).select(F.col("_id").alias("new_id"), F.col("_nid2").alias("match_id"))
    # cut the candidate set once (r14): it is consumed by the id fanout
    # below AND by the verify join, and each reference would otherwise
    # re-run BOTH banded joins (vs_old and vs_new) end to end
    candidates = vs_old.unionByName(vs_new).distinct().transform(materialize)

    # exact-Jaccard verify on candidates only (same discipline as the
    # batch operator: re-shingle only docs that appear in a candidate)
    corpus = ensure_parallelism(old_df.unionByName(new_df)).select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_txt")
    )
    cand_ids = candidates.select(
        F.explode(F.array(F.col("new_id"), F.col("match_id"))).alias("_id")
    ).distinct()
    # sh is joined twice (new side / match side): cut it so the corpus
    # semi-join + candidate re-shingle runs once, not per join leg
    sh = corpus.join(cand_ids, "_id", "left_semi").select(
        "_id", shingles("_txt", k_shingle).alias("_sh")
    ).transform(materialize)
    return (
        candidates.join(sh.withColumnsRenamed({"_id": "new_id", "_sh": "_sh_a"}), "new_id")
        .join(sh.withColumnsRenamed({"_id": "match_id", "_sh": "_sh_b"}), "match_id")
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("_sh_a", "_sh_b")).cast("double")
            / F.size(F.array_union("_sh_a", "_sh_b")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select("new_id", "match_id", "jaccard")
    )

