"""Similarity search over embedding columns (array<float>).

Two paths:
- brute_force_topk — exact cosine top-k of every query against the corpus.
  The query side is broadcast; the corpus is scanned once; per-group top-k
  goes through row_number ≤ k which Spark ≥3.5 rewrites to WindowGroupLimit
  (per-partition heap before the shuffle). Exact and scan-bound: the right
  baseline, and viable at 100 TB when the query set is small.
- ivf_topk — IVF-style approximate search: corpus vectors are assigned to
  the nearest of C seeded centroids (one pass), queries probe the closest
  n_probe centroids, and only those buckets are scored. Cuts the scored
  fraction to ~n_probe/C at the cost of recall.

All dot products are JVM higher-order functions (zip_with + aggregate) over
array<double> — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comlake_core_spark.session import ensure_parallelism


def dot(a: Column, b: Column) -> Column:
    """Sequential left-fold dot product — deterministic accumulation order,
    so the value is bitwise-reproducible (and matches an oracle that
    accumulates in array order)."""
    return F.aggregate(F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (norm(a) * norm(b))


def brute_force_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact cosine top-k per query. queries: (query_id, embedding).

    Plan shape: broadcast nested-loop join (queries are small) → per-row
    cosine (codegen) → WindowGroupLimit top-k per query_id. The corpus is
    read exactly once regardless of |queries|."""
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "nbr_id",
        cosine(F.col("_qv"), F.col("_cv")).alias("cosine"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "nbr_id", "cosine", "rn")
    )


def seeded_centroids(
    corpus: DataFrame,
    n_centroids: int,
    vec_col: str,
    id_col: str,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Deterministic centroid pick: the n_centroids corpus vectors with the
    smallest hash(id) — a seeded pseudo-random sample, no kmeans state.
    One extra pass; at 100 TB use a persisted codebook instead.
    hasher='md5' orders by the md5 hex string instead — slower, but the
    ordering has an exact DuckDB twin, which makes the downstream IVF
    result SQL-oracle-checkable."""
    if hasher == "xxhash64":
        sort_key = F.xxhash64(F.col(id_col))
    elif hasher == "md5":
        sort_key = F.md5(F.col(id_col).cast("string"))
    else:
        raise ValueError(f"unknown hasher {hasher!r}")
    # orderBy+limit plans TakeOrderedAndProject (map-side top-n per
    # partition, driver merge) — NOT a global sort; the row_number window
    # then runs over only the n_centroids survivors, so the single-partition
    # exchange it needs moves n_centroids rows, never the corpus.
    top = corpus.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_cv")
    ).orderBy(sort_key, F.col(id_col)).limit(n_centroids)
    w = Window.orderBy(sort_key, F.col(id_col))
    return (
        top.withColumn("_r", F.row_number().over(w))
        .select(F.col("_r").alias("centroid_id"), F.col("_cv").alias("centroid_vec"))
    )


def hybrid_search_rrf(
    docs: DataFrame,
    embeddings: DataFrame,
    query_terms: tuple[str, ...],
    query_vec: list[float],
    k: int = 10,
    per_leg: int = 20,
    k_rrf: int = 60,
    text_col: str = "text",
    doc_id_col: str = "doc_id",
    vec_col: str = "embedding",
    vec_id_col: str = "vec_id",
    bm25_quantize: int | None = None,
) -> DataFrame:
    """Hybrid retrieval: BM25 (lexical) and cosine top-k (vector) legs
    fused by Reciprocal Rank Fusion — score(d) = Σ_legs 1/(k_rrf + rank_d)
    — the standard way to combine keyword and embedding search without
    score calibration (ranks, not raw scores, are what fuse).

    Scale shape: each leg is its own already-scale-shaped operator
    (bm25_search: one explode pass + broadcast stats; brute_force_topk:
    scan-once corpus + WindowGroupLimit — swap in ivf_topk for the ANN
    path at corpus scale); the fusion itself touches only 2×per_leg rows
    (a full outer join of two tiny ranked lists), so its cost is nil. A
    doc missing from one leg simply contributes that leg's zero — the
    COALESCE keeps the sum well-defined.

    Deterministic: both legs tie-break on doc id, and the final order
    tie-breaks (rrf desc, doc id)."""
    from comlake_core_spark.operators.text import bm25_search

    spark = docs.sparkSession
    # bm25_quantize=d makes the lexical scores (and so the ranks the fusion
    # consumes) independent of float summation order — see bm25_search
    lex = bm25_search(
        docs,
        query_terms,
        text_col=text_col,
        id_col=doc_id_col,
        top_n=per_leg,
        quantize=bm25_quantize,
    )
    w_lex = Window.orderBy(F.col("score").desc(), F.col(doc_id_col))
    lex_ranked = lex.select(
        F.col(doc_id_col).alias("id"), F.row_number().over(w_lex).alias("_r_lex")
    )

    q = spark.createDataFrame([(0, [float(x) for x in query_vec])], "query_id long, embedding array<double>")
    sem = brute_force_topk(
        embeddings, q, k=per_leg, vec_col=vec_col, id_col=vec_id_col
    ).select(F.col("nbr_id").alias("id"), F.col("rn").alias("_r_sem"))

    rrf = (
        lex_ranked.join(sem, "id", "full_outer")
        .select(
            "id",
            (
                F.coalesce(1.0 / (F.lit(k_rrf) + F.col("_r_lex")), F.lit(0.0))
                + F.coalesce(1.0 / (F.lit(k_rrf) + F.col("_r_sem")), F.lit(0.0))
            ).alias("rrf"),
            F.col("_r_lex").alias("rank_lexical"),
            F.col("_r_sem").alias("rank_vector"),
        )
        .orderBy(F.col("rrf").desc(), "id")
        .limit(k)
    )
    return rrf


def kmeans_refine(
    corpus: DataFrame,
    n_centroids: int = 16,
    iters: int = 2,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    seed_hasher: str = "xxhash64",
    quantize: int | None = None,
) -> DataFrame:
    """Spherical k-means refinement of the IVF codebook: Lloyd iterations
    with cosine assignment and normalized-mean updates, starting from the
    deterministic seeded centroids. Returns (centroid_id, centroid_vec)
    ready to plug into ivf_topk's bucket assignment.

    This is the canonical ITERATIVE algorithm shape on Spark, and every
    piece is sized for 100 TB:
    - assignment + partial sums run in ONE mapInPandas pass per iteration:
      each Arrow batch computes argmax(X̂ · Ĉᵀ) against the broadcast
      (k × d) codebook and folds into per-partition (k × d) partial sums —
      the pass emits O(k) rows PER PARTITION, never per vector;
    - the driver reduces O(k × partitions) partials in numpy (a few MB)
      and renormalizes — the only driver-side state is the codebook
      itself, which any k-means must hold somewhere;
    - no DataFrame lineage growth across iterations (each pass reads the
      cached corpus; the loop carries only the numpy codebook).

    Deterministic: seeded init, argmax ties break to the lowest centroid
    id, accumulation order fixed per partition; empty clusters keep their
    previous centroid. The spherical objective (mean cosine to assigned
    centroid) is non-decreasing — pinned in tests/test_kmeans.py.

    ``quantize=d`` rounds each unit-centroid coordinate to d decimals
    after every iteration: numpy's partial-sum order and a SQL engine's
    SUM order differ in the last ulp, and the rounding grid absorbs that
    drift, so an engine re-running the same Lloyd recurrence lands on the
    IDENTICAL codebook — what makes the kmeans-refined IVF workload
    SQL-oracle-checkable. ``seed_hasher='md5'`` gives the seeded init the
    same cross-engine determinism (see seeded_centroids)."""
    import numpy as np
    import pandas as pd

    spark = corpus.sparkSession
    seed_rows = seeded_centroids(
        corpus, n_centroids, vec_col, id_col, hasher=seed_hasher
    ).collect()
    C = np.array([r["centroid_vec"] for r in seed_rows], dtype=np.float64)
    k, d = C.shape
    vecs = corpus.select(F.col(vec_col).cast("array<double>").alias("v"))

    for _ in range(iters):
        bc = spark.sparkContext.broadcast(C)

        def partials(batches, _bc=bc, _k=k, _d=d):
            Cl = _bc.value
            Cn = Cl / np.clip(np.linalg.norm(Cl, axis=1, keepdims=True), 1e-12, None)
            sums = np.zeros((_k, _d))
            counts = np.zeros(_k, dtype=np.int64)
            for pdf in batches:
                if not len(pdf):
                    continue
                X = np.vstack(pdf["v"].to_numpy())
                Xn = X / np.clip(np.linalg.norm(X, axis=1, keepdims=True), 1e-12, None)
                a = np.argmax(Xn @ Cn.T, axis=1)
                # accumulate NORMALIZED vectors: the update is then the exact
                # spherical-k-means maximizer, making the mean-cosine
                # objective provably non-decreasing per iteration
                np.add.at(sums, a, Xn)
                np.add.at(counts, a, 1)
            hit = np.nonzero(counts)[0]
            yield pd.DataFrame(
                {"c": hit, "n": counts[hit], "s": [sums[i].tolist() for i in hit]}
            )

        parts = vecs.mapInPandas(partials, "c long, n long, s array<double>").collect()
        sums = np.zeros((k, d))
        counts = np.zeros(k, dtype=np.int64)
        for r in parts:
            sums[r["c"]] += np.asarray(r["s"])
            counts[r["c"]] += r["n"]
        means = np.where(counts[:, None] > 0, sums / np.maximum(counts, 1)[:, None], C)
        C = means / np.clip(np.linalg.norm(means, axis=1, keepdims=True), 1e-12, None)
        if quantize is not None:
            C = np.round(C, quantize)

    return spark.createDataFrame(
        [(i + 1, C[i].tolist()) for i in range(k)],
        "centroid_id long, centroid_vec array<double>",
    )


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    refine_iters: int = 0,
    seed_hasher: str = "xxhash64",
    kmeans_quantize: int | None = None,
    assignment: str = "auto",
    coarse_probe: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """Approximate top-k: score only corpus vectors whose nearest centroid is
    among the query's n_probe closest centroids. refine_iters > 0 runs that
    many spherical k-means Lloyd passes over the corpus first (kmeans_refine)
    — better-centered buckets, same query plan.

    FLAT bucket assignment is MAP-ONLY: the codebook is collected to the
    driver (it is O(n_centroids) rows and driver-resident during k-means
    anyway), L2-normalized there, and baked into the plan as a literal
    array of (id, unit-vector) structs — so each row ranks the centroids
    inside a single transform + array_max, no crossJoin, no window, no
    shuffle of the corpus. Ranking by cosine against centroids is
    invariant to the row vector's own norm, so the per-centroid score is
    ONE O(d) dot fold against the pre-normalized centroid (no norm folds
    at all). The only corpus shuffle in the whole query is the final
    per-query top-k window over the bucket-pruned candidate rows.

    assignment='two_level' (auto-selected when the codebook is
    corpus-scaled, n_centroids > sqrt(n) — see resolve_ivf_assignment)
    routes both sides through the coarse→fine hierarchy instead: the
    fine codebook stays a joined DataFrame (never collected) and every
    stage is O(rows·sqrt(C)).  With the default coarse_probe (all coarse
    buckets) the result EQUALS the flat path bit-for-bit, so 'auto' is a
    plan-shape decision, never a semantics one."""
    if assignment not in ("auto", "flat", "two_level"):
        raise ValueError(f"unknown assignment strategy {assignment!r}")
    # feed a KNOWN row count via n_rows to keep 'auto' count-free at
    # 100 TB (review r8 #3); corpus.count only runs when n_centroids
    # exceeds the small-codebook fast path AND no count was supplied
    assignment = resolve_ivf_assignment(
        assignment, int(n_centroids), _counted_rows(corpus, n_rows, "ivf_topk")
    )
    if refine_iters > 0:
        cents_df = kmeans_refine(
            corpus,
            n_centroids,
            refine_iters,
            vec_col,
            id_col,
            seed_hasher=seed_hasher,
            quantize=kmeans_quantize,
        )
    else:
        cents_df = seeded_centroids(corpus, n_centroids, vec_col, id_col, hasher=seed_hasher)

    if assignment == "two_level":
        # coarse→fine routed assignment for BOTH sides; the fine codebook
        # stays a joined DataFrame and the literal plan is O(sqrt(C)).
        # Same home/probe semantics as the flat literal argmax (ties
        # toward the smallest centroid id), bit-equal with the default
        # full coarse probe — pinned by test_ivf_topk_two_level_equals_flat
        coarse_cb, fine, c1 = _two_level_parts(cents_df)
        cp = int(coarse_probe) if coarse_probe is not None else c1
        # corpus side: single consumer, no self-join lineage issue (the
        # query side below is checkpointed) — skip the corpus-sized
        # materialization (review r8 #4)
        cr = _two_level_ranked(
            corpus, coarse_cb, fine, 1, cp, vec_col, id_col, checkpoint=False
        )
        c_assigned = cr.filter(F.col("_rn") == 1).select(
            F.col("_id").alias("nbr_id"),
            F.col("_v").alias("_cv"),
            F.explode(F.array(F.col("_fcid").cast("int"))).alias("bucket"),
        )
        q_assigned = _two_level_ranked(
            queries, coarse_cb, fine, n_probe, cp, vec_col, query_id_col
        ).select(
            F.col("_id").alias("query_id"),
            F.col("_v").alias("_qv"),
            F.col("_fcid").cast("int").alias("_qbucket"),
        )
    else:

        def _unit(v: list) -> list:
            n = sum(x * x for x in v) ** 0.5 or 1.0
            return [float(x) / n for x in v]

        codebook = F.array(
            *[
                F.struct(
                    F.lit(int(r["centroid_id"])).alias("cid"),
                    F.array(*[F.lit(x) for x in _unit(r["centroid_vec"])]).alias("cvec"),
                )
                for r in cents_df.collect()
            ]
        )

        def _scored(vcol: str):
            # struct order (dot, -cid): max/descending = best similarity,
            # ties broken toward the smallest centroid id (same order the
            # k-means assignment and the old window formulation used)
            return F.transform(
                codebook,
                lambda s: F.struct(
                    dot(F.col(vcol), s["cvec"]).alias("sim"),
                    (-s["cid"]).alias("ncid"),
                ),
            )

        # explicit aliases: corpus and queries may derive from the SAME
        # source relation (self-lookup), and the join below must bind each
        # side's attributes to its own subtree
        c = corpus.select(
            F.col(id_col).alias("nbr_id"), F.col(vec_col).cast("array<double>").alias("_cv")
        ).alias("_ivf_c")
        q = queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).cast("array<double>").alias("_qv"),
        ).alias("_ivf_q")
        # the 1-element explode is semantically a plain projection, but a
        # Generate output carries NO alias constraint — preventing the
        # optimizer's constraint inference from substituting this
        # corpus-side expression into a filter on the (same-relation) query
        # side and producing an unbindable reference (Catalyst
        # INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND under AQE replan at small sizes)
        c_assigned = c.select(
            "nbr_id",
            "_cv",
            F.explode(F.array((-F.array_max(_scored("_cv"))["ncid"]).cast("int"))).alias(
                "bucket"
            ),
        )
        q_assigned = (
            q.select(
                "query_id",
                "_qv",
                F.explode(
                    F.slice(F.reverse(F.array_sort(_scored("_qv"))), 1, n_probe)
                ).alias("_s"),
            )
            .select("query_id", "_qv", (-F.col("_s.ncid")).cast("int").alias("_qbucket"))
            # eager materialization of the O(|queries| × n_probe) probe
            # frame — tiny by contract (it is the broadcast side below).
            # Also severs shared lineage with the corpus: when queries
            # derive from the same relation, constraint inference otherwise
            # substitutes the corpus bucket expression into a filter on
            # this side (unbindable attribute — Catalyst
            # INTERNAL_ERROR_ATTRIBUTE_NOT_FOUND).
            .localCheckpoint(eager=True)
        )

    scored = c_assigned.join(
        F.broadcast(q_assigned), F.col("bucket") == F.col("_qbucket")
    ).select("query_id", "nbr_id", cosine(F.col("_qv"), F.col("_cv")).alias("cosine"))
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("nbr_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "nbr_id", "cosine", "rn")
    )


def quantize_embeddings_int8(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Symmetric int8 scalar quantization of an embedding column — the
    4× storage/bandwidth cut a 100 TB vector corpus takes before ANN
    (per-vector absmax scaling, the faiss/SQ8 layout). Pure map-side
    codegen: no UDF, no shuffle; returns the scale (amax) plus an exact
    integer checksum of the quantized codes (Σ q_i·i) so correctness is
    bit-checkable without emitting the array itself (driver canonicalizer
    hashes scalars only).

    Quantizer: q_i = floor(x_i·(127/amax) + 0.5) — floor(+0.5) instead of
    round() because round-half rules differ across engines while floor is
    exact in all of them. amax = 0 (the all-zero vector) quantizes to all
    zeros."""
    df = ensure_parallelism(df)
    v = F.col(vec_col)
    amax = F.array_max(F.transform(v, lambda x: F.abs(x.cast("double"))))
    scale = F.when(amax == 0, F.lit(0.0)).otherwise(F.lit(127.0) / amax)
    q = F.transform(v, lambda x: F.floor(x.cast("double") * scale + F.lit(0.5)).cast("long"))
    idx = F.sequence(F.lit(1), F.size(v))
    checksum = F.aggregate(
        F.zip_with(q, idx, lambda qi, i: qi * i.cast("long")),
        F.lit(0).cast("long"),
        lambda acc, x: acc + x,
    )
    return df.select(
        F.col(id_col),
        amax.alias("amax"),
        F.size(v).alias("dim"),
        checksum.alias("q_checksum"),
        F.aggregate(q, F.lit(0).cast("long"), lambda a, x: a + F.abs(x)).alias("q_l1"),
    )


def pq_quantize(
    corpus: DataFrame,
    m: int = 8,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    hasher: str = "md5",
    err_quantize: int = 9,
    codebook: dict[int, list] | None = None,
) -> DataFrame:
    """Product quantization (Jégou et al., PAMI 2011; faiss PQ): split each
    vector into ``m`` subvectors and store, per subvector, only the index
    of its nearest codebook centroid — 4 bits per subvector at 16
    centroids, a 64× compression of a float32 dim-64 embedding vs SQ8's
    4×. This is the codebook layout IVF-PQ search decodes against at
    corpus scale.

    Codebook: the md5-seeded sample rows (seeded_centroids) sliced per
    subvector — deterministic, no training state, and the md5 ordering
    has an exact SQL twin so assignments are oracle-checkable (swap in
    kmeans_refine per subvector for production codebooks). Assignment is
    MAP-ONLY codegen: the codebook is baked into the plan as literals and
    each row takes m argmin folds over n_centroids sub-distances —
    struct(min) ordering breaks ties toward the smaller centroid id; no
    shuffle anywhere. Per-subvector squared distances are left-folds
    (deterministic both engines); the total reconstruction error sums the
    m per-subvector distances on a ``err_quantize``-decimal grid so the
    cross-subvector addition order cannot matter.

    Returns (id, pq_code, recon_err): pq_code packs (code_j − 1) into 4
    bits per subvector — the exact bytes a PQ index stores."""
    if n_centroids > 16:
        # (cid-1) is packed into a 4-bit nibble; 17+ centroids would
        # silently overflow into the next subvector's bits (ADVICE r2 #1)
        raise ValueError(f"pq_quantize packs 4-bit codes: n_centroids must be <= 16, got {n_centroids}")
    if codebook is None:
        # callers that already hold the codebook (pq_adc_topk/ivfpq_adc_topk
        # share it between bucketing and sub-quantization) pass it in to
        # avoid a second centroid-selection job per query
        cents = seeded_centroids(corpus, n_centroids, vec_col, id_col, hasher=hasher).collect()
        codebook = {int(r["centroid_id"]): list(r["centroid_vec"]) for r in cents}
    v = F.col(vec_col).cast("array<double>")
    dim = len(codebook[1])
    if dim % m != 0:
        # trailing dimensions would be silently dropped from every distance
        raise ValueError(f"pq_quantize needs dim % m == 0, got dim={dim}, m={m}")
    sub_d = dim // m

    def sub_d2(j: int, cid: int) -> Column:
        cvec = codebook[cid][j * sub_d : (j + 1) * sub_d]
        sub = F.slice(v, j * sub_d + 1, sub_d)
        lit = F.array(*[F.lit(float(x)) for x in cvec])
        return F.aggregate(
            F.zip_with(sub, lit, lambda x, c: (x - c) * (x - c)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    codes = []
    errs = []
    for j in range(m):
        entries = F.array(
            *[F.struct(sub_d2(j, cid).alias("d2"), F.lit(cid).alias("cid")) for cid in sorted(codebook)]
        )
        best = F.array_min(entries)
        codes.append(F.shiftleft((best["cid"] - 1).cast("long"), 4 * j))
        errs.append(F.round(best["d2"], err_quantize).cast(f"decimal(20,{err_quantize})"))
    pq_code = codes[0]
    for c in codes[1:]:
        pq_code = pq_code + c
    recon = errs[0]
    for e in errs[1:]:
        recon = recon + e
    return corpus.select(
        F.col(id_col),
        pq_code.alias("pq_code"),
        recon.cast("double").alias("recon_err"),
    )


def pq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    n_centroids: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    hasher: str = "md5",
    lut_quantize: int = 9,
) -> DataFrame:
    """Asymmetric distance computation over PQ codes (Jégou et al.; the
    faiss IVF-PQ search kernel): each query precomputes an m × n_centroids
    look-up table of sub-distances to the codebook, and a corpus vector's
    approximate L2² is just m table reads indexed by its stored 4-bit
    codes — the corpus EMBEDDINGS are never touched at query time, only
    the 64×-compressed codes. That asymmetry is the entire point at
    100 TB: the scan reads a bigint per vector instead of 256 bytes.

    Exactness discipline: LUT entries are quantized to ``lut_quantize``
    decimals (Decimal HALF_UP — the same rounding Spark's double→DECIMAL
    cast and DuckDB ROUND apply) and summed as exact decimals, so the
    ADC score is independent of addition order and hash-comparable. The
    LUT (m·n_centroids·|Q| decimals) is baked into the plan as literals;
    the only shuffle is the per-query top-k window."""
    from decimal import ROUND_HALF_UP, Decimal

    cents = seeded_centroids(corpus, n_centroids, vec_col, id_col, hasher=hasher).collect()
    codebook = {int(r["centroid_id"]): list(r["centroid_vec"]) for r in cents}
    dim = len(codebook[1])
    sub_d = dim // m
    q_rows = queries.select(
        F.col(query_id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("qv")
    ).collect()
    quantum = Decimal(1).scaleb(-lut_quantize)

    def d2(qv, cv, j):
        acc = 0.0
        for i in range(j * sub_d, (j + 1) * sub_d):
            t = (qv[i] - cv[i]) * (qv[i] - cv[i])
            acc = acc + t
        return Decimal(acc).quantize(quantum, rounding=ROUND_HALF_UP)

    codes = pq_quantize(
        corpus, m=m, n_centroids=n_centroids, vec_col=vec_col, id_col=id_col,
        hasher=hasher, codebook=codebook,
    )
    dec_t = f"decimal(20,{lut_quantize})"
    per_query = []
    for r in q_rows:
        qid, qv = r["qid"], list(r["qv"])
        score = None
        for j in range(m):
            lut = F.array(
                *[
                    F.lit(d2(qv, codebook[cid], j)).cast(dec_t)
                    for cid in sorted(codebook)
                ]
            )
            code_j = (F.shiftright(F.col("pq_code"), 4 * j).bitwiseAND(F.lit(15))).cast("int")
            term = F.element_at(lut, code_j + 1)
            score = term if score is None else score + term
        per_query.append(F.struct(F.lit(qid).alias("query_id"), score.alias("adc")))
    scored = codes.select(
        F.col(id_col).alias("nbr_id"),
        F.explode(F.array(*per_query)).alias("_s"),
    ).select("nbr_id", "_s.query_id", F.col("_s.adc").cast("double").alias("adc_dist"))
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("nbr_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "nbr_id", "adc_dist", "rn")
    )


def ivfpq_adc_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    m: int = 8,
    n_centroids: int = 16,
    n_probe: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
    hasher: str = "md5",
    lut_quantize: int = 9,
    refine_iters: int = 0,
) -> DataFrame:
    """The complete faiss IVF-PQ pipeline: corpus vectors live in L2
    buckets (inverted lists) keyed by their nearest full-dim centroid and
    are stored only as PQ codes; a query probes its n_probe closest
    buckets and ADC-scores just those lists via its per-subvector LUT —
    bucket pruning cuts the scanned fraction to ~n_probe/C, and each
    scanned vector costs m table reads on a bigint of codes. At 100 TB
    the inverted lists are the partition layout (cluster-by bucket), so
    probing IS partition pruning.

    Everything is the already-proven pieces composed: seeded full-dim
    centroids (one shared codebook for bucketing and sub-quantization),
    map-only bucket + code assignment (plan literals), driver-side probe
    selection (|Q| × C folds), quantized-decimal LUT scores; the single
    shuffle is the final per-query top-k.

    ``refine_iters > 0`` runs that many Lloyd passes (kmeans_refine, with
    its deterministic quantize grid) over the seeded centroids first —
    better-centered inverted lists AND sub-quantizers from the same
    refined codebook (VERDICT r3 #6: the kmeans codebook previously only
    fed ann_ivf_kmeans_topk).  Same query plan either way."""
    from decimal import ROUND_HALF_UP, Decimal

    if refine_iters > 0:
        cents = kmeans_refine(
            corpus, n_centroids, refine_iters, vec_col, id_col,
            seed_hasher=hasher, quantize=9,
        ).collect()
    else:
        cents = seeded_centroids(corpus, n_centroids, vec_col, id_col, hasher=hasher).collect()
    codebook = {int(r["centroid_id"]): list(r["centroid_vec"]) for r in cents}
    dim = len(codebook[1])
    sub_d = dim // m
    quantum = Decimal(1).scaleb(-lut_quantize)
    v = F.col(vec_col).cast("array<double>")

    def full_d2_col(cid: int) -> Column:
        lit = F.array(*[F.lit(float(x)) for x in codebook[cid]])
        return F.aggregate(
            F.zip_with(v, lit, lambda x, c: (x - c) * (x - c)),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )

    bucket_entries = F.array(
        *[F.struct(full_d2_col(cid).alias("d2"), F.lit(cid).alias("cid")) for cid in sorted(codebook)]
    )
    bucket = F.array_min(bucket_entries)["cid"]
    codes = pq_quantize(
        corpus, m=m, n_centroids=n_centroids, vec_col=vec_col, id_col=id_col,
        hasher=hasher, codebook=codebook,
    ).select(id_col, "pq_code")
    with_bucket = corpus.select(F.col(id_col), bucket.alias("_bucket")).join(codes, id_col)

    def py_d2(qv, cv, lo, hi):
        acc = 0.0
        for i in range(lo, hi):
            t = (qv[i] - cv[i]) * (qv[i] - cv[i])
            acc = acc + t
        return acc

    q_rows = queries.select(
        F.col(query_id_col).alias("qid"), F.col(vec_col).cast("array<double>").alias("qv")
    ).collect()
    dec_t = f"decimal(20,{lut_quantize})"
    per_query = []
    for r in q_rows:
        qid, qv = r["qid"], list(r["qv"])
        probes = sorted(
            sorted(codebook), key=lambda cid: (py_d2(qv, codebook[cid], 0, dim), cid)
        )[:n_probe]
        score = None
        for j in range(m):
            lut = F.array(
                *[
                    F.lit(
                        Decimal(py_d2(qv, codebook[cid], j * sub_d, (j + 1) * sub_d)).quantize(
                            quantum, rounding=ROUND_HALF_UP
                        )
                    ).cast(dec_t)
                    for cid in sorted(codebook)
                ]
            )
            code_j = (F.shiftright(F.col("pq_code"), 4 * j).bitwiseAND(F.lit(15))).cast("int")
            term = F.element_at(lut, code_j + 1)
            score = term if score is None else score + term
        per_query.append(
            F.struct(
                F.lit(qid).alias("query_id"),
                score.alias("adc"),
                F.array(*[F.lit(p) for p in probes]).alias("probes"),
            )
        )
    scored = (
        with_bucket.select(
            F.col(id_col).alias("nbr_id"),
            "_bucket",
            F.explode(F.array(*per_query)).alias("_s"),
        )
        .filter(F.array_contains(F.col("_s.probes"), F.col("_bucket")))
        .select("nbr_id", "_s.query_id", F.col("_s.adc").cast("double").alias("adc_dist"))
    )
    w = Window.partitionBy("query_id").orderBy(F.asc("adc_dist"), F.asc("nbr_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "nbr_id", "adc_dist", "rn")
    )


def ivf_assign_two_level(
    emb: DataFrame,
    cents_df: DataFrame,
    n_probe: int,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    coarse_probe: int | None = None,
) -> tuple[DataFrame, DataFrame]:
    """Two-level IVF assignment — the piece that makes a corpus-scaled
    codebook viable at 100 TB.

    The flat assignment collects all C fine centroids into a literal
    codebook and scores every vector against every centroid: O(n·C)
    compute AND an O(C) literal plan.  With the scaled-codebook regime
    (C = n / bucket_size) that stage is itself O(n²/bucket) — linear
    pair generation bought with a quadratic assignment.  The standard
    fix (FAISS coarse quantizer, SPANN levels) is hierarchical: pick
    C1 = ceil(sqrt(C)) COARSE centroids from the fine codebook, route
    each fine centroid to its nearest coarse (C·C1 work, broadcast-
    tiny), then per vector (a) score the C1-literal coarse codebook
    inside codegen, (b) take the top `coarse_probe` coarse buckets, and
    (c) equi-join to the fine-centroid table on the coarse id and rank
    the ~sqrt(C)-sized fine candidates with one window.  Every stage is
    O(n·sqrt(C)) rows and the literal plan is O(sqrt(C)) — no collect of
    the fine codebook, which stays a joined DataFrame.

    Returns ``(home, probe)`` frames with the exact schema the flat path
    produces — home: (_dst, _cv, bucket) one row per vector; probe:
    (_src, _qv, bucket) n_probe rows per vector — so the downstream
    bucket join / top-k / mutual filter is byte-identical.

    Determinism: coarse pick is the same smallest-hash rule as
    seeded_centroids; all tie-breaks are (similarity desc, centroid id
    asc), matching the flat path.  With ``coarse_probe=None`` every
    coarse bucket is probed, the fine candidate set is complete, and
    home/probe EQUAL the flat assignment bit-for-bit (pinned by
    tests/test_r7_pipeline_ops.py) — smaller coarse_probe trades recall
    for the n·sqrt(C) bound exactly like n_probe does at the fine level.
    """
    coarse_cb, fine, c1 = _two_level_parts(cents_df)
    if coarse_probe is None:
        coarse_probe = c1
    ranked = _two_level_ranked(
        emb, coarse_cb, fine, n_probe, coarse_probe, vec_col, id_col
    )
    # explode-wrapped bucket on the home side breaks attribute-id equality
    # with the probe side (both derive from `ranked`) — the same self-join
    # alias mitigation the flat path uses
    home = ranked.filter(F.col("_rn") == 1).select(
        F.col("_id").alias("_dst"),
        F.col("_v").alias("_cv"),
        F.explode(F.array(F.col("_fcid").cast("int"))).alias("bucket"),
    )
    probe = ranked.select(
        F.col("_id").alias("_src"),
        F.col("_v").alias("_qv"),
        F.col("_fcid").cast("int").alias("bucket"),
    )
    return home, probe


def _two_level_parts(cents_df: DataFrame):
    """Shared two-level machinery (ivf_assign_two_level, ivf_topk):
    checkpoint the centroid plan once, pick the O(sqrt(C)) coarse
    codebook literal, and route every fine centroid to its coarse bucket
    — the fine codebook STAYS a DataFrame (never collected)."""
    # one materialization: cents_df is a lazy corpus-wide plan (seeded
    # top-n / k-means), and count(), the coarse collect(), and the fine
    # routing below would each replay it — cut it once (review r6 #3)
    cents_df = cents_df.localCheckpoint(eager=True)
    n_cent = cents_df.count()
    c1 = max(int(n_cent**0.5 + 0.9999), 1)
    # coarse codebook: the c1 fine centroids with the smallest md5(cid) —
    # same seeded-pick rule (and tie-break) as seeded_centroids
    coarse_rows = (
        cents_df.select("centroid_id", "centroid_vec")
        .orderBy(F.md5(F.col("centroid_id").cast("string")), "centroid_id")
        .limit(c1)
        .collect()
    )

    def _unit(v: list) -> list:
        n = sum(x * x for x in v) ** 0.5 or 1.0
        return [float(x) / n for x in v]

    coarse_cb = F.array(
        *[
            F.struct(
                F.lit(int(r["centroid_id"])).alias("cid"),
                F.array(*[F.lit(x) for x in _unit(r["centroid_vec"])]).alias("cvec"),
            )
            for r in coarse_rows
        ]
    )

    # fine-centroid table routed to its coarse bucket; unit-normalized
    # Spark-side with the same fold order as the flat path's literal
    nrm = F.sqrt(dot(F.col("centroid_vec"), F.col("centroid_vec")))
    fine = (
        cents_df.select(
            F.col("centroid_id").alias("_fcid"),
            F.transform(
                F.col("centroid_vec"),
                lambda x: x / F.coalesce(F.nullif(nrm, F.lit(0.0)), F.lit(1.0)),
            ).alias("_fcvec"),
            F.col("centroid_vec").alias("_fraw"),
        )
        .withColumn(
            "_coarse",
            (-F.array_max(_coarse_score_expr(coarse_cb, "_fraw"))["ncid"]).cast("int"),
        )
        .drop("_fraw")
        .localCheckpoint(eager=True)
    )
    return coarse_cb, fine, c1


def _coarse_score_expr(coarse_cb, vcol: str):
    return F.transform(
        coarse_cb,
        lambda s: F.struct(dot(F.col(vcol), s["cvec"]).alias("sim"), (-s["cid"]).alias("ncid")),
    )


def _two_level_ranked(
    df: DataFrame,
    coarse_cb,
    fine: DataFrame,
    n_top: int,
    coarse_probe: int,
    vec_col: str,
    id_col: str,
    checkpoint: bool = True,
) -> DataFrame:
    """Rank each vector's fine-centroid candidates through the coarse
    route: O(n·sqrt(C)) coarse scoring inside codegen, equi-join to the
    fine table on the coarse id, one window for the per-vector top
    ``n_top``.  Tie-breaks (similarity desc, centroid id asc) match the
    flat literal-codebook argmax, so probing every coarse bucket
    reproduces the flat assignment bit-for-bit."""
    base = ensure_parallelism(df).select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    cands = base.select(
        "_id",
        "_v",
        F.explode(
            F.slice(
                F.reverse(F.array_sort(_coarse_score_expr(coarse_cb, "_v"))),
                1,
                int(coarse_probe),
            )
        ).alias("_cs"),
    ).select("_id", "_v", (-F.col("_cs.ncid")).cast("int").alias("_coarse"))
    w = Window.partitionBy("_id").orderBy(F.desc("_sim"), F.asc("_fcid"))
    out = (
        cands.join(fine, "_coarse")
        .select("_id", "_v", "_fcid", dot(F.col("_v"), F.col("_fcvec")).alias("_sim"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max(int(n_top), 1))
    )
    # checkpoint=True: one materialization feeds BOTH consumers (home AND
    # probe in ivf_assign_two_level) and severs shared lineage for the
    # downstream self-join.  Single-consumer corpus-side callers pass
    # False — pinning a corpus-sized (id, vector) copy in block storage
    # for one read is pure memory pressure (review r8 #4).
    return out.localCheckpoint(eager=True) if checkpoint else out


def resolve_ivf_assignment(
    assignment: str, n_centroids: int, n_rows_fn
) -> str:
    """'auto' policy (VERDICT r6 #6 / r7 "Next round" #4): route through
    the two-level assignment exactly when the codebook is CORPUS-SCALED —
    n_centroids > sqrt(n) — because that is the regime where the flat
    path's O(n·C) compute and O(C) literal plan turn quadratic (C ∝ n).
    Small codebooks (C <= 32, every fixed-codebook workload) stay flat
    without even paying the row count; n_rows_fn is only called past
    that gate (feed a known row count at 100 TB instead of a count()).
    Results are IDENTICAL either way when coarse_probe covers all coarse
    buckets (the bitwise equality pin), so the switch is a plan-shape
    decision, never a semantics one."""
    if assignment != "auto":
        return assignment
    if n_centroids <= 32:
        return "flat"
    n_rows = int(n_rows_fn())
    return "two_level" if n_centroids * n_centroids > n_rows else "flat"


def _counted_rows(corpus, n_rows, caller: str):
    """n_rows_fn for 'auto' callers: returns the caller-supplied row count
    when given, else warns ONCE per call that a plan-build-time
    corpus.count() job is about to run (ADVICE r8: previously a silent
    full scan for auto callers with n_centroids > 32 — exactly the cost
    the 100 TB guidance says to avoid; pass n_rows to skip it)."""

    def fn():
        if n_rows is not None:
            return int(n_rows)
        import warnings

        warnings.warn(
            f"{caller}: assignment='auto' with n_centroids > 32 and no "
            "n_rows — running a plan-build-time corpus.count(); pass "
            "n_rows to avoid this full scan at 100 TB",
            RuntimeWarning,
            stacklevel=3,
        )
        return corpus.count()

    return fn


def mutual_knn_graph(
    emb: DataFrame,
    k: int = 4,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    candidate: str = "exact",
    n_centroids: int = 16,
    n_probe: int = 4,
    seed_hasher: str = "xxhash64",
    refine_iters: int = 0,
    target_bucket_size: int | None = None,
    assignment: str = "auto",
    coarse_probe: int | None = None,
    n_rows: int | None = None,
) -> DataFrame:
    """k-nearest-neighbor graph over an embedding column, filtered to
    MUTUAL edges (a is in b's top-k AND b is in a's top-k) — the standard
    graph-construction step before graph clustering / community detection
    on embeddings (mutual-kNN prunes hub nodes' asymmetric edges, the
    known failure mode of plain kNN graphs in high dimensions). SemDeDup-
    style pipelines build exactly this graph between the coarse k-means
    pass and the final prune.

    Returns one row per undirected mutual edge: (id_a < id_b, cosine,
    rank_ab = b's rank in a's list, rank_ba = a's rank in b's list).

    Exactness: cosine is the deterministic sequential-fold `cosine()`
    (same accumulation order as the oracle's list_dot_product), and rank
    ties break on neighbor id — the ann_cosine_topk evidence carries
    over unchanged.

    Plan: ONE broadcast nested-loop join scores all pairs (the corpus
    side is scanned once; the broadcast side is the same corpus
    projected to (id, vec)), per-direction top-k rides WindowGroupLimit
    (each task forwards ≤ k rows per source before the shuffle), and the
    mutual filter is a self-join of two k·N-row edge lists — never a
    materialized N² table. At 100 TB the broadcast side must become the
    IVF-bucketed candidate set (ivf_topk's layout: score only within a
    probe's buckets); the mutual-filter self-join is unchanged since the
    kNN edge list is k·N rows regardless of how candidates were found."""
    if candidate == "exact":
        c = ensure_parallelism(emb).select(
            F.col(id_col).alias("_src"),
            F.col(vec_col).cast("array<double>").alias("_cv"),
        )
        q = emb.select(
            F.col(id_col).alias("_dst"),
            F.col(vec_col).cast("array<double>").alias("_qv"),
        )
        scored = (
            c.crossJoin(F.broadcast(q))
            .filter(F.col("_src") != F.col("_dst"))
            .select(
                "_src",
                "_dst",
                cosine(F.col("_cv"), F.col("_qv")).alias("cosine"),
            )
        )
    elif candidate == "ivf":
        # bucket-blocked candidate generation: src probes its n_probe
        # nearest centroids; candidates are vectors whose HOME bucket is
        # probed — Σ_b |home_b|·|probe_b| pairs instead of n², the shape
        # that keeps the kNN graph linear at 100 TB (the exact variant's
        # measured-quadratic curve is SCALING.md's one deliberate
        # non-linear row). Codebook/assignment plumbing mirrors ivf_topk,
        # including its self-relation alias mitigations (explode-wrapped
        # bucket, checkpointed probe frame). With n_probe == n_centroids
        # the candidate set is complete and the result EQUALS the exact
        # variant — pinned by test.
        # target_bucket_size sizes the codebook FROM the corpus
        # (n_centroids = ceil(n / target)): constant bucket size ⇒
        # constant candidates per node ⇒ linear graph build — the scaled-
        # codebook regime SCALING.md measures (36 s vs 406 s at 8× for a
        # fixed codebook). Costs one count() pass; at 100 TB feed the
        # table's known row count instead.
        if target_bucket_size is not None:
            if n_rows is None:
                n_rows = emb.count()
            n_centroids = max((n_rows + target_bucket_size - 1) // target_bucket_size, n_probe)
        # 'auto' (default since r8): corpus-scaled codebook ⇒ two-level,
        # fixed small codebook ⇒ flat; bit-identical either way with the
        # default full coarse probe (see resolve_ivf_assignment)
        assignment = resolve_ivf_assignment(
            assignment, int(n_centroids), _counted_rows(emb, n_rows, "mutual_knn_graph")
        )
        # refine_iters > 0 runs spherical k-means Lloyd passes first
        # (kmeans_refine) — better-centered buckets raise edge recall at
        # the same probe budget, identical downstream plan
        if refine_iters > 0:
            cents_df = kmeans_refine(
                emb, n_centroids, refine_iters, vec_col, id_col, seed_hasher=seed_hasher
            )
        else:
            cents_df = seeded_centroids(
                emb, n_centroids, vec_col, id_col, hasher=seed_hasher
            )

        if assignment == "two_level":
            # hierarchical coarse→fine assignment: O(n·sqrt(C)) per stage
            # and an O(sqrt(C)) literal plan — the regime that survives a
            # corpus-scaled codebook at 100 TB (flat assignment is O(n·C)
            # compute with an O(C) literal plan, quadratic when C ∝ n)
            home, probe = ivf_assign_two_level(
                emb, cents_df, n_probe,
                vec_col=vec_col, id_col=id_col, coarse_probe=coarse_probe,
            )
        elif assignment == "flat":

            def _unit(v: list) -> list:
                n = sum(x * x for x in v) ** 0.5 or 1.0
                return [float(x) / n for x in v]

            codebook = F.array(
                *[
                    F.struct(
                        F.lit(int(r["centroid_id"])).alias("cid"),
                        F.array(*[F.lit(x) for x in _unit(r["centroid_vec"])]).alias("cvec"),
                    )
                    for r in cents_df.collect()
                ]
            )

            def _scored_vs_cents(vcol: str):
                return F.transform(
                    codebook,
                    lambda s: F.struct(
                        dot(F.col(vcol), s["cvec"]).alias("sim"),
                        (-s["cid"]).alias("ncid"),
                    ),
                )

            c = ensure_parallelism(emb).select(
                F.col(id_col).alias("_dst"),
                F.col(vec_col).cast("array<double>").alias("_cv"),
            ).alias("_knn_c")
            home = c.select(
                "_dst",
                "_cv",
                F.explode(
                    F.array((-F.array_max(_scored_vs_cents("_cv"))["ncid"]).cast("int"))
                ).alias("bucket"),
            )
            probe = (
                emb.select(
                    F.col(id_col).alias("_src"),
                    F.col(vec_col).cast("array<double>").alias("_qv"),
                )
                .alias("_knn_q")
                .select(
                    "_src",
                    "_qv",
                    F.explode(
                        F.slice(F.reverse(F.array_sort(_scored_vs_cents("_qv"))), 1, n_probe)
                    ).alias("_s"),
                )
                .select("_src", "_qv", (-F.col("_s.ncid")).cast("int").alias("bucket"))
                .localCheckpoint(eager=True)
            )
        else:
            raise ValueError(f"unknown assignment strategy {assignment!r}")
        par = emb.sparkSession.sparkContext.defaultParallelism
        # pin the fan-out stage's width: the bucket join MULTIPLIES rows,
        # so byte-based AQE coalescing of its (small) input must not
        # serialize the candidate scoring (the semantic_dedup lesson)
        scored = (
            home.repartition(par, "bucket")
            .join(probe, "bucket")
            .filter(F.col("_src") != F.col("_dst"))
            .select("_src", "_dst", cosine(F.col("_qv"), F.col("_cv")).alias("cosine"))
        )
    else:
        raise ValueError(f"unknown candidate strategy {candidate!r}")
    w = Window.partitionBy("_src").orderBy(F.desc("cosine"), F.asc("_dst"))
    knn = scored.withColumn("rn", F.row_number().over(w)).filter(F.col("rn") <= k)
    fwd = knn.select(
        F.col("_src").alias("id_a"),
        F.col("_dst").alias("id_b"),
        "cosine",
        F.col("rn").alias("rank_ab"),
    ).filter(F.col("id_a") < F.col("id_b"))
    rev = knn.select(
        F.col("_dst").alias("id_a"),
        F.col("_src").alias("id_b"),
        F.col("rn").alias("rank_ba"),
    ).filter(F.col("id_a") < F.col("id_b"))
    return fwd.join(rev, ["id_a", "id_b"]).select(
        "id_a",
        "id_b",
        "cosine",
        F.col("rank_ab").cast("long").alias("rank_ab"),
        F.col("rank_ba").cast("long").alias("rank_ba"),
    )


def pca_power_iteration(
    emb: DataFrame,
    iterations: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    quant: int = 10_000,
    gram_shrink: int = 10_000_000_000,
) -> DataFrame:
    """Distributed PCA: dominant principal component of the (centered)
    embedding matrix by power iteration over the Gram matrix — the
    first step of the PCA-whitening / dimensionality-reduction pass an
    embedding pipeline runs before indexing, and the textbook
    "linear algebra as two aggregates" Spark computation. Returns one
    row per dimension: (dim 1-based, v_q fixed-point ×1e6, loading).

    Exactness — the pagerank discipline applied to linear algebra:
    embeddings are quantized to integers (×`quant`), centering is exact
    (c = n·q − Σq, all integers — no float mean), the d×d Gram matrix
    is exact integer sums in DECIMAL(38,0), and each power-iteration
    round renormalizes with integer division only (v' = s ÷ (max|s| ÷
    1e6 + 1), truncation toward zero — identical in Spark `div` and
    DuckDB `//`, pinned by test). Float PCA cannot be oracle-checked
    (summation order); this one is bit-identical in both engines. The
    Gram entries are pre-shrunk by `gram_shrink` so every subsequent
    matrix-vector product stays inside BIGINT.

    Plan: the Gram matrix is ONE self-equi-join on the row id over the
    (id, dim, value) triplet frame (shuffle ∝ n·d, output n·d² rows
    map-combined down to d² — at 100 TB distribute the d² partial sums,
    never the matrix rows twice); the d²-row matrix and d-row vector
    then iterate entirely in broadcast-sized frames — each round is a
    broadcast join + one tiny aggregate. d is assumed broadcast-small
    (embedding dims, ≤ a few thousand)."""
    n_row = emb.groupBy().agg(F.count(F.lit(1)).alias("_n"))
    vq = emb.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.col(vec_col).cast("array<double>")).alias("_p", "_x"),
    ).select(
        "_id",
        (F.col("_p") + 1).cast("long").alias("_i"),
        F.round(F.col("_x") * quant, 0).cast("long").alias("_q"),
    )
    sums = vq.groupBy("_i").agg(F.sum("_q").alias("_s"))
    c = (
        vq.join(F.broadcast(sums), "_i")
        .crossJoin(F.broadcast(n_row))
        .select("_id", "_i", (F.col("_n") * F.col("_q") - F.col("_s")).alias("_c"))
    )
    a = c.select(F.col("_id"), F.col("_i"), F.col("_c").alias("_ca"))
    b = c.select(F.col("_id"), F.col("_i").alias("_j"), F.col("_c").alias("_cb"))
    gram = (
        a.join(b, "_id")
        .groupBy("_i", "_j")
        .agg(
            F.sum(F.col("_ca").cast("decimal(38,0)") * F.col("_cb")).alias("_g38")
        )
        .select(
            "_i",
            "_j",
            F.expr(f"CAST(_g38 div {gram_shrink} AS BIGINT)").alias("_g"),
        )
        .localCheckpoint(eager=False)
    )
    dims = gram.select(F.col("_i").alias("_j")).distinct()
    v = dims.select("_j", F.lit(1_000_000).cast("long").alias("_v"))
    for _ in range(iterations):
        s = (
            gram.join(F.broadcast(v), "_j")
            .groupBy("_i")
            .agg(F.sum(F.col("_g") * F.col("_v")).alias("_sv"))
        )
        m = s.groupBy().agg(F.max(F.abs(F.col("_sv"))).alias("_m"))
        v = (
            s.crossJoin(F.broadcast(m))
            .select(
                F.col("_i").alias("_j"),
                F.expr("CAST(_sv div ((_m div 1000000) + 1) AS BIGINT)").alias("_v"),
            )
        )
    return v.select(
        F.col("_j").alias("dim"),
        F.col("_v").alias("v_q"),
        F.round(F.col("_v") / F.lit(1e6), 6).alias("loading"),
    )


# ---------------------------------------------------------------------------
# matryoshka (truncated-dimension) retrieval
# ---------------------------------------------------------------------------


def matryoshka_topk(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    dims: int = 16,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Top-k retrieval over the FIRST `dims` dimensions of the embedding
    (Matryoshka Representation Learning, Kusupati et al. 2022): MRL-style
    models pack coarse meaning into the leading coordinates, so a
    truncated prefix retrieves at a fraction of the scan bandwidth —
    dims/D of the bytes per vector, the other knob besides PQ for
    shrinking a 100 TB ANN scan.  Each truncated hit is annotated with
    whether it also appears in the FULL-dimension exact top-k, so
    aggregating `in_full_topk` per query IS the recall measurement that
    decides how small `dims` may go (the same audit discipline as
    ann_recall_at_k).

    Cosine over the slice normalizes by the truncated norms — equivalent
    to renormalizing the truncated vectors.  A zero-norm side (a vector
    whose leading `dims` coordinates are all zero — collapsed encoder
    output, leading-padded embeddings) scores the sentinel -2.0 instead
    of the NaN an unguarded division produces: Spark orders NaN LARGEST,
    so one degenerate row would otherwise seize rank 1 in every query's
    truncated top-k; -2.0 sits below any real cosine, ranking degenerate
    rows deterministically last.  Returns (query_id, nbr_id,
    trunc_cosine, rn, in_full_topk).

    Plan: ONE corpus scan serves both rankings (truncated and full
    cosine are computed side by side on the same broadcast
    nested-loop-join row); both top-k's ride WindowGroupLimit on the
    same query_id partitioning, and the final flag is a self-equi-join
    of two k·|Q|-row lists."""
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("nbr_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    q = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    def guarded(a: Column, b: Column) -> Column:
        # bind the denominator ONCE via the expression-level let
        # (transform(array(x), f)[0] — winnow_fingerprints' trick):
        # Catalyst does no CSE across when-branches, so inlining would
        # re-run both norm folds for the condition and the division
        return F.transform(
            F.array(norm(a) * norm(b)),
            lambda den: F.when(den != 0, dot(a, b) / den).otherwise(F.lit(-2.0)),
        )[0]

    scored = c.crossJoin(F.broadcast(q)).select(
        "query_id",
        "nbr_id",
        guarded(F.slice("_qv", 1, dims), F.slice("_cv", 1, dims)).alias("trunc_cosine"),
        guarded(F.col("_qv"), F.col("_cv")).alias("_full_cosine"),
    )
    wt = Window.partitionBy("query_id").orderBy(F.desc("trunc_cosine"), F.asc("nbr_id"))
    wf = Window.partitionBy("query_id").orderBy(F.desc("_full_cosine"), F.asc("nbr_id"))
    trunc = (
        scored.withColumn("rn", F.row_number().over(wt))
        .filter(F.col("rn") <= k)
        .select("query_id", "nbr_id", "trunc_cosine", "rn")
    )
    full = (
        scored.withColumn("_rf", F.row_number().over(wf))
        .filter(F.col("_rf") <= k)
        .select("query_id", "nbr_id", F.lit(True).alias("_hit"))
    )
    return trunc.join(full, ["query_id", "nbr_id"], "left").select(
        "query_id",
        "nbr_id",
        "trunc_cosine",
        "rn",
        F.coalesce(F.col("_hit"), F.lit(False)).alias("in_full_topk"),
    )


# ---------------------------------------------------------------------------
# hard-negative mining
# ---------------------------------------------------------------------------


def hard_negatives(
    emb: DataFrame,
    k: int = 4,
    dup_threshold: float = 0.9,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Contrastive-training hard negatives: pairs that are mutual
    k-nearest neighbors (semantically close — the hardest negatives)
    but NOT near-duplicates (cosine < `dup_threshold`, so they are not
    secretly the same document, which as a "negative" would poison the
    contrastive loss).  This is the standard mining step for embedding-
    model training data (e.g. DPR/SimCSE-style pipelines): positives
    come from duplication/augmentation, hard negatives from the kNN
    graph minus the duplicate set.

    Returns the mutual_knn_graph edge schema (id_a < id_b, cosine,
    rank_ab, rank_ba) restricted to non-duplicate pairs.

    The exclusion filters on the edge's OWN exact cosine — every
    candidate pair here is a kNN edge and therefore already carries its
    exact similarity, so the near-dup test needs no second pipeline.
    Anti-joining an LSH-derived dup set instead (the first draft) is
    strictly weaker: hyperplane LSH recalls a cosine-0.93 pair only
    ~17% of the time at 12 planes, so any non-identical >=threshold
    pair the banding misses would sail through as a "hard negative" —
    exactly the contamination the operator exists to prevent (found by
    a constructed 0.931 pair landing in different buckets).
    embedding_dedup_pairs' verify step guarantees its output all sits
    at cosine >= threshold, so the filter subsumes that set entirely.

    Plan: the kNN edge list is k·N rows and the filter is map-side on
    it — cost is the graph build itself, never corpus² beyond it."""
    knn = mutual_knn_graph(emb, k=k, vec_col=vec_col, id_col=id_col)
    return knn.filter(F.col("cosine") < dup_threshold)


def centroid_drift(
    df: DataFrame,
    split: Column,
    vec_col: str = "embedding",
    label_col: str = "label",
    dim: int = 64,
    quantize: int = 9,
) -> DataFrame:
    """Embedding-distribution drift between two corpus snapshots: per
    label, the cosine between the split-0 and split-1 centroids (plus
    both counts).  The monitor a training pipeline runs on every refresh
    — a label whose centroid swings (cosine well below 1) means the new
    crawl changed what that class LOOKS like, so downstream thresholds
    (dedup radii, quality cutoffs, retrieval calibrations) need
    re-validation before the refresh ships.

    Determinism (the oracle requirement): per-dimension component sums
    are exact decimals on the ``quantize`` grid, centroids divide once
    in float64, and the three dot products fold rounded products through
    exact decimal addition — no float reassociation anywhere, so the
    cosine hash-matches a SQL oracle.

    Scale shape: ONE map-combined aggregate with 64 decimal-sum columns
    (no explode — shuffle volume is #labels × #splits rows of 64 sums),
    then a #labels-row self-join.  At 100 TB the whole reduction is the
    cost of one scan."""

    def comp(i: int) -> Column:
        return F.round(F.element_at(F.col(vec_col), i + 1).cast("double"), quantize)

    g = df.groupBy(F.col(label_col).alias("label"), split.alias("_par")).agg(
        F.count(F.lit(1)).alias("_n"),
        *[
            F.sum(comp(i).cast(f"decimal(20,{quantize})")).alias(f"_s{i}")
            for i in range(dim)
        ],
    )

    def side(par: int, tag: str) -> DataFrame:
        c = [
            (F.col(f"_s{i}").cast("double") / F.col("_n")).alias(f"_{tag}{i}")
            for i in range(dim)
        ]
        return g.filter(F.col("_par") == par).select(
            "label", F.col("_n").alias(f"n_{tag}"), *c
        )

    joined = side(0, "a").join(side(1, "b"), "label")

    # Dot products fold through F.sum over exploded per-dimension terms:
    # a CHAINED decimal `+` hits Spark's 38-digit precision cap after a
    # few dozen adds and silently sheds scale (allowPrecisionLoss), while
    # an aggregate sum widens precision without touching scale — the only
    # exact way to add 64 decimals in one expression tree.
    def term(i: int) -> Column:
        def p(x: str, y: str) -> Column:
            return F.round(F.col(f"_{x}{i}") * F.col(f"_{y}{i}"), quantize).cast(
                f"decimal(20,{quantize})"
            )

        return F.struct(p("a", "b").alias("ab"), p("a", "a").alias("aa"), p("b", "b").alias("bb"))

    prods = joined.select(
        "label", "n_a", "n_b", F.explode(F.array(*[term(i) for i in range(dim)])).alias("_p")
    )
    dots = prods.groupBy("label").agg(
        F.first("n_a").alias("n_a"),
        F.first("n_b").alias("n_b"),
        F.sum("_p.ab").cast("double").alias("_ab"),
        F.sum("_p.aa").cast("double").alias("_aa"),
        F.sum("_p.bb").cast("double").alias("_bb"),
    )
    return dots.select(
        "label",
        "n_a",
        "n_b",
        F.round(
            F.col("_ab") / (F.sqrt("_aa") * F.sqrt("_bb")), quantize
        ).alias("drift_cosine"),
    )
