"""IVF approximate top-k and the two-level (coarse-to-fine) assignment
machinery that keeps a corpus-scaled codebook O(n*sqrt(C)) at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comlake_core_spark.operators.similarity.core import cosine, dot, seeded_centroids
from comlake_core_spark.operators.similarity.kmeans import kmeans_refine
from comlake_core_spark.session import ensure_parallelism


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
    #
    # MEMORY_AND_DISK, explicitly (VERDICT r9 #5 close-out): the ranked
    # frame carries the FULL vector on each of its n_top rows per input
    # vector, so the level must be spill-SAFE for corpus-scaled callers —
    # which MEMORY_AND_DISK is: the unified memory manager evicts cached
    # blocks to disk when execution needs the space, so the frame can
    # never OOM the job.  An r10 experiment pinned DISK_ONLY instead and
    # measured strictly worse in isolation (8x curve point 7.1 -> 7.6 s;
    # the 1x bench +1.7 s on embedding_knn_graph_ivf2) because the
    # common case — the frame fits — paid disk I/O for nothing; the r9
    # 8x step that motivated it did not reproduce in an isolated session
    # (it was co-tenant cache pressure, SCALING.md).
    if not checkpoint:
        return out
    from pyspark.storagelevel import StorageLevel

    return out.localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)


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

