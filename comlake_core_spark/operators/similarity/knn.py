"""Mutual k-NN graph construction (exact or IVF-bucketed candidates) and
contrastive hard-negative mining on top of it.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comlake_core_spark.operators.similarity.core import cosine, dot, seeded_centroids
from comlake_core_spark.operators.similarity.ivf import (
    _counted_rows,
    ivf_assign_two_level,
    resolve_ivf_assignment,
)
from comlake_core_spark.operators.similarity.kmeans import kmeans_refine
from comlake_core_spark.session import ensure_parallelism


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
    # mutual filter as ONE pair-keyed aggregate (r14): the old shape
    # derived fwd/rev edge lists from knn and self-joined them — two full
    # consumptions of the k·N edge list, which re-executed the whole
    # candidate-scoring pipeline + window per leg (the second pass
    # additionally ran in an AQE-coalesced 5-partition layout: 9.8 s of
    # task time at sf0.1).  Folding each directed edge onto its
    # undirected (least, greatest) key and aggregating consumes knn once
    # with one shuffle; a pair is mutual exactly when both direction
    # slots are filled.  Each direction appears at most once in knn, so
    # max() over the singleton IS the value; cosine is taken from the
    # a<b leg exactly as fwd carried it (it is bit-identical from either
    # leg — same dims, same fold order — but the pin stays strict).
    e = knn.select(
        F.least("_src", "_dst").alias("id_a"),
        F.greatest("_src", "_dst").alias("id_b"),
        F.when(F.col("_src") < F.col("_dst"), F.col("cosine")).alias("_cf"),
        F.when(F.col("_src") < F.col("_dst"), F.col("rn")).alias("_rab"),
        F.when(F.col("_src") > F.col("_dst"), F.col("rn")).alias("_rba"),
    )
    return (
        e.groupBy("id_a", "id_b")
        .agg(
            F.max("_cf").alias("cosine"),
            F.max("_rab").alias("rank_ab"),
            F.max("_rba").alias("rank_ba"),
        )
        .filter(F.col("rank_ab").isNotNull() & F.col("rank_ba").isNotNull())
        .select(
            "id_a",
            "id_b",
            "cosine",
            F.col("rank_ab").cast("long").alias("rank_ab"),
            F.col("rank_ba").cast("long").alias("rank_ba"),
        )
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

