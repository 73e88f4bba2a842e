"""Embedding-space near-dup: random-hyperplane LSH bucketing with exact
cosine verify, and SemDeDup-style cluster-pruned semantic dedup
(Abbas et al., 2023, arXiv:2303.09540).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comlake_core_spark.operators.dedup.graph import connected_components
from comlake_core_spark.session import ensure_parallelism


def embedding_dedup_pairs(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    threshold: float = 0.95,
    n_planes: int = 12,
    max_bucket: int = 10_000,
    method: str = "auto",
) -> DataFrame:
    """Near-dup pairs among embeddings: random-hyperplane LSH bucket, then
    exact cosine verify within buckets.

    The ±1 hyperplanes are seeded-deterministic, computed ON THE DRIVER, and
    captured as a numpy codebook inside two Arrow-vectorized Pandas UDFs:
    bucketing is one (batch × dim) @ (dim × n_planes) matmul per Arrow batch,
    and the bucket-local cosine verify is an einsum over the candidate pairs.
    Per-row work never leaves C; the shuffle carries only (id, vec, bucket).

    ``max_bucket`` is the worst-bucket bound (same role as winnowing's
    ``max_df`` posting cap): a degenerate embedding distribution — all-zero
    vectors, a collapsed encoder — can put a huge fraction of the corpus in
    one bucket and make the self-join quadratic in it. Buckets larger than
    the cap are dropped (documented recall trade-off: a bucket that big is
    boilerplate/degenerate, exactly the content a near-dup pass should
    handle by other means), so the join does at most max_bucket² work per
    bucket. The bucket histogram is tiny (≤ 2^n_planes rows) and broadcast.

    ``method``: 'pandas' runs bucketing and verify as Arrow-vectorized
    Pandas UDFs (one matmul / einsum per batch — right for high-dim
    embeddings, where a per-row fold would be a huge codegen expression);
    'jvm' expresses both as built-in higher-order folds (whole-stage
    codegen, zero Python workers — right for small dims, where Arrow
    transfer + worker spin-up dominates the actual math); 'auto' picks
    'jvm' when dim × n_planes is small enough to codegen comfortably."""
    import numpy as np

    from comlake_core_spark.functions.udfs import make_cosine_pair_udf, make_hyperplane_bucket_udf

    first = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if first is None:
        return df.sparkSession.createDataFrame([], "id_a long, id_b long, cosine double")
    dim = int(first["d"])
    rng = np.random.default_rng(1729)  # fixed seed: stable buckets across runs
    planes_t = rng.choice([-1.0, 1.0], size=(n_planes, dim)).T  # (dim, n_planes)
    if method == "auto":
        method = "jvm" if dim * n_planes <= 8192 else "pandas"

    if method == "jvm":
        # same bit convention as the pandas UDF: bit j = (v · plane_j >= 0)
        def _dot(a: Column, b: Column) -> Column:
            return F.aggregate(
                F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x
            )

        def bucket_fn(vcol: Column) -> Column:
            out = F.lit(0)
            for j in range(n_planes):
                plane = F.array(*[F.lit(float(planes_t[i, j])) for i in range(dim)])
                out = out + F.when(_dot(vcol, plane) >= 0, F.lit(1 << j)).otherwise(F.lit(0))
            return out.cast("long")

        def cosine_fn(a: Column, b: Column) -> Column:
            den = F.sqrt(_dot(a, a)) * F.sqrt(_dot(b, b))
            return F.when(den == 0.0, F.lit(0.0)).otherwise(_dot(a, b) / den)

    elif method == "pandas":
        bucket_udf = make_hyperplane_bucket_udf(planes_t)
        cosine_udf = make_cosine_pair_udf()
        bucket_fn = lambda vcol: bucket_udf(vcol)  # noqa: E731
        cosine_fn = lambda a, b: cosine_udf(a, b)  # noqa: E731
    else:
        raise ValueError(f"unknown method {method!r}")

    v = F.col(vec_col).cast("array<double>")
    docs = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("_id"), v.alias("_v"), bucket_fn(v).alias("_bucket"))
        .persist()
    )
    small = (
        docs.groupBy("_bucket")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= max_bucket)
        .select("_bucket")
    )
    # Same fan-out hazard as semantic_dedup's all-pairs stage (SCALING.md
    # round-5 fix #2): embedding rows are small in BYTES but the bucket
    # self-join's output is Σ|bucket|² cosine pairs, so byte-based AQE
    # shuffle coalescing can serialize the pair work.  An explicit keyed
    # repartition pins the stage width; per-key cost is bounded by
    # max_bucket.  (The text-side self-joins — minhash/simhash/winnow/
    # ngram — don't need this: their inputs are byte-heavy relative to
    # their df-capped fan-out, so coalescing cannot collapse them.)
    par = df.sparkSession.sparkContext.defaultParallelism
    docs = docs.join(F.broadcast(small), "_bucket").repartition(par, "_bucket")
    a, b = docs.alias("a"), docs.alias("b")
    return (
        a.join(b, (F.col("a._bucket") == F.col("b._bucket")) & (F.col("a._id") < F.col("b._id")))
        .withColumn("cosine", cosine_fn(F.col("a._v"), F.col("b._v")))
        .filter(F.col("cosine") >= threshold)
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"), "cosine")
    )


def semantic_dedup(
    emb: DataFrame,
    n_clusters: int = 16,
    threshold: float = 0.92,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    hasher: str = "md5",
    max_cluster: int = 10_000,
    max_depth: int = 2,
    recluster_clusters: int | None = None,
) -> DataFrame:
    """SemDeDup-style semantic deduplication (Abbas et al., 2023,
    arXiv:2303.09540): cluster the embedding space, then prune
    near-duplicates WITHIN each cluster only — the clustering turns the
    O(n²) all-pairs cosine problem into per-cluster problems whose union
    is ~n²/k, and at 100 TB the cluster id doubles as the partition key
    (each cluster's pruning is embarrassingly parallel).

    Pipeline (every stage reuses an already-oracled primitive):
      1. centroids: similarity.seeded_centroids (md5 ordering — exact SQL
         twin), unit-normalized and baked into the plan as literals;
      2. assignment: per-row argmax cosine against the literal codebook —
         map-only, the ivf_topk idiom, no shuffle;
      3. intra-cluster edges: self-join on the cluster id, exact cosine
         >= threshold.  Clusters above ``max_cluster`` rows are first
         RE-CLUSTERED with a fresh per-cluster codebook (up to
         ``max_depth`` rounds — at 100 TB the head cluster is exactly
         where the duplicates live, so it must be pruned, not exempted);
         a cluster still oversized after the depth cap falls back to the
         worst-bucket exclusion, like embedding LSH's max_bucket;
      4. survivors: connected components per edge set, keep the smallest
         id per component (deterministic canonical pick).

    Returns per-cluster accounting: (bucket, n_vectors, n_survivors,
    survivor_id_sum) — the id-sum checksum pins the exact surviving
    membership under the driver's hash gate."""
    from comlake_core_spark.operators.similarity.core import cosine, dot, seeded_centroids

    def _unit(v: list) -> list:
        n = sum(x * x for x in v) ** 0.5 or 1.0
        return [float(x) / n for x in v]

    def _bucket_expr(cents: list, id_offset: int):
        """Argmax-cosine bucket id against a literal codebook, as a pure
        Column expression; bucket ids are offset so refinement rounds
        never collide."""
        codebook = F.array(
            *[
                F.struct(
                    F.lit(id_offset + int(r["centroid_id"])).alias("cid"),
                    F.array(*[F.lit(x) for x in _unit(r["centroid_vec"])]).alias("cvec"),
                )
                for r in cents
            ]
        )
        scored = F.transform(
            codebook,
            lambda s: F.struct(dot(F.col("_v"), s["cvec"]).alias("sim"), (-s["cid"]).alias("ncid")),
        )
        return (-F.array_max(scored)["ncid"]).cast("int")

    def _assign(df: DataFrame, cents: list, id_offset: int) -> DataFrame:
        """Map-only argmax-cosine assignment against a literal codebook."""
        return df.withColumn("bucket", _bucket_expr(cents, id_offset))

    rows = ensure_parallelism(emb).select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    cents = seeded_centroids(emb, n_clusters, vec_col, id_col, hasher=hasher).collect()
    assigned = _assign(rows, cents, 0).persist()

    # Depth-capped recursive refinement (VERDICT r3 #4): clusters above
    # max_cluster re-cluster with a fresh per-cluster seeded codebook
    # instead of being exempted from pruning.  The driver loop is over
    # OVERSIZED CLUSTER IDS only (O(head-of-distribution), not O(rows));
    # each sub-codebook is one bounded collect and the re-assignment stays
    # map-only, so the plan shape survives 100 TB.  New bucket ids are
    # allocated sequentially past the current max — compact and stable.
    prev: DataFrame | None = None
    for _depth in range(max_depth):
        oversized = sorted(
            r["bucket"]
            for r in assigned.groupBy("bucket")
            .agg(F.count(F.lit(1)).alias("_n"))
            .filter(F.col("_n") > max_cluster)
            .collect()
        )
        # the collect above materialized the current round's cache, so the
        # previous round's persisted frame can be released — without this,
        # executor storage accumulates one full assignment copy per round
        # in exactly the head-of-distribution scenario the refinement is
        # built for (ADVICE r4, dedup.py:882)
        if prev is not None:
            prev.unpersist()
            prev = None
        if not oversized:
            break
        next_id = assigned.agg(F.max("bucket").alias("m")).first()["m"] + 1
        k_sub = recluster_clusters or n_clusters
        # ONE windowed job seeds EVERY oversized cluster: row_number per
        # bucket over the same (hash, id) ordering seeded_centroids uses,
        # so the seeds are identical to a per-cluster
        # seeded_centroids(sub, k_sub) — but B collect-jobs become one.
        # (The first r4 shape ran one seeding job per oversized cluster
        # and rebuilt `assigned` as a (B+1)-way filter/union, whose
        # partition count multiplied every round — at 8x scale the curve
        # went super-linear on task-scheduling overhead alone, measured
        # 224 s vs 26 s for this shape.)
        if hasher == "xxhash64":
            sort_key = F.xxhash64(F.col("_id"))
        else:
            sort_key = F.md5(F.col("_id").cast("string"))
        w_seed = Window.partitionBy("bucket").orderBy(sort_key, F.col("_id"))
        seed_rows = (
            assigned.filter(F.col("bucket").isin([int(b) for b in oversized]))
            .withColumn("_r", F.row_number().over(w_seed))
            .filter(F.col("_r") <= k_sub)
            .select("bucket", "_r", "_v")
            .collect()
        )
        by_bucket: dict[int, list] = {}
        for r in seed_rows:
            by_bucket.setdefault(r["bucket"], []).append((r["_r"], r["_v"]))
        # The per-bucket sub-codebooks ride a BROADCAST JOIN on the bucket
        # key — NOT plan literals: a literal chained-when was tried first
        # and its B x k_sub x dim constants made Catalyst analysis itself
        # the bottleneck once round 2 had many oversized clusters
        # (measured 106 s at 2x where this shape takes ~20 s).  The join
        # attaches each oversized row its own cluster's codebook array;
        # scoring stays the same map-only argmax transform, rows outside
        # any oversized bucket keep their assignment (null codebook).
        # Plan size is constant per round; the broadcast is O(B x k_sub)
        # rows.  Sub-centroid ids are offset past the current max in
        # sorted-bucket order, exactly as the literal path allocated them.
        cb_rows = []
        for b in oversized:
            cents = sorted(by_bucket[int(b)], key=lambda t: t[0])
            # ids = next_id + row_number (1-based), matching the original
            # per-cluster `_assign(sub, sub_cents, next_id)` allocation
            cb_rows.append(
                (int(b), [(int(next_id) + int(_r), _unit(v)) for _r, v in cents])
            )
            next_id += len(cents)
        cbdf = emb.sparkSession.createDataFrame(
            cb_rows, "bucket int, _cb array<struct<cid:int,cvec:array<double>>>"
        )
        scored = F.transform(
            F.col("_cb"),
            lambda s: F.struct(dot(F.col("_v"), s["cvec"]).alias("sim"), (-s["cid"]).alias("ncid")),
        )
        prev = assigned
        assigned = (
            assigned.join(F.broadcast(cbdf), "bucket", "left")
            .withColumn(
                "bucket",
                F.when(F.col("_cb").isNull(), F.col("bucket")).otherwise(
                    (-F.array_max(scored)["ncid"]).cast("int")
                ),
            )
            .drop("_cb")
            .persist()
        )
    if prev is not None:
        # depth cap hit with clusters still oversized: materialize the final
        # assignment before releasing its parent's cache (its lineage reads
        # the parent), then drop the parent
        assigned.count()
        prev.unpersist()

    small = (
        assigned.groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("_n"))
        .filter(F.col("_n") <= max_cluster)
        .select("bucket")
    )
    # Pin the all-pairs stage's parallelism with an EXPLICIT keyed
    # repartition: the self-join's input is small in BYTES (AQE coalesces
    # its shuffle to 1-2 partitions under the AQE-only-broadcast posture)
    # but its OUTPUT is Σ|cluster|² cosine pairs — byte-based coalescing
    # is blind to join fan-out, and the pair work went serial (measured
    # 108 s vs ~15 s at a 4k-vector scale point).  An explicit partition
    # count is respected by AQE; per-key cost stays bounded by max_cluster.
    par = emb.sparkSession.sparkContext.defaultParallelism
    prunable = assigned.join(F.broadcast(small), "bucket").repartition(par, "bucket")
    a, b = prunable.alias("a"), prunable.alias("b")
    edges = (
        a.join(b, (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a._id") < F.col("b._id")))
        .withColumn("_cos", cosine(F.col("a._v"), F.col("b._v")))
        .filter(F.col("_cos") >= threshold)
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"))
    )
    comp = connected_components(edges)  # (node, component); component = min id
    labeled = assigned.join(comp, assigned["_id"] == comp["node"], "left").select(
        "bucket", "_id", F.coalesce("component", F.col("_id")).alias("_rep")
    )
    return labeled.groupBy("bucket").agg(
        F.count(F.lit(1)).alias("n_vectors"),
        F.count_distinct("_rep").alias("n_survivors"),
        F.sum(F.when(F.col("_id") == F.col("_rep"), F.col("_id"))).cast("long").alias("survivor_id_sum"),
    )

