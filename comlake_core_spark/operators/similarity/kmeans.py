"""Spherical k-means codebook refinement: Lloyd iterations with cosine
assignment, one mapInPandas pass per iteration emitting O(k) rows per
partition; driver state is the codebook only.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from comlake_core_spark.operators.similarity.core import seeded_centroids


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

