"""Duplicate-graph operators: connected components, PageRank, BFS depth
over near-duplicate edge lists (see package docstring in __init__.py).
All arithmetic is integer fixed-point so results are oracle-exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from comlake_core_spark.session import materialize


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 15,
    edges_cut: bool = False,
) -> DataFrame:
    """Group near-duplicate PAIRS into duplicate CLUSTERS: connected
    components by min-label propagation. Returns (node, component) where
    component is the smallest node id reachable from `node` — the cluster
    representative a dedup pipeline keeps.

    Why this exists: every pairwise dedup stage (minhash/simhash/winnow/
    embedding) emits edges, but the keep/drop decision needs the
    transitive closure — A~B and B~C must collapse to ONE survivor even
    though (A, C) was never emitted as a pair.

    Algorithm: labels start as each node's own id; each round every node
    takes the min of its label and its neighbors' labels (one equi-join on
    the edge list + one min-agg — two keyed shuffles per round), stopping
    when a round changes nothing. Rounds needed = graph diameter; dup
    clusters are near-cliques (diameter ≤ ~3), so this converges in a
    handful of rounds — the asymptotically better large-star/small-star
    contraction (Kiveris et al.) only pays off on long-chain graphs that
    dedup similarity edges don't produce. Convergence is checked with a
    cheap sum(label) aggregate (strictly decreasing until fixpoint), and
    each round localCheckpoints to keep the plan from growing with the
    iteration count (on a cluster: checkpoint to reliable storage).

    ``max_iter`` counts PROPAGATION ROUNDS, and the fused label seed (see
    below) IS round 1, so max_iter must be >= 1 (ADVICE r14: the r14 seed
    fold silently turned max_iter=0 into one round; now it raises).

    ``edges_cut=True`` declares that ``pairs`` is ALREADY materialized
    (e.g. the caller localCheckpointed it to share with another
    consumer); the symmetrized view is then left as a cheap union over
    the caller's blocks instead of being checkpointed again — without
    the flag, callers like leakage_safe_split held BOTH the raw pair
    blocks AND a 2x symmetrized copy for the lifetime of the plan
    (ADVICE r14: ~3x edge rows as spill-only blocks)."""
    if max_iter < 1:
        raise ValueError(f"max_iter must be >= 1 (the label seed is round 1), got {max_iter}")
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # materialize the edge list ONCE (the same cut pagerank and bfs_depth
    # below already carry): sym is referenced by the label seed and by
    # EVERY propagation round's join, and without a cut each reference
    # re-runs the upstream pair pipeline — for an LSH edge set that is
    # the whole shingle/band/verify cascade per round (measured r14,
    # together with the fused seed below: dedup_clusters fn()+force
    # 7.45 s → 3.30 s, leakage_safe_split_docs 8.95 s → 3.29 s,
    # dedup_canonical_docs 6.99 s → 3.60 s).  Lazy localCheckpoint: computed at
    # first use (the label seed), truncates lineage so each round's plan
    # stays one round deep, immune to clearCache/LRU eviction; blocks are
    # released by the ContextCleaner when the loop's frames go
    # unreachable.  On a cluster: checkpoint to reliable storage.
    # When the caller already cut `pairs`, the union is two map-only
    # reads of those blocks per consumer — re-checkpointing it would
    # store the edge set a second time (2x rows) for no lineage benefit.
    if not edges_cut:
        sym = sym.transform(materialize)
    # seed = round 1, fused (r14): with initial labels label(v)=v, the
    # first propagation round computes least(v, min(N(v))) — which is
    # exactly ONE aggregate over the symmetrized edges (every node
    # appears as src).  The old shape paid a distinct (same exchange as
    # this aggregate) just to seed identity labels, then spent a full
    # join+agg+checkpoint round recomputing what the seed could carry —
    # one whole edge-set pass saved at any scale.
    labels = (
        sym.groupBy(F.col("src").alias("node"))
        .agg(F.least(F.col("node"), F.min("dst")).alias("component"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("component")).first()[0]
    for _ in range(max_iter - 1):
        nbr_min = (
            sym.join(labels, sym["src"] == labels["node"])
            .groupBy("dst")
            .agg(F.min("component").alias("_nbr"))
        )
        labels = (
            labels.join(nbr_min, labels["node"] == nbr_min["dst"], "left")
            .select(
                "node",
                F.least(F.col("component"), F.coalesce(F.col("_nbr"), F.col("component"))).alias(
                    "component"
                ),
            )
            .localCheckpoint()
        )
        cur_sum = labels.agg(F.sum("component")).first()[0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels


def pagerank(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    iterations: int | None = 3,
    damping_pct: int = 85,
    scale: int = 10**12,
    max_iter: int = 40,
) -> DataFrame:
    """Fixed-iteration PageRank over an undirected edge list — node
    importance inside the near-dup graph (which copy of a duplicated
    page is the hub every mirror links through; host-importance weighting
    in web-corpus curation uses exactly this shape). Returns
    (node, degree, rank_q) where rank_q is the rank after `iterations`
    rounds, fixed-point-scaled by `scale`.

    Exactness: ALL arithmetic is integer — ranks start at `scale`, each
    round is r' = (100-d)%·scale + d%·Σ floor(r/deg) with integer (div)
    division throughout — so results are bit-identical across engines
    and partitionings (float PageRank sums in nondeterministic order and
    cannot be oracle-checked exactly). With scale=1e12 and N nodes,
    intermediate sums stay below N·scale·damping_pct ≪ 2^63 for any
    corpus whose node ids fit a BIGINT's practical range (overflow at
    ~10^5 trillion-rank nodes — raise via smaller scale).

    Plan per round: one equi-join edge→rank (shuffle on node id) and one
    map-combined sum — the same two keyed exchanges as
    connected_components, degree skew bounded by the upstream LSH caps.
    Fixed iteration count keeps the plan finite; for rank convergence at
    scale, checkpoint between rounds like connected_components does."""
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # materialize the edge list ONCE: sym is referenced by the degree agg
    # and by every iteration's join, and without a cut each reference
    # re-runs the upstream pair pipeline (for an LSH edge set that is the
    # whole shingle/band/verify cascade — measured 27 s/iteration-chain vs
    # ~2 s cut).  Lazy localCheckpoint: computed at first use, truncates
    # lineage, immune to clearCache and LRU eviction (same rationale as
    # jaccard_topk_similar's corpus cut; on a cluster checkpoint to
    # reliable storage instead).
    sym = sym.transform(materialize)
    deg = sym.groupBy("src").agg(F.count(F.lit(1)).alias("d")).withColumnRenamed("src", "node")
    base = scale * (100 - damping_pct) // 100
    r = deg.select("node", "d", F.lit(scale).cast("long").alias("r"))

    def step(cur):
        contrib = (
            sym.join(cur, sym["src"] == cur["node"])
            .select(F.col("dst").alias("node"), F.expr("r div d").alias("_c"))
            .groupBy("node")
            .agg(F.sum("_c").alias("_c"))
        )
        return deg.join(contrib, "node").select(
            "node",
            "d",
            F.expr(f"cast({base} + ({damping_pct} * _c) div 100 as bigint)").alias("r"),
        )

    if iterations is not None:
        # fixed-round form: finite plan, exactly reproducible by an
        # unrolled SQL oracle (the registered workload's shape)
        for _ in range(iterations):
            r = step(r)
        return r.select("node", F.col("d").alias("degree"), F.col("r").alias("rank_q"))
    # convergence form (iterations=None): run until the integer ranks
    # reach their fixpoint — integer arithmetic makes "unchanged" exact,
    # no epsilon. Each round localCheckpoints (plan stays one round deep)
    # and convergence is detected with a cheap sum aggregate first, then
    # confirmed with an exact anti-join count only when the sum is stable
    # (two different rank vectors can share a sum; a changed sum can't be
    # a fixpoint). The production knob for rank-quality use; the
    # fixed-round form remains the oracle-able one.
    r = r.localCheckpoint()
    prev_sum = r.agg(F.sum("r")).first()[0]
    for _ in range(max_iter):
        r_new = step(r).localCheckpoint()
        cur_sum = r_new.agg(F.sum("r")).first()[0]
        if cur_sum == prev_sum:
            changed = (
                r_new.alias("a")
                .join(r.alias("b"), "node")
                .filter(F.col("a.r") != F.col("b.r"))
                .limit(1)
                .count()
            )
            if changed == 0:
                r = r_new
                break
        prev_sum = cur_sum
        r = r_new
    return r.select("node", F.col("d").alias("degree"), F.col("r").alias("rank_q"))


def bfs_depth(
    pairs: DataFrame,
    seed_pred,
    id_a: str = "id_a",
    id_b: str = "id_b",
    iterations: int = 3,
    attribute_seed: bool = False,
) -> DataFrame:
    """Multi-source breadth-first search over the undirected near-dup
    edge list: minimum hop distance (0..iterations) from any seed node —
    "how far is this document from a known-bad/known-contaminated page?"
    Contamination-radius and spam-neighborhood policies in web-corpus
    curation are exactly this query (flag everything within k hops of a
    blocklisted page); it complements connected_components (which answers
    reachable-at-all, not how-close).

    `seed_pred` is a Column predicate over the node id selecting the seed
    set. Returns (node, depth) for every node within `iterations` hops of
    a seed — unreached nodes are absent (their distance is unknown, not
    infinite: the graph is bounded by the LSH edge set).

    Exactness: depths are small integers computed by min() — no floats
    anywhere, bit-identical in any engine, unlike distance algorithms
    with weighted relaxation. Determinism does not depend on iteration
    order because min() is idempotent and commutative.

    Plan per round: one equi-join frontier→edges (shuffle on node id) +
    one map-combined min — the connected_components exchange shape. The
    edge list is localCheckpoint'd ONCE (same rationale as pagerank:
    without the cut every round re-runs the whole LSH cascade). Frontier
    size is monotone non-increasing in useful work: a node's depth is
    final the first time it is reached (min of earlier rounds wins), so
    at scale pass only the NEWLY-reached frontier into the next join —
    here the full known set is joined each round for plan simplicity at
    fixed small `iterations`."""
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    ).transform(materialize)
    nodes = sym.select(F.col("src").alias("node")).distinct()
    # relax over a (depth, seed) struct: struct min is lexicographic, so
    # min() still relaxes on depth first and tie-breaks deterministically
    # on the smaller seed id — attribution rides the same exchanges for
    # free (plain mode simply projects the seed away)
    d = nodes.filter(seed_pred(F.col("node"))).select(
        "node",
        F.struct(
            F.lit(0).cast("long").alias("depth"), F.col("node").alias("seed")
        ).alias("_st"),
    )
    for _ in range(iterations):
        reached = (
            sym.join(d, sym["src"] == d["node"])
            .select(
                F.col("dst").alias("node"),
                F.struct(
                    (F.col("_st.depth") + 1).alias("depth"),
                    F.col("_st.seed").alias("seed"),
                ).alias("_nst"),
            )
            .groupBy("node")
            .agg(F.min("_nst").alias("_nst"))
        )
        # least() skips nulls, so this is min(existing, new) with either
        # side possibly absent after the full outer join
        d = d.join(reached, "node", "full_outer").select(
            "node", F.least(F.col("_st"), F.col("_nst")).alias("_st")
        )
    out = d.select(
        "node",
        F.col("_st.depth").cast("long").alias("depth"),
        # no cast: the seed IS a node value, so it inherits the caller's id
        # type — casting to long silently nulled string ids
        F.col("_st.seed").alias("nearest_seed"),
    )
    return out if attribute_seed else out.drop("nearest_seed")
