"""Sampling primitives for training-data pipelines: deterministic
stratified sampling, stable hash-based train/test splits, and fixed-size
uniform samples.

The reference has no sampling surface (its extract path returns whole
filtered sets — SURVEY.md §2.2); these are the operations a 100 TB corpus
pipeline needs on top: cap a dominant class, carve a reproducible held-out
set, pull a fixed-size sample for inspection. All are deterministic —
rerunning the pipeline yields byte-identical splits, which is what makes
dataset versioning and eval contamination checks possible.

Scale notes per operator are in the docstrings; the common theme is that
each costs at most one shuffle, and the per-stratum cap rides Spark's
WindowGroupLimit so the limit is applied map-side BEFORE the exchange
(each task forwards at most k rows per stratum, not its whole partition).
"""

from __future__ import annotations

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comlake_core_spark.session import ensure_parallelism, materialize


def stratified_cap(
    df: DataFrame, stratum: str, order_by: str, n_per_stratum: int
) -> DataFrame:
    """At most `n_per_stratum` rows per stratum, chosen deterministically
    as the first n in `order_by` order. One shuffle on the stratum key;
    rank(<=k) compiles to WindowGroupLimit, so every map task pre-trims to
    k rows per stratum before shuffling — a dominant class costs its cap,
    not its cardinality."""
    w = Window.partitionBy(stratum).orderBy(order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= n_per_stratum)
        .drop("_rn")
    )


def stratified_sample(
    df: DataFrame, stratum: str, order_by: str, fraction: float
) -> DataFrame:
    """Proportional stratified sample: ceil(fraction * |stratum|) rows from
    each stratum, deterministic in `order_by` order. Two passes: a
    per-stratum count (map-side combined, output is O(#strata) and
    broadcast back), then a rank filter against the per-stratum quota.

    A join-derived quota is not a literal, so Spark can't plan
    WindowGroupLimit from it alone; we therefore ALSO bound the rank by
    the max quota (one O(#strata) driver-side collect of an already-tiny
    aggregate) — that literal bound restores the map-side trim, and the
    broadcast quota join tightens it to the exact per-stratum quota."""
    quotas = df.groupBy(stratum).agg(
        F.ceil(F.count(F.lit(1)) * fraction).alias("_quota")
    )
    max_quota = quotas.agg(F.max("_quota")).first()[0] or 0
    w = Window.partitionBy(stratum).orderBy(order_by)
    return (
        df.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= max_quota)
        .join(F.broadcast(quotas), stratum)
        .filter(F.col("_rn") <= F.col("_quota"))
        .drop("_rn", "_quota")
    )


def split_assignment(key: Column, test_fraction: float, buckets: int = 10_000) -> Column:
    """Stable train/test assignment from a content key: true → test set.

    pmod(xxhash64(key), buckets) < test_fraction * buckets. Pure JVM
    hashing (stays in codegen), no shuffle at all, and the assignment is a
    function of the KEY — stable across runs, partitionings, cluster
    sizes, and even re-ingestion of the same documents, which is the
    property that keeps eval sets uncontaminated as the corpus grows."""
    cut = int(test_fraction * buckets)
    return F.pmod(F.xxhash64(key), F.lit(buckets)) < cut


def split_assignment_portable(key: Column, test_fraction: float) -> Column:
    """Engine-portable stable split: true → test set.

    Same contamination guarantee as split_assignment (assignment is a pure
    function of the key), but built on md5 — available bit-identically in
    Spark, DuckDB, and PostgreSQL — so the split can be recomputed and
    audited OUTSIDE Spark. The first 4 hex chars are compared
    lexicographically against floor(fraction * 16^4) in hex: [0-9a-f]
    lexicographic order equals numeric order, so no hex→int conversion is
    needed in engines that lack one. Granularity is 1/65536 — ample for
    split fractions. Prefer split_assignment (xxhash64, one codegen'd
    intrinsic) in pure-Spark hot paths."""
    cut = format(int(test_fraction * 65536), "04x")
    return F.substring(F.md5(key.cast("string")), 1, 4) < F.lit(cut)


def hash_split(
    df: DataFrame, key: str, test_fraction: float = 0.1
) -> tuple[DataFrame, DataFrame]:
    """(train, test) DataFrames via split_assignment on df[key]."""
    is_test = split_assignment(F.col(key), test_fraction)
    return df.filter(~is_test), df.filter(is_test)


def uniform_sample_n(df: DataFrame, n: int, seed: int = 42, key: str | None = None) -> DataFrame:
    """Exactly min(n, |df|) rows, approximately uniform. Distributed
    top-n by a per-row hash: with `key`, the hash is content-derived and
    the sample is fully deterministic; without, xxhash64 over all columns
    is used. Plans as TakeOrderedAndProject — each task keeps its local
    top-n, the driver merges O(n * #partitions), no full sort."""
    h = F.xxhash64(F.col(key)) if key else F.xxhash64(*[F.col(c) for c in df.columns])
    return df.orderBy(h.asc(), *[F.col(c) for c in df.columns[:1]]).limit(n)


def sample_fraction_bounds(test_fraction: float, n: int) -> tuple[float, float]:
    """3-sigma binomial bounds on the observed test-set fraction — what a
    pipeline health-check should assert after a split of n keys."""
    sigma = math.sqrt(test_fraction * (1 - test_fraction) / max(n, 1))
    return max(0.0, test_fraction - 3 * sigma), min(1.0, test_fraction + 3 * sigma)


def negative_samples(
    corpus: DataFrame,
    anchors: DataFrame,
    k: int = 4,
    id_col: str = "doc_id",
    anchor_id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic negative sampling for contrastive training pairs:
    for each anchor, pick the k corpus items with the smallest
    md5(anchor_id:item_id) — a seeded pseudo-random draw that is (a)
    reproducible across runs/partitionings (pure function of the id
    pair, the same portability argument as split_assignment_portable),
    (b) different per anchor (the anchor id salts the hash), and (c)
    exactly recomputable by a SQL oracle. Positive-pair mining (minhash/
    embedding dedup) finds what IS similar; this supplies the matched
    negatives an embedding-training pipeline pairs them with.

    Plan: anchors broadcast over one corpus scan; WindowGroupLimit keeps
    k per anchor map-side before the single shuffle. Exclusions beyond
    self (e.g. known positives) can be anti-joined upstream."""
    c = ensure_parallelism(corpus).select(F.col(id_col).alias("item_id"))
    a = anchors.select(F.col(anchor_id_col).alias("anchor_id"))
    scored = (
        c.crossJoin(F.broadcast(a))
        .filter(F.col("item_id") != F.col("anchor_id"))
        .select(
            "anchor_id",
            "item_id",
            F.md5(
                F.concat_ws(":", F.col("anchor_id").cast("string"), F.col("item_id").cast("string"))
            ).alias("_h"),
        )
    )
    w = Window.partitionBy("anchor_id").orderBy(F.asc("_h"), F.asc("item_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("anchor_id", "item_id", "rn")
    )


def mixture_resample(
    df: DataFrame,
    group_cols: list[str],
    target_docs: int,
    token_count: Column | str = "n_tokens",
    id_col: str = "doc_id",
    alpha: float = 0.5,
) -> DataFrame:
    """Training-mixture re-weighting: allocate a document budget across
    domains proportional to each domain's token mass raised to the
    TEMPERATURE `alpha` (exponentiated sampling, the multilingual-mixture
    knob: α=1 is proportional, α=0 uniform; mBERT used α≈0.7 and XLM-R
    α=0.3 — Conneau et al. 2020 §3.1 — to keep head languages from
    drowning the tail; the default 0.5 is the classic square-root
    flattening, and DoReMi-style learned weights drop into the same
    quota slot), then select each domain's quota deterministically by
    content-hash rank, so re-ingesting or re-partitioning never changes
    the mixture.

    Quotas use LARGEST-REMAINDER apportionment (ADVICE r2 #2): each
    domain gets floor(target·wᵢ/Σw), and the leftover seats go to the
    domains with the largest fractional remainders (ties → group-key
    order), so Σquota == target_docs EXACTLY — independent rounding could
    drift by ±n_domains/2.  (A domain whose quota exceeds its document
    count still undershoots n_kept; the budget claim is about quotas.)

    Exactness discipline: token masses are exact ints; sqrt (the α=0.5
    special case) is IEEE-exact in every engine, and general tokens^α
    goes through libm pow, so EITHER way each domain weight lands on a
    9-decimal grid before the exact decimal total (the same quantize
    bridge as every ln in this codebase); the remainders are identical
    doubles of identical inputs in both engines, so quotas are
    integer-identical across engines. Returns per-domain accounting
    INCLUDING an id-sum checksum of the selected set — the hash gate
    pins the exact membership, not just the counts.

    Scale: one shuffle groups tokens per domain (tiny frame); the
    per-domain rank rides one shuffle on the group key; weights are a
    broadcast scalar frame. Selection never materializes outside the
    window filter."""
    ids = [F.col(c) for c in group_cols]
    tok = F.col(token_count) if isinstance(token_count, str) else token_count
    base = df.select(*ids, F.col(id_col), tok.cast("long").alias("_tok"))
    dom = base.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs_total"), F.sum("_tok").alias("domain_tokens")
    )
    mass = F.col("domain_tokens").cast("double")
    raw_w = F.sqrt(mass) if alpha == 0.5 else F.pow(mass, F.lit(float(alpha)))
    w9 = F.round(raw_w, 9).cast("decimal(20,9)")
    dom = dom.withColumn("_w", w9)
    tot = dom.agg(F.sum("_w").alias("_tot"))
    raw = F.lit(float(target_docs)) * (F.col("_w").cast("double") / F.col("_tot").cast("double"))
    domq = (
        dom.crossJoin(F.broadcast(tot))
        .withColumn("_base", F.floor(raw).cast("long"))
        .withColumn("_rem", raw - F.col("_base"))
    )
    base_sum = domq.agg(F.sum("_base").alias("_bsum"))
    # single-partition window is fine: the frame is one row per DOMAIN
    lr_w = Window.orderBy(F.desc("_rem"), *[F.asc(c) for c in group_cols])
    domq = (
        domq.crossJoin(F.broadcast(base_sum))
        .withColumn("_lr", F.row_number().over(lr_w))
        .withColumn(
            "quota",
            F.col("_base")
            + F.when(F.col("_lr") <= F.lit(target_docs) - F.col("_bsum"), F.lit(1)).otherwise(
                F.lit(0)
            ),
        )
    )
    rank_w = Window.partitionBy(*group_cols).orderBy(
        F.md5(F.col(id_col).cast("string")).asc(), F.col(id_col).asc()
    )
    ranked = base.withColumn("_rn", F.row_number().over(rank_w))
    kept = ranked.join(F.broadcast(domq.select(*group_cols, "quota")), group_cols).filter(
        F.col("_rn") <= F.col("quota")
    )
    kept_stats = kept.groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.sum("_tok").cast("long").alias("kept_tokens"),
        F.sum(F.col(id_col)).cast("long").alias("kept_id_sum"),
    )
    return (
        domq.select(*group_cols, "n_docs_total", "domain_tokens", "quota")
        .join(kept_stats, group_cols, "left")
        .select(
            *group_cols,
            "n_docs_total",
            F.col("domain_tokens").cast("long").alias("domain_tokens"),
            "quota",
            F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
            F.coalesce("kept_tokens", F.lit(0)).cast("long").alias("kept_tokens"),
            F.coalesce("kept_id_sum", F.lit(0)).cast("long").alias("kept_id_sum"),
        )
    )


def leakage_safe_split(
    df: DataFrame,
    pairs: DataFrame,
    test_fraction: float = 0.125,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Contamination-safe train/test split: near-duplicate documents must
    land in the SAME split, or the eval set silently overlaps the training
    set (the leakage a plain per-document hash split cannot prevent — a
    near-dup pair hashes to independent splits with probability
    2·f·(1−f)).

    The unit of assignment is the near-dup CLUSTER: ``pairs`` (any
    pairwise dedup stage's edges) collapse to connected components
    (operators/dedup.connected_components), every document maps to its
    component representative (itself when unpaired), and the
    engine-portable md5 split (split_assignment_portable) is applied to
    the REPRESENTATIVE — so cluster members move together by
    construction.

    Returns per-split accounting: n_docs, n_clustered docs, an id-sum
    membership checksum, and ``cross_split_pairs`` — the number of input
    pairs whose endpoints land in different splits, COMPUTED (not
    assumed) so the zero-leakage claim is part of the verified output.

    Scale: components are O(diameter) label-propagation rounds over the
    edge set (dup clusters are near-cliques, diameter ~2); the join of
    docs→component is one shuffle on id; everything after is a small
    per-split aggregate."""
    from comlake_core_spark.operators.dedup.graph import connected_components

    # the edge list is consumed TWICE here — by the component propagation
    # and by the cross-split leakage count below — and for an LSH edge set
    # its lineage is the whole shingle/band/verify cascade.  Cut it once
    # so both consumers read materialized blocks instead of re-running the
    # cascade.  edges_cut=True tells connected_components NOT to checkpoint
    # its symmetrized view on top of this cut (ADVICE r14: the double
    # materialization held ~3x edge rows as spill-only blocks); its rounds
    # instead union this cut's blocks per pass — map-only reads.
    # Lazy: materialized by the components' first action.
    pairs = pairs.transform(materialize)
    comp = connected_components(pairs, id_a=id_a, id_b=id_b, edges_cut=True)
    docs = df.select(F.col(id_col).alias("_id"))
    with_rep = docs.join(comp, docs["_id"] == comp["node"], "left").select(
        "_id", F.coalesce("component", F.col("_id")).alias("_rep")
    )
    split = F.when(split_assignment_portable(F.col("_rep"), test_fraction), "test").otherwise(
        "train"
    )
    assigned = with_rep.select("_id", "_rep", split.alias("split"))
    # leakage metric: endpoints of any input pair in different splits
    a = assigned.select(F.col("_id").alias(id_a), F.col("split").alias("_sa"))
    b = assigned.select(F.col("_id").alias(id_b), F.col("split").alias("_sb"))
    crossing = (
        pairs.join(a, id_a).join(b, id_b).filter(F.col("_sa") != F.col("_sb")).count()
    )
    return assigned.groupBy("split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum((F.col("_rep") != F.col("_id")).cast("long")).alias("n_in_clusters"),
        F.sum("_id").cast("long").alias("id_sum"),
        F.lit(crossing).cast("long").alias("cross_split_pairs"),
    )


def weighted_sample(
    df: DataFrame,
    weight: Column | str,
    n_per_group: int,
    group_col: str,
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement per group —
    the A-ES scheme (Efraimidis & Spirakis 2006): each row gets the key
    u^(1/w) for a uniform u, and the top-n keys per group are exactly a
    weighted sample without replacement. The stage a quality-weighted
    corpus subsampler runs ("keep 5 docs per source, preferring long /
    high-quality ones, reproducibly").

    Determinism + portability: u is derived from md5(id) (bit-identical
    in Spark / DuckDB / PostgreSQL — same recipe as
    split_assignment_portable): the first 12 hex chars parse to an
    integer h, and u = (h+1)/2^48 ∈ (0, 1]. Rows are ranked by
    ln(u)/w — a monotone transform of u^(1/w) that avoids pow — and the
    key is QUANTIZED to an integer (×1e9) before ranking, so a 1-ulp
    libm difference between engines cannot reorder boundary rows.

    Plan: hashing and key computation are map-only codegen'd JVM
    expressions; the rank(<= n) rides WindowGroupLimit, so each map task
    forwards at most n rows per group BEFORE the one shuffle on the
    group key — a dominant group costs its cap, not its cardinality."""
    wcol = F.col(weight) if isinstance(weight, str) else weight
    h = F.conv(F.substring(F.md5(F.col(id_col).cast("string")), 1, 12), 16, 10)
    u = (h.cast("long") + 1) / F.lit(float(2**48))
    qk = F.round(F.log(u) / F.greatest(wcol, F.lit(1)) * 1e9, 0).cast("long")
    w = Window.partitionBy(group_col).orderBy(F.col("_qk").desc(), F.col(id_col))
    return (
        df.withColumn("_qk", qk)
        .withColumn("sample_rank", F.row_number().over(w).cast("long"))
        .filter(F.col("sample_rank") <= n_per_group)
        .select(
            group_col,
            "sample_rank",
            id_col,
            wcol.cast("long").alias("weight"),
            F.round(F.col("_qk") / F.lit(1e9), 6).alias("es_key"),
        )
    )


def dsir_weights(
    df: DataFrame,
    target_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    top_n: int = 100,
    ngram_max: int = 1,
) -> DataFrame:
    """Data Selection via Importance Resampling (DSIR, Xie et al.,
    NeurIPS 2023): score every document by how target-like its hashed
    n-gram feature distribution is — the log importance ratio
    Σ_tokens [ln p_target(h(tok)) - ln p_raw(h(tok))] under two smoothed
    bag-of-buckets unigram models — then keep the highest-weighted docs.
    This is the principled version of "train a quality classifier on a
    trusted corpus": no labels, just a target sample (`target_pred`
    selects it; here e.g. lang = 'en').

    Returns (doc_id, n_tokens, weight_q, avg_weight_micro, sampled):
    weight_q is the log-ratio sum in 1e-9 units; `sampled` marks the
    global top-`top_n` by (weight_q DESC, doc_id).

    Exactness bridge: each bucket's log-ratio is computed ONCE from
    integer counts ((c_t+1)/(N_t+B) vs (c_r+1)/(N_r+B)) and immediately
    quantized to an integer (×1e9), so per-document weights are exact
    integer sums — summation order cannot matter, and the oracle
    reproduces every value bit-for-bit.

    Plan: two map-combined aggregates over the exploded tokens build the
    two count tables (≤ `buckets` rows each); their join is the model —
    a ≤1024-row broadcast. Scoring is then a broadcast hash join on the
    bucket id plus one map-combined per-doc sum: one effective pass over
    the corpus, no big shuffle. The global top-n rank is assigned by
    `global_row_number` (range shuffle + O(P) offset table + map-only
    rank) — NOT a `row_number().over(Window.orderBy(...))`, whose
    no-partition window funnels the whole scored corpus through one task
    at 100 TB (VERDICT r12 #2, the last such window in the tree)."""
    scored = dsir_scores(
        df,
        target_pred,
        text_col=text_col,
        id_col=id_col,
        buckets=buckets,
        ngram_max=ngram_max,
    )
    ranked = global_row_number(
        scored, [F.desc("weight_q"), F.asc(id_col)], out="_rk"
    )
    return (
        ranked
        .select(
            id_col,
            "n_tokens",
            "weight_q",
            F.expr("(weight_q * 1000) div n_tokens").alias("avg_weight_micro"),
            (F.col("_rk") <= top_n).alias("sampled"),
        )
    )


def dsir_scores(
    df: DataFrame,
    target_pred,
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    ngram_max: int = 1,
) -> DataFrame:
    """The scoring stage of ``dsir_weights``: (id_col, n_tokens, weight_q)
    per document — the exact integer log-ratio sums, un-ranked.  Exposed
    so the ranking primitive can be swapped (top-n via global_row_number
    here; a weight threshold from approx quantiles is the same contract)
    and so plan tests can pin the broadcast scoring join on the stage
    that owns it (global_row_number's localCheckpoint cuts the visible
    plan above the rank)."""
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    # hashed n-gram features per the paper (Xie et al. use unigrams AND
    # bigrams): ngram_max=2 appends "t_i t_{i+1}" features to the bag —
    # same bucket space, still map-only
    if ngram_max >= 2:
        n_ = F.size(toks)
        bigrams = F.when(
            n_ >= 2,
            F.zip_with(
                F.slice(toks, 1, n_ - 1),
                F.slice(toks, 2, n_ - 1),
                lambda a, b: F.concat(a, F.lit(" "), b),
            ),
        ).otherwise(F.array().cast("array<string>"))
        feats = F.concat(toks, bigrams)
    else:
        feats = toks
    tok = df.select(
        F.col(id_col),
        target_pred(df).alias("_is_tgt"),
        F.explode(feats).alias("_term"),
    ).withColumn(
        "_b",
        F.pmod(
            F.conv(F.substring(F.md5(F.col("_term")), 1, 8), 16, 10).cast("long"),
            F.lit(buckets),
        ),
    )
    # ONE counting pass: raw and target bucket counts as two aggregates of
    # the same map-combined groupBy, totals derived from the <=1024-row
    # count table — the corpus is scanned once for the model, once for
    # scoring (a naive raw/tgt/totals split costs four corpus passes)
    counts = tok.groupBy("_b").agg(
        F.count(F.lit(1)).alias("_cr"),
        F.sum(F.when(F.col("_is_tgt"), 1).otherwise(0)).alias("_ct"),
    )
    totals = counts.groupBy().agg(
        F.sum("_cr").alias("_nr"), F.sum("_ct").alias("_nt")
    )
    model = counts.crossJoin(F.broadcast(totals)).select(
        "_b",
        F.round(
            (
                F.log((F.col("_ct") + 1) / (F.col("_nt") + buckets))
                - F.log((F.col("_cr") + 1) / (F.col("_nr") + buckets))
            )
            * 1e9,
            0,
        )
        .cast("long")
        .alias("_lrq"),
    )
    return (
        tok.join(F.broadcast(model), "_b")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("_lrq").alias("weight_q"),
        )
    )


# ---------------------------------------------------------------------------
# distributed global ranking + balanced shard assignment
# ---------------------------------------------------------------------------


def global_row_number(
    df: DataFrame,
    order_by: list[Column],
    out: str = "rank",
    num_partitions: int | None = None,
) -> DataFrame:
    """Global 1-based row number in the total order given by `order_by`
    — WITHOUT the single-partition window that the naive
    ``row_number().over(Window.orderBy(...))`` degenerates to (Spark
    warns "No Partition Defined" and funnels 100 TB through one task).

    Mechanics: range-repartition + in-partition sort on the keys (the
    same machinery as a global ORDER BY), assign
    ``monotonically_increasing_id`` — whose layout is (partition_index
    << 33) + local_offset, i.e. it encodes exactly the two coordinates a
    global rank needs — then one O(#partitions) count job builds the
    per-partition offset table, broadcast back as a plan literal, and
    the final rank is MAP-ONLY: offset[pid] + local_offset + 1.  Range
    partitions are ordered by key, so offsets in partition order are the
    global prefix sums.

    The frame is pinned with an EAGER localCheckpoint, not persist():
    the count pass and the rank pass must see the identical layout (the
    id is deterministic only for a pinned partitioning), and a
    checkpoint cuts the lineage, so a lost block fails LOUDLY instead of
    silently recomputing ids under a fresh layout — while persist()
    under storage pressure does exactly that silent recompute, which is
    the one failure mode this operator cannot tolerate.  The blocks are
    released by the ContextCleaner when the returned frame goes
    unreachable (persist() here additionally leaked a corpus-sized cache
    entry per call until then, with no unpersist path — the returned
    frame still needs the data, so there is no safe place to drop it
    explicitly).  The caller must make the order total (include a unique
    id as tie-break) for the rank to be reproducible — the same contract
    a SQL row_number carries.

    Cost at 100 TB: one range shuffle (unavoidable — it IS the global
    sort), one O(P)-row count job, zero additional shuffles."""
    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    d = (
        df.repartitionByRange(p, *order_by)
        .sortWithinPartitions(*order_by)
        .withColumn("_mid", F.monotonically_increasing_id())
        .localCheckpoint(eager=True)
    )
    pid = F.shiftright("_mid", 33)
    counts = {
        r["_pid"]: r["count"]
        for r in d.groupBy(pid.alias("_pid")).count().collect()
    }
    offsets, acc = [], 0
    for i in range(p):
        offsets.append(acc)
        acc += counts.get(i, 0)
    offset_lit = F.array(*[F.lit(o) for o in offsets])
    rank = (
        F.element_at(offset_lit, pid.cast("int") + 1)
        + F.col("_mid").bitwiseAND(F.lit((1 << 33) - 1))
        + 1
    )
    return d.withColumn(out, rank.cast("long")).drop("_mid")


def assign_shards(
    df: DataFrame,
    n_shards: int = 8,
    size_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Deterministic size-balanced output sharding: rank documents by
    (size desc, id asc) and deal them round-robin — shard = (rank-1) mod
    n_shards — the classic LPT-flavored heuristic that keeps every
    output shard within one document of the same cardinality and tightly
    balanced on total tokens (big docs spread evenly because neighbors
    in the sorted order land on different shards).  This is the
    WRITE-side step of a training pipeline: balanced shards mean
    balanced data-loader workers and no straggler file.

    Returns one summary row per shard: (shard, n_docs, total_tokens,
    max_tokens, docs_md5) where docs_md5 fingerprints the exact
    membership (md5 of the comma-joined sorted ids — oracle-checkable).

    Plan: global_row_number's range sort + map-only rank, then one
    map-combined agg on the shard id (n_shards keys).  The membership
    fingerprint keeps the workload's output O(n_shards) rows however
    large the corpus."""
    ranked = global_row_number(
        df.select(F.col(id_col), F.col(size_col)),
        [F.col(size_col).desc(), F.col(id_col).asc()],
        out="_rank",
        num_partitions=max(2, n_shards),
    )
    shard = ((F.col("_rank") - 1) % n_shards).cast("int")
    return (
        ranked.select(shard.alias("shard"), id_col, size_col)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(size_col).cast("bigint").alias("total_tokens"),
            F.max(size_col).cast("bigint").alias("max_tokens"),
            F.md5(
                F.array_join(
                    F.transform(
                        F.array_sort(F.collect_list(F.col(id_col))),
                        lambda x: x.cast("string"),
                    ),
                    ",",
                )
            ).alias("docs_md5"),
        )
    )


def curriculum_order(
    df: DataFrame,
    size_col: str = "n_tokens",
    id_col: str = "doc_id",
    bucket_width: int = 50,
) -> DataFrame:
    """Length-based curriculum ordering: documents grouped into token-
    count buckets, buckets served SHORT→LONG, order within a bucket
    deterministically shuffled by content hash — the Shortformer recipe
    (Press et al. 2021: short-sequence warmup measurably speeds LM
    convergence) made reproducible: re-running the pipeline yields the
    byte-identical training order, which is what makes a loss curve
    comparable across data refreshes.

    Returns (doc_id, bucket, position) with position the GLOBAL 1-based
    training position — assigned by global_row_number, so there is no
    single-partition window: one range shuffle + map-side rank at any
    corpus size (the second consumer of that primitive after
    assign_shards; the md5 tie-break inside a bucket is the same
    stable-shuffle idiom as mixture_resample's content-hash rank)."""
    base = df.select(
        F.col(id_col),
        (F.col(size_col).cast("long") / F.lit(bucket_width)).cast("long").alias("bucket"),
        F.md5(F.col(id_col).cast("string")).alias("_h"),
    )
    ranked = global_row_number(
        base,
        [F.col("bucket").asc(), F.col("_h").asc(), F.col(id_col).asc()],
        out="position",
    )
    return ranked.select(id_col, "bucket", "position")


def global_running_sum(
    df: DataFrame,
    order_by: list[Column],
    value_col: str,
    out: str = "running_sum",
    rank_out: str | None = None,
    num_partitions: int | None = None,
) -> DataFrame:
    """Global prefix sum of ``value_col`` (and optionally the global rank)
    in the total order ``order_by`` — WITHOUT the single-partition window
    that ``sum().over(Window.orderBy(...))`` degenerates to.

    Mechanics (sibling of global_row_number, same layout-pinning rules):
    range-repartition + in-partition sort on the keys, pin the layout with
    an EAGER localCheckpoint, then ONE O(P)-row job collects each
    partition's (row count, value total); their prefix sums come back as a
    Python dict baked into a mapInPandas closure, and the final pass is
    MAP-ONLY: each partition streams its Arrow batches in sorted order,
    adding offset[pid] to a local cumulative sum.  Range partitions are
    ordered by key, so per-partition offsets in partition order ARE the
    global prefix sums.

    The cumulative sum is computed in the column's own dtype — integer
    inputs accumulate exactly (no FP reassociation), which is what lets a
    coverage/cdf consumer hash-match a SQL window oracle.

    The caller must make the order total (unique tie-break key), same
    contract as global_row_number.  Cost at 100 TB: one range shuffle
    (it IS the global sort), one O(P) job, one Arrow-batched map pass.
    """
    import pandas as pd  # noqa: F401  (mapInPandas contract)
    from pyspark.sql import types as T

    spark = df.sparkSession
    p = num_partitions or int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    d = (
        df.repartitionByRange(p, *order_by)
        .sortWithinPartitions(*order_by)
        .localCheckpoint(eager=True)
    )
    stats = {
        r["_pid"]: (r["_n"], r["_s"])
        for r in d.groupBy(F.spark_partition_id().alias("_pid"))
        .agg(F.count(F.lit(1)).alias("_n"), F.sum(value_col).alias("_s"))
        .collect()
    }
    count_off: dict[int, int] = {}
    sum_off: dict[int, float | int] = {}
    acc_n, acc_s = 0, 0
    for i in range(p):
        count_off[i], sum_off[i] = acc_n, acc_s
        n_i, s_i = stats.get(i, (0, 0))
        acc_n += n_i
        acc_s += s_i or 0

    value_field = d.schema[value_col]
    fields = list(d.schema.fields) + [T.StructField(out, value_field.dataType, True)]
    if rank_out:
        fields.append(T.StructField(rank_out, T.LongType(), False))
    out_schema = T.StructType(fields)

    def _cum(batches):
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        run_s = sum_off.get(pid, 0)
        run_n = count_off.get(pid, 0)
        for pdf in batches:
            c = pdf[value_col].cumsum() + run_s
            res = pdf.copy()
            res[out] = c
            if rank_out:
                res[rank_out] = range(run_n + 1, run_n + 1 + len(pdf))
                run_n += len(pdf)
            if len(pdf):
                run_s = c.iloc[-1]
            yield res

    return d.mapInPandas(_cum, out_schema)


def doremi_domain_weights(
    df: DataFrame,
    group_cols: list[str],
    loss_col: Column | str,
    rounds: int = 3,
    eta: float = 1.0,
    smoothing: float = 0.01,
) -> DataFrame:
    """DoReMi-style domain reweighting (Xie et al. 2023, arXiv:2305.10429
    Algorithm 1, the multiplicative-weights core): given a per-document
    loss proxy, compute per-domain EXCESS loss over the corpus mean and
    run `rounds` of exponentiated-gradient ascent on the domain weights —
    w_d <- w_d * exp(eta * excess_d), renormalized and mixed with the
    uniform distribution by `smoothing` each round (the paper's step 6;
    the mix is per-round, so the loop is genuinely iterative, not a
    closed form).  Domains whose documents are harder than average gain
    training share; smoothing keeps every domain sampled.

    In the full recipe the proxy losses come from a small reference/proxy
    model pair re-evaluated between rounds; this operator implements the
    data-side schedule for a FIXED loss table, which is the piece a data
    engine owns (the weights drop into mixture_resample's quota slot).

    Exactness (the pagerank discipline): per-domain mean = exact decimal
    sum / count (one double division); excess, each exp, and each
    renormalized weight land on the 9-decimal quantize grid; totals are
    exact decimal sums — bit-identical in any engine with md5-free
    arithmetic, so an unrolled SQL oracle can replay every round.

    Scale: ONE corpus-sized aggregate (map-combined) produces the domain
    frame; every round is then arithmetic on that O(domains) frame with
    1-row broadcast totals — no corpus re-scan, no collect at any domain
    count.  Output: one row per domain with n_docs, mean_loss, excess,
    and the final weight (×1e9 fixed-point and as double)."""
    loss = F.col(loss_col) if isinstance(loss_col, str) else loss_col
    ids = [F.col(c) for c in group_cols]
    dom = df.select(*ids, loss.cast("double").alias("_l")).groupBy(*group_cols).agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.round(F.col("_l"), 9).cast("decimal(28,9)")).alias("_lsum"),
    )
    glob = dom.agg(
        F.sum("_lsum").alias("_gsum"), F.sum("n_docs").alias("_gn"),
        F.count(F.lit(1)).alias("_k"),
    )
    d = (
        dom.crossJoin(F.broadcast(glob))
        .withColumn("mean_loss", F.round(F.col("_lsum").cast("double") / F.col("n_docs"), 9))
        .withColumn("_gmean", F.round(F.col("_gsum").cast("double") / F.col("_gn"), 9))
        .withColumn("excess", F.greatest(F.round(F.col("mean_loss") - F.col("_gmean"), 9), F.lit(0.0)))
        .withColumn("_w", F.round(F.lit(1.0) / F.col("_k"), 9).cast("decimal(20,9)"))
        # pin the O(domains) frame: each round references it TWICE (the Z
        # total and the update), and without a cut Spark replays the
        # corpus aggregate per reference — 17 parquet scans in the
        # 3-round executed plan before this checkpoint, 1 after (pinned
        # by test).  Same discipline as connected_components' loop.
        .localCheckpoint(eager=True)
    )
    for _ in range(int(rounds)):
        d = d.withColumn(
            "_u",
            F.round(
                F.col("_w").cast("double") * F.round(F.exp(F.lit(float(eta)) * F.col("excess")), 9),
                9,
            ).cast("decimal(20,9)"),
        )
        z = d.agg(F.sum("_u").alias("_z"))
        d = (
            d.crossJoin(F.broadcast(z))
            .withColumn(
                "_w",
                F.round(
                    F.lit(1.0 - float(smoothing))
                    * (F.col("_u").cast("double") / F.col("_z").cast("double"))
                    + F.lit(float(smoothing)) / F.col("_k"),
                    9,
                ).cast("decimal(20,9)"),
            )
            .drop("_u", "_z")
            # keep the per-round plan flat (rounds are user-controlled)
            .localCheckpoint(eager=True)
        )
    return d.select(
        *group_cols,
        "n_docs",
        "mean_loss",
        "excess",
        (F.col("_w") * 1_000_000_000).cast("long").alias("weight_q9"),
        F.col("_w").cast("double").alias("weight"),
    )
