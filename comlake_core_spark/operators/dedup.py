"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard,
embedding-cosine near-dup.

Design for 100 TB: every algorithm here is shuffle-bounded by *candidate
pairs*, never by all-pairs. Exact dedup is a hash aggregate; MinHash/SimHash
band/bucket keys turn O(n²) similarity into a groupBy on bucket keys plus a
verify join over bucket-local pairs. Signatures are computed with JVM
built-ins (xxhash64 over shingles) so the scan stays in whole-stage codegen;
only SimHash's 64-bit bit-vote uses a vectorized Pandas UDF.

The reference has no dedup of any kind (SURVEY.md §2.4); IPFS gives it
byte-identical *content* dedup for free (eval.tex:143-144) — the analogue
here is exact_dedup on the fingerprint, and the near-dup family goes beyond.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comlake_core_spark.operators.text import fingerprint, tokens
from comlake_core_spark.session import ensure_parallelism


# ---------------------------------------------------------------------------
# exact
# ---------------------------------------------------------------------------


def connected_components(
    pairs: DataFrame, id_a: str = "id_a", id_b: str = "id_b", max_iter: int = 15
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
    iteration count (on a cluster: checkpoint to reliable storage)."""
    edges = pairs.select(F.col(id_a).alias("src"), F.col(id_b).alias("dst"))
    sym = edges.unionByName(
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    labels = (
        sym.select(F.col("src").alias("node"))
        .distinct()
        .select("node", F.col("node").alias("component"))
        .localCheckpoint()
    )
    prev_sum = labels.agg(F.sum("component")).first()[0]
    for _ in range(max_iter):
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
    sym = sym.localCheckpoint(eager=False)
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


def exact_dedup(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Keep one representative (min id) per normalized-text fingerprint.

    Hash aggregate with partial (map-side) combine: the shuffle carries one
    row per distinct document, so 100 TB with 50% dups shuffles 50 TB of
    *keys+ids*, not documents."""
    return (
        df.select(fingerprint(text_col).alias("fp"), F.col(id_col))
        .groupBy("fp")
        .agg(F.min(id_col).alias("keep_id"), F.count(F.lit(1)).alias("n_copies"))
    )


def dedup_lines(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    words_per_line: int = 10,
) -> DataFrame:
    """Sub-document line-level dedup (C4 §2.2 / RefinedWeb): every line that
    occurs more than once ANYWHERE in the corpus is kept only at its first
    occurrence (smallest (doc_id, line_idx)) and removed everywhere else —
    the stage that strips boilerplate (nav bars, cookie banners, license
    headers) that document-level dedup can never see. The corpus here has
    no newlines, so a "line" is a fixed span of `words_per_line` whitespace
    tokens — the operator is span-identity dedup either way.

    Returns one row per document: (doc_id, n_lines, n_kept, kept_text_md5)
    where kept_text_md5 fingerprints the surviving text in original line
    order (md5 so a SQL oracle can recompute it bit-for-bit).

    Shape at 100 TB: map-only explode (fanout = #lines), ONE hash shuffle
    on the line value for the keep-first window, one keyed shuffle back to
    doc_id for reassembly. Never all-pairs. The window partitions by full
    line text — a viral line (e.g. an empty span) concentrates its
    occurrences on one task; if that bounds throughput, pre-aggregate
    min(struct(doc_id, line_idx)) per line (map-side combine collapses the
    viral key) and join the winner back instead of sorting it."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_lines = F.greatest(
        F.ceil(F.size(toks) / F.lit(float(words_per_line))), F.lit(1)
    ).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - F.lit(1)),
        lambda i: F.array_join(
            F.slice(toks, i * words_per_line + F.lit(1), words_per_line), " "
        ),
    )
    exploded = df.select(
        F.col(id_col), F.posexplode(lines).alias("line_idx", "line")
    )
    w = Window.partitionBy("line").orderBy(F.col(id_col).asc(), F.col("line_idx").asc())
    flagged = exploded.withColumn("keep", F.row_number().over(w) == F.lit(1))
    kept_struct = F.when(F.col("keep"), F.struct(F.col("line_idx"), F.col("line")))
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda s: s["line"]
                ),
                " ",
            )
        ).alias("kept_text_md5"),
    )


# ---------------------------------------------------------------------------
# shingling + MinHash + LSH
# ---------------------------------------------------------------------------


def shingles(text: Column | str, k: int = 3) -> Column:
    """Distinct word k-grams as strings. Built from sequence+transform —
    no UDF, no explode (the array stays row-local until the LSH explode)."""
    toks = tokens(text)
    n = F.size(toks)
    idx = F.sequence(F.lit(1), F.greatest(n - (k - 1), F.lit(1)))
    grams = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, k), " "))
    return F.array_distinct(grams)


def minhash_signature(shingle_col: Column, num_hashes: int = 32) -> Column:
    """num_hashes seeded xxhash64 min-hashes over the shingle set.

    xxhash64(shingle, seed_i) is a JVM intrinsic — the whole signature is
    one codegen'd expression per row.

    The per-hash lambda MUST be unary: F.transform passes the element
    index as a second argument when the lambda accepts two, so a
    ``lambda s, i=i`` closure silently receives the ARRAY POSITION as
    ``i`` and every "hash" collapses to one position-dependent function
    (found via the dedup_minhash_lsh brute-force oracle in round 2)."""

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
        .select("_id", minhash_signature(F.col("_sh"), num_hashes).alias("_sig"))
        .persist()
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


# ---------------------------------------------------------------------------
# n-gram Jaccard (exact, blocked)
# ---------------------------------------------------------------------------


def ngram_jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    threshold: float = 0.5,
    block_col: Column | None = None,
) -> DataFrame:
    """Exact Jaccard over word k-gram sets, blocked to avoid all-pairs.

    Default (block_col=None): MinHash-banded candidate generation + exact
    Jaccard verify — i.e. the skew-safe LSH plan. VERDICT r1 #8: the old
    default (first token of the document) is skew-prone at scale — the
    "The"-block of a 100 TB corpus is nearly the whole corpus and the
    per-block self-join is quadratic in it. MinHash band keys are
    uniformly distributed by construction, so no block concentrates.

    Pass an explicit ``block_col`` for cheap single-key blocking when the
    key is known to be selective (e.g. a URL host, a shard id, or prefix
    blocking on a corpus where that is safe)."""
    if block_col is None:
        return minhash_lsh_pairs(
            df, text_col=text_col, id_col=id_col, k_shingle=k_shingle, threshold=threshold
        )
    toks = tokens(text_col)
    block = block_col
    df = ensure_parallelism(df)
    docs = df.select(
        F.col(id_col).alias("_id"),
        shingles(text_col, k_shingle).alias("_sh"),
        block.alias("_blk"),
    )
    a, b = docs.alias("a"), docs.alias("b")
    return (
        a.join(b, (F.col("a._blk") == F.col("b._blk")) & (F.col("a._id") < F.col("b._id")))
        .withColumn(
            "jaccard",
            F.size(F.array_intersect("a._sh", "b._sh")).cast("double")
            / F.size(F.array_union("a._sh", "b._sh")),
        )
        .filter(F.col("jaccard") >= threshold)
        .select(F.col("a._id").alias("id_a"), F.col("b._id").alias("id_b"), "jaccard")
    )


def decontaminate_ngrams(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
) -> DataFrame:
    """Train/eval decontamination by word n-gram overlap: return the train
    documents sharing at least one lowercased word n-gram with any eval
    document, with the count of distinct overlapping n-grams (the standard
    LLM-pipeline leakage check — GPT-3 App. C / PaLM-style 'n-gram
    collision with the benchmark').

    Scale shape: the eval n-gram set is DISTINCT'd and broadcast (eval
    benchmarks are small — MBs against a 100 TB train corpus), so the
    train side is one map-only explode + broadcast semi probe; the only
    shuffle is the final per-doc distinct-count, over matched grams only
    (rare by construction). Documents shorter than n tokens produce no
    grams and can't be flagged.
    """
    lowered = lambda c: F.lower(F.trim(F.col(c)))  # noqa: E731

    def grams(df: DataFrame) -> DataFrame:
        toks = tokens(lowered(text_col))
        sz = F.size(toks)
        idx = F.sequence(F.lit(1), sz - (n - 1))
        g = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
        return df.filter(sz >= n).select(
            F.col(id_col), F.explode(F.array_distinct(g)).alias("_g")
        )

    eval_grams = grams(eval_df).select("_g").distinct()
    return (
        grams(train)
        .join(F.broadcast(eval_grams), "_g")
        .groupBy(id_col)
        # grams are per-doc distinct already (array_distinct before the
        # explode), so a plain count is the distinct count — no extra
        # distinct aggregation state
        .agg(F.count(F.lit(1)).alias("n_contaminated_grams"))
    )


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------


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
    sigs = simhash(df, text_col, id_col).persist()
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


# ---------------------------------------------------------------------------
# embedding cosine near-dup
# ---------------------------------------------------------------------------


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


def winnow_dedup_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k: int = 20,
    w: int = 16,
    min_shared: int = 2,
    max_df: int = 100,
    hasher: str = "xxhash64",
) -> DataFrame:
    """Substring-level near-dup pairs via winnowing fingerprints
    (operators/text.winnow_fingerprints): documents sharing >= min_shared
    selected k-gram hashes. Complements MinHash/SimHash (whole-document
    similarity) by catching copied *passages* inside otherwise-different
    documents — the winnowing guarantee makes any shared normalized run of
    w+k-1 characters produce a shared fingerprint.

    Scale design: the sketch itself is map-only; the candidate join inverts
    it into (fingerprint, doc) postings and self-joins on the fingerprint —
    the same plan shape as the MinHash band join, shuffling only 16-byte
    postings rows. `max_df` drops fingerprints appearing in more than that
    many documents (boilerplate n-grams), the standard posting-list cap that
    bounds the worst bucket to max_df^2 candidate pairs and keeps the
    self-join skew-free at 100 TB."""
    from comlake_core_spark.operators.text import winnow_fingerprints

    # persist: the postings feed the df-cap aggregate AND both sides of the
    # fingerprint self-join — without it the O(n·w) winnowing sketch is
    # re-evaluated three times (same discipline as the MinHash/SimHash
    # signature frames above; at 100 TB write the postings as a table).
    postings = (
        ensure_parallelism(df)
        .select(
            F.col(id_col).alias("_id"),
            F.explode(winnow_fingerprints(text_col, k=k, w=w, hasher=hasher)).alias("_fp"),
        )
        .persist()
    )
    # fingerprints are distinct within a doc, so count(*) = document frequency
    rare = (
        postings.groupBy("_fp")
        .agg(F.count(F.lit(1)).alias("_df"))
        .filter(F.col("_df") <= max_df)
        .select("_fp")
    )
    pruned = postings.join(rare, "_fp")
    b = pruned.select(F.col("_fp"), F.col("_id").alias("_id_b"))
    return (
        pruned.join(b, "_fp")
        .filter(F.col("_id") < F.col("_id_b"))
        .groupBy("_id", "_id_b")
        .agg(F.count(F.lit(1)).alias("shared_fps"))
        .filter(F.col("shared_fps") >= min_shared)
        .select(F.col("_id").alias("id_a"), F.col("_id_b").alias("id_b"), "shared_fps")
    )


def jaccard_topk_similar(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    shingle_k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_df: int | None = 100,
    broadcast_queries: bool | str = True,
) -> DataFrame:
    """Exact Jaccard top-k similar documents per query — the set-similarity
    twin of similarity.brute_force_topk (retrieval, not thresholded dedup:
    top-k has no similarity floor, so LSH banding cannot bound recall).

    Returns only POSITIVE-similarity neighbours (a pair sharing zero
    shingles has similarity 0 — retrieval never surfaces it), which is
    what makes the exact answer computable by an INVERTED INDEX instead
    of an all-pairs scan: explode corpus shingles, equi-join on the
    shingle against the (broadcast) query postings, and count shared
    shingles per (query, doc) — |intersection| arrives as a map-combined
    aggregate over only the pairs that actually co-occur, never the |Q|×N
    cross product (a first crossJoin+array_intersect draft measured 29 s
    at sf0.1; this plan is ~20×). |union| = |Q-grams| + |doc-grams| −
    |intersection| from two tiny per-doc count frames. WindowGroupLimit
    trims to k per query before the final shuffle.

    ``max_df`` (VERDICT r2 "What's wrong" #1) drops shingles whose corpus
    document frequency exceeds the cap — the same posting-list cap as
    winnow_dedup_pairs.  Without it a stop-shingle ("of the and") present
    in most documents regenerates nearly |Q|×N intermediate rows through
    the posting join before the count aggregates them away; with it the
    worst shingle contributes ≤ |Q|·max_df rows.  The similarity becomes
    Jaccard over the df-filtered shingle universe — an exact, deterministic
    quantity (sizes are recomputed on the filtered sets, so |union| stays
    consistent), and the oracle applies the identical prune.  Pass
    ``max_df=None`` for unfiltered exact Jaccard.

    ``broadcast_queries`` picks the posting-join strategy (VERDICT r3 #5):
    True broadcasts the query postings (right for the common "few queries
    against a big corpus" shape — zero shuffle of the corpus postings);
    False shuffle-joins the two posting lists on the shingle key (right
    when |Q| is itself corpus-scale, e.g. all-pairs retrieval, where a
    broadcast would not fit the executors); "auto" defers to Spark AQE's
    runtime size statistics by hinting neither side.  All three produce
    identical results — only the exchange strategy moves.  Default True:
    the retrieval workload shape, and the plan the bench pins."""
    c = ensure_parallelism(corpus).select(
        F.col(id_col).alias("nbr_id"), shingles(text_col, shingle_k).alias("_cg")
    )
    q = queries.select(F.col(id_col).alias("query_id"), shingles(text_col, shingle_k).alias("_qg"))
    if max_df is not None:
        # Stop set = shingles with corpus df > max_df.  It is tiny by
        # construction (only boilerplate shingles exceed the cap), so it is
        # folded into a ONE-ROW array and broadcast-crossJoined onto both
        # sides; the prune is then a map-side array_except, and the
        # filtered set SIZE comes for free in the same projection — no
        # per-doc size aggregation, no size join.  Shingles are distinct
        # within a doc, so count(*) over postings = document frequency.
        #
        # The shingled corpus feeds TWO branches (the stop-set aggregate
        # and the posting explode).  r2-r4 shared it with persist(), which
        # (a) made cold 2× slower than warm and (b) was silently defeated
        # by any clearCache() — the r4 bench timed a double-scan plan the
        # engine never runs (VERDICT r4 "What's wrong" #3).  A lazy
        # localCheckpoint materializes the shingle arrays to executor-
        # local disk at the FIRST action (the stop-set broadcast build)
        # and the posting branch replays from there: one corpus scan, one
        # regex-shingling pass, cold == warm.  At 100 TB the checkpoint
        # write is the same partition-local volume a posting shuffle would
        # spill, and — unlike cache — it is not subject to LRU eviction
        # mid-query.  (Windowed in-line df + ReusedExchange was tried and
        # measured WORSE: AQE does not reuse the exchange across the
        # broadcast-subquery boundary, so it re-scanned anyway and paid
        # two full posting sorts on top — 5.8 s vs 2.8 s at sf0.1.)
        c = c.localCheckpoint(eager=False)
        stop_arr = (
            c.select(F.explode("_cg").alias("_g"))
            .groupBy("_g")
            .agg(F.count(F.lit(1)).alias("_df"))
            .filter(F.col("_df") > max_df)
            .agg(F.collect_list("_g").alias("_stop"))
        )
        c = c.crossJoin(F.broadcast(stop_arr)).select(
            "nbr_id", F.array_except("_cg", "_stop").alias("_cg")
        )
        q = q.crossJoin(F.broadcast(stop_arr)).select(
            "query_id", F.array_except("_qg", "_stop").alias("_qg")
        )
    # carry the (filtered) set size through the explode so |union| needs no
    # separate size frames: the corpus size rides the postings rows and
    # survives the intersection groupBy as a constant-per-doc min()
    cpost = c.select("nbr_id", F.size("_cg").alias("_cn"), F.explode("_cg").alias("_g"))
    qpost = q.select("query_id", F.size("_qg").alias("_qn"), F.explode("_qg").alias("_g"))
    if broadcast_queries is True:
        qpost = F.broadcast(qpost)
    elif broadcast_queries is False:
        # pin a shuffle join: merge-able exchanges on the shingle key, no
        # driver-side collect of the query postings
        qpost = qpost.hint("shuffle_hash")
    inter = (
        cpost.join(qpost, "_g")
        .filter(F.col("nbr_id") != F.col("query_id"))
        .groupBy("query_id", "nbr_id")
        .agg(
            F.count(F.lit(1)).alias("_inter"),
            F.min("_cn").alias("_cn"),
            F.min("_qn").alias("_qn"),
        )
    )
    scored = inter.select(
        "query_id",
        "nbr_id",
        (
            F.col("_inter").cast("double")
            / (F.col("_qn") + F.col("_cn") - F.col("_inter"))
        ).alias("jaccard"),
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("jaccard"), F.asc("nbr_id"))
    return (
        scored.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= k)
        .select("query_id", "nbr_id", "jaccard", "rn")
    )


def canonical_docs(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    length_col: str = "n_chars",
) -> DataFrame:
    """Cluster near-dup pairs into components and pick ONE survivor per
    cluster — the keep/drop decision a dedup pipeline actually ships.
    Keep-rule: longest document wins (ties → smallest id), an exact
    integer argmax so the choice is engine-agreement deterministic.

    Plan: component labels from min-label propagation (O(diameter)
    rounds); the survivor pick is one max_by per component. Components
    are dup near-cliques so the groupBy key count ≈ cluster count —
    no skew beyond the largest dup clique, which the upstream pair
    stage already bounds (max_df / max_bucket caps)."""
    comp = connected_components(pairs, max_iter=15)
    member = comp.join(
        df.select(F.col(id_col).alias("node"), F.col(length_col).alias("_len")), "node"
    )
    return (
        member.groupBy("component")
        .agg(
            F.count(F.lit(1)).alias("n_members"),
            F.max_by("node", F.struct(F.col("_len"), -F.col("node"))).alias("keep_doc_id"),
            F.max("_len").alias("keep_len"),
        )
        .select("component", "keep_doc_id", F.col("keep_len").cast("long").alias("keep_len"), "n_members")
    )


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
        "_id", "_sh", minhash_signature(F.col("_sh"), num_hashes).alias("_sig")
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
    new_b = _banded(new_df).persist()

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
    candidates = vs_old.unionByName(vs_new).distinct()

    # exact-Jaccard verify on candidates only (same discipline as the
    # batch operator: re-shingle only docs that appear in a candidate)
    corpus = ensure_parallelism(old_df.unionByName(new_df)).select(
        F.col(id_col).alias("_id"), F.col(text_col).alias("_txt")
    )
    cand_ids = candidates.select(
        F.explode(F.array(F.col("new_id"), F.col("match_id"))).alias("_id")
    ).distinct()
    sh = corpus.join(cand_ids, "_id", "left_semi").select(
        "_id", shingles("_txt", k_shingle).alias("_sh")
    )
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
    from comlake_core_spark.operators.similarity import cosine, dot, seeded_centroids

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
    ).localCheckpoint(eager=False)
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


def common_span_coverage(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    span: int = 10,
    min_docs: int = 2,
    key: str = "text",
) -> DataFrame:
    """ExactSubstr-style duplicated-span accounting (Lee et al. 2022,
    "Deduplicating Training Data Makes Language Models Better"): a span
    of `span` consecutive tokens that appears in >= `min_docs` DISTINCT
    documents is duplicated text; per document, report how many token
    positions are covered by at least one duplicated span. This is the
    sub-document signal that motivates span CUTTING rather than document
    dropping — a news article quoting a press release is 20% duplicated,
    not a duplicate.

    Returns one row per document: (doc_id, n_tokens, n_dup_spans,
    covered_tokens, mostly_dup = covered*2 >= n_tokens).

    Exactness: coverage is the union length of fixed-length integer
    intervals — computed as sum(min(span, pos - lag(pos))) over
    positions sorted per doc, all integer arithmetic.

    Plan: map-side sliding-window explode (transform over a sequence —
    no UDF), ONE hash shuffle on the span text to count distinct owner
    docs (map-combined), one join back to positions on the span key, a
    per-doc window + aggregate sharing one doc_id exchange. Shuffle
    volume is O(total token positions) — the suffix-array original is
    O(n log n) single-machine; this banded form is the standard
    distributed approximation (span granularity = the window stride).
    At 100 TB pass key='xxhash64': the span text is hashed to a 64-bit
    fingerprint BEFORE the exchange, so the shuffle carries 8-byte keys
    instead of ~60-byte strings (same candidate semantics up to hash
    collisions, ~n²/2⁶⁴ expected false dup positions — negligible
    against the span threshold). key='text' keeps raw span text so the
    DuckDB oracle can replicate the computation exactly; both modes are
    pinned result-identical on the test corpora."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n = F.size(toks)
    starts = F.when(
        n >= span, F.sequence(F.lit(0), n - span)
    ).otherwise(F.array().cast("array<int>"))
    gram_text = lambda i: F.array_join(F.slice(toks, i + 1, span), " ")  # noqa: E731
    if key == "text":
        gram_key = gram_text
    elif key == "xxhash64":
        gram_key = lambda i: F.xxhash64(gram_text(i))  # noqa: E731
    else:
        raise ValueError(f"unknown span key mode {key!r}")
    grams = F.transform(
        starts, lambda i: F.struct(
            i.cast("long").alias("pos"),
            gram_key(i).alias("gram"),
        )
    )
    base = df.select(F.col(id_col), n.cast("long").alias("n_tokens"), grams.alias("_g"))
    # cut: positions feed both the distinct-owner count and the join back
    # — without it the corpus-wide sliding-window explode runs twice
    # (the jaccard persist-dependence lesson, VERDICT r4)
    pos = (
        base.select(F.col(id_col), F.explode("_g").alias("_e"))
        .select(F.col(id_col), F.col("_e.pos").alias("pos"), F.col("_e.gram").alias("gram"))
        .localCheckpoint(eager=False)
    )
    dup = (
        pos.groupBy("gram")
        .agg(F.count_distinct(F.col(id_col)).alias("_nd"))
        .filter(F.col("_nd") >= min_docs)
        .select("gram")
    )
    hits = pos.join(dup, "gram").select(id_col, "pos")
    w = Window.partitionBy(id_col).orderBy("pos")
    cov = hits.withColumn(
        "_inc",
        F.when(F.lag("pos").over(w).isNull(), F.lit(span)).otherwise(
            F.least(F.lit(span), F.col("pos") - F.lag("pos").over(w))
        ),
    )
    agg = cov.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_dup_spans"),
        F.sum("_inc").alias("covered_tokens"),
    )
    return (
        base.select(id_col, "n_tokens")
        .join(agg, id_col, "left")
        .select(
            id_col,
            "n_tokens",
            F.coalesce(F.col("n_dup_spans"), F.lit(0)).cast("long").alias("n_dup_spans"),
            F.coalesce(F.col("covered_tokens"), F.lit(0)).cast("long").alias("covered_tokens"),
            (F.coalesce(F.col("covered_tokens"), F.lit(0)) * 2 >= F.col("n_tokens")).alias("mostly_dup"),
        )
    )


# ---------------------------------------------------------------------------
# source-level boilerplate stripping (CCNet / C4-style)
# ---------------------------------------------------------------------------


def strip_boilerplate(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    source_col: str = "source",
    words_per_line: int = 2,
    min_docs: int = 5,
) -> DataFrame:
    """Per-source boilerplate removal: a line occurring in >= `min_docs`
    DISTINCT documents of the same source is boilerplate (nav bars,
    cookie banners, license headers — content that repeats across a
    site's pages) and is stripped from EVERY document of that source.
    Contrast with :func:`dedup_lines`, which keeps a duplicated line's
    first occurrence corpus-wide; boilerplate keeps none, and the df
    threshold is scoped per source so one site's banner never suppresses
    another site's legitimate prose. This is the CCNet/C4 cleanup stage
    that runs BEFORE document-level dedup.

    The corpus here has no newlines, so a "line" is a fixed span of
    `words_per_line` whitespace tokens (same convention as dedup_lines).

    Returns one row per document: (doc_id, n_lines, n_kept,
    kept_text_md5) — md5 of the surviving text in original line order so
    a SQL oracle can recompute it bit-for-bit.

    Shape at 100 TB: map-only explode (fanout = #lines), then the
    per-line df comes from ONE windowed pass over (source, line) — the
    count-distinct-via-window idiom, max(dense_rank ordered by doc) over
    the same partition keys, so both windows share a single
    sort-exchange and a line repeated WITHIN one doc still votes once —
    and one keyed shuffle back to doc_id for reassembly.  Never
    all-pairs, and the corpus is exploded exactly once (the first draft
    aggregated and joined the exploded frame against itself, which
    re-scanned and re-exploded every document).  Caveat shared with
    dedup_lines: a viral line concentrates its occurrences on one task;
    if that bounds throughput, fall back to the agg + join-back shape
    over a PERSISTED exploded frame."""
    toks = F.split(F.trim(F.col(text_col)), r"\s+")
    n_lines = F.greatest(
        F.ceil(F.size(toks) / F.lit(float(words_per_line))), F.lit(1)
    ).cast("int")
    lines = F.transform(
        F.sequence(F.lit(0), n_lines - F.lit(1)),
        lambda i: F.array_join(
            F.slice(toks, i * words_per_line + F.lit(1), words_per_line), " "
        ),
    )
    exploded = ensure_parallelism(df).select(
        F.col(id_col), F.col(source_col), F.posexplode(lines).alias("line_idx", "line")
    )
    w_ord = Window.partitionBy(source_col, "line").orderBy(F.col(id_col).asc())
    w_all = Window.partitionBy(source_col, "line")
    flagged = (
        exploded.withColumn("_dr", F.dense_rank().over(w_ord))
        .withColumn("_df", F.max("_dr").over(w_all))
        .withColumn("keep", F.col("_df") < min_docs)
    )
    kept_struct = F.when(F.col("keep"), F.struct(F.col("line_idx"), F.col("line")))
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_lines"),
        F.sum(F.when(F.col("keep"), 1).otherwise(0)).cast("bigint").alias("n_kept"),
        F.md5(
            F.array_join(
                F.transform(
                    F.array_sort(F.collect_list(kept_struct)), lambda s: s["line"]
                ),
                " ",
            )
        ).alias("kept_text_md5"),
    )


# ---------------------------------------------------------------------------
# Bloom-filter decontamination (the O(m)-bits broadcast alternative to
# shipping the eval n-gram set)
# ---------------------------------------------------------------------------


def bloom_decontaminate(
    train: DataFrame,
    eval_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 5,
    m_bits: int = 65536,
    k_hashes: int = 3,
) -> DataFrame:
    """Decontamination via a Bloom filter over the eval set's word
    n-grams, with the filter's answers audited against the exact
    broadcast-join check: per train document, how many of its distinct
    n-grams HIT the bloom filter, how many are TRUE eval grams, and the
    difference (the filter's false positives — deterministic, since the
    bloom is a pure function of the eval grams and md5).

    Why a bloom when :func:`decontaminate_ngrams` already broadcasts the
    gram set: the broadcast is O(|eval grams| x bytes-per-gram); a giant
    eval suite (every benchmark ever published, 10^8+ grams) stops
    fitting, while the bloom is O(m) BITS regardless — `m_bits` bounds
    both the broadcast and the driver memory by construction, because
    only DISTINCT bit positions (<= m) are ever collected. The false-
    positive columns are the accuracy audit you run at small scale to
    size m before trusting the filter at 100 TB (k=3, m/n≈13 here →
    FP≈1.8% per gram).

    Hash family: position_j(g) = int(md5(j ':' g)[:12], 16) mod m — md5
    so a SQL oracle reproduces every bit exactly ([[oracle-discipline]]:
    md5 is the one hash with a bit-identical DuckDB twin).

    Returns (doc_id, n_grams, n_bloom_hits, n_true_hits, n_false_pos)
    for every train doc with >= 1 gram."""
    lowered = lambda c: F.lower(F.trim(F.col(c)))  # noqa: E731

    def grams(df: DataFrame) -> DataFrame:
        toks = tokens(lowered(text_col))
        sz = F.size(toks)
        idx = F.sequence(F.lit(1), sz - (n - 1))
        g = F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " "))
        return df.filter(sz >= n).select(
            F.col(id_col), F.explode(F.array_distinct(g)).alias("_g")
        )

    def positions(gram: Column) -> Column:
        return F.array(
            *[
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"{j}:"), gram)), 1, 12), 16, 10
                ).cast("long")
                % m_bits
                for j in range(k_hashes)
            ]
        )

    eval_grams = grams(eval_df).select("_g").distinct()
    # DISTINCT positions only: the collect is bounded by m_bits rows no
    # matter how large the eval suite is — that bound is the operator's
    # entire point (documented O(m) driver pass, not O(|eval|)).
    set_bits = sorted(
        r[0]
        for r in eval_grams.select(F.explode(positions(F.col("_g"))).alias("p"))
        .distinct()
        .collect()
    )
    words = [0] * ((m_bits + 63) // 64)
    for p in set_bits:
        words[p // 64] |= 1 << (p % 64)
    # two's-complement into signed longs for the plan literal
    bitmap = F.array(*[F.lit(w - (1 << 64) if w >= (1 << 63) else w) for w in words])

    tg = grams(train)
    pos = positions(F.col("_g"))
    bit_set = lambda p: (  # noqa: E731
        F.bit_get(
            F.element_at(bitmap, (p / F.lit(64)).cast("int") + 1), (p % 64).cast("int")
        )
        == 1
    )
    hit = F.forall(pos, bit_set)
    flagged = tg.join(
        F.broadcast(eval_grams.select(F.col("_g"), F.lit(True).alias("_true"))),
        "_g",
        "left",
    ).select(
        id_col,
        hit.cast("int").alias("_bloom"),
        F.coalesce(F.col("_true"), F.lit(False)).cast("int").alias("_exact"),
    )
    return flagged.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_grams"),
        F.sum("_bloom").cast("bigint").alias("n_bloom_hits"),
        F.sum("_exact").cast("bigint").alias("n_true_hits"),
        (F.sum("_bloom") - F.sum("_exact")).cast("bigint").alias("n_false_pos"),
    )


# ---------------------------------------------------------------------------
# LSH candidates -> exact edit-distance verify
# ---------------------------------------------------------------------------


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


# ---------------------------------------------------------------------------
# Engine-portable MinHash (md5-seeded) — the auditable twin of
# minhash_signature.  xxhash64 is the hot-path hash (one JVM intrinsic per
# shingle) but exists only in Spark; these md5 signatures are bit-identical
# in Spark, DuckDB, and PostgreSQL (split_assignment_portable's argument),
# which is what lets the LSH *infrastructure itself* — bucket skew, the
# estimator's calibration — be value-hash-verified by a SQL oracle rather
# than trusted.  Hex-string MIN is numeric MIN ([0-9a-f] lexicographic
# order), so no hex→int conversion is needed anywhere.
# ---------------------------------------------------------------------------


def _portable_hash(i: int):
    """Seeded md5 over a shingle, as a unary-lambda factory (a default-arg
    closure would receive the ARRAY POSITION as the seed — the
    minhash_signature bug class)."""
    return lambda g: F.md5(F.concat_ws("|", F.lit(str(i)), g))


def minhash_signature_portable(shingle_col: Column, num_hashes: int = 12) -> Column:
    """num_hashes seeded md5 min-hashes (32-hex strings) over the shingle
    set — recomputable bit-for-bit by any engine with md5."""
    return F.array(
        *[F.array_min(F.transform(shingle_col, _portable_hash(i))) for i in range(num_hashes)]
    )


def lsh_banded_portable(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """(_id, _band, _bkey) rows of the portable-signature LSH banding —
    the bucket layout both diagnostics below aggregate over."""
    rows = num_hashes // bands
    base = ensure_parallelism(df).select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"))
    docs = base.select("_id", shingles("_txt", k_shingle).alias("_sh")).select(
        "_id", minhash_signature_portable(F.col("_sh"), num_hashes).alias("_sig")
    )
    return docs.select(
        "_id",
        F.posexplode(
            F.array(
                *[
                    F.md5(F.array_join(F.slice("_sig", b * rows + 1, rows), ","))
                    for b in range(bands)
                ]
            )
        ).alias("_band", "_bkey"),
    )


def lsh_bucket_skew(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
) -> DataFrame:
    """Per-band LSH bucket-skew audit: the numbers to read BEFORE running
    the candidate self-join at 100 TB.  Candidate pairs per band are
    Σ C(bucket,2) — a single degenerate bucket (empty docs, a boilerplate
    shingle set, a hash pathology) turns the join quadratic, and this
    audit is how that is caught as a report instead of as a dead executor.
    Emits per band: bucket count, max bucket, total candidate pairs, and
    the share of pairs contributed by the largest bucket.

    Cost: the signature scan plus ONE (band,bucket)-keyed count and a
    band-keyed rollup — strictly cheaper than the join it audits."""
    buckets = (
        lsh_banded_portable(df, text_col, id_col, k_shingle, num_hashes, bands)
        .groupBy("_band", "_bkey")
        .agg(F.count(F.lit(1)).alias("_n"))
    )
    pairs = F.col("_n") * (F.col("_n") - 1) / 2
    return (
        buckets.groupBy("_band")
        .agg(
            F.count(F.lit(1)).alias("n_buckets"),
            F.max("_n").alias("max_bucket"),
            F.sum(pairs).cast("bigint").alias("candidate_pairs"),
            F.max(pairs).cast("bigint").alias("top_bucket_pairs"),
        )
        .select(
            F.col("_band").cast("bigint").alias("band"),
            "n_buckets",
            "max_bucket",
            "candidate_pairs",
            F.round(
                F.col("top_bucket_pairs") / F.nullif(F.col("candidate_pairs").cast("double"), F.lit(0.0)),
                9,
            ).alias("top_bucket_pair_share"),
        )
    )


def minhash_calibration(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    num_hashes: int = 12,
    bands: int = 4,
    quantize: int = 9,
) -> DataFrame:
    """MinHash estimator calibration over the LSH candidate pairs:
    signature agreement (matching components / num_hashes — the unbiased
    Jaccard estimator) binned into deciles against EXACT shingle Jaccard.
    Per bin: pair count, mean estimate, mean true Jaccard, mean absolute
    error.  This is the measured answer to "how many hashes do I need?"
    — the same measure-don't-guess discipline as ann_recall_at_k, applied
    to the dedup family's own estimator.

    Scale shape: candidates come from the banded bucket join (never
    all-pairs); signatures and shingle sets are joined back only for
    candidate ids (a vanishing corpus fraction); the bin rollup is
    map-combined on ≤10 keys with exact decimal sums."""
    base = ensure_parallelism(df).select(F.col(id_col).alias("_id"), F.col(text_col).alias("_txt"))
    docs = base.select("_id", shingles("_txt", k_shingle).alias("_sh")).select(
        "_id", "_sh", minhash_signature_portable(F.col("_sh"), num_hashes).alias("_sig")
    )
    banded = lsh_banded_portable(df, text_col, id_col, k_shingle, num_hashes, bands)
    cand = (
        banded.alias("l")
        .join(banded.alias("r"), ["_band", "_bkey"])
        .filter(F.col("l._id") < F.col("r._id"))
        .select(F.col("l._id").alias("_ida"), F.col("r._id").alias("_idb"))
        .distinct()
    )
    a = docs.select(F.col("_id").alias("_ida"), F.col("_sh").alias("_sha"), F.col("_sig").alias("_siga"))
    b = docs.select(F.col("_id").alias("_idb"), F.col("_sh").alias("_shb"), F.col("_sig").alias("_sigb"))
    matches = F.size(
        F.filter(F.zip_with("_siga", "_sigb", lambda x, y: x == y), lambda t: t)
    )
    est = matches.cast("double") / num_hashes
    true_j = F.size(F.array_intersect("_sha", "_shb")).cast("double") / F.size(
        F.array_union("_sha", "_shb")
    )
    scored = (
        cand.join(a, "_ida")
        .join(b, "_idb")
        .select(
            F.least(F.floor(est * 10).cast("long"), F.lit(9)).alias("est_bin"),
            F.round(est, quantize).alias("_e"),
            F.round(true_j, quantize).alias("_t"),
            F.round(F.abs(est - true_j), quantize).alias("_ae"),
        )
    )
    dsum = lambda c: F.sum(F.col(c).cast(f"decimal(20,{quantize})")).cast("double")  # noqa: E731
    return scored.groupBy("est_bin").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        (dsum("_e") / F.count(F.lit(1))).alias("avg_estimate"),
        (dsum("_t") / F.count(F.lit(1))).alias("avg_true_jaccard"),
        (dsum("_ae") / F.count(F.lit(1))).alias("mae"),
    )


def containment_candidates(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """Candidate-pair generation for ``containment_pairs_prefix`` —
    exposed separately so tests can measure candidate VOLUME (the thing
    the ``max_df`` stop-cap bounds) independent of verification.
    Returns distinct (_src, _dst) candidate pairs."""
    _, pref, posts = _containment_stages(df, threshold, text_col, id_col, k_shingle, max_df)
    return _containment_cand(pref, posts)


def _containment_cand(pref: DataFrame, posts: DataFrame) -> DataFrame:
    """Prefix-vs-postings candidate equi-join, shared by the operator and
    the volume-measuring helper so a future cap/fix lands in both."""
    return (
        pref.join(posts.select(F.col("_id").alias("_dst"), "_g"), "_g")
        .filter(F.col("_src") != F.col("_dst"))
        .select("_src", "_dst")
        .distinct()
    )


def _containment_stages(df, threshold, text_col, id_col, k_shingle, max_df):
    """(doc shingle sets, prefix rows, postings) under the optional df
    stop-cap.  With ``max_df`` set, grams with corpus document frequency
    above it are removed from the SHINGLE UNIVERSE itself — postings
    feeding prefixes, AND the verification sets — so the operator stays
    EXACT for the capped similarity (containment over non-boilerplate
    grams), the same redefinition ``sparse_cosine_topk``'s max_df
    applies to its vector space.  Required-overlap arithmetic uses an
    epsilon-guarded ceil: ceil(t·gc − 1e−9) is the smallest integer ≥
    t·gc even when the double product rounds a hair above an exactly-
    integral value, which plain ceil would overestimate by 1 —
    shortening the prefix and breaking the recall guarantee at exact-
    threshold pairs (ADVICE r8).

    Plan shape (the r9 first cut persisted the EXPLODED gram frame and
    rebuilt verify arrays with a corpus-wide collect_list — 5× slower at
    sf0.1; this shape keeps the r8 skeleton):
    - the persisted frame is the DOC-LEVEL arrays (small cache);
    - hot grams leave the verify sets by array_except against a per-doc
      hot-gram list built from hot OCCURRENCES only (tiny when the cap
      binds normally; the all-boilerplate worst case pays proportional
      to what it removes);
    - the candidate join probes prefixes against RAW postings: prefixes
      never contain capped-out grams, so hot postings simply never
      match — no postings-side filter materializes."""
    t = float(threshold)
    sh = (
        ensure_parallelism(df)
        .select(F.col(id_col).alias("_id"), shingles(F.col(text_col), k_shingle).alias("_sh"))
        .persist()  # doc-level arrays feed postings (×3) and verify sets
    )
    posts = sh.select("_id", F.explode("_sh").alias("_g"))
    dfreq_all = posts.groupBy("_g").agg(F.count(F.lit(1)).alias("_df"))
    if max_df is not None:
        # two consumers under the cap (kept side feeds prefixes, hot side
        # feeds the verify-set filter) — persist the O(distinct grams)
        # aggregate so the corpus-wide count shuffle runs once, not twice
        dfreq_all = dfreq_all.persist()
    dfreq = dfreq_all.filter(F.col("_df") <= int(max_df)) if max_df is not None else dfreq_all
    wid = Window.partitionBy("_id")
    w = wid.orderBy(F.asc("_df"), F.asc("_g"))
    # inner join doubles as the universe filter: capped-out grams never
    # enter the ordering, the per-doc count, or the prefix
    pref = (
        posts.join(dfreq, "_g")
        .withColumn("_rn", F.row_number().over(w))
        .withColumn("_gce", F.count(F.lit(1)).over(wid))
        .withColumn(
            "_req", F.ceil(F.lit(t) * F.col("_gce") - F.lit(1e-9)).cast("long")
        )
        .filter(F.col("_rn") <= F.col("_gce") - F.col("_req") + F.lit(1))
        .select(F.col("_id").alias("_src"), "_g")
    )
    if max_df is not None:
        hot = dfreq_all.filter(F.col("_df") > int(max_df)).select("_g")
        doc_hot = (
            posts.join(hot, "_g")
            .groupBy("_id")
            .agg(F.collect_list("_g").alias("_hot"))
        )
        empty = F.array().cast("array<string>")
        sets = (
            sh.join(doc_hot, "_id", "left")
            .select(
                "_id",
                F.array_except("_sh", F.coalesce("_hot", empty)).alias("_sh"),
            )
            .withColumn("_gc", F.size("_sh"))
            .filter(F.col("_gc") > 0)
        )
    else:
        sets = sh.withColumn("_gc", F.size("_sh"))
    return sets, pref, posts


def containment_pairs_prefix(
    df: DataFrame,
    threshold: float = 0.8,
    text_col: str = "text",
    id_col: str = "doc_id",
    k_shingle: int = 3,
    max_df: int | None = None,
) -> DataFrame:
    """One-sided set-CONTAINMENT join: all ordered pairs (src, dst) with
    C(src→dst) = |S_src ∩ S_dst| / |S_src| >= threshold — the near-
    SUPERSET detector Jaccard-threshold dedup structurally misses (a
    short doc embedded verbatim in a long one has high containment but
    arbitrarily low Jaccard, so MinHash-LSH banding at the Jaccard
    threshold is not guaranteed to surface it).  This is the quote/
    template/wrapper case in pretraining corpora.

    Algorithm: AllPairs/PPJoin-style PREFIX FILTERING (Bayardo et al.
    WWW'07; Xiao et al. WWW'08), the exact-recall counterpart to LSH:

      1. one corpus pass computes shingle document frequencies;
      2. each doc orders its shingles by (df asc, shingle asc) — the
         canonical global order that puts the RAREST shingles first —
         and keeps only its PREFIX of size |S| - ceil(t·|S|) + 1: by
         pigeonhole, any dst reaching overlap ceil(t·|S_src|) must share
         at least one prefix shingle, so joining src PREFIXES against
         the FULL posting list loses nothing (100% recall, exact);
      3. candidates are verified with the exact intersection from the
         stored shingle arrays.

    Scale: no all-pairs anywhere — candidate volume is Σ_gram
    |prefix postings| × |postings|, and frequency-ascending prefix
    ordering makes prefix postings the rare grams.  ``max_df`` is the
    100 TB lever for the df tail's worst case (VERDICT r8 #3): grams
    above the cap leave the shingle UNIVERSE (postings, prefixes, and
    verify sets alike — see _containment_stages), so a boilerplate gram
    shared by the whole corpus can no longer meet a corpus-sized posting
    list; the operator stays exact for the capped similarity, and the
    oracle mirrors the same universe filter.  Two aggregate shuffles
    (df count, per-doc prefix window) + the candidate equi-join;
    verification joins are id-keyed.  Same shingle machinery as the LSH
    family (operators/dedup.shingles), so the SQL oracle twin matches
    bit-for-bit."""
    t = float(threshold)
    sets, pref, posts = _containment_stages(df, threshold, text_col, id_col, k_shingle, max_df)
    cand = _containment_cand(pref, posts)
    a = sets.select(F.col("_id").alias("_src"), F.col("_sh").alias("_sha"), F.col("_gc").alias("_gca"))
    b = sets.select(F.col("_id").alias("_dst"), F.col("_sh").alias("_shb"))
    return (
        cand.join(a, "_src")
        .join(b, "_dst")
        .withColumn(
            "containment",
            F.size(F.array_intersect("_sha", "_shb")).cast("double") / F.col("_gca"),
        )
        .filter(F.col("containment") >= t)
        .select(
            F.col("_src").alias("src_id"),
            F.col("_dst").alias("dst_id"),
            "containment",
        )
    )
