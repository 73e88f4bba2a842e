"""deduplication, LSH, decontamination, and dedup-graph workloads

Split from the monolithic workloads.py (VERDICT r5 "Next round" #6).
Module organization CANNOT move the driver window: registration order is
re-pinned to the original monolith order by _REGISTRATION_ORDER in
workloads/__init__.py, and tests/test_driver_window.py pins the first-50.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comlake_core_spark.qast.compiler import compile_predicate, default_resolver
from comlake_core_spark.session import materialize, tables

from ._base import _t, dec, workload



# ---------------------------------------------------------------------------
# Deduplication (operators/dedup.py)
# ---------------------------------------------------------------------------


@workload(
    "dedup_exact",
    r"""
    SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
           MIN(doc_id) AS keep_id,
           COUNT(*) AS n_copies
    FROM documents
    GROUP BY 1
    """,
    "dedup",
)
def dedup_exact_wl(spark: SparkSession, sf_dir: str) -> DataFrame:
    from comlake_core_spark.operators.dedup.exact import exact_dedup

    (docs,) = _t(spark, sf_dir, "documents")
    return exact_dedup(docs)




@workload(
    "dedup_ngram_jaccard",
    r"""
    WITH docs AS (
      SELECT doc_id AS id,
             string_split_regex(trim(text), '\s+') AS toks
      FROM documents
    ), sh AS (
      SELECT id,
             lower(toks[1]) AS blk,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' ')
             )) AS grams
      FROM docs
    )
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
    FROM sh a JOIN sh b ON a.blk = b.blk AND a.id < b.id
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.05
    """,
    "dedup",
    "jaccard",
)
def dedup_ngram_jaccard(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact blocked Jaccard with an EXPLICIT first-token block key so the
    SQL oracle can mirror the blocking deterministically. The operator's
    default blocking is now MinHash-banded (skew-safe; VERDICT r1 #8) and
    is oracle-checked by dedup_minhash_lsh's brute-force oracle."""
    from comlake_core_spark.operators.dedup.jaccard import ngram_jaccard_pairs
    from comlake_core_spark.operators.text.core import tokens

    (docs,) = _t(spark, sf_dir, "documents")
    first_tok = F.lower(tokens("text").getItem(0))
    return ngram_jaccard_pairs(docs, threshold=0.05, block_col=first_tok)




@workload(
    "dedup_clusters",
    r"""
    WITH RECURSIVE sh AS (
      SELECT doc_id AS id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' ')
             )) AS grams
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
            FROM documents)
    ), sized AS (SELECT id, grams, len(grams) AS gc FROM sh),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM sized a JOIN sized b
        ON a.id < b.id
       AND a.gc >= CAST(ceil(b.gc * 0.8) AS BIGINT)
       AND b.gc >= CAST(ceil(a.gc * 0.8) AS BIGINT)
      WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
               / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    walk(id, comp) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT e.b, w.comp FROM walk w JOIN edges e ON e.a = w.id
      WHERE w.comp < e.b
    )
    SELECT comp AS component, COUNT(*) AS n_docs
    FROM (SELECT id, MIN(comp) AS comp FROM walk GROUP BY id)
    GROUP BY comp
    """,
    "dedup",
    "components",
)
def dedup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup CLUSTERS, not just pairs: MinHash-LSH candidate edges
    grouped by min-label-propagation connected components (transitive
    closure — A~B, B~C collapse to one survivor even without an (A, C)
    edge), returning (component, n_docs) per cluster. Promoted to a full
    oracle (VERDICT r1 pattern): the brute-force exact-Jaccard edge set at
    0.8 equals the LSH edge set (see dedup_minhash_lsh), and DuckDB
    computes the same min-label closure with a recursive CTE — labels
    propagate along edges only downhill (comp < target), which reaches
    every node because a component's minimum is smaller than every member.
    Convergence/closure also pytest-pinned in test_operators.py."""
    from comlake_core_spark.operators.dedup.graph import connected_components
    from comlake_core_spark.operators.dedup.minhash import minhash_lsh_pairs

    from comlake_core_spark.session import ensure_parallelism

    (docs,) = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(ensure_parallelism(docs), threshold=0.8, num_hashes=64, bands=16)
    comp = connected_components(pairs)
    return comp.groupBy("component").agg(F.count(F.lit(1)).alias("n_docs"))




@workload(
    "dedup_minhash_lsh",
    r"""
    WITH sh AS (
      SELECT doc_id AS id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' ')
             )) AS grams
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
            FROM documents)
    ), sized AS (SELECT id, grams, len(grams) AS gc FROM sh)
    SELECT a.id AS id_a, b.id AS id_b,
           CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
    FROM sized a JOIN sized b
      ON a.id < b.id
     AND a.gc >= CAST(ceil(b.gc * 0.8) AS BIGINT)
     AND b.gc >= CAST(ceil(a.gc * 0.8) AS BIGINT)
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
             / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8
    """,
    "dedup",
    "minhash",
)
def dedup_minhash_lsh(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash+LSH near-dup pairs, promoted to a full hash-checked oracle
    (VERDICT r1 #7): the oracle brute-forces exact Jaccard over ALL pairs
    (with an exactness-preserving size-ratio prefilter: jaccard >= t
    implies min|grams| >= t * max|grams|), so equality holds iff LSH
    banding recalls every true pair. At threshold 0.8 the corpus's
    near-dup pairs all sit at jaccard >= 0.9; 16 bands x 4 rows detect
    with P(miss) = (1-s^4)^16 ~ 4e-8 per pair — and xxhash64 is
    deterministic, so the sf0.01 outcome is fixed and verified (8 bands
    empirically missed exactly one 0.9-pair there), not probabilistic."""
    from comlake_core_spark.operators.dedup.minhash import minhash_lsh_pairs

    (docs,) = _t(spark, sf_dir, "documents")
    return minhash_lsh_pairs(docs, threshold=0.8, num_hashes=64, bands=16)




@workload(
    "dedup_simhash",
    r"""
    WITH toks AS (
      SELECT doc_id, unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
      FROM documents
    ), toks2 AS (
      SELECT doc_id, tok FROM toks WHERE tok <> ''
    ), vocab AS (
      SELECT tok,
             list_reduce(
               list_prepend(14695981039346656037::UBIGINT,
                 list_transform(range(length(tok)), i -> unicode(substr(tok, i+1, 1))::UBIGINT)),
               (h, b) -> CAST(CAST(xor(h, b) AS HUGEINT) * 1099511628211
                              % 18446744073709551616 AS UBIGINT)) AS h
      FROM (SELECT DISTINCT tok FROM toks2)
    ), votes AS (
      SELECT doc_id, bit,
             SUM(CASE WHEN (h >> bit) & 1 = 1 THEN 1 ELSE -1 END) AS tally
      FROM toks2 JOIN vocab USING (tok) CROSS JOIN range(64) bits(bit)
      GROUP BY doc_id, bit
    ), sig AS (
      SELECT doc_id,
             COALESCE(SUM(CASE WHEN tally > 0
                                THEN CAST(1::UBIGINT << bit AS HUGEINT) END), 0) AS usig
      FROM votes GROUP BY doc_id
    ), chunks AS (
      SELECT doc_id, usig, band,
             CAST((usig >> (band * 16)) % 65536 AS BIGINT) AS chunk
      FROM sig CROSS JOIN range(4) bands(band)
    )
    SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b,
           CAST(bit_count(xor(CAST(a.usig AS UBIGINT), CAST(b.usig AS UBIGINT))) AS INT)
             AS hamming
    FROM chunks a JOIN chunks b
      ON a.band = b.band AND a.chunk = b.chunk AND a.doc_id < b.doc_id
    WHERE bit_count(xor(CAST(a.usig AS UBIGINT), CAST(b.usig AS UBIGINT))) <= 10
    """,
    "dedup",
    "simhash",
)
def dedup_simhash(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Pandas-UDF signature). Oracle-able because
    the signature is EXACT integer arithmetic end to end: the oracle
    recomputes the per-token 64-bit FNV-1a in SQL (list_reduce over code
    units — the corpus is ASCII so unicode() == the UTF-8 byte), takes the
    same ±1 bit votes with multiplicity, packs sign bits, and mirrors the
    16-bit pigeonhole band join + Hamming verify."""
    from comlake_core_spark.operators.dedup.simhash import simhash_dedup_pairs

    (docs,) = _t(spark, sf_dir, "documents")
    return simhash_dedup_pairs(docs, max_hamming=10)




@workload(
    "dedup_embedding",
    """
    WITH aug AS (
      SELECT vec_id, embedding FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, embedding FROM embeddings WHERE vec_id % 10 = 0
    )
    SELECT a.vec_id AS id_a, b.vec_id AS id_b,
           ROUND(list_cosine_similarity(a.embedding, b.embedding), 6) AS cosine
    FROM aug a JOIN aug b ON a.vec_id < b.vec_id
    WHERE list_cosine_similarity(a.embedding, b.embedding) >= 0.9
    """,
    "dedup",
    "embedding",
)
def dedup_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding cosine near-dup pairs via hyperplane LSH, with planted
    duplicates and a full brute-force oracle (VERDICT r1 #6/#7: the old
    rows-only check returned 0 rows at sf0.01 — the synthetic embeddings
    have max pairwise cosine ~0.51). Every 10th vector is re-inserted
    under id+1e6; identical vectors share every LSH bucket by
    construction, so recall on the planted pairs is exactly 1, and no
    natural pair reaches 0.9 — the oracle's all-pairs scan verifies both
    the found pairs AND the absence of false positives. Cosine is
    rounded to 6 digits on both engines (float64 einsum vs DuckDB's
    float32 list_cosine_similarity agree to ~1e-7 on unit-identical
    pairs)."""
    from comlake_core_spark.operators.dedup.embedding import embedding_dedup_pairs

    (emb,) = _t(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", "embedding")
    planted = base.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    pairs = embedding_dedup_pairs(base.unionByName(planted), threshold=0.9)
    return pairs.select("id_a", "id_b", F.round("cosine", 6).alias("cosine"))




@workload(
    "dedup_winnow",
    r"""
    WITH fps AS (
      SELECT doc_id, unnest(sel) AS g
      FROM (
        SELECT doc_id,
               CASE WHEN len(grams) >= 16 THEN
                 list_distinct(list_transform(range(len(grams) - 15),
                                              j -> list_min(grams[j+1:j+16])))
               WHEN len(grams) > 0 THEN [list_min(grams)]
               ELSE [] END AS sel
        FROM (
          SELECT doc_id,
                 CASE WHEN length(nm) >= 20 THEN
                   list_transform(range(length(nm) - 19),
                     i -> ('0x' || substr(md5(substr(nm, i+1, 20)), 1, 15))::BIGINT)
                 ELSE [] END AS grams
          FROM (SELECT doc_id,
                       regexp_replace(lower(text), '[^a-z0-9]+', '', 'g') AS nm
                FROM documents)
        )
      )
    ), rare AS (
      SELECT g FROM fps GROUP BY g HAVING COUNT(*) <= 100
    ), pruned AS (
      SELECT doc_id, g FROM fps JOIN rare USING (g)
    )
    SELECT a.doc_id AS id_a, b.doc_id AS id_b, COUNT(*) AS shared_fps
    FROM pruned a JOIN pruned b ON a.g = b.g AND a.doc_id < b.doc_id
    GROUP BY a.doc_id, b.doc_id
    HAVING COUNT(*) >= 4
    """,
    "dedup",
    "text",
)
def dedup_winnow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Substring-level near-dup pairs via winnowing fingerprints
    (Schleimer et al., SIGMOD 2003). Runs in hasher='md5' mode — identical
    selection logic to the xxhash64 scale path, but the k-gram hash (first
    15 hex chars of md5 as a base-16 long) has an exact DuckDB twin, so
    the whole sketch → df-capped postings → self-join pipeline is under
    the value-hash oracle. The xxhash64 path's coverage guarantee and
    planted-passage detection are pytest-verified in tests/test_operators.py."""
    from comlake_core_spark.operators.dedup.spans import winnow_dedup_pairs

    (docs,) = _t(spark, sf_dir, "documents")
    return winnow_dedup_pairs(docs, min_shared=4, hasher="md5")




# ---------------------------------------------------------------------------
# Training-pipeline hygiene: decontamination, repetition filtering, SCD2
# change history, time-weighted averages (all north-star extensions;
# reference has no aggregate/window constructs at all, SURVEY.md §2.4)
# ---------------------------------------------------------------------------


@workload(
    "decontaminate_train_eval",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents
    ),
    grams AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS g
      FROM toks, UNNEST(range(1, len(t) - 3)) AS r(i)
      WHERE len(t) >= 5
    )
    SELECT grams.doc_id, CAST(COUNT(*) AS BIGINT) AS n_contaminated_grams
    FROM grams
    JOIN (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0) e USING (g)
    WHERE grams.doc_id % 50 <> 0
    GROUP BY grams.doc_id
    """,
    "dedup",
    "decontamination",
    "text",
)
def decontaminate_train_eval(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Benchmark decontamination: flag training documents sharing any
    lowercased word 5-gram with the held-out eval slice (docs with
    doc_id % 50 == 0 stand in for the benchmark). The eval n-gram set is
    distinct'd and BROADCAST — at 100 TB the train side is a map-only
    explode + broadcast semi probe; the only shuffle is the per-doc count
    over matched grams (rare by construction)."""
    from comlake_core_spark.operators.dedup.jaccard import decontaminate_ngrams
    from comlake_core_spark.session import ensure_parallelism

    (docs,) = _t(spark, sf_dir, "documents")
    docs = ensure_parallelism(docs)
    eval_df = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    return decontaminate_ngrams(train, eval_df, n=5)




@workload(
    "dedup_canonical_docs",
    r"""
    WITH RECURSIVE sh AS (
      SELECT doc_id AS id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' ')
             )) AS grams
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
            FROM documents)
    ), sized AS (SELECT id, grams, len(grams) AS gc FROM sh),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM sized a JOIN sized b
        ON a.id < b.id
       AND a.gc >= CAST(ceil(b.gc * 0.8) AS BIGINT)
       AND b.gc >= CAST(ceil(a.gc * 0.8) AS BIGINT)
      WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
               / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8
    ),
    edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    walk(id, comp) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT e.b, w.comp FROM walk w JOIN edges e ON e.a = w.id
      WHERE w.comp < e.b
    ),
    members AS (SELECT id, MIN(comp) AS comp FROM walk GROUP BY id)
    SELECT component, keep_doc_id, keep_len, n_members FROM (
      SELECT m.comp AS component, d.doc_id AS keep_doc_id,
             CAST(d.n_chars AS BIGINT) AS keep_len,
             COUNT(*) OVER (PARTITION BY m.comp) AS n_members,
             row_number() OVER (PARTITION BY m.comp
                                ORDER BY d.n_chars DESC, d.doc_id ASC) AS rn
      FROM members m JOIN documents d ON m.id = d.doc_id
    ) WHERE rn = 1
    """,
    "dedup",
    "components",
    "canonical",
)
def dedup_canonical_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The keep/drop decision a dedup pipeline actually ships: MinHash-LSH
    pair edges → connected components → ONE survivor per cluster by the
    exact integer keep-rule (longest doc, ties to smallest id). The
    oracle brute-forces the same transitive closure with a recursive CTE
    and picks the survivor with a window — end-to-end verification of
    edges, clustering, and survivor choice in one gate."""
    from comlake_core_spark.operators.dedup.exact import canonical_docs
    from comlake_core_spark.operators.dedup.minhash import minhash_lsh_pairs

    (docs,) = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.8, num_hashes=64, bands=16)
    return canonical_docs(docs, pairs)




@workload(
    "dedup_incremental_batch",
    r"""
    WITH sh AS (
      SELECT doc_id AS id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' '))) AS grams
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
            FROM documents)
    ), sized AS (SELECT id, grams, len(grams) AS gc FROM sh)
    SELECT n.id AS new_id, o.id AS match_id,
           CAST(len(list_intersect(n.grams, o.grams)) AS DOUBLE)
             / len(list_distinct(list_concat(n.grams, o.grams))) AS jaccard
    FROM sized n JOIN sized o
      ON n.id % 2 = 1
     AND (o.id % 2 = 0 OR n.id < o.id)
     AND n.gc >= CAST(ceil(o.gc * 0.8) AS BIGINT)
     AND o.gc >= CAST(ceil(n.gc * 0.8) AS BIGINT)
    WHERE CAST(len(list_intersect(n.grams, o.grams)) AS DOUBLE)
             / len(list_distinct(list_concat(n.grams, o.grams))) >= 0.8
    """,
    "dedup",
    "minhash",
    "incremental",
)
def dedup_incremental_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental dedup — the production shape: a NEW batch (odd doc_ids)
    lands against an EXISTING corpus index (even doc_ids); only new×old
    and new×new pairs are computed, never old×old. The oracle brute-forces
    exact Jaccard over exactly that pair space (with the exactness-
    preserving size-ratio prefilter), so equality again proves 100% LSH
    recall on the incremental path — same banding/recall argument as
    dedup_minhash_lsh (64 hashes × 16 bands at threshold 0.8)."""
    from comlake_core_spark.operators.dedup.minhash import minhash_lsh_pairs_incremental

    (docs,) = _t(spark, sf_dir, "documents")
    old = docs.filter(F.col("doc_id") % 2 == 0)
    new = docs.filter(F.col("doc_id") % 2 == 1)
    return minhash_lsh_pairs_incremental(old, new, threshold=0.8, num_hashes=64, bands=16)




@workload(
    "dedup_graph_triangles",
    r"""
    WITH sh AS (
      SELECT doc_id AS id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' '))) AS grams
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
            FROM documents)
    ), sized AS (SELECT id, grams, len(grams) AS gc FROM sh),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM sized a JOIN sized b
        ON a.id < b.id
       AND a.gc >= CAST(ceil(b.gc * 0.8) AS BIGINT)
       AND b.gc >= CAST(ceil(a.gc * 0.8) AS BIGINT)
      WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
               / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8
    ),
    tri AS (
      SELECT COUNT(*) AS n_triangles
      FROM pairs e1
      JOIN pairs e2 ON e2.id_a = e1.id_a AND e2.id_b > e1.id_b
      JOIN pairs e3 ON e3.id_a = e1.id_b AND e3.id_b = e2.id_b
    ),
    deg AS (
      SELECT node, COUNT(*) AS d FROM (
        SELECT id_a AS node FROM pairs UNION ALL SELECT id_b FROM pairs
      ) GROUP BY node
    ),
    wedge AS (SELECT CAST(SUM(d * (d - 1) / 2) AS BIGINT) AS n_wedges FROM deg)
    SELECT CAST(n_triangles AS BIGINT) AS n_triangles,
           n_wedges,
           CASE WHEN n_wedges = 0 THEN 0.0
                ELSE CAST(3 * n_triangles AS DOUBLE) / n_wedges END AS clustering_coeff
    FROM tri CROSS JOIN wedge
    """,
    "dedup",
    "graph",
)
def dedup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Graph analytics over the near-dup edge set: triangle count and the
    global clustering coefficient (3·triangles / wedges) — the density
    diagnostic that tells a dedup pipeline whether its LSH edges form
    tight cliques (safe to collapse via connected components) or sparse
    chains (transitive collapse would over-merge). Triangle counting is
    the canonical ordered two-join (e1=(a,b) ⋈ e2=(a,c>b) ⋈ e3=(b,c)):
    every triangle counted exactly once, no cartesian. At 100 TB the
    edge set is the LSH output (≪ corpus²) and the joins shuffle on node
    ids; degree skew is bounded by the max_bucket/max_df caps upstream."""
    from comlake_core_spark.operators.dedup.minhash import minhash_lsh_pairs

    (docs,) = _t(spark, sf_dir, "documents")
    pairs = (
        minhash_lsh_pairs(docs, threshold=0.8, num_hashes=64, bands=16)
        .select("id_a", "id_b")
        # localCheckpoint, not persist (r14, guide §3.3): the edge set is
        # referenced five times (e1/e2/e3 + both degree legs) and persist
        # leaves the full LSH cascade in the logical plan per reference —
        # Catalyst analyzed a 112-Exchange / 73-scan tree
        # (plans/r14/dedup_graph_triangles_before.txt).  The checkpoint
        # truncates lineage at the edges; same rows, one materialization.
        .transform(materialize)
    )
    e1 = pairs.select(F.col("id_a").alias("a"), F.col("id_b").alias("b"))
    e2 = pairs.select(F.col("id_a").alias("a2"), F.col("id_b").alias("c"))
    e3 = pairs.select(F.col("id_a").alias("b3"), F.col("id_b").alias("c3"))
    tri = (
        e1.join(e2, (F.col("a") == F.col("a2")) & (F.col("c") > F.col("b")))
        .join(e3, (F.col("b3") == F.col("b")) & (F.col("c3") == F.col("c")))
        .agg(F.count(F.lit(1)).alias("n_triangles"))
    )
    deg = (
        pairs.select(F.col("id_a").alias("node"))
        .unionByName(pairs.select(F.col("id_b").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    wedge = deg.agg(
        F.sum((F.col("d") * (F.col("d") - 1) / 2).cast("long")).cast("long").alias("n_wedges")
    )
    return tri.crossJoin(wedge).select(
        F.col("n_triangles").cast("long").alias("n_triangles"),
        "n_wedges",
        F.when(F.col("n_wedges") == 0, F.lit(0.0))
        .otherwise((3 * F.col("n_triangles")).cast("double") / F.col("n_wedges"))
        .alias("clustering_coeff"),
    )




@workload(
    "semantic_dedup_embeddings",
    r"""
    WITH RECURSIVE aug AS (
      SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings
      UNION ALL
      SELECT vec_id + 1000000, CAST(embedding AS DOUBLE[])
      FROM embeddings WHERE vec_id % 10 = 0
    ), cent AS (
      SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS cid, cv
      FROM (SELECT * FROM aug ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 16)
    ), centu AS (
      SELECT cid, list_transform(cv, x -> x / sqrt(list_dot_product(cv, cv))) AS cvec
      FROM cent
    ), cassign AS (
      SELECT vec_id, cv, cid AS bucket FROM (
        SELECT vec_id, cv, cid, row_number() OVER (
          PARTITION BY vec_id
          ORDER BY list_dot_product(cv, cvec) DESC, cid ASC) AS rn
        FROM aug CROSS JOIN centu
      ) WHERE rn = 1
    ), pairs AS (
      SELECT a.vec_id AS id_a, b.vec_id AS id_b
      FROM cassign a JOIN cassign b
        ON a.bucket = b.bucket AND a.vec_id < b.vec_id
      WHERE list_dot_product(a.cv, b.cv)
              / (sqrt(list_dot_product(a.cv, a.cv)) * sqrt(list_dot_product(b.cv, b.cv)))
            >= 0.92
    ), edges AS (
      SELECT id_a AS a, id_b AS b FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ), walk(id, comp) AS (
      SELECT DISTINCT a, a FROM edges
      UNION
      SELECT e.b, w.comp FROM walk w JOIN edges e ON e.a = w.id
      WHERE w.comp < e.b
    ), comps AS (SELECT id, MIN(comp) AS comp FROM walk GROUP BY id),
    labeled AS (
      SELECT c.bucket, c.vec_id AS id, COALESCE(p.comp, c.vec_id) AS rep
      FROM cassign c LEFT JOIN comps p ON c.vec_id = p.id
    )
    SELECT CAST(bucket AS INT) AS bucket, COUNT(*) AS n_vectors,
           COUNT(DISTINCT rep) AS n_survivors,
           CAST(SUM(CASE WHEN id = rep THEN id END) AS BIGINT) AS survivor_id_sum
    FROM labeled GROUP BY bucket
    """,
    "dedup",
    "embedding",
    "semantic",
)
def semantic_dedup_embeddings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al., arXiv:2303.09540) under the full oracle
    gate: cluster embeddings by md5-seeded centroids (exact SQL twin, the
    ann_ivf_topk pattern), prune cosine>=0.92 near-dups WITHIN clusters
    via connected components, keep the min-id survivor per component.
    Planted duplicates (every 10th vector re-inserted at id+1e6, the
    dedup_embedding pattern) guarantee real prunes: an identical pair
    shares its centroid assignment by construction, so recall on planted
    pairs is exactly 1, and no natural pair reaches 0.92 (max ~0.51) —
    the oracle's per-cluster all-pairs scan plus recursive-CTE closure
    verifies found prunes AND absence of false positives. See
    operators/dedup.semantic_dedup for the 100 TB shape (cluster id =
    partition key; max_cluster caps the worst bucket)."""
    from comlake_core_spark.operators.dedup.embedding import semantic_dedup

    (emb,) = _t(spark, sf_dir, "embeddings")
    base = emb.select("vec_id", "embedding")
    planted = base.filter(F.col("vec_id") % 10 == 0).select(
        (F.col("vec_id") + 1000000).alias("vec_id"), "embedding"
    )
    return semantic_dedup(base.unionByName(planted), n_clusters=16, threshold=0.92)




@workload(
    "url_normalize_dedup",
    r"""
    WITH urls AS (
      SELECT doc_id,
             'https://WWW.' || source || '.Example.COM/p/' || CAST(doc_id % 7 AS VARCHAR)
               || '?utm_source=feed&ref=' || source || '&id=' || CAST(doc_id % 3 AS VARCHAR) AS url
      FROM documents
    ), norm AS (
      SELECT doc_id,
             regexp_replace(
               regexp_replace(
                 regexp_replace(lower(url), '://www\.', '://'),
                 '(utm_[a-z]+|ref)=[^&]*&?', '', 'g'),
               '[?&]+$', '') AS norm_url
      FROM urls
    )
    SELECT norm_url, MIN(doc_id) AS canonical_doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_dups
    FROM norm GROUP BY norm_url
    """,
    "dedup",
    "text",
)
def url_normalize_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """URL-level exact dedup, the FIRST dedup stage of every web-corpus
    pipeline (CCNet/RefinedWeb dedup by canonical URL before any content
    pass): normalize (lowercase, strip www., drop utm_*/ref tracking
    params, trim dangling separators), then keep min(doc_id) per
    canonical URL.  The documents table has no URL column, so a
    deterministic URL is synthesized from (source, doc_id) IDENTICALLY
    in both engines — the operator under test is the normalize + groupBy
    dedup, which is one map-combined exchange on the normalized key (at
    100 TB: ~#distinct-urls shuffle rows, never #docs)."""
    from comlake_core_spark.operators.text.core import normalize_url

    (docs,) = _t(spark, sf_dir, "documents")
    url = F.concat(
        F.lit("https://WWW."), F.col("source"), F.lit(".Example.COM/p/"),
        (F.col("doc_id") % 7).cast("string"),
        F.lit("?utm_source=feed&ref="), F.col("source"),
        F.lit("&id="), (F.col("doc_id") % 3).cast("string"),
    )
    return (
        docs.select("doc_id", normalize_url(url).alias("norm_url"))
        .groupBy("norm_url")
        .agg(
            F.min("doc_id").alias("canonical_doc_id"),
            F.count(F.lit(1)).alias("n_dups"),
        )
    )




@workload(
    "dedup_lines_corpus",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ), lines AS (
      SELECT doc_id, CAST(u.i AS INT) AS line_idx,
             array_to_string(t[CAST(u.i*10+1 AS BIGINT):CAST(u.i*10+10 AS BIGINT)], ' ') AS line
      FROM toks,
           LATERAL (SELECT unnest(range(greatest(CAST(ceil(len(t)/10.0) AS BIGINT), 1))) AS i) u
    ), flagged AS (
      SELECT doc_id, line_idx, line,
             (row_number() OVER (PARTITION BY line ORDER BY doc_id, line_idx)) = 1 AS keep
      FROM lines
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           md5(coalesce(string_agg(CASE WHEN keep THEN line END, ' ' ORDER BY line_idx), '')) AS kept_text_md5
    FROM flagged GROUP BY doc_id
    """,
    "dedup",
    "text",
)
def dedup_lines_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style line-level dedup (C4 §2.2 / RefinedWeb): duplicate lines
    are removed corpus-wide, keeping only the first occurrence by
    (doc_id, line_idx) — the sub-document stage that strips boilerplate
    the seven document-level dedup workloads cannot see.  Output is one
    row per document with total/kept line counts and an md5 fingerprint
    of the surviving text in original order (md5 per the oracle-bridge
    discipline: bit-identical in both engines).  Plan: map-only explode,
    one hash shuffle on the line value (keep-first window), one keyed
    shuffle back to doc_id — shuffle volume O(#lines), never all-pairs."""
    from comlake_core_spark.operators.dedup.exact import dedup_lines

    (docs,) = _t(spark, sf_dir, "documents")
    return dedup_lines(docs, words_per_line=10)




@workload(
    "pagerank_dedup_graph",
    r"""
    WITH sh AS (
      SELECT doc_id AS id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' '))) AS grams
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
            FROM documents)
    ), sized AS (SELECT id, grams, len(grams) AS gc FROM sh),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM sized a JOIN sized b
        ON a.id < b.id
       AND a.gc >= CAST(ceil(b.gc * 0.8) AS BIGINT)
       AND b.gc >= CAST(ceil(a.gc * 0.8) AS BIGINT)
      WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
               / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8
    ),
    sym AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    deg AS (SELECT src AS node, COUNT(*) AS d FROM sym GROUP BY src),
    it0 AS (SELECT node, d, CAST(1000000000000 AS BIGINT) AS r FROM deg),
    it1 AS (
      SELECT deg.node, deg.d,
             CAST(150000000000 + (85 * agg.c) // 100 AS BIGINT) AS r
      FROM deg JOIN (
        SELECT sym.dst AS node, SUM(p.r // p.d) AS c
        FROM sym JOIN it0 p ON sym.src = p.node GROUP BY sym.dst
      ) agg ON agg.node = deg.node
    ),
    it2 AS (
      SELECT deg.node, deg.d,
             CAST(150000000000 + (85 * agg.c) // 100 AS BIGINT) AS r
      FROM deg JOIN (
        SELECT sym.dst AS node, SUM(p.r // p.d) AS c
        FROM sym JOIN it1 p ON sym.src = p.node GROUP BY sym.dst
      ) agg ON agg.node = deg.node
    ),
    it3 AS (
      SELECT deg.node, deg.d,
             CAST(150000000000 + (85 * agg.c) // 100 AS BIGINT) AS r
      FROM deg JOIN (
        SELECT sym.dst AS node, SUM(p.r // p.d) AS c
        FROM sym JOIN it2 p ON sym.src = p.node GROUP BY sym.dst
      ) agg ON agg.node = deg.node
    )
    SELECT node AS doc_id, CAST(d AS BIGINT) AS degree, r AS rank_q,
           ROUND(r / 1000000000000.0, 6) AS pagerank
    FROM it3
    """,
    "dedup",
    "graph",
    "iterative",
)
def pagerank_dedup_graph(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Iterative graph algorithm under a FULL value-hash oracle: 3 rounds
    of PageRank (damping 0.85) over the near-dup edge set — which
    duplicated page is the hub its mirrors cluster around, the
    importance signal web-corpus curation weighs survivors by.  Float
    PageRank cannot be oracle-checked (summation order); this one is
    INTEGER fixed-point throughout (operators/dedup.py:pagerank), so
    Spark and the unrolled-SQL oracle agree bit-for-bit.  Spark builds
    the edge set via banded MinHash LSH + exact-Jaccard verify; the
    oracle brute-forces the same exact-Jaccard pairs (the LSH recall
    proof is dedup_minhash_lsh's own oracle).  Per round: one keyed join
    + one map-combined sum — same exchanges as connected components."""
    from comlake_core_spark.operators.dedup.graph import pagerank
    from comlake_core_spark.operators.dedup.minhash import minhash_lsh_pairs

    (docs,) = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.8, num_hashes=64, bands=16)
    pr = pagerank(pairs, iterations=3)
    return pr.select(
        F.col("node").alias("doc_id"),
        "degree",
        "rank_q",
        F.round(F.col("rank_q") / F.lit(1e12), 6).alias("pagerank"),
    )




@workload(
    "dedup_graph_bfs_depth",
    r"""
    WITH sh AS (
      SELECT doc_id AS id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' '))) AS grams
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
            FROM documents)
    ), sized AS (SELECT id, grams, len(grams) AS gc FROM sh),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b
      FROM sized a JOIN sized b
        ON a.id < b.id
       AND a.gc >= CAST(ceil(b.gc * 0.8) AS BIGINT)
       AND b.gc >= CAST(ceil(a.gc * 0.8) AS BIGINT)
      WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
               / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8
    ),
    sym AS (
      SELECT id_a AS src, id_b AS dst FROM pairs
      UNION ALL SELECT id_b, id_a FROM pairs
    ),
    d0 AS (
      SELECT DISTINCT src AS node, CAST(0 AS BIGINT) AS depth
      FROM sym WHERE src % 5 = 0
    ),
    r1 AS (
      SELECT sym.dst AS node, MIN(d0.depth) + 1 AS nd
      FROM sym JOIN d0 ON sym.src = d0.node GROUP BY sym.dst
    ),
    d1 AS (
      SELECT COALESCE(a.node, b.node) AS node,
             CASE WHEN a.depth IS NULL THEN b.nd
                  WHEN b.nd IS NULL THEN a.depth
                  WHEN a.depth < b.nd THEN a.depth ELSE b.nd END AS depth
      FROM d0 a FULL OUTER JOIN r1 b ON a.node = b.node
    ),
    r2 AS (
      SELECT sym.dst AS node, MIN(d1.depth) + 1 AS nd
      FROM sym JOIN d1 ON sym.src = d1.node GROUP BY sym.dst
    ),
    d2 AS (
      SELECT COALESCE(a.node, b.node) AS node,
             CASE WHEN a.depth IS NULL THEN b.nd
                  WHEN b.nd IS NULL THEN a.depth
                  WHEN a.depth < b.nd THEN a.depth ELSE b.nd END AS depth
      FROM d1 a FULL OUTER JOIN r2 b ON a.node = b.node
    ),
    r3 AS (
      SELECT sym.dst AS node, MIN(d2.depth) + 1 AS nd
      FROM sym JOIN d2 ON sym.src = d2.node GROUP BY sym.dst
    ),
    d3 AS (
      SELECT COALESCE(a.node, b.node) AS node,
             CASE WHEN a.depth IS NULL THEN b.nd
                  WHEN b.nd IS NULL THEN a.depth
                  WHEN a.depth < b.nd THEN a.depth ELSE b.nd END AS depth
      FROM d2 a FULL OUTER JOIN r3 b ON a.node = b.node
    )
    SELECT node AS doc_id, CAST(depth AS BIGINT) AS depth FROM d3
    """,
    "dedup",
    "graph",
    "iterative",
)
def dedup_graph_bfs_depth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Contamination-radius BFS: minimum hop distance (0..3) from seed
    documents (doc_id % 50 == 0, the "blocklisted page" stand-in) over
    the near-dup edge set — flag-everything-within-k-hops policies in
    corpus curation are this exact query.  Spark builds the edge set via
    banded MinHash LSH + exact-Jaccard verify; the oracle brute-forces
    the same exact-Jaccard pairs and unrolls the 3 min-relaxation rounds
    (operators/dedup.bfs_depth — integer depths, min() relaxation, one
    keyed join + map-combined min per round over the checkpointed edge
    list)."""
    from comlake_core_spark.operators.dedup.graph import bfs_depth
    from comlake_core_spark.operators.dedup.minhash import minhash_lsh_pairs

    (docs,) = _t(spark, sf_dir, "documents")
    pairs = minhash_lsh_pairs(docs, threshold=0.8, num_hashes=64, bands=16)
    return bfs_depth(pairs, lambda node: node % 5 == 0, iterations=3).select(
        F.col("node").alias("doc_id"), "depth"
    )




@workload(
    "dedup_common_spans",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ), base AS (
      SELECT doc_id, len(t) AS n_tokens FROM toks
    ), grams AS (
      SELECT doc_id, CAST(u.i AS BIGINT) AS pos,
             array_to_string(t[CAST(u.i+1 AS BIGINT):CAST(u.i+10 AS BIGINT)], ' ') AS gram
      FROM toks, LATERAL (SELECT unnest(range(len(t) - 10 + 1)) AS i) u
      WHERE len(t) >= 10
    ), dup AS (
      SELECT gram FROM grams GROUP BY gram HAVING COUNT(DISTINCT doc_id) >= 2
    ), hits AS (
      SELECT g.doc_id, g.pos FROM grams g JOIN dup USING (gram)
    ), cov AS (
      SELECT doc_id, pos,
             CASE WHEN lag(pos) OVER w IS NULL THEN 10
                  ELSE least(10, pos - lag(pos) OVER w) END AS inc
      FROM hits WINDOW w AS (PARTITION BY doc_id ORDER BY pos)
    ), agg AS (
      SELECT doc_id, COUNT(*) AS n_dup_spans, SUM(inc) AS covered FROM cov GROUP BY doc_id
    )
    SELECT b.doc_id,
           CAST(b.n_tokens AS BIGINT) AS n_tokens,
           CAST(COALESCE(a.n_dup_spans, 0) AS BIGINT) AS n_dup_spans,
           CAST(COALESCE(a.covered, 0) AS BIGINT) AS covered_tokens,
           COALESCE(a.covered, 0) * 2 >= b.n_tokens AS mostly_dup
    FROM base b LEFT JOIN agg a USING (doc_id)
    """,
    "dedup",
    "text",
)
def dedup_common_spans(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr-style duplicated-span accounting (Lee et al. 2022):
    per document, how many token positions sit inside a 10-token span
    that also appears in another document — the sub-document duplication
    signal that motivates span cutting over document dropping.  Interval-
    union coverage is exact integer arithmetic over sorted span starts;
    see operators/dedup.common_span_coverage for the plan shape (map-side
    sliding-window explode, one distinct-owner shuffle on the span text,
    one join back, per-doc window)."""
    from comlake_core_spark.operators.dedup.spans import common_span_coverage

    from comlake_core_spark.session import ensure_parallelism

    (docs,) = _t(spark, sf_dir, "documents")
    return common_span_coverage(ensure_parallelism(docs), span=10, min_docs=2)




# ---------------------------------------------------------------------------
# r5 post-window additions (never driver-seen; rotate into the r6 window)
# ---------------------------------------------------------------------------


@workload(
    "boilerplate_strip_source",
    r"""
    WITH toks AS (
      SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS t
      FROM documents
    ), lines AS (
      SELECT doc_id, source, CAST(u.i AS INT) AS line_idx,
             array_to_string(t[CAST(u.i*2+1 AS BIGINT):CAST(u.i*2+2 AS BIGINT)], ' ') AS line
      FROM toks,
           LATERAL (SELECT unnest(range(greatest(CAST(ceil(len(t)/2.0) AS BIGINT), 1))) AS i) u
    ), ldf AS (
      SELECT source, line, COUNT(DISTINCT doc_id) AS df
      FROM lines GROUP BY source, line HAVING COUNT(DISTINCT doc_id) >= 5
    ), flagged AS (
      SELECT l.doc_id, l.line_idx, l.line, ldf.df IS NULL AS keep
      FROM lines l LEFT JOIN ldf ON l.source = ldf.source AND l.line = ldf.line
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(CASE WHEN keep THEN 1 ELSE 0 END) AS BIGINT) AS n_kept,
           md5(coalesce(string_agg(CASE WHEN keep THEN line END, ' ' ORDER BY line_idx), '')) AS kept_text_md5
    FROM flagged GROUP BY doc_id
    """,
    "dedup",
    "text",
    "quality",
)
def boilerplate_strip_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CCNet/C4-style per-source boilerplate stripping: a 2-word line
    occurring in >= 5 distinct documents of the SAME source (a site's
    nav bar / cookie banner / license header) is removed from every
    document of that source — the cleanup stage that runs before
    document-level dedup and that keep-first line dedup
    (dedup_lines_corpus) deliberately does not model (boilerplate keeps
    NO occurrence, and the threshold is scoped per source).  Output is
    one row per doc with kept-line counts and an md5 fingerprint of the
    surviving text in original order.  Plan: map-only explode, one
    map-combined (source, line) df aggregate joined back on its own
    exchange, one keyed shuffle to doc_id — shuffle volume O(#lines);
    see operators/dedup.strip_boilerplate."""
    from comlake_core_spark.operators.dedup.boilerplate import strip_boilerplate

    (docs,) = _t(spark, sf_dir, "documents")
    return strip_boilerplate(docs, words_per_line=2, min_docs=5)




@workload(
    "decontaminate_bloom",
    r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(lower(text)), '\s+') AS t
      FROM documents
    ), grams AS (
      SELECT DISTINCT doc_id, array_to_string(t[i:i+4], ' ') AS g
      FROM toks, UNNEST(range(1, len(t) - 3)) AS r(i)
      WHERE len(t) >= 5
    ), pos AS (
      SELECT DISTINCT CAST('0x' || substr(md5(j.j || ':' || g), 1, 12) AS BIGINT) % 65536 AS p
      FROM (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0) e,
           (SELECT unnest(range(3)) AS j) j
    ), train AS (
      SELECT doc_id, g,
             (CAST('0x' || substr(md5('0:' || g), 1, 12) AS BIGINT) % 65536 IN (SELECT p FROM pos))
         AND (CAST('0x' || substr(md5('1:' || g), 1, 12) AS BIGINT) % 65536 IN (SELECT p FROM pos))
         AND (CAST('0x' || substr(md5('2:' || g), 1, 12) AS BIGINT) % 65536 IN (SELECT p FROM pos)) AS bloom_hit,
             g IN (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0) AS true_hit
      FROM grams WHERE doc_id % 50 <> 0
    )
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_grams,
           CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_bloom_hits,
           CAST(SUM(CASE WHEN true_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_true_hits,
           CAST(SUM(CASE WHEN bloom_hit THEN 1 ELSE 0 END)
                - SUM(CASE WHEN true_hit THEN 1 ELSE 0 END) AS BIGINT) AS n_false_pos
    FROM train GROUP BY doc_id
    """,
    "dedup",
    "decontamination",
    "sketch",
)
def decontaminate_bloom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decontamination through a 65536-bit / 3-hash Bloom filter of the
    eval slice's word 5-grams, AUDITED against the exact broadcast-join
    check: per train doc, bloom hits vs true hits vs deterministic false
    positives (md5-derived bit positions, so the oracle reproduces every
    bit).  The scale rationale over decontaminate_train_eval's gram-set
    broadcast: the bitmap is O(m) BITS however large the eval suite
    grows, and the driver collect is bounded by DISTINCT bit positions
    (<= m) by construction — this workload is the small-scale audit that
    sizes m before trusting the filter at 100 TB.  See
    operators/dedup.bloom_decontaminate."""
    from comlake_core_spark.operators.dedup.bloom import bloom_decontaminate
    from comlake_core_spark.session import ensure_parallelism

    (docs,) = _t(spark, sf_dir, "documents")
    docs = ensure_parallelism(docs)
    eval_df = docs.filter(F.col("doc_id") % 50 == 0)
    train = docs.filter(F.col("doc_id") % 50 != 0)
    return bloom_decontaminate(train, eval_df, n=5)




@workload(
    "dedup_lsh_edit_verify",
    r"""
    WITH sh AS (
      SELECT doc_id AS id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' ')
             )) AS grams
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
            FROM documents)
    ), sized AS (SELECT id, grams, len(grams) AS gc FROM sh),
    pairs AS (
      SELECT a.id AS id_a, b.id AS id_b,
             CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
               / len(list_distinct(list_concat(a.grams, b.grams))) AS jaccard
      FROM sized a JOIN sized b
        ON a.id < b.id
       AND a.gc >= CAST(ceil(b.gc * 0.8) AS BIGINT)
       AND b.gc >= CAST(ceil(a.gc * 0.8) AS BIGINT)
      WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
               / len(list_distinct(list_concat(a.grams, b.grams))) >= 0.8
    ), pfx AS (
      SELECT doc_id, substr(lower(trim(text)), 1, 120) AS ptxt FROM documents
    )
    SELECT id_a, id_b, jaccard,
           CAST(levenshtein(a.ptxt, b.ptxt) AS BIGINT) AS lev_prefix,
           ROUND(1.0 - levenshtein(a.ptxt, b.ptxt)
                       / greatest(length(a.ptxt), length(b.ptxt)), 6) AS edit_sim
    FROM pairs JOIN pfx a ON pairs.id_a = a.doc_id
               JOIN pfx b ON pairs.id_b = b.doc_id
    """,
    "dedup",
    "minhash",
    "verify",
)
def dedup_lsh_edit_verify(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Candidate-generation + exact-verify made explicit: the
    dedup_minhash_lsh candidate pairs re-scored with Levenshtein over a
    120-char lowercase prefix — the order-sensitive verify that
    separates true re-crawls from bag-of-words Jaccard coincidences.
    The oracle brute-forces exact Jaccard over all pairs (the
    dedup_minhash_lsh recall evidence carries over unchanged: banding
    recalls every >= 0.8 pair here) and recomputes the identical
    levenshtein — integer-equal across engines, division rounded once.
    Cost at scale ∝ |candidates| x prefix² — the prefix caps the DP so a
    10 MB document cannot stall a task; see
    operators/dedup.lsh_edit_verify."""
    from comlake_core_spark.operators.dedup.editverify import lsh_edit_verify

    (docs,) = _t(spark, sf_dir, "documents")
    return lsh_edit_verify(docs, threshold=0.8, num_hashes=64, bands=16, prefix=120)




# ---------------------------------------------------------------------------
# LSH infrastructure diagnostics: the dedup family's own machinery put
# under the value-hash gate.  Both run the PORTABLE md5 MinHash
# (operators/dedup.minhash_signature_portable) so the oracle recomputes
# the signatures — and therefore the buckets and the estimator —
# bit-for-bit, not just the downstream answers.
# ---------------------------------------------------------------------------

_PORTABLE_LSH_SQL = r"""
    WITH toks AS (
      SELECT doc_id, string_split_regex(trim(text), '\s+') AS t FROM documents
    ), sh AS (
      SELECT doc_id,
             list_distinct(list_transform(
               range(1, greatest(len(t) - 2, 1) + 1),
               i -> array_to_string(t[i:i+2], ' '))) AS grams
      FROM toks
    ), sig AS (
      SELECT doc_id, grams,
             list_transform(range(12),
               s -> list_min(list_transform(grams,
                      g -> md5(CAST(s AS VARCHAR) || '|' || g)))) AS sg
      FROM sh
    ), banded AS (
      SELECT doc_id, band,
             md5(array_to_string(sg[band*3+1:band*3+3], ',')) AS bkey
      FROM sig CROSS JOIN (SELECT unnest(range(4)) AS band)
    )
"""




@workload(
    "lsh_bucket_skew_audit",
    _PORTABLE_LSH_SQL
    + r""",
    buckets AS (
      SELECT band, bkey, COUNT(*) AS n FROM banded GROUP BY band, bkey
    )
    SELECT CAST(band AS BIGINT) AS band,
           COUNT(*) AS n_buckets,
           CAST(MAX(n) AS BIGINT) AS max_bucket,
           CAST(SUM(n * (n - 1) / 2) AS BIGINT) AS candidate_pairs,
           ROUND(CAST(MAX(n * (n - 1) / 2) AS DOUBLE)
                 / NULLIF(CAST(SUM(n * (n - 1) / 2) AS DOUBLE), 0), 9)
             AS top_bucket_pair_share
    FROM buckets GROUP BY band
    """,
    "dedup",
    "diagnostics",
    "skew",
)
def lsh_bucket_skew_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-band LSH bucket-skew audit — candidate pairs are Σ C(bucket,2),
    so ONE degenerate bucket turns the dedup self-join quadratic; this
    report catches it BEFORE the join (a (band,bucket) count plus a
    band rollup, strictly cheaper than the join it protects).  The
    oracle recomputes the md5 signatures and buckets themselves.  See
    operators/dedup.lsh_bucket_skew."""
    from comlake_core_spark.operators.dedup.portable import lsh_bucket_skew

    (docs,) = _t(spark, sf_dir, "documents")
    return lsh_bucket_skew(docs)




@workload(
    "minhash_estimate_calibration",
    _PORTABLE_LSH_SQL
    + r""",
    cand AS (
      SELECT DISTINCT l.doc_id AS ida, r.doc_id AS idb
      FROM banded l JOIN banded r
        ON l.band = r.band AND l.bkey = r.bkey AND l.doc_id < r.doc_id
    ), scored AS (
      SELECT least(CAST(floor(est * 10) AS BIGINT), 9) AS est_bin,
             ROUND(est, 9) AS e, ROUND(jac, 9) AS tj,
             ROUND(abs(est - jac), 9) AS ae
      FROM (
        SELECT CAST(len(list_filter(range(12),
                         i -> a.sg[i+1] = b.sg[i+1])) AS DOUBLE) / 12 AS est,
               CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE)
                 / len(list_distinct(list_concat(a.grams, b.grams))) AS jac
        FROM cand JOIN sig a ON cand.ida = a.doc_id
                  JOIN sig b ON cand.idb = b.doc_id
      )
    )
    SELECT est_bin, COUNT(*) AS n_pairs,
           CAST(SUM(CAST(e  AS DECIMAL(20,9))) AS DOUBLE) / COUNT(*) AS avg_estimate,
           CAST(SUM(CAST(tj AS DECIMAL(20,9))) AS DOUBLE) / COUNT(*) AS avg_true_jaccard,
           CAST(SUM(CAST(ae AS DECIMAL(20,9))) AS DOUBLE) / COUNT(*) AS mae
    FROM scored GROUP BY est_bin
    """,
    "dedup",
    "diagnostics",
    "calibration",
)
def minhash_estimate_calibration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash estimator calibration: signature agreement (the unbiased
    Jaccard estimator) vs EXACT shingle Jaccard over the LSH candidate
    pairs, binned by estimate decile with mean-absolute-error per bin —
    the measured answer to "how many hashes?", ann_recall_at_k's
    discipline applied to the dedup estimator itself.  Candidates come
    from bucket joins (never all-pairs); exact sets join back for
    candidate ids only.  See operators/dedup.minhash_calibration."""
    from comlake_core_spark.operators.dedup.portable import minhash_calibration

    (docs,) = _t(spark, sf_dir, "documents")
    return minhash_calibration(docs)




@workload(
    "dedup_exact_normalized",
    r"""
    WITH reposts AS (
      SELECT doc_id, text FROM documents
      UNION ALL
      SELECT doc_id + 1000000, '  ' || upper(text) || '  '
      FROM documents WHERE doc_id < 200
    ), norm AS (
      SELECT doc_id,
             regexp_replace(regexp_replace(lower(trim(text)), '[^a-z0-9 ]', '', 'g'),
                            ' +', ' ', 'g') AS nt
      FROM reposts
    )
    SELECT MIN(doc_id) AS canonical_doc_id, COUNT(*) AS n_copies
    FROM norm GROUP BY md5(nt)
    HAVING COUNT(*) > 1
    """,
    "dedup",
    "text",
    "normalization",
)
def dedup_exact_normalized(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4-style normalized exact dedup: lowercase, trim, strip
    non-alphanumerics, collapse whitespace — the canonicalization that
    catches re-posts byte-exact dedup misses (the fixture plants an
    UPPERCASED padded copy of every doc_id < 200; raw md5 dedup finds
    none of them).  One map-side normalization + one groupBy on the
    digest: at 100 TB, shuffle rows = #distinct normal forms."""
    (docs,) = _t(spark, sf_dir, "documents")
    reposts = docs.select("doc_id", "text").unionByName(
        docs.filter(F.col("doc_id") < 200).select(
            (F.col("doc_id") + 1_000_000).alias("doc_id"),
            F.concat(F.lit("  "), F.upper("text"), F.lit("  ")).alias("text"),
        )
    )
    nt = F.regexp_replace(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), "[^a-z0-9 ]", ""),
        " +",
        " ",
    )
    return (
        reposts.select("doc_id", F.md5(nt).alias("_h"))
        .groupBy("_h")
        .agg(F.min("doc_id").alias("canonical_doc_id"), F.count(F.lit(1)).alias("n_copies"))
        .filter(F.col("n_copies") > 1)
        .drop("_h")
    )




@workload(
    "dedup_containment_prefix",
    r"""
    WITH sh0 AS (
      SELECT doc_id AS id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' ')
             )) AS grams
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
            FROM documents)
    ), posts AS (SELECT id, unnest(grams) AS g FROM sh0),
    dfreq AS (SELECT g, count(*) AS df FROM posts GROUP BY g),
    kept AS (SELECT id, g FROM posts JOIN dfreq USING (g) WHERE df <= 200),
    sized AS (SELECT id, list(g) AS grams, count(*) AS gc FROM kept GROUP BY id)
    SELECT a.id AS src_id, b.id AS dst_id,
           CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) / a.gc AS containment
    FROM sized a JOIN sized b
      ON a.id <> b.id
     AND b.gc >= CAST(ceil(a.gc * 0.8 - 1e-9) AS BIGINT)
    WHERE CAST(len(list_intersect(a.grams, b.grams)) AS DOUBLE) / a.gc >= 0.8
    """,
    "dedup",
    "containment",
    "prefix-filter",
)
def dedup_containment_prefix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Set-containment near-superset detection at 0.8 via AllPairs/PPJoin
    prefix filtering — the quote/template/wrapper dedup case MinHash-LSH
    (Jaccard-banded) structurally misses.  EXACT recall by pigeonhole
    (rarest-first prefix vs full postings) over the max_df-capped
    shingle universe (grams in >200 docs leave postings, prefixes, and
    verify sets alike — the 100 TB hot-gram lever, VERDICT r8 #3; at
    this corpus's df ceiling the cap admits every gram, so the answer
    equals uncapped containment).  The oracle brute-forces the full
    ordered pair space over the SAME capped universe (with the necessary
    |S_dst| size prefilter, epsilon-guarded ceil on both engines —
    ADVICE r8) and equality proves both the prefix filter's 100% recall
    AND the verification arithmetic.  See
    operators/dedup.containment_pairs_prefix."""
    from comlake_core_spark.operators.dedup.containment import containment_pairs_prefix

    (docs,) = _t(spark, sf_dir, "documents")
    return containment_pairs_prefix(docs, threshold=0.8, max_df=200)




@workload(
    "train_test_ngram_leakage",
    r"""
    WITH sh AS (
      SELECT doc_id, source,
             list_distinct(list_transform(
               range(1, greatest(len(ts) - 4, 1) + 1),
               i -> array_to_string(ts[i:i+4], ' ')
             )) AS grams,
             substring(md5(CAST(doc_id AS VARCHAR)), 1, 4) < '2000' AS is_test
      FROM (SELECT doc_id, source, string_split_regex(trim(text), '\s+') AS ts
            FROM documents)
    ), tg AS (
      SELECT DISTINCT unnest(grams) AS g FROM sh WHERE NOT is_test
    ), testd AS (
      SELECT doc_id, source, grams FROM sh WHERE is_test
    ), hits AS (
      SELECT DISTINCT doc_id FROM (
        SELECT t.doc_id, unnest(t.grams) AS g FROM testd t
      ) x JOIN tg USING (g)
    ), te AS (
      SELECT t.source, COUNT(*) AS n_test,
             CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_contaminated
      FROM testd t LEFT JOIN hits h ON t.doc_id = h.doc_id
      GROUP BY t.source
    ), tr AS (
      SELECT source, COUNT(*) AS n_train FROM sh WHERE NOT is_test GROUP BY source
    )
    SELECT source,
           COALESCE(n_train, 0) AS n_train,
           COALESCE(n_test, 0) AS n_test,
           COALESCE(n_contaminated, 0) AS n_contaminated,
           CASE WHEN COALESCE(n_test, 0) > 0
                THEN round(CAST(COALESCE(n_contaminated, 0) AS DOUBLE) / n_test, 9)
           END AS contamination_rate
    FROM tr FULL JOIN te USING (source)
    """,
    "dedup",
    "decontamination",
    "split",
)
def train_test_ngram_leakage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Split-contamination audit (r8): apply the engine-portable md5
    split (12.5% test, split_assignment_portable — the same cut the
    leakage-safe splits use) and measure, per source, how many TEST
    documents share at least one 5-gram with ANY train document — the
    audit a data team runs to decide whether a plain hash split leaks
    eval data (the answer motivating leakage_safe_split_docs).
    Complements decontaminate_bloom (external benchmark) by auditing the
    corpus against its OWN split.

    Plan (reshaped r11 — isolated noop-forced median 3.8 → 1.6 s at
    sf0.1): ONE scan builds per-doc distinct 5-gram sets (map-only
    sequence+transform) behind a persist — the r8 shape recomputed the
    shingle arrays once per side, which a count()-pruned profile hid
    because Catalyst eliminates the whole contamination subtree under
    count(); train grams collapse to one distinct gram set
    (map-combined); the test side probes it with a LEFT SEMI gram join
    carrying `source`, and contaminated docs aggregate per source with
    count_distinct — no doc-keyed join-back, no all-pairs, no broadcast
    of corpus-sized state; at 100 TB the gram semi-join is the same
    shape as the LSH band join and the persist is the same doc-array
    cache class the containment family carries."""
    from comlake_core_spark.operators.dedup.minhash import shingles
    from comlake_core_spark.operators.sampling import split_assignment_portable
    from comlake_core_spark.session import ensure_parallelism

    (docs,) = _t(spark, sf_dir, "documents")
    base = ensure_parallelism(docs).select(
        "doc_id",
        "source",
        shingles(F.col("text"), 5).alias("_sh"),
        split_assignment_portable(F.col("doc_id"), 0.125).alias("_is_test"),
        # r14: checkpoint, not cache — train/test filters + the per-split
        # aggs each read it once per run
    ).transform(materialize)
    train = base.filter(~F.col("_is_test"))
    testd = base.filter(F.col("_is_test"))
    train_grams = train.select(F.explode("_sh").alias("g")).distinct()
    cont = (
        testd.select("source", "doc_id", F.explode("_sh").alias("g"))
        .join(train_grams, "g", "leftsemi")
        .groupBy("source")
        .agg(F.count_distinct("doc_id").alias("n_contaminated"))
    )
    te = testd.groupBy("source").agg(F.count(F.lit(1)).alias("n_test"))
    tr = train.groupBy("source").agg(F.count(F.lit(1)).alias("n_train"))
    return (
        tr.join(te, "source", "full")
        .join(cont, "source", "left")
        .select(
            "source",
            F.coalesce("n_train", F.lit(0)).alias("n_train"),
            F.coalesce("n_test", F.lit(0)).alias("n_test"),
            F.coalesce("n_contaminated", F.lit(0)).alias("n_contaminated"),
            F.when(
                F.coalesce("n_test", F.lit(0)) > 0,
                F.round(
                    F.coalesce("n_contaminated", F.lit(0)).cast("double") / F.col("n_test"), 9
                ),
            ).alias("contamination_rate"),
        )
    )




@workload(
    "dedup_header_footer_boilerplate",
    r"""
    WITH hf AS (
      SELECT doc_id, source,
             md5(substring(text, 1, 80)) AS head_fp,
             md5(substring(text, greatest(length(text) - 79, 1), 80)) AS tail_fp
      FROM documents WHERE length(text) >= 80
    ), heads AS (
      SELECT head_fp, COUNT(*) AS c, COUNT(DISTINCT source) AS n_sources,
             MIN(doc_id) AS exemplar_doc
      FROM hf GROUP BY head_fp HAVING COUNT(*) >= 2
    ), tails AS (
      SELECT tail_fp, COUNT(*) AS c, COUNT(DISTINCT source) AS n_sources,
             MIN(doc_id) AS exemplar_doc
      FROM hf GROUP BY tail_fp HAVING COUNT(*) >= 2
    )
    SELECT 'head' AS kind, head_fp AS fp, c AS n_docs, n_sources, exemplar_doc
    FROM heads
    UNION ALL
    SELECT 'tail' AS kind, tail_fp AS fp, c AS n_docs, n_sources, exemplar_doc
    FROM tails
    """,
    "dedup",
    "boilerplate",
)
def dedup_header_footer_boilerplate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shared header/footer detection: documents opening or closing with
    the SAME 80-character window are template instances (site chrome,
    license banners, scraper artifacts) — the cluster list feeding a
    strip-boilerplate pass at the document edge, complementing
    dedup_lines_corpus (interior lines) and boilerplate_strip_source
    (per-source line frequency).  Map-only fingerprints + two
    map-combined aggregates; the HAVING >= 2 cut keeps the result
    cluster-sized, never corpus-sized."""
    from comlake_core_spark.session import ensure_parallelism

    (docs,) = _t(spark, sf_dir, "documents")
    base = (
        ensure_parallelism(docs)
        .filter(F.length("text") >= 80)
        .select(
            "doc_id",
            "source",
            F.md5(F.substring("text", 1, 80)).alias("head_fp"),
            F.md5(
                F.substring(
                    "text", F.greatest(F.length("text") - 79, F.lit(1)).cast("int"), 80
                )
            ).alias("tail_fp"),
        )
    )

    def clusters(col: str, kind: str) -> DataFrame:
        return (
            base.groupBy(F.col(col).alias("fp"))
            .agg(
                F.count(F.lit(1)).alias("n_docs"),
                F.countDistinct("source").alias("n_sources"),
                F.min("doc_id").alias("exemplar_doc"),
            )
            .filter(F.col("n_docs") >= 2)
            .select(F.lit(kind).alias("kind"), "fp", "n_docs", "n_sources", "exemplar_doc")
        )

    return clusters("head_fp", "head").unionByName(clusters("tail_fp", "tail"))


# ---------------------------------------------------------------------------
# ExactSubstr span CUTTING (operators/dedup/spans.py) — registered r13
# after the r12 staging round (oracle proven bit-exact in
# tests/test_r13_staged.py before registration; the r7/r11/r12 staging
# pattern — the test pins this SQL identical to its staged copy).
# ---------------------------------------------------------------------------

_EXACT_CUT_SPAN = 8
_EXACT_CUT_MIN_DOCS = 2

_EXACT_CUT_SQL = f"""
WITH base AS (
  SELECT doc_id,
         list_filter(string_split_regex(trim(text), '\\s+'), x -> x <> '') AS ts
  FROM documents
), grams AS (
  SELECT doc_id,
         UNNEST(range(len(ts) - {_EXACT_CUT_SPAN} + 1)) AS s,
         UNNEST(list_transform(range(len(ts) - {_EXACT_CUT_SPAN} + 1),
                i -> array_to_string(ts[i+1 : i+{_EXACT_CUT_SPAN}], ' '))) AS g
  FROM base WHERE len(ts) >= {_EXACT_CUT_SPAN}
), gt AS (
  SELECT g, MIN(doc_id) AS owner
  FROM grams GROUP BY g HAVING COUNT(DISTINCT doc_id) >= {_EXACT_CUT_MIN_DOCS}
), covered AS (
  SELECT DISTINCT doc_id, p FROM (
    SELECT gr.doc_id, UNNEST(range(gr.s, gr.s + {_EXACT_CUT_SPAN})) AS p
    FROM grams gr JOIN gt ON gr.g = gt.g
    WHERE gt.owner <> gr.doc_id
  )
), tokpos AS (
  SELECT doc_id, UNNEST(ts) AS tok, UNNEST(range(len(ts))) AS p FROM base
), kept AS (
  SELECT t.doc_id, t.tok, t.p FROM tokpos t
  WHERE NOT EXISTS (SELECT 1 FROM covered c WHERE c.doc_id = t.doc_id AND c.p = t.p)
), rebuilt AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(tok, ' ' ORDER BY p) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(len(b.ts) AS BIGINT) AS n_tokens,
       CAST(len(b.ts) - COALESCE(r.n_kept, 0) AS BIGINT) AS n_cut,
       CASE WHEN len(b.ts) = 0 THEN 0.0
            ELSE CAST(len(b.ts) - COALESCE(r.n_kept, 0) AS DOUBLE) / len(b.ts)
       END AS cut_frac,
       COALESCE(r.clean_text, '') AS clean_text
FROM base b LEFT JOIN rebuilt r ON b.doc_id = r.doc_id
"""


@workload(
    "exact_substring_cut",
    _EXACT_CUT_SQL,
    "dedup",
    "spans",
    "exactsubstr",
)
def exact_substring_cut_wl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ExactSubstr duplicated-span CUTTING (Lee et al. 2022 §4.1 — the
    dedup ACTION their suffix-array pipeline ships, where
    dedup_common_spans only accounts for coverage): every token covered
    by a duplicated 8-token run is excised unless the document is the
    run's canonical owner (min doc_id), so exactly one copy of each
    duplicated passage survives corpus-wide while quoting documents keep
    their surrounding prose.  Gram-keyed aggregate for ownership,
    foreign-hit-only position expansion, doc-keyed rebuild — no
    all-pairs stage (operators/dedup/spans.py exact_substring_cut)."""
    from comlake_core_spark.operators.dedup.spans import exact_substring_cut

    (docs,) = _t(spark, sf_dir, "documents")
    return exact_substring_cut(
        docs, span=_EXACT_CUT_SPAN, min_docs=_EXACT_CUT_MIN_DOCS
    )


# ---------------------------------------------------------------------------
# r14 registrations (staged during r13, oracles proven bit-exact in
# tests/test_r14_staged.py before registration — the r7/r11/r12/r13
# staging pattern; the test pins each SQL identical to its staged copy).
# ---------------------------------------------------------------------------

_PARAGRAPH_SQL = r"""
WITH base AS (
  SELECT doc_id,
         list_filter(list_transform(string_split_regex(text, '\n{2,}'),
                                    s -> trim(s, ' ')),
                     x -> x <> '') AS ps
  FROM documents
), occ AS (
  SELECT doc_id,
         UNNEST(range(len(ps))) AS pos,
         UNNEST(ps) AS para
  FROM base
), own AS (
  SELECT para, MIN(ROW(doc_id, pos)) AS o FROM occ GROUP BY para
), kept AS (
  SELECT o.doc_id, o.pos, o.para
  FROM occ o JOIN own w ON o.para = w.para
  WHERE w.o = ROW(o.doc_id, o.pos)
), rebuilt AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         string_agg(para, chr(10) || chr(10) ORDER BY pos) AS clean_text
  FROM kept GROUP BY doc_id
)
SELECT b.doc_id,
       CAST(len(b.ps) AS BIGINT) AS n_paras,
       COALESCE(r.n_kept, 0) AS n_kept,
       CASE WHEN len(b.ps) = 0 THEN 0.0
            ELSE CAST(COALESCE(r.n_kept, 0) AS DOUBLE) / len(b.ps)
       END AS kept_frac,
       COALESCE(r.clean_text, '') AS clean_text
FROM base b LEFT JOIN rebuilt r ON b.doc_id = r.doc_id
"""


@workload(
    "dedup_paragraphs_corpus",
    _PARAGRAPH_SQL,
    "dedup",
    "paragraphs",
)
def dedup_paragraphs_corpus_wl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide exact paragraph dedup, first occurrence wins — the
    Dolma/C4 paragraph tier between whole-document dedup and
    exact_substring_cut's span cutting (Soldaini et al. 2024 §4; Raffel
    et al. 2020): each distinct paragraph survives exactly once
    corpus-wide (min (doc_id, position) owns it) and every document is
    reassembled from its surviving paragraphs in order.  Paragraph-keyed
    min-struct aggregate for ownership — NO window, so hot boilerplate
    paragraphs cannot pivot a skewed window partition — then an
    equi-join back and a doc-keyed rebuild
    (operators/dedup/paragraphs.py paragraph_dedup)."""
    from comlake_core_spark.operators.dedup.paragraphs import paragraph_dedup

    (docs,) = _t(spark, sf_dir, "documents")
    return paragraph_dedup(docs)


_SOFT_SQL = r"""
WITH base AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                              x -> x <> '')) AS BIGINT) AS n_tokens,
         md5(array_to_string(string_split_regex(trim(lower(text)), '\s+'),
                             ' ')) AS fp
  FROM documents
), sizes AS (
  SELECT fp, CAST(COUNT(*) AS BIGINT) AS cluster_size FROM base GROUP BY fp
)
SELECT b.doc_id, s.cluster_size,
       1.0 / s.cluster_size AS weight,
       b.n_tokens,
       CAST(b.n_tokens AS DOUBLE) / s.cluster_size AS eff_tokens
FROM base b JOIN sizes s ON b.fp = s.fp
"""


@workload(
    "dedup_soft_weights",
    _SOFT_SQL,
    "dedup",
    "softdedup",
    "sampling",
)
def dedup_soft_weights_wl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SoftDeDup inverse-duplication sampling weights (He et al. 2024;
    the duplicate-aware sampling of Muennighoff et al. 2023): every
    document keeps weight 1/cluster_size over its exact-duplicate
    cluster (dedup_exact's md5 fingerprint), so the EXPECTED number of
    times a distinct text is sampled is one, and eff_tokens = n_tokens /
    cluster_size sums to the cluster's distinct token mass.  One
    map-side fingerprint, one map-combined size aggregate, one
    fingerprint equi-join (operators/dedup/softdedup.py
    soft_dedup_weights)."""
    from comlake_core_spark.operators.dedup.softdedup import soft_dedup_weights

    (docs,) = _t(spark, sf_dir, "documents")
    return soft_dedup_weights(docs)


_FUNNEL_SPAN = 8
_FUNNEL_MIN_DOCS = 2

_FUNNEL_SQL = rf"""
WITH exact_base AS (
  SELECT doc_id,
         CAST(len(list_filter(string_split_regex(trim(text), '\s+'),
                              x -> x <> '')) AS BIGINT) AS nt,
         md5(array_to_string(string_split_regex(trim(lower(text)), '\s+'),
                             ' ')) AS fp
  FROM documents
), exact_canon AS (
  SELECT fp, MIN(doc_id) AS keep FROM exact_base GROUP BY fp
), exact_row AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS docs_in,
         CAST(SUM(CASE WHEN b.doc_id = c.keep THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_kept,
         CAST(SUM(b.nt) AS BIGINT) AS tokens_in,
         CAST(SUM(CASE WHEN b.doc_id = c.keep THEN b.nt ELSE 0 END) AS BIGINT)
           AS tokens_kept
  FROM exact_base b JOIN exact_canon c ON b.fp = c.fp
), para_out AS ({_PARAGRAPH_SQL}
), para_row AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS docs_in,
         CAST(SUM(CASE WHEN p.clean_text <> '' THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_kept,
         CAST(SUM(e.nt) AS BIGINT) AS tokens_in,
         CAST(SUM(len(list_filter(string_split_regex(trim(p.clean_text), '\s+'),
                                  x -> x <> ''))) AS BIGINT) AS tokens_kept
  FROM para_out p JOIN exact_base e ON p.doc_id = e.doc_id
), cut_out AS ({_EXACT_CUT_SQL}
), cut_row AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS docs_in,
         CAST(SUM(CASE WHEN clean_text <> '' THEN 1 ELSE 0 END) AS BIGINT)
           AS docs_kept,
         CAST(SUM(n_tokens) AS BIGINT) AS tokens_in,
         CAST(SUM(n_tokens - n_cut) AS BIGINT) AS tokens_kept
  FROM cut_out
)
SELECT 'exact' AS stage, docs_in, docs_kept, tokens_in, tokens_kept,
       CASE WHEN tokens_in > 0
            THEN CAST(tokens_kept AS DOUBLE) / tokens_in ELSE 0.0 END
         AS token_kept_frac
FROM exact_row
UNION ALL
SELECT 'paragraph', docs_in, docs_kept, tokens_in, tokens_kept,
       CASE WHEN tokens_in > 0
            THEN CAST(tokens_kept AS DOUBLE) / tokens_in ELSE 0.0 END
FROM para_row
UNION ALL
SELECT 'span', docs_in, docs_kept, tokens_in, tokens_kept,
       CASE WHEN tokens_in > 0
            THEN CAST(tokens_kept AS DOUBLE) / tokens_in ELSE 0.0 END
FROM cut_row
"""


@workload(
    "dedup_survivorship_funnel",
    _FUNNEL_SQL,
    "dedup",
    "funnel",
    "report",
)
def dedup_survivorship_funnel_wl(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup survivorship funnel — the per-tier accounting report (Lee
    et al. 2022 tabulate exactly this for C4/RealNews; Dolma's datasheet
    publishes the same removal rates): for each tier (exact document /
    paragraph / duplicated-span), measured INDEPENDENTLY on the raw
    corpus, the documents and tokens that tier alone would keep.  The
    composition capstone of the dedup family: three bounded tier plans
    (each documented in its operator) plus three 1-row aggregates and a
    3-row union (operators/dedup/funnel.py dedup_survivorship_funnel)."""
    from comlake_core_spark.operators.dedup.funnel import dedup_survivorship_funnel

    (docs,) = _t(spark, sf_dir, "documents")
    return dedup_survivorship_funnel(
        docs, span=_FUNNEL_SPAN, min_docs=_FUNNEL_MIN_DOCS
    )
