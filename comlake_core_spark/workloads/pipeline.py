"""end-to-end pipeline composition workloads

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



@workload(
    "pipeline_clean_corpus",
    r"""
    WITH scored AS (
      SELECT doc_id, text, lang, n_chars,
             len(string_split_regex(trim(text), '\s+')) AS n_tokens,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      FROM documents
    ), filtered AS (
      SELECT * FROM scored WHERE n_tokens >= 20 AND lang IN ('en', 'de', 'fr', 'es')
    )
    SELECT doc_id, lang, n_tokens,
           CAST(n_tokens AS DOUBLE) / n_chars AS tokens_per_char
    FROM (
      SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
      FROM filtered
    ) WHERE rn = 1
    """,
    "pipeline",
    "dedup",
    "text",
)
def pipeline_clean_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite LLM-data-pipeline shape: length filter → language
    filter → exact dedup (keep-min-id) → per-doc stats. One scan + one
    dedup shuffle; this is the template a 100 TB corpus-cleaning job
    follows, with the near-dup stages (minhash/simhash) slotting in after
    the exact pass."""
    from comlake_core_spark.operators.text.core import fingerprint, token_count

    (docs,) = _t(spark, sf_dir, "documents")
    scored = docs.select(
        "doc_id",
        "lang",
        "n_chars",
        token_count("text").alias("n_tokens"),
        fingerprint("text").alias("fp"),
    )
    filtered = scored.filter((F.col("n_tokens") >= 20) & F.col("lang").isin("en", "de", "fr", "es"))
    # dedup as row_number-over-fingerprint: ONE shuffle (and WindowGroupLimit
    # prunes each fingerprint group to 1 row before it), versus the
    # groupBy-then-join formulation's two
    w = Window.partitionBy("fp").orderBy("doc_id")
    return (
        filtered.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "doc_id",
            "lang",
            "n_tokens",
            (F.col("n_tokens").cast("double") / F.col("n_chars")).alias("tokens_per_char"),
        )
    )




@workload(
    "pipeline_chunk_dedup_pack",
    r"""
    WITH chunks AS (
      SELECT doc_id,
             CAST(i AS INT) AS chunk_idx,
             substr(text, 1 + CAST(i AS INT) * 400, 500) AS chunk_text
      FROM documents
      CROSS JOIN range(0, 1000) t(i)
      WHERE 1 + i * 400 <= greatest(length(text), 1)
    ), uniq AS (
      SELECT doc_id, chunk_idx, chunk_text FROM (
        SELECT *, row_number() OVER (
          PARTITION BY md5(chunk_text) ORDER BY doc_id, chunk_idx) AS rn
        FROM chunks
      ) WHERE rn = 1
    ), toks AS (
      SELECT doc_id, chunk_idx,
             len(string_split_regex(trim(chunk_text), '\s+')) AS n_tokens
      FROM uniq
    )
    SELECT doc_id, chunk_idx,
           CAST(n_tokens AS BIGINT) AS n_tokens,
           CAST((SUM(n_tokens) OVER w - n_tokens) // 2048 AS BIGINT) AS pack_id,
           CAST(SUM(n_tokens) OVER w - n_tokens AS BIGINT) AS tokens_before
    FROM toks
    WINDOW w AS (ORDER BY doc_id, chunk_idx ROWS UNBOUNDED PRECEDING)
    """,
    "pipeline",
    "text",
)
def pipeline_chunk_dedup_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The end-to-end training-data prep pipeline in one plan: chunk the
    corpus (500-char windows, 100 overlap) → exact-dedup chunks on the md5
    fingerprint (keep lowest (doc_id, chunk_idx) — boilerplate shared
    across documents collapses here) → count tokens → pack into
    2048-token training bins. Shape: map-only fanout, ONE dedup shuffle
    (row_number over fingerprint with WindowGroupLimit), one
    range-partitioned running sum. This is the composite job a 100 TB
    corpus-prep run executes; every stage is the already-oracled operator."""
    from comlake_core_spark.operators.text.chunking import chunk_documents, pack_sequences
    from comlake_core_spark.operators.text.core import token_count

    (docs,) = _t(spark, sf_dir, "documents")
    chunks = chunk_documents(docs, chunk_chars=500, overlap=100)
    w = Window.partitionBy("_fp").orderBy("doc_id", "chunk_idx")
    uniq = (
        chunks.withColumn("_fp", F.md5("chunk_text"))
        .withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
    )
    toks = uniq.select("doc_id", "chunk_idx", token_count("chunk_text").alias("n_tokens"))
    return pack_sequences(toks, id_col=["doc_id", "chunk_idx"], token_count="n_tokens", budget=2048)




@workload(
    "pipeline_pretrain_corpus",
    r"""
    WITH RECURSIVE scored AS (
      SELECT doc_id, lang, text,
             string_split_regex(trim(text), '\s+') AS t,
             md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp
      FROM documents
    ), enriched AS (
      SELECT doc_id, lang, text, fp, len(t) AS n_tokens,
        least(CAST(len(t) AS DOUBLE) / 100.0, 1.0) * 0.4
        + least((CAST(len(list_filter(t, x -> list_contains(
              ['the','a','of','and','to','in','is','it'], lower(x)))) AS DOUBLE)
            / len(t)) * 4, 1.0) * 0.3
        + (1.0 - least((CAST(length(text) - length(regexp_replace(
              text, '[.,;:!?''"()\[\]{}-]', '', 'g')) AS DOUBLE)
            / length(text)) * 10, 1.0)) * 0.3 AS quality
      FROM scored
    ), filtered AS (
      SELECT * FROM enriched
      WHERE n_tokens >= 20 AND lang IN ('en','de','fr','es') AND quality >= 0.6
    ), exact_kept AS (
      SELECT doc_id, lang, text, n_tokens FROM (
        SELECT *, row_number() OVER (PARTITION BY fp ORDER BY doc_id) AS rn
        FROM filtered
      ) WHERE rn = 1
    ), sh AS (
      SELECT doc_id AS id,
             list_distinct(list_transform(
               range(1, greatest(len(toks) - 2, 1) + 1),
               i -> array_to_string(toks[i:i+2], ' '))) AS grams
      FROM (SELECT doc_id, string_split_regex(trim(text), '\s+') AS toks
            FROM exact_kept)
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
    ), comps AS (SELECT id, MIN(comp) AS comp FROM walk GROUP BY id),
    final AS (
      SELECT k.doc_id, k.lang, k.n_tokens,
             CASE WHEN substring(md5(CAST(COALESCE(c.comp, k.doc_id) AS VARCHAR)), 1, 4)
                       < '2000'
                  THEN 'test' ELSE 'train' END AS split
      FROM exact_kept k LEFT JOIN comps c ON k.doc_id = c.id
      WHERE COALESCE(c.comp, k.doc_id) = k.doc_id
    )
    SELECT lang, split, COUNT(*) AS n_docs,
           CAST(SUM(n_tokens) AS BIGINT) AS total_tokens,
           CAST(SUM(doc_id) AS BIGINT) AS kept_id_sum
    FROM final GROUP BY lang, split
    """,
    "pipeline",
    "training-data",
    "dedup",
    "sampling",
)
def pipeline_pretrain_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The COMPLETE pretraining-corpus curation job in one oracle-gated
    pipeline — every stage an already-proven operator, composed the way a
    100 TB data team actually chains them:

      1. score:   token count + quality (length/stopword/punctuation mix)
      2. filter:  n_tokens >= 20, lang ∈ {en,de,fr,es}, quality >= 0.6
      3. exact dedup: one survivor per normalized-text fingerprint
      4. near-dup:    MinHash-LSH edges at 0.8 over the survivors →
                      connected components → min-id survivor per cluster
      5. split:   contamination-safe — the portable md5 split applied to
                  the CLUSTER representative (leakage_safe_split semantics)
      6. account: per (lang, split) doc/token totals + id-sum checksum
                  pinning the exact final membership

    The oracle re-derives all six stages in SQL (quality formula, exact-
    Jaccard pair space ≡ the LSH edge set, recursive-CTE closure, same
    split cut), so the END-TO-END composition is value-hash-verified, not
    just the pieces.  Scale: one scan feeds scoring+filtering (codegen),
    the exact pass is one fingerprint shuffle, near-dup runs only on
    filtered survivors, and the accounting is a partial agg."""
    from comlake_core_spark.operators.dedup.graph import connected_components
    from comlake_core_spark.operators.dedup.minhash import minhash_lsh_pairs
    from comlake_core_spark.operators.sampling import split_assignment_portable
    from comlake_core_spark.operators.text.core import fingerprint, quality_score, token_count
    from comlake_core_spark.session import ensure_parallelism

    (docs,) = _t(spark, sf_dir, "documents")
    scored = ensure_parallelism(docs).select(
        "doc_id",
        "lang",
        "text",
        token_count("text").alias("n_tokens"),
        quality_score("text").alias("quality"),
        fingerprint("text").alias("fp"),
    )
    filtered = scored.filter(
        (F.col("n_tokens") >= 20)
        & F.col("lang").isin("en", "de", "fr", "es")
        & (F.col("quality") >= 0.6)
    )
    w = Window.partitionBy("fp").orderBy("doc_id")
    exact_kept = (
        filtered.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("doc_id", "lang", "text", "n_tokens")
        # feeds the LSH pair stage AND the final labeling; lazy
        # localCheckpoint, not persist (r14 measured pattern: no columnar
        # cache write, and the readers' plans stop re-inlining the
        # score+filter+window lineage)
        .transform(materialize)
    )
    pairs = minhash_lsh_pairs(exact_kept, threshold=0.8, num_hashes=64, bands=16).select(
        "id_a", "id_b"
    )
    comp = connected_components(pairs)
    labeled = exact_kept.join(comp, exact_kept["doc_id"] == comp["node"], "left").select(
        "doc_id", "lang", "n_tokens", F.coalesce("component", F.col("doc_id")).alias("_rep")
    )
    final = labeled.filter(F.col("doc_id") == F.col("_rep")).select(
        "doc_id",
        "lang",
        "n_tokens",
        F.when(split_assignment_portable(F.col("_rep"), 0.125), "test")
        .otherwise("train")
        .alias("split"),
    )
    return final.groupBy("lang", "split").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum("n_tokens").cast("long").alias("total_tokens"),
        F.sum("doc_id").cast("long").alias("kept_id_sum"),
    )




@workload(
    "pretrain_pipeline_v2",
    r"""
    WITH tr AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS ts
      FROM documents WHERE doc_id % 2 = 0
    ),
    trt AS (
      SELECT ts[CAST(i AS INT)] AS w1, ts[CAST(i AS INT)+1] AS w2, ts[CAST(i AS INT)+2] AS w3
      FROM tr, LATERAL (SELECT unnest(range(1, len(ts)-1)) AS i) u
      WHERE len(ts) >= 3
    ),
    c3 AS (SELECT w1, w2, w3, COUNT(*) AS c3 FROM trt GROUP BY 1, 2, 3),
    ctx AS (SELECT w1, w2, SUM(c3) AS c2tot, COUNT(*) AS n1fw12 FROM c3 GROUP BY 1, 2),
    mid AS (SELECT w2, w3, COUNT(*) AS n1mid FROM c3 GROUP BY 1, 2),
    midtot AS (SELECT w2, SUM(n1mid) AS n1mid_tot, COUNT(*) AS n1fw_mid FROM mid GROUP BY 1),
    bg AS (
      SELECT DISTINCT ts[CAST(i AS INT)] AS a, ts[CAST(i AS INT)+1] AS b
      FROM tr, LATERAL (SELECT unnest(range(1, len(ts))) AS i) u
      WHERE len(ts) >= 2
    ),
    cont AS (SELECT b, COUNT(*) AS n1bw FROM bg GROUP BY 1),
    n1all AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n1all FROM bg),
    sc AS (
      SELECT doc_id,
             list_filter(string_split_regex(trim(lower(text)), '\s+'), x -> x <> '') AS ts
      FROM documents WHERE doc_id % 2 = 1
    ),
    sct AS (
      SELECT doc_id, ts[CAST(i AS INT)] AS w1, ts[CAST(i AS INT)+1] AS w2, ts[CAST(i AS INT)+2] AS w3
      FROM sc, LATERAL (SELECT unnest(range(1, len(ts)-1)) AS i) u
      WHERE len(ts) >= 3
    ),
    j AS (
      SELECT sct.doc_id, sct.w1, sct.w2, sct.w3,
             c3.c3, ctx.c2tot, ctx.n1fw12,
             mid.n1mid, midtot.n1mid_tot, midtot.n1fw_mid,
             cont.n1bw, n1all.n1all
      FROM sct
      LEFT JOIN c3 ON sct.w1 = c3.w1 AND sct.w2 = c3.w2 AND sct.w3 = c3.w3
      LEFT JOIN ctx ON sct.w1 = ctx.w1 AND sct.w2 = ctx.w2
      LEFT JOIN mid ON sct.w2 = mid.w2 AND sct.w3 = mid.w3
      LEFT JOIN midtot ON sct.w2 = midtot.w2
      LEFT JOIN cont ON sct.w3 = cont.b
      CROSS JOIN n1all
    ),
    p2c AS (
      SELECT *,
        CASE WHEN COALESCE(n1mid_tot, 0) > 0 THEN
          (GREATEST(CAST(COALESCE(n1mid, 0) AS DOUBLE) - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE))
           + CAST(0.75 AS DOUBLE) * CAST(n1fw_mid AS DOUBLE)
             * (CAST(COALESCE(n1bw, 0) AS DOUBLE) / n1all))
          / CAST(n1mid_tot AS DOUBLE)
        ELSE CAST(COALESCE(n1bw, 0) AS DOUBLE) / n1all END AS p2
      FROM j
    ),
    p3c AS (
      SELECT doc_id,
        round(CASE WHEN COALESCE(c2tot, 0) > 0 THEN
          (GREATEST(CAST(COALESCE(c3, 0) AS DOUBLE) - CAST(0.75 AS DOUBLE), CAST(0 AS DOUBLE))
           + CAST(0.75 AS DOUBLE) * CAST(n1fw12 AS DOUBLE) * p2)
          / CAST(c2tot AS DOUBLE)
        ELSE p2 END, 9) AS p9
      FROM p2c
    ),
    lp AS (
      SELECT doc_id, round(ln(GREATEST(p9, CAST(1e-9 AS DOUBLE))), 9) AS lp FROM p3c
    ),
    kn AS (
      SELECT doc_id,
             CAST(SUM(CAST(lp AS DECIMAL(28,9))) AS DOUBLE) / COUNT(*) AS avg_logprob
      FROM lp GROUP BY doc_id
    ),
    flagged AS (
      SELECT d.doc_id, d.source, d.text, kn.avg_logprob
      FROM documents d JOIN kn USING (doc_id)
      WHERE kn.avg_logprob > -18.0
    ),
    d0 AS (
      SELECT source, COUNT(*) AS n_docs,
             SUM(CAST(round(-avg_logprob, 9) AS DECIMAL(28,9))) AS lsum
      FROM flagged GROUP BY source
    ), g AS (SELECT SUM(lsum) AS gsum, SUM(n_docs) AS gn, COUNT(*) AS k FROM d0),
    base0 AS (
      SELECT source, n_docs,
             round(CAST(lsum AS DOUBLE)/n_docs, 9) AS mean_loss,
             GREATEST(round(round(CAST(lsum AS DOUBLE)/n_docs, 9)
                            - round(CAST(g.gsum AS DOUBLE)/g.gn, 9), 9), 0.0) AS excess,
             CAST(round(1.0/g.k, 9) AS DECIMAL(20,9)) AS w, g.k AS k
      FROM d0 CROSS JOIN g
    ), u1 AS (
      SELECT *, CAST(round(CAST(w AS DOUBLE)*round(exp(excess), 9), 9) AS DECIMAL(20,9)) AS u
      FROM base0
    ), r1 AS (
      SELECT source, n_docs, mean_loss, excess, k,
             CAST(round(CAST(1.0-0.01 AS DOUBLE)*(CAST(u AS DOUBLE)/CAST(z AS DOUBLE))
                        + CAST(0.01 AS DOUBLE)/k, 9) AS DECIMAL(20,9)) AS w
      FROM u1 CROSS JOIN (SELECT SUM(u) AS z FROM u1) zz
    ), u2 AS (
      SELECT *, CAST(round(CAST(w AS DOUBLE)*round(exp(excess), 9), 9) AS DECIMAL(20,9)) AS u
      FROM r1
    ), r2 AS (
      SELECT source, n_docs, mean_loss, excess,
             CAST(round(CAST(1.0-0.01 AS DOUBLE)*(CAST(u AS DOUBLE)/CAST(z AS DOUBLE))
                        + CAST(0.01 AS DOUBLE)/k, 9) AS DECIMAL(20,9)) AS w
      FROM u2 CROSS JOIN (SELECT SUM(u) AS z FROM u2) zz
    ),
    toks AS (
      SELECT source, doc_id,
             CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS n_tokens
      FROM flagged
    ),
    dom AS (
      SELECT source, SUM(n_tokens) AS domain_tokens,
             CAST(round(sqrt(CAST(SUM(n_tokens) AS DOUBLE)), 9) AS DECIMAL(20,9)) AS mw
      FROM toks GROUP BY source
    ),
    domq AS (
      SELECT source, domain_tokens,
             CAST(200.0 AS DOUBLE) * (CAST(mw AS DOUBLE)/CAST(tot AS DOUBLE)) AS raw
      FROM dom CROSS JOIN (SELECT SUM(mw) AS tot FROM dom) t
    ),
    domq2 AS (
      SELECT *, CAST(floor(raw) AS BIGINT) AS qbase, raw - floor(raw) AS rem FROM domq
    ),
    domq3 AS (
      SELECT *, row_number() OVER (ORDER BY rem DESC, source ASC) AS lr,
             SUM(qbase) OVER () AS bsum
      FROM domq2
    ),
    quotas AS (
      SELECT source, domain_tokens,
             qbase + CASE WHEN lr <= 200 - bsum THEN 1 ELSE 0 END AS quota
      FROM domq3
    ),
    ranked AS (
      SELECT t.source, t.doc_id, t.n_tokens,
             row_number() OVER (PARTITION BY t.source
                                ORDER BY md5(CAST(t.doc_id AS VARCHAR)) ASC, t.doc_id ASC) AS rn
      FROM toks t
    ),
    kept AS (
      SELECT r.source, COUNT(*) AS n_kept, SUM(r.n_tokens) AS kept_tokens,
             SUM(r.doc_id) AS kept_id_sum
      FROM ranked r JOIN quotas q ON r.source = q.source AND r.rn <= q.quota
      GROUP BY r.source
    ),
    chn AS (
      SELECT source,
             SUM(CAST((GREATEST(length(text), 1) - 1) // 320 AS BIGINT) + 1) AS n_chunks
      FROM flagged GROUP BY source
    )
    SELECT r2.source,
           r2.n_docs,
           r2.mean_loss,
           r2.excess,
           CAST(r2.w*1000000000 AS BIGINT) AS weight_q9,
           CAST(r2.w AS DOUBLE) AS weight,
           CAST(q.domain_tokens AS BIGINT) AS domain_tokens,
           CAST(q.quota AS BIGINT) AS quota,
           CAST(COALESCE(k.n_kept, 0) AS BIGINT) AS n_kept,
           CAST(COALESCE(k.kept_tokens, 0) AS BIGINT) AS kept_tokens,
           CAST(COALESCE(k.kept_id_sum, 0) AS BIGINT) AS kept_id_sum,
           CAST(c.n_chunks AS BIGINT) AS n_chunks
    FROM r2
    JOIN quotas q USING (source)
    LEFT JOIN kept k USING (source)
    JOIN chn c USING (source)
    """,
    "pipeline",
    "training-data",
    "sampling",
    "language-model",
)
def pretrain_pipeline_v2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The model-aware curation pipeline (VERDICT r6 #7 / r7 #2), composed
    the way a post-2023 LLM data team chains it — perplexity filter, then
    LEARNED domain weights, then mixture quotas, then chunking:

      1. KN filter:  even doc_ids train an interpolated Kneser-Ney
                     trigram LM; odd doc_ids are scored and must clear
                     avg_logprob > -18.0 (the KenLM/CCNet quality cut)
      2. DoReMi:     per-source weights from the KN loss (-avg_logprob),
                     2 rounds of exponentiated-gradient ascent
      3. mixture:    a 200-doc budget apportioned by sqrt token mass
                     (largest-remainder quotas, md5-rank selection)
      4. chunk:      400-char/80-overlap chunks of every kept doc

    Output: one row per source carrying every stage's accounting — KN
    survivor count, DoReMi weight (double + q9 fixed-point), token mass,
    quota, selected-set id-sum checksum, chunk count — so the value hash
    pins the full composition end-to-end.  The oracle re-derives all
    four stages in one SQL statement (the KN chain verbatim from
    kneser_ney_logprob_docs, the DoReMi 2-round unroll on the 9-grid,
    largest-remainder apportionment, arithmetic chunk counts).

    Scale shape: the KN stage is one trigram aggregate + map-only
    scoring joins; DoReMi is ONE corpus aggregate then O(domains)
    arithmetic; the mixture rank is one shuffle on source; chunking is
    map-only fanout.  Nothing here collects or all-pairs.  See
    tests/test_r7_pipeline_ops.py::test_pretrain_pipeline_v2_composition
    for the staged composition test this registration promotes."""
    from comlake_core_spark.operators.sampling import doremi_domain_weights, mixture_resample
    from comlake_core_spark.operators.text.chunking import chunk_documents
    from comlake_core_spark.operators.text.core import token_count
    from comlake_core_spark.operators.text.kneser_ney import kneser_ney_trigram_logprob

    (docs,) = _t(spark, sf_dir, "documents")
    lm = docs.filter(F.col("doc_id") % 2 == 0)
    cand = docs.filter(F.col("doc_id") % 2 == 1)
    scored = kneser_ney_trigram_logprob(cand, lm).select("doc_id", "avg_logprob")
    flagged = (
        cand.join(scored, "doc_id")
        .filter(F.col("avg_logprob") > -18.0)
        .select("doc_id", "source", "text", "avg_logprob")
        # localCheckpoint, not persist (r14, guide §3.3): flagged feeds
        # DoReMi + mixture + chunking and is referenced ~10× through
        # their internals.  persist() dedupes EXECUTION but not the
        # LOGICAL plan — every reference re-inlines the whole KN scoring
        # chain, and Catalyst analyzed a 1053-Exchange / 422-scan tree
        # (plans/r14/pretrain_pipeline_v2_before.txt) for 8.6 s of
        # driver time per run.  The checkpoint truncates lineage at the
        # survivor frame (plan now 60 Exchanges), same rows, same cache
        # semantics for the downstream stages; materialized by DoReMi's
        # first eager round exactly like the persist was.
        .transform(materialize)
    )
    w = doremi_domain_weights(flagged, ["source"], -F.col("avg_logprob"), rounds=2)
    mix = mixture_resample(
        flagged.withColumn("n_tokens", token_count("text")), ["source"], target_docs=200
    )
    nch = (
        chunk_documents(flagged, chunk_chars=400, overlap=80)
        .groupBy("doc_id")
        .agg(F.count(F.lit(1)).alias("_nc"))
        .join(flagged.select("doc_id", "source"), "doc_id")
        .groupBy("source")
        .agg(F.sum("_nc").cast("long").alias("n_chunks"))
    )
    return (
        w.join(
            mix.select(
                "source", "domain_tokens", "quota", "n_kept", "kept_tokens", "kept_id_sum"
            ),
            "source",
        )
        .join(nch, "source")
        .select(
            "source",
            "n_docs",
            "mean_loss",
            "excess",
            "weight_q9",
            "weight",
            "domain_tokens",
            F.col("quota").cast("long").alias("quota"),
            "n_kept",
            "kept_tokens",
            "kept_id_sum",
            "n_chunks",
        )
    )
