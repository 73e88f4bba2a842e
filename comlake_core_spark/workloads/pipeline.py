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
from comlake_core_spark.session import tables

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
    from comlake_core_spark.operators.text import fingerprint, token_count

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
    from comlake_core_spark.operators.text import chunk_documents, pack_sequences, token_count

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
    from comlake_core_spark.operators.dedup import connected_components, minhash_lsh_pairs
    from comlake_core_spark.operators.sampling import split_assignment_portable
    from comlake_core_spark.operators.text import fingerprint, quality_score, token_count
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
        .persist()  # feeds the LSH pair stage AND the final labeling
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
