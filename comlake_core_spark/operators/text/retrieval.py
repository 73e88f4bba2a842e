"""Lexical retrieval and sparse-vector similarity: per-doc TF-IDF top
terms, Okapi BM25 ranking, and inverted-index cosine top-k over sparse
tf-idf vectors (Bayardo et al., WWW'07 candidate generation).

Scale discipline shared by all three: ONE corpus explode feeds every
aggregate, document-frequency/vocabulary tables are rollups joined back
by broadcast where small, and the per-query/doc cut is a
WindowGroupLimit or TakeOrderedAndProject — no all-pairs stage."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comlake_core_spark.session import materialize

from comlake_core_spark.operators.text.core import _clean_tokens, tokens


def top_terms_tfidf(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_n: int = 5,
    ln_idf: bool = True,
) -> DataFrame:
    """Top-n most distinctive terms per document by TF-IDF — the classic
    keyword/topic signal a corpus pipeline computes for routing, quality
    filtering, and near-dup triage.

    Shape at scale: one scan exploding to (doc, term) pairs, a map-side-
    combined tf aggregation on (doc, term), an O(vocabulary) document-
    frequency aggregation joined back on term (vocabulary ≪ corpus; Spark
    broadcasts it when small enough), and a WindowGroupLimit top-n per doc
    — no all-pairs stage anywhere. N_docs rides along as a broadcast
    scalar, not a driver-side constant baked into the plan.

    `ln_idf=False` swaps ln((N+1)/(df+1)) for the raw ratio (N+1)/(df+1):
    ln is monotone, so rankings are IDENTICAL, but the ratio is computed
    bitwise-identically by any IEEE engine while ln's last ulp is libm-
    dependent — the workload oracle uses the ratio form so values
    hash-match DuckDB exactly."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    ).filter(F.col("term") != "")
    # persist: tf feeds both the document-frequency agg and the scoring
    # join — without it each consumer re-tokenizes the whole corpus. tf is
    # the compacted (doc, distinct-term) frame, far smaller than the raw
    # token explosion; at 100 TB write it as a table and reuse across runs.
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf")).transform(materialize)  # r14: checkpoint, not cache (see bm25 note below)
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    n_docs = df.agg(F.count(F.lit(1)).alias("n_docs"))
    ratio = (F.col("n_docs") + F.lit(1.0)) / (F.col("df") + F.lit(1.0))
    idf = F.log(ratio) if ln_idf else ratio
    from pyspark.sql.window import Window

    scored = (
        tf.join(dfreq, "term")
        .crossJoin(F.broadcast(n_docs))
        .withColumn("tfidf", F.col("tf") * idf)
    )
    w = Window.partitionBy(id_col).orderBy(F.col("tfidf").desc(), F.col("term"))
    return (
        scored.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") <= top_n)
        .select(id_col, "term", "tfidf")
    )


def bm25_search(
    df: DataFrame,
    query_terms: tuple[str, ...],
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    top_n: int = 10,
    quantize: int | None = None,
) -> DataFrame:
    """Okapi BM25 ranking of the corpus against a bag of query terms —
    the lexical-retrieval complement to the embedding ANN operators
    (similarity.py): idf = ln(1 + (N - df + 0.5)/(df + 0.5)),
    score = Σ_t idf(t) · tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl)).

    Scale shape: one explode pass over the corpus feeds BOTH the per-doc
    length agg and the per-(doc, query-term) tf agg — the isin filter on
    query terms prunes the tf side to O(matching docs) BEFORE its shuffle.
    Document frequency and the (N, avgdl) scalars are O(|query|) and O(1)
    frames joined back by broadcast, and the final top-n is
    TakeOrderedAndProject. No score for a doc containing no query term
    (BM25 gives it 0 — it never enters the tf frame at all).

    ``quantize=None`` (default) sums raw double contributions. With
    ``quantize=d`` each per-(doc, term) contribution is rounded to d
    decimals and summed EXACTLY in decimal — the score's float dependence
    is then confined to the single per-term rounding, making the result
    independent of Spark's partial-aggregation order and hash-comparable
    against a SQL oracle (ln agrees across engines to ~1 ulp, ~6 orders
    of magnitude inside the rounding grid)."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    ).filter(F.col("term") != "")
    # persist the two SMALL aggregates (one row per doc / per (doc, term)):
    # dl feeds both the corpus-stats agg and the final join, tf feeds both
    # the df agg and the final join — without persist each consumer
    # re-tokenizes the whole corpus (4 passes instead of 2). The exploded
    # token frame itself is deliberately NOT persisted: at 100 TB it is
    # larger than the corpus; two streaming passes beat materializing it.
    # r14: lazy localCheckpoint, not persist — same materialize-once
    # effect without the columnar cache write (measured pattern: KN A/B
    # persist 3.04 s vs checkpoint 2.17 s), and the lineage cut keeps
    # each reader's plan from re-inlining the corpus tokenization
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl")).transform(materialize)
    stats = dl.agg(
        F.avg("dl").alias("avgdl"), F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    tf = (
        toks.filter(F.col("term").isin(*query_terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .transform(materialize)
    )
    dfreq = tf.groupBy("term").agg(F.count(F.lit(1)).cast("double").alias("df"))
    idf = F.log(
        F.lit(1.0) + (F.col("n_docs") - F.col("df") + 0.5) / (F.col("df") + 0.5)
    )
    norm_tf = (F.col("tf") * (k1 + 1)) / (
        F.col("tf") + k1 * (1 - b + b * F.col("dl") / F.col("avgdl"))
    )
    contrib = idf * norm_tf
    if quantize is not None:
        contrib = F.round(contrib, quantize).cast(f"decimal(20,{quantize})")
    score = F.sum(contrib).alias("score")
    out = (
        tf.join(F.broadcast(dfreq), "term")
        .join(dl, id_col)
        .crossJoin(F.broadcast(stats))
        .groupBy(id_col)
        .agg(score)
    )
    if quantize is not None:
        out = out.select(id_col, F.col("score").cast("double").alias("score"))
    return out.orderBy(F.col("score").desc(), id_col).limit(top_n)


def sparse_cosine_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 3,
    max_df: int = 100,
    text_col: str = "text",
    id_col: str = "doc_id",
    quantize: int = 9,
) -> DataFrame:
    """Doc-to-doc cosine top-k over SPARSE tf-idf vectors via an inverted
    index — the classic all-pairs similarity search (Bayardo et al.,
    WWW'07): candidate pairs exist only where a term co-occurs, and the
    df cap drops stop-like terms whose postings would otherwise create
    |D|² candidate pairs (the same bound as jaccard_topk_similar's
    max_df; DISCO's prefix-filter family is the tighter refinement).

    Weights w(t,d) = tf · ln(N/df) with ln on the ``quantize`` grid;
    pair dots and vector norms are exact decimal sums of rounded
    products, so the cosine hash-matches a SQL oracle.  Norms are taken
    over the SAME df-capped term space the dots use — the capped space
    IS the similarity definition, not an approximation of it.

    Scale: one tf agg, one O(vocab) df agg, a postings join keyed on the
    term whose worst fan-out is |Q|·max_df per term, and a
    WindowGroupLimit top-k per query."""
    toks = df.select(F.col(id_col).alias("_d"), F.explode(_clean_tokens(text_col)).alias("_t"))
    tf = toks.groupBy("_d", "_t").agg(F.count(F.lit(1)).alias("_tf"))
    dfreq = tf.groupBy("_t").agg(F.count(F.lit(1)).alias("_df")).filter(F.col("_df") <= max_df)
    n_docs = df.select(F.countDistinct(id_col).alias("_n"))
    posts = (
        tf.join(dfreq, "_t")
        .crossJoin(F.broadcast(n_docs))
        .select(
            "_t",
            "_d",
            (
                F.col("_tf")
                * F.round(F.log(F.col("_n").cast("double") / F.col("_df")), quantize)
            ).alias("_w"),
        )
    )
    dsum = lambda c, p=24: F.sum(F.round(c, quantize).cast(f"decimal({p},{quantize})")).cast("double")  # noqa: E731
    norms = posts.groupBy("_d").agg(F.sqrt(dsum(F.col("_w") * F.col("_w"))).alias("_norm"))
    qids = queries.select(F.col(id_col).alias("_q"))
    qposts = posts.join(qids, posts["_d"] == qids["_q"]).select(
        "_t", F.col("_q"), F.col("_w").alias("_wq")
    )
    dots = (
        qposts.join(posts, "_t")
        .filter(F.col("_d") != F.col("_q"))
        .groupBy("_q", "_d")
        .agg(dsum(F.col("_wq") * F.col("_w")).alias("_dot"))
    )
    scored = (
        dots.join(norms.withColumnRenamed("_d", "_q").withColumnRenamed("_norm", "_nq"), "_q")
        .join(norms, "_d")
        .select(
            F.col("_q").alias("query_id"),
            F.col("_d").alias(id_col),
            F.round(F.col("_dot") / (F.col("_nq") * F.col("_norm")), quantize).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.col("cosine").desc(), F.col(id_col).asc())
    return scored.withColumn("_rn", F.row_number().over(w)).filter(F.col("_rn") <= k).drop("_rn")
