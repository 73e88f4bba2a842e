"""Text-analysis operators for large-scale training-data pipelines.

All hot-path expressions are JVM built-ins (whole-stage codegen eligible) —
no Python UDFs — so they run at full scan speed on 100 TB of documents.
The reference has no text operators at all (SURVEY.md §2.4); these extend
its extract path (reference extract/data.clj:29-37) with the operations an
LLM data pipeline needs over a `documents(text)` table.

Engine-agreement note: everything here is per-row arithmetic on identical
inputs, so results match a SQL oracle bitwise (see workloads package doc).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from comlake_core_spark.session import ensure_parallelism

# Tiny deterministic stopword list per language bucket; enough for a
# ratio-based heuristic without shipping a model.
STOPWORDS = ("the", "a", "of", "and", "to", "in", "is", "it")

# Marker words for the n-gram/keyword language-ID heuristic. Real pipelines
# plug fasttext/cld3 here via mapInPandas; the heuristic keeps the operator
# dependency-free and deterministic.
LANG_MARKERS = {
    "en": ("the", "and", "of", "is"),
    "de": ("der", "die", "und", "ist"),
    "fr": ("le", "la", "et", "est"),
    "es": ("el", "la", "y", "es"),
    "zh": (),  # CJK detected by script, not stopwords
}


def tokens(text: Column | str) -> Column:
    """Whitespace tokenization of trimmed text (split on runs of spaces)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(F.trim(c), r"\s+")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def bpe_ish_token_count(text: Column | str) -> Column:
    """Approximate subword token count: words plus digit runs plus
    punctuation marks, the usual ~heuristic for budgeting LLM token costs
    without a tokenizer dependency."""
    c = F.col(text) if isinstance(text, str) else text
    words = F.size(F.split(F.trim(c), r"\s+"))
    # every 4 chars beyond the first of a long word adds ~1 subword token
    extra = (F.length(c) - words) / F.lit(16.0)
    return (words + F.floor(extra)).cast("long")


def stopword_ratio(text: Column | str, stopwords: tuple[str, ...] = STOPWORDS) -> Column:
    toks = tokens(text)
    sw = F.array(*[F.lit(s) for s in stopwords])
    n_sw = F.size(F.filter(toks, lambda t: F.array_contains(sw, F.lower(t))))
    return n_sw.cast("double") / F.size(toks)


def punct_ratio(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    stripped = F.regexp_replace(c, r"[.,;:!?'\"()\[\]{}-]", "")
    return (F.length(c) - F.length(stripped)).cast("double") / F.length(c)


def avg_token_len(text: Column | str) -> Column:
    toks = tokens(text)
    total = F.aggregate(toks, F.lit(0), lambda acc, t: acc + F.length(t))
    return total.cast("double") / F.size(toks)


def quality_score(text: Column | str) -> Column:
    """Composite heuristic quality score in [0, 1]: rewards mid-length docs
    with natural stopword density and low punctuation noise.  Weights are
    arbitrary but fixed; pipelines filter on a threshold."""
    c = F.col(text) if isinstance(text, str) else text
    n = token_count(c).cast("double")
    length_term = F.least(n / F.lit(100.0), F.lit(1.0))
    sw_term = F.least(stopword_ratio(c) * 4, F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct_ratio(c) * 10, F.lit(1.0))
    return (length_term * 0.4 + sw_term * 0.3 + punct_term * 0.3).alias("quality")


def lang_id(text: Column | str) -> Column:
    """Marker-word / script language-ID heuristic → 2-letter code or 'und'.

    CJK by Unicode-script regex; otherwise the language whose marker words
    hit most tokens wins (ties broken by fixed language order)."""
    c = F.col(text) if isinstance(text, str) else text
    toks = tokens(c)

    def hits(lang: str) -> Column:
        markers = F.array(*[F.lit(m) for m in LANG_MARKERS[lang]])
        return F.size(F.filter(toks, lambda t: F.array_contains(markers, F.lower(t))))

    is_cjk = c.rlike(r"[一-鿿]")
    en, de, fr, es = hits("en"), hits("de"), hits("fr"), hits("es")
    best = F.greatest(en, de, fr, es)
    return (
        F.when(is_cjk, F.lit("zh"))
        .when(best == 0, F.lit("und"))
        .when(en == best, F.lit("en"))
        .when(de == best, F.lit("de"))
        .when(fr == best, F.lit("fr"))
        .otherwise(F.lit("es"))
    )


def fingerprint(text: Column | str) -> Column:
    """Deterministic document fingerprint: md5 of whitespace-normalized
    lowercased text.  md5 is identical across Spark and any SQL oracle,
    making this the canonical exact-dedup key."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(F.regexp_replace(F.lower(F.trim(c)), r"\s+", " "))


def winnow_fingerprints(
    text: Column | str, k: int = 8, w: int = 4, hasher: str = "xxhash64"
) -> Column:
    """Winnowing document fingerprints (Schleimer, Wilkerson & Aiken,
    SIGMOD 2003): hash every character k-gram of the normalized text, then
    keep the minimum hash of each window of w consecutive k-grams, distinct.
    Guarantee: any match of at least w+k-1 normalized characters between two
    documents yields at least one shared fingerprint, so the selected set is
    a position-robust sketch for substring-level near-dup detection —
    stronger than the whole-document md5 `fingerprint` (one edit anywhere
    changes that) and finer-grained than MinHash over word shingles.

    Entirely JVM-side — `transform` over a `sequence` of positions with
    `xxhash64` k-gram hashing, then windowed `array_min` — so at 100 TB this
    is a map-only job: no shuffle, no Python workers. (We take the per-window
    min *value* rather than the paper's rightmost-min tiebreak; the coverage
    guarantee is unchanged.)

    The normalized text and the gram array are bound ONCE via the
    expression-level let `transform(array(x), f)[0]`: Catalyst does no
    common-subexpression elimination across lambda bodies, so inlining the
    gram array into the window lambda would re-evaluate it (regex included)
    per window position — O(n^2) per document instead of O(n*w).

    ``hasher``: 'xxhash64' (default — fastest, a JVM intrinsic) or 'md5'
    (first 15 hex chars of md5 as a base-16 long; slower but md5 has an
    identical twin in DuckDB, so an md5-mode run is SQL-oracle-checkable
    end to end — same selection logic, swapped hash primitive)."""
    c = F.col(text) if isinstance(text, str) else text
    empty = F.array().cast("array<bigint>")
    if hasher == "xxhash64":
        gram_hash = lambda g: F.xxhash64(g)  # noqa: E731
    elif hasher == "md5":
        gram_hash = lambda g: F.conv(F.substring(F.md5(g), 1, 15), 16, 10).cast("long")  # noqa: E731
    else:
        raise ValueError(f"unknown hasher {hasher!r}")

    def _bind(col: Column, f) -> Column:
        return F.transform(F.array(col), f)[0]

    def _grams(nm: Column) -> Column:
        n = F.length(nm)
        return F.when(
            n >= k,
            F.transform(
                F.sequence(F.lit(1), n - k + 1),
                lambda i: gram_hash(nm.substr(i, F.lit(k))),
            ),
        ).otherwise(empty)

    def _select(g: Column) -> Column:
        m = F.size(g)
        return (
            F.when(
                m >= w,
                F.array_distinct(
                    F.transform(
                        F.sequence(F.lit(1), m - w + 1),
                        lambda j: F.array_min(F.slice(g, j, w)),
                    )
                ),
            )
            .when(m > 0, F.array(F.array_min(g)))
            .otherwise(empty)
        )

    norm = F.regexp_replace(F.lower(c), r"[^a-z0-9]+", "")
    return _bind(norm, lambda nm: _bind(_grams(nm), _select))


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
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf")).persist()
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
    dl = toks.groupBy(id_col).agg(F.count(F.lit(1)).alias("dl")).persist()
    stats = dl.agg(
        F.avg("dl").alias("avgdl"), F.count(F.lit(1)).cast("double").alias("n_docs")
    )
    tf = (
        toks.filter(F.col("term").isin(*query_terms))
        .groupBy(id_col, "term")
        .agg(F.count(F.lit(1)).alias("tf"))
        .persist()
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


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style within-document repetition metrics: token count,
    distinct-token count, the most frequent token's count, and a
    repetition flag (over half the tokens are repeats, or one token is
    more than 20% of the document). All metrics are integers and the flag
    is integer cross-multiplication — no FP, so the SQL oracle matches
    bitwise.

    Scale shape: explode → (doc, token) count with map-side partial
    aggregation (the combine collapses each partition's duplicates before
    the shuffle, so shuffle volume is per-partition-distinct tokens, not
    raw tokens), then a doc-level roll-up whose input is already tiny.
    A row-local alternative (aggregate over array_distinct) avoids both
    shuffles but is O(n²) per document — wrong for long documents.
    """
    tok = df.select(
        F.col(id_col),
        F.explode(tokens(F.lower(F.trim(F.col(text_col))))).alias("_tok"),
    ).filter(F.col("_tok") != "")
    per = tok.groupBy(id_col, "_tok").agg(F.count(F.lit(1)).alias("_c"))
    return per.groupBy(id_col).agg(
        F.sum("_c").alias("n_tokens"),
        F.count(F.lit(1)).alias("n_distinct"),
        F.max("_c").alias("max_token_count"),
        (
            (2 * F.count(F.lit(1)) < F.sum("_c"))
            | (5 * F.max("_c") > F.sum("_c"))
        ).alias("is_repetitive"),
    )


def text_stats(df: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """One-pass per-document stats frame — single scan, codegen'd, no
    shuffle; at 100 TB this is a map-only job."""
    return df.select(
        id_col,
        token_count(text_col).alias("n_tokens"),
        F.length(text_col).alias("n_chars_computed"),
        avg_token_len(text_col).alias("avg_token_len"),
        stopword_ratio(text_col).alias("stopword_ratio"),
        punct_ratio(text_col).alias("punct_ratio"),
        fingerprint(text_col).alias("fingerprint"),
    )


# ---------------------------------------------------------------------------
# PII redaction
# ---------------------------------------------------------------------------

# Conservative RE2-and-Java-compatible patterns (no backrefs, no lookaround)
# so the same regex runs in Spark (java.util.regex), DuckDB (RE2), and any
# other engine a pipeline pairs this with.
PII_PATTERNS: dict[str, str] = {
    "email": r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}",
    # TPC-H-style international phone: 12-345-678-9012
    "phone": r"[0-9]{2}-[0-9]{3,4}-[0-9]{3,4}-[0-9]{4}",
    "ipv4": r"[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}\.[0-9]{1,3}",
}


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    patterns: dict[str, str] | None = None,
    token: str = "[PII]",
) -> DataFrame:
    """Redact PII spans from a text column and report per-category match
    counts — the scrub step a training-data pipeline runs before anything
    leaves the lake. Categories apply in sorted-name order (deterministic:
    an email's digits must not first be half-eaten by the phone pattern —
    order is part of the contract).

    Scale shape: map-only — every regexp_replace / regexp_count is a
    codegen'd JVM expression over the single scan; no shuffle, no Python.
    """
    pats = dict(sorted((patterns or PII_PATTERNS).items()))
    red = F.col(text_col)
    counts = []
    for name, pat in pats.items():
        counts.append(F.regexp_count(F.col(text_col), F.lit(pat)).alias(f"n_{name}"))
        red = F.regexp_replace(red, pat, token)
    return df.select(F.col(id_col), *counts, red.alias("redacted"))


# ---------------------------------------------------------------------------
# Document chunking + sequence packing (training-data prep)
# ---------------------------------------------------------------------------


def chunk_documents(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    chunk_chars: int = 500,
    overlap: int = 100,
) -> DataFrame:
    """Split each document into fixed-size overlapping character chunks —
    the preprocessing step every pretraining / RAG pipeline runs before
    tokenization. Chunk i starts at 1 + i*(chunk_chars - overlap); every
    chunk is substr(start, chunk_chars), so consecutive chunks share
    ``overlap`` characters and no text is lost (the last chunk may be
    short). Empty documents produce one empty chunk (start=1), keeping the
    row-per-document invariant auditable downstream.

    Map-only: sequence + posexplode + substring, all codegen'd JVM
    expressions — at 100 TB this is a pure scan with row fanout
    ~len/(chunk_chars-overlap), no shuffle."""
    if overlap >= chunk_chars:
        raise ValueError("overlap must be smaller than chunk_chars")
    step = chunk_chars - overlap
    c = F.col(text_col)
    starts = F.sequence(F.lit(1), F.greatest(F.length(c), F.lit(1)), F.lit(step))
    out = df.select(
        F.col(id_col),
        F.posexplode(starts).alias("chunk_idx", "_start"),
        c.alias("_txt"),
    )
    return out.select(
        id_col,
        "chunk_idx",
        F.substring(F.col("_txt"), F.col("_start"), chunk_chars).alias("chunk_text"),
        F.length(F.substring(F.col("_txt"), F.col("_start"), chunk_chars)).alias("chunk_len"),
    )


def pack_sequences(
    df: DataFrame,
    id_col: str | list[str] = "doc_id",
    token_count: Column | str = "n_tokens",
    budget: int = 2048,
) -> DataFrame:
    """Assign documents to fixed-capacity training packs: documents are
    taken in ``id_col`` order and pack_id = floor(tokens-before-me /
    budget) — the deterministic bin assignment a distributed packer uses
    when exact greedy reset-on-overflow would need a sequential scan
    (packs can exceed budget by at most one document's tokens; the exact
    stateful variant is streaming/budget.py's admission control).

    One shuffle (the global running sum's range partitioning); everything
    else is map-side. At 100 TB, pack WITHIN shards (add the shard to the
    window partition) so no global ordering is needed."""
    ids = [id_col] if isinstance(id_col, str) else list(id_col)
    tok = F.col(token_count) if isinstance(token_count, str) else token_count
    w = Window.orderBy(*[F.col(c) for c in ids]).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    cum_incl = F.sum(tok).over(w)
    return df.select(
        *[F.col(c) for c in ids],
        tok.cast("long").alias("n_tokens"),
        ((cum_incl - tok) / F.lit(budget)).cast("long").alias("pack_id"),
        (cum_incl - tok).cast("long").alias("tokens_before"),
    )


def ngram_novelty(
    df: DataFrame,
    n: int = 8,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Sub-document novelty: the fraction of a document's distinct word
    n-grams that occur in NO other document — the pretraining-corpus
    signal behind 'dedup at paragraph granularity' (a doc full of
    boilerplate n-grams scores near 0 even when no whole-doc near-dup
    exists; RefinedWeb / Gopher both filter on it).

    Plan: grams stay row-local (sequence+transform, no UDF) until ONE
    explode. The trick that kills the join-back: a gram with df == 1 has
    exactly ONE owner, so carrying min(doc_id) through the same
    document-frequency aggregation identifies it — the big exploded frame
    shuffles ONCE (the df agg); everything after operates on per-gram and
    per-doc frames. n_grams is a map-only array size. At 100 TB: the df
    agg is map-combined on a near-uniform key (the gram), the unique-gram
    frame re-aggregates to |docs| rows, and the final join is per-doc ×
    per-doc — a first draft that joined the exploded frame back to the
    df table measured 7.0 s at sf0.1; this shape runs ~2×."""
    from comlake_core_spark.session import ensure_parallelism

    df = ensure_parallelism(df)
    toks = tokens(F.col(text_col))
    idx = F.sequence(F.lit(1), F.greatest(F.size(toks) - (n - 1), F.lit(1)))
    grams = F.array_distinct(F.transform(idx, lambda i: F.array_join(F.slice(toks, i, n), " ")))
    sizes = df.select(F.col(id_col), F.size(grams).alias("n_grams"))
    uniq = (
        df.select(F.col(id_col), F.explode(grams).alias("_g"))
        .groupBy("_g")
        .agg(F.count(F.lit(1)).alias("_df"), F.min(id_col).alias("_owner"))
        .filter(F.col("_df") == 1)
        .groupBy(F.col("_owner").alias(id_col))
        .agg(F.count(F.lit(1)).alias("n_unique"))
    )
    return sizes.join(uniq, id_col, "left").select(
        id_col,
        "n_grams",
        F.coalesce(F.col("n_unique"), F.lit(0)).cast("long").alias("n_unique"),
        (
            F.coalesce(F.col("n_unique"), F.lit(0)).cast("double") / F.col("n_grams")
        ).alias("novelty"),
    )


def unigram_logprob(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    quantize: int = 9,
) -> DataFrame:
    """Per-document average token log-probability under the corpus's own
    unigram language model — the CCNet-style fluency/quality signal
    (documents full of rare junk tokens score far below well-formed prose;
    filter or re-weight by it before pretraining).

    score(doc) = (1/|doc|) Σ_t ln(count(t)/total_tokens)

    Scale shape: ONE explode pass feeds both the vocab count agg and the
    per-doc re-agg; the token→vocab join is on the term itself (near-
    uniform key, no broadcast needed — vocab at web scale exceeds a
    broadcast). The ln lands on a ``quantize``-decimal grid and the
    per-doc sum is exact decimal, so the result is independent of
    partial-aggregation order and hash-comparable to a SQL oracle (same
    discipline as bm25_search's quantize)."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("term")
    ).filter(F.col("term") != "")
    vocab = toks.groupBy("term").agg(F.count(F.lit(1)).alias("_c")).persist()
    total = vocab.agg(F.sum("_c").cast("double").alias("_t"))
    contrib = F.round(F.log(F.col("_c").cast("double") / F.col("_t")), quantize).cast(
        f"decimal(20,{quantize})"
    )
    return (
        toks.join(vocab, "term")
        .crossJoin(F.broadcast(total))
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(contrib).alias("_lp"),
        )
        .select(
            id_col,
            "n_tokens",
            (F.col("_lp").cast("double") / F.col("n_tokens")).alias("avg_logprob"),
        )
    )


def feature_hashing(
    df: DataFrame,
    n_features: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Hashing-trick vectorization (Weinberger et al., ICML 2009; sklearn
    HashingVectorizer): token → bucket = md5(token) mod D, counts per
    bucket — the fixed-width sparse feature vector a downstream linear
    model or clustering step consumes, with no vocabulary to build,
    broadcast, or keep consistent across 100 TB (THE reason the trick
    exists at scale: vectorization becomes embarrassingly parallel).

    md5 (not xxhash64) so bucket assignment has an exact DuckDB/PostgreSQL
    twin — same portability argument as sampling.split_assignment_portable.
    Emits per-doc summary scalars of the sparse vector (nnz, l1, exact l2²
    and a bucket-weighted checksum) rather than the vector itself — the
    driver canonicalizer hashes scalars, and the summaries pin every bucket
    count exactly.

    Plan: explode → map-combined shuffle on (doc, bucket) → per-doc
    re-agg (second, much smaller exchange: ≤ D rows per doc). No
    vocabulary state anywhere."""
    toks = df.select(
        F.col(id_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("_t")
    ).filter(F.col("_t") != "")
    bucket = F.conv(F.substring(F.md5("_t"), 1, 15), 16, 10).cast("long") % n_features
    per_bucket = toks.select(F.col(id_col), bucket.alias("_b")).groupBy(id_col, "_b").agg(
        F.count(F.lit(1)).alias("_cnt")
    )
    return per_bucket.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("nnz"),
        F.sum("_cnt").cast("long").alias("l1"),
        F.sum(F.col("_cnt") * F.col("_cnt")).cast("long").alias("l2_sq"),
        F.sum(F.col("_b") * F.col("_cnt")).cast("long").alias("checksum"),
    )


# Gopher document-quality stop set (Rae et al. 2021, arXiv:2112.11446
# §A1.1): a document must contain at least 2 of these to pass the
# "contains common English words" rule.
GOPHER_STOPWORDS = ("the", "be", "to", "of", "and", "that", "have", "with")


def gopher_quality(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style document quality rules (Rae et al. 2021,
    arXiv:2112.11446 §A1.1; the same family FineWeb/Dolma apply before
    pretraining): per-document word count bounds, mean word length
    bounds, alphabetic-word fraction, and a common-stopword floor, plus
    the composite keep decision.

    All rules are per-row Column arithmetic over one whitespace
    tokenization — map-only, whole-stage codegen, zero shuffles: at
    100 TB this runs at scan speed and the keep flag prunes the corpus
    before any downstream (dedup/pack) stage pays for rejected docs.
    Thresholds follow the paper: 50 <= words <= 100_000,
    3 <= mean_word_len <= 10, >= 80% words with an alphabetic char,
    >= 2 distinct hits... counted as TOTAL stopword occurrences here
    (both engines agree; the paper is ambiguous and total-hits is the
    common reimplementation).  `keep` is INT 0/1 so the driver
    canonicalizer sees a scalar."""
    t = tokens(text_col)
    wc = F.size(t)
    sum_len = F.aggregate(
        F.transform(t, lambda w: F.length(w)), F.lit(0), lambda a, x: a + x
    )
    mean_wl = F.round(sum_len.cast("double") / wc, 6)
    alpha = F.size(F.filter(t, lambda w: w.rlike("[a-zA-Z]")))
    alpha_frac = F.round(alpha.cast("double") / wc, 6)
    stop_hits = F.size(
        F.filter(t, lambda w: F.lower(w).isin(*GOPHER_STOPWORDS))
    )
    keep = (
        wc.between(50, 100_000)
        & mean_wl.between(3.0, 10.0)
        & (alpha_frac >= 0.8)
        & (stop_hits >= 2)
    )
    return df.select(
        F.col(id_col),
        wc.alias("word_count"),
        mean_wl.alias("mean_word_len"),
        alpha_frac.alias("alpha_word_frac"),
        stop_hits.cast("int").alias("stop_hits"),
        keep.cast("int").alias("keep"),
    )


def normalize_url(url: Column | str) -> Column:
    """Canonicalize a URL for exact URL-level deduplication (the first
    dedup stage of every web-corpus pipeline — CCNet/RefinedWeb dedup by
    normalized URL before any content pass): lowercase, drop the
    `www.` host prefix, strip tracking query parameters (`utm_*`,
    `ref`), and trim dangling `?`/`&` separators.  Pure per-row string
    ops — codegen'd, shuffle-free; the groupBy on the normalized key is
    the only exchange a URL-dedup pass needs."""
    c = F.col(url) if isinstance(url, str) else url
    u = F.lower(c)
    u = F.regexp_replace(u, r"://www\.", "://")
    u = F.regexp_replace(u, r"(utm_[a-z]+|ref)=[^&]*&?", "")
    return F.regexp_replace(u, r"[?&]+$", "")


def js_divergence_by_group(
    df: DataFrame,
    group_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    buckets: int = 1024,
    scale: int = 10**12,
) -> DataFrame:
    """Distribution drift per group: Jensen-Shannon divergence between
    each group's hashed-unigram token distribution and the whole
    corpus's — the mixture-weighting / domain-shift diagnostic a corpus
    curator reads before setting sampling ratios (a source whose JS is
    near 0 adds nothing new; a high-JS source shifts the mix). JS (not
    KL) because it is symmetric, bounded by ln 2, and defined even where
    a group is missing tokens the corpus has.

    Token distributions are over `buckets` hashed unigram buckets (the
    DSIR feature space): the comparison is O(groups × buckets) whatever
    the vocabulary size — the property that makes this computable at
    100 TB, where a raw-vocab JS would join every group against a
    billion-term dictionary.

    Returns (group, n_tokens, js_q, js) with js_q the divergence in
    1/`scale` units (nats).

    Exactness bridge: each (group, bucket) contribution
    0.5·[p·ln(p/m) + q·ln(q/m)] is computed from integer counts (the
    doubles p, q, m are exact-rational-derived, identical in both
    engines) and quantized to an integer immediately, so the per-group
    sum is exact integer addition — order-free, oracle-reproducible.

    Plan: one map-combined aggregate to (group, bucket) counts (≤
    groups×buckets rows), one to bucket totals (≤ buckets rows,
    broadcast), the group×bucket frame is built by joining the dense
    bucket list (broadcast) so zero-count buckets contribute q·ln 2
    correctly, then one map-combined sum per group. No corpus-sized
    shuffle anywhere — the exchanges carry count tables only."""
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    tok = df.select(F.col(group_col).alias("_g"), F.explode(toks).alias("_term")).withColumn(
        "_b",
        F.pmod(
            F.conv(F.substring(F.md5(F.col("_term")), 1, 8), 16, 10).cast("long"),
            F.lit(buckets),
        ),
    )
    # ONE corpus pass builds the (group, bucket) count table; bucket
    # totals, group totals, and the grand total are all rollups of that
    # groups×buckets-row table (a naive four-aggregate version scans the
    # corpus four times)
    gb = tok.groupBy("_g", "_b").agg(F.count(F.lit(1)).alias("_c")).localCheckpoint(eager=False)
    bt = gb.groupBy("_b").agg(F.sum("_c").alias("_cb"))
    gt = gb.groupBy("_g").agg(F.sum("_c").alias("_ng"))
    n_all = gb.groupBy().agg(F.sum("_c").alias("_n"))
    # dense (group × corpus-bucket) frame: absent cells have p = 0 but a
    # real q — they still contribute 0.5·q·ln 2 to the divergence
    frame = gt.crossJoin(F.broadcast(bt)).crossJoin(F.broadcast(n_all))
    cells = frame.join(gb, ["_g", "_b"], "left").select(
        "_g",
        "_ng",
        (F.coalesce(F.col("_c"), F.lit(0)) / F.col("_ng")).alias("_p"),
        (F.col("_cb") / F.col("_n")).alias("_q"),
    )
    m = (F.col("_p") + F.col("_q")) / 2
    contrib = (
        F.when(F.col("_p") > 0, F.col("_p") * F.log(F.col("_p") / m)).otherwise(F.lit(0.0))
        + F.col("_q") * F.log(F.col("_q") / m)
    ) / 2
    return (
        cells.select("_g", "_ng", F.round(contrib * scale, 0).cast("long").alias("_jq"))
        .groupBy("_g", "_ng")
        .agg(F.sum("_jq").alias("js_q"))
        .select(
            F.col("_g").alias(group_col),
            F.col("_ng").cast("long").alias("n_tokens"),
            "js_q",
            F.round(F.col("js_q") / F.lit(float(scale)), 9).alias("js"),
        )
    )


def bpe_merges(
    df: DataFrame,
    text_col: str = "text",
    merges: int = 3,
    end_marker: str = "</w>",
) -> DataFrame:
    """Byte-pair-encoding tokenizer TRAINING (Sennrich et al. 2016, the
    algorithm behind GPT/Llama vocabularies): learn the first `merges`
    merge rules from the corpus — repeatedly count adjacent symbol pairs
    over the word-frequency table and fuse the most frequent pair.
    Returns one row per learned merge: (merge_rank, pair, new_symbol,
    pair_count), the head of the merges.txt a real tokenizer ships.

    Scale shape — the reason BPE training is feasible at 100 TB: after
    ONE corpus pass builds the word-frequency table, every merge round
    runs over the DISTINCT-WORD dictionary (vocabulary-sized, millions
    of rows, weighted by count), not the corpus. Rounds are: map-side
    pair explode over the dictionary → one map-combined count shuffle →
    a 1-row argmax broadcast → map-side string replace. The dictionary
    is localCheckpoint'd so round k does not re-run rounds 1..k-1's
    replaces from the corpus scan.

    Symbol sequences are DOUBLE-space delimited and the merge rewrite
    matches ' s1  s2 ' (single boundary space each side): adjacent
    occurrences then never share matched characters, so plain
    left-to-right non-overlapping replace() merges EVERY eligible pair
    in one pass, greedy-leftmost on self-overlapping runs ('b b b' →
    'bb b') — exactly reference BPE. With single-space delimiters the
    second of two adjacent matches loses its leading space to the first
    match and is silently skipped (caught by test: 'ababab' must become
    'ab ab ab', not 'ab a b ab').

    Determinism: counts are integers; the argmax tie-breaks on the pair
    string (binary collation in both engines); replace() scan order is
    byte-identical in Spark and DuckDB, pinned by test."""
    out, _cur = _bpe_chain(df, text_col, merges, end_marker)
    return out


def _bpe_chain(df, text_col, merges, end_marker):
    """Shared BPE merge loop: returns (merge-rule rows, the final
    word→symbol-sequence dictionary) so training (bpe_merges) and
    application (bpe_fertility) run the identical chain."""
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    words = (
        df.select(F.explode(toks).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    # "t  e  s  t  </w>": double-space-delimited symbols + end marker
    seq0 = F.concat(
        F.trim(F.regexp_replace(F.col("word"), "(.)", "$1  ")),
        F.lit("  " + end_marker),
    )
    cur = words.select("word", seq0.alias("seq"), "cnt").localCheckpoint(eager=False)
    out = None
    for rank in range(1, merges + 1):
        arr = F.split(F.col("seq"), "  ")
        # guard single-symbol sequences: sequence(0, -1) DESCENDS in Spark,
        # which would index element_at(arr, 0) and throw
        pairs = F.when(
            F.size(arr) >= 2,
            F.transform(
                F.sequence(F.lit(0), F.size(arr) - 2),
                lambda i: F.concat(
                    F.element_at(arr, i + 1), F.lit(" "), F.element_at(arr, i + 2)
                ),
            ),
        ).otherwise(F.array().cast("array<string>"))
        counted = (
            cur.select(F.explode(pairs).alias("pair"), "cnt")
            .groupBy("pair")
            .agg(F.sum("cnt").alias("total"))
        )
        best = counted.orderBy(F.desc("total"), F.asc("pair")).limit(1)
        row = best.select(
            F.lit(rank).cast("long").alias("merge_rank"),
            "pair",
            F.replace(F.col("pair"), F.lit(" "), F.lit("")).alias("new_symbol"),
            F.col("total").cast("long").alias("pair_count"),
        )
        out = row if out is None else out.unionByName(row)
        if rank <= merges:
            # pattern ' s1  s2 ' → ' s1s2 ': boundary spaces are shared
            # with neighbors' delimiters, interior double space is the
            # pair's own — adjacent matches stay disjoint
            cur = cur.crossJoin(F.broadcast(best)).select(
                "word",
                F.trim(
                    F.replace(
                        F.concat(F.lit(" "), F.col("seq"), F.lit(" ")),
                        F.concat(
                            F.lit(" "),
                            F.replace(F.col("pair"), F.lit(" "), F.lit("  ")),
                            F.lit(" "),
                        ),
                        F.concat(
                            F.lit(" "),
                            F.replace(F.col("pair"), F.lit(" "), F.lit("")),
                            F.lit(" "),
                        ),
                    )
                ).alias("seq"),
                "cnt",
            ).localCheckpoint(eager=False)
    return out, cur


def bpe_fertility(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "lang",
    merges: int = 3,
    end_marker: str = "</w>",
) -> DataFrame:
    """Tokenizer train→APPLY loop: learn `merges` BPE rules on the whole
    corpus (the identical chain as bpe_merges), encode every word with
    them, and report per-group FERTILITY — subword tokens per word, the
    standard metric for how well a shared vocabulary serves each
    language (high fertility = the language pays more sequence length
    per word; the number tokenizer papers tabulate per language).

    Returns (group, n_words, n_subword_tokens, fertility_micro) with
    fertility_micro = tokens·1e6 div words (exact integer).

    Plan: the merge chain runs over the global word dictionary (see
    bpe_merges); application is a hash join of the per-group word counts
    against that dictionary (vocabulary-sized, shuffle on the word key —
    broadcastable when the dict fits) followed by one map-combined
    aggregate per group. The corpus is scanned twice total: once for the
    global dictionary, once for the per-group counts."""
    _rules, final_dict = _bpe_chain(df, text_col, merges, end_marker)
    toks = F.filter(
        F.split(F.trim(F.lower(F.col(text_col))), r"\s+"), lambda t: t != ""
    )
    grp_words = (
        df.select(F.col(group_col).alias("_grp"), F.explode(toks).alias("word"))
        .groupBy("_grp", "word")
        .agg(F.count(F.lit(1)).alias("_gc"))
    )
    encoded = final_dict.select(
        "word", F.size(F.split(F.col("seq"), "  ")).cast("long").alias("_ntok")
    )
    return (
        grp_words.join(encoded, "word")
        .groupBy("_grp")
        .agg(
            F.sum("_gc").alias("n_words"),
            F.sum(F.col("_gc") * F.col("_ntok")).alias("n_subword_tokens"),
        )
        .select(
            F.col("_grp").alias(group_col),
            "n_words",
            "n_subword_tokens",
            F.expr("(n_subword_tokens * 1000000) div n_words").alias("fertility_micro"),
        )
    )


# ---------------------------------------------------------------------------
# vocabulary OOV rate
# ---------------------------------------------------------------------------


def oov_rate(
    df: DataFrame,
    vocab_size: int = 20,
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Out-of-vocabulary rate per source against a frequency-pruned
    vocabulary: build the top-`vocab_size` tokens by global count
    (deterministic tie-break on the token string), then measure what
    fraction of each source's token stream falls outside it — the number
    a tokenizer/vocab decision is validated with before committing a
    vocabulary for a 100 TB corpus (a source with a high OOV rate will
    fragment into subwords or <unk>s).

    Returns (source, n_tokens, n_oov, n_distinct_oov, oov_rate) with
    oov_rate = n_oov/n_tokens rounded to 6 decimals (single double
    division — engine-identical).

    Plan: the corpus is exploded ONCE, map-combined straight into
    (source, term) counts and persisted — that table is O(vocab ×
    sources) rows, a vanishing fraction of the token stream, and
    EVERYTHING downstream works off it: the global vocab counts are its
    rollup, top-V is a TakeOrdered over that rollup broadcast back, and
    the per-source metrics re-aggregate the same small table (n_oov sums
    the counts, n_distinct_oov counts its rows — one row per (source,
    term) by construction, no distinct-agg state).  One corpus-sized
    shuffle total; re-deriving the metrics from the raw token stream
    (the first draft) scanned and exploded the corpus twice."""
    per = (
        ensure_parallelism(df)
        .select(
            F.col(source_col), F.explode(tokens(F.lower(F.col(text_col)))).alias("_t")
        )
        .filter(F.col("_t") != "")
        .groupBy(source_col, "_t")
        .agg(F.count(F.lit(1)).alias("_c"))
        .persist()
    )
    top = (
        per.groupBy("_t")
        .agg(F.sum("_c").alias("_gc"))
        .orderBy(F.col("_gc").desc(), F.col("_t").asc())
        .limit(vocab_size)
        .select("_t", F.lit(True).alias("_iv"))
    )
    oov = F.col("_iv").isNull()
    return (
        per.join(F.broadcast(top), "_t", "left")
        .groupBy(source_col)
        .agg(
            F.sum("_c").cast("bigint").alias("n_tokens"),
            F.sum(F.when(oov, F.col("_c")).otherwise(0)).cast("bigint").alias("n_oov"),
            F.sum(F.when(oov, 1).otherwise(0)).cast("bigint").alias("n_distinct_oov"),
        )
        .select(
            source_col,
            "n_tokens",
            "n_oov",
            "n_distinct_oov",
            F.round(F.col("n_oov") / F.col("n_tokens"), 6).alias("oov_rate"),
        )
    )


# ---------------------------------------------------------------------------
# stupid-backoff bigram language model
# ---------------------------------------------------------------------------


def bigram_backoff_logprob(
    score_df: DataFrame,
    lm_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 0.4,
    quantize: int = 9,
) -> DataFrame:
    """Per-document average log-score under a stupid-backoff bigram LM
    (Brants et al., EMNLP 2007 — "Large Language Models in Machine
    Translation") trained on `lm_df` and applied to `score_df` — the
    CCNet recipe: an LM over a curated slice scores candidate documents,
    and the score buckets drive keep/drop/re-weight decisions.  A bigram
    model separates word-salad from prose far better than the unigram
    fluency score (unigram_logprob), and stupid backoff needs no
    discounting state — exactly why it won at web scale.

        S(w|v) = c(vw)/c(v)            if c(vw) > 0
               = alpha * P1(w)         otherwise
        P1(w)  = (c(w)+1)/(N+V+1)      (add-one over the LM vocab; handles OOV)

    First tokens score ln(P1) with no penalty.  Every ln lands on a
    `quantize`-decimal grid and the per-doc sum is exact decimal
    (unigram_logprob's discipline), so the result hash-matches a SQL
    oracle.

    Returns (doc_id, n_tokens, n_backoff, avg_logprob) where n_backoff
    counts scored tokens that fell through to the unigram path.

    Plan: token/bigram count aggs over the LM slice (map-combined, keyed
    on the term — web-scale vocab shuffles, it does not broadcast); the
    scoring side is a MAP-ONLY (pos, term, prev) explode (prev comes
    from the token array itself, no lag window) + three keyed joins onto
    the count tables; totals ride a 1-row broadcast."""
    lowered = F.lower(F.col(text_col))
    toks_arr = F.filter(tokens(lowered), lambda x: x != "")

    lm_toks = ensure_parallelism(lm_df).select(F.explode(toks_arr).alias("_w"))
    uni = lm_toks.groupBy("_w").agg(F.count(F.lit(1)).alias("_c")).persist()
    totals = uni.agg(
        F.sum("_c").cast("double").alias("_n"),
        F.count(F.lit(1)).cast("double").alias("_v"),
    )
    lm_pairs = (
        lm_df.select(toks_arr.alias("_ts"))
        .filter(F.size("_ts") >= 2)
        .select(
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_ts") - 1),
                    lambda i: F.struct(
                        F.element_at("_ts", i).alias("_prev"),
                        F.element_at("_ts", i + 1).alias("_w"),
                    ),
                )
            ).alias("_bg")
        )
        .select("_bg._prev", "_bg._w")
    )
    bi = lm_pairs.groupBy("_prev", "_w").agg(F.count(F.lit(1)).alias("_cb"))

    scored_toks = (
        score_df.select(F.col(id_col), toks_arr.alias("_ts"))
        .filter(F.size("_ts") >= 1)
        .select(
            F.col(id_col),
            F.explode(
                F.transform(
                    F.sequence(F.lit(1), F.size("_ts")),
                    lambda i: F.struct(
                        (i - 1).alias("_pos"),
                        F.element_at("_ts", i).alias("_w"),
                        F.when(i > 1, F.element_at("_ts", i - 1)).alias("_prev"),
                    ),
                )
            ).alias("_tk"),
        )
        .select(id_col, "_tk._pos", "_tk._w", "_tk._prev")
    )
    up = uni.select(F.col("_w").alias("_prev"), F.col("_c").alias("_cp"))
    joined = (
        scored_toks.join(uni, "_w", "left")
        .join(up, "_prev", "left")
        .join(bi, ["_prev", "_w"], "left")
        .crossJoin(F.broadcast(totals))
    )
    p1 = (F.coalesce(F.col("_c"), F.lit(0)).cast("double") + 1.0) / (
        F.col("_n") + F.col("_v") + 1.0
    )
    contrib = F.round(
        F.when(F.col("_pos") == 0, F.log(p1))
        .when(
            F.col("_cb").isNotNull(),
            F.log(F.col("_cb").cast("double") / F.col("_cp").cast("double")),
        )
        .otherwise(F.log(F.lit(alpha) * p1)),
        quantize,
    ).cast(f"decimal(20,{quantize})")
    backoff = F.when(
        (F.col("_pos") > 0) & F.col("_cb").isNull(), 1
    ).otherwise(0)
    return (
        joined.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum(backoff).cast("bigint").alias("n_backoff"),
            F.sum(contrib).alias("_lp"),
        )
        .select(
            id_col,
            "n_tokens",
            "n_backoff",
            (F.col("_lp").cast("double") / F.col("n_tokens")).alias("avg_logprob"),
        )
    )


# ---------------------------------------------------------------------------
# consistent pseudonymization
# ---------------------------------------------------------------------------


def pseudonymize(
    df: DataFrame,
    cols: dict[str, str],
    secret: str = "rotate-me",
    token_len: int = 12,
) -> DataFrame:
    """Consistent (deterministic) pseudonymization: replace each column in
    `cols` with a stable keyed token —

        token = md5(secret ':' domain ':' value)[:token_len]

    Same value → same token, so joins, group-bys, and frequency analyses
    still work on the pseudonymized tables; different `domain` strings
    keep columns un-linkable to each other (the same raw value in two
    domains yields different tokens); rotating `secret` re-keys the whole
    corpus.  This is the GDPR-article-4(5) 'pseudonymisation' shape —
    redaction (pii_redact) destroys analytic utility, pseudonymization
    preserves it while the secret stays out of band.  md5 keyed by
    concatenation is linkability protection against outsiders without the
    secret, not a MAC against adversaries who can query the oracle; for
    the latter swap in HMAC-SHA256 via `sha2` — the plan shape is
    identical.

    `cols` maps column name → domain string (use the same domain for the
    two SIDES of a foreign key — e.g. both customer.c_custkey and
    orders.o_custkey under domain 'custkey' — so referential integrity
    survives).

    NULL stays NULL — tokenizing it would (a) give every missing value
    ONE shared stable token, turning "was NULL" into a linkable
    equivalence class, and (b) make pseudonymized equi-joins MATCH on
    NULL keys where the raw join never did (concat_ws silently skips
    NULLs; the isNotNull guard restores SQL's NULL-propagating `||`
    semantics, which is also what the workload oracle computes).

    Map-only (codegen'd md5 over one scan); a join on the token hashes a
    high-entropy uniformly-distributed key, so the pseudonymized join is
    if anything BETTER-behaved under skew than the original."""
    out = df
    for c, domain in cols.items():
        out = out.withColumn(
            c,
            F.when(
                F.col(c).isNotNull(),
                F.substring(
                    F.md5(
                        F.concat_ws(
                            ":", F.lit(secret), F.lit(domain), F.col(c).cast("string")
                        )
                    ),
                    1,
                    token_len,
                ),
            ),
        )
    return out


def _clean_tokens(text: Column | str) -> Column:
    """Lowercased whitespace tokens with empties dropped — the shared
    tokenization of the corpus-statistics family (same convention as
    unigram_logprob's explode + filter, kept row-local here)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.filter(tokens(F.lower(c)), lambda t: t != "")


def ngram_diversity(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    ns: tuple[int, ...] = (1, 2, 3),
) -> DataFrame:
    """Distinct-n diversity (distinct n-grams / total n-grams) per group —
    the standard corpus self-repetition metric (distinct-1/2/3 of the NLG
    literature).  Low diversity at n=2/3 flags template/boilerplate-heavy
    sources worth down-weighting before pretraining.

    Scale shape: ONE scan builds every n's gram list row-locally
    (sequence+transform — no UDF), a single explode feeds ONE
    (group, n, gram)-keyed count with map-side combine, and the
    distinct/total division happens on the tiny per-(group, n) rollup.
    Exact distinct counts by design (it is the headline number); swap the
    final rollup for approx_count_distinct when ±2% is acceptable and the
    gram space is web-scale."""
    toks = _clean_tokens(text_col)

    def grams(n: int) -> Column:
        if n == 1:
            src = toks
        else:
            src = F.when(
                F.size(toks) >= n,
                F.transform(
                    F.sequence(F.lit(1), F.size(toks) - (n - 1)),
                    lambda i: F.array_join(F.slice(toks, i, n), " "),
                ),
            ).otherwise(F.array().cast("array<string>"))
        return F.transform(src, lambda g: F.struct(F.lit(n).cast("long").alias("n"), g.alias("gram")))

    exploded = df.select(
        F.col(group_col), F.explode(F.flatten(F.array(*[grams(n) for n in ns]))).alias("_g")
    ).select(group_col, F.col("_g.n").alias("n"), F.col("_g.gram").alias("gram"))
    per_gram = exploded.groupBy(group_col, "n", "gram").agg(F.count(F.lit(1)).alias("_c"))
    return per_gram.groupBy(group_col, "n").agg(
        F.count(F.lit(1)).alias("distinct_grams"),
        F.sum("_c").alias("total_grams"),
    ).select(
        group_col,
        "n",
        "distinct_grams",
        "total_grams",
        F.round(F.col("distinct_grams") / F.col("total_grams"), 9).alias("diversity"),
    )


def zipf_fit(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    top_r: int = 500,
    quantize: int = 9,
) -> DataFrame:
    """Zipf's-law fit per group: OLS slope of ln(frequency) on ln(rank)
    over the top ``top_r`` tokens.  Natural text sits near slope −1;
    a much flatter slope flags key-smashing/ID-heavy sources, a much
    steeper one flags tiny-vocabulary boilerplate — a one-number corpus
    fingerprint used alongside the diversity metrics.

    Scale shape: token counts are one map-combined agg; the rank window
    is PARTITIONED by group over the (group, term, count) rollup (never
    the corpus — per-group vocab is window-local), and WindowGroupLimit
    applies the top_r cut map-side.  The ln values land on a
    ``quantize``-decimal grid and all four OLS sums are exact decimals,
    so slope/intercept are partial-agg-order-independent and
    hash-comparable to a SQL oracle (unigram_logprob's discipline)."""
    toks = df.select(F.col(group_col), F.explode(_clean_tokens(text_col)).alias("term"))
    vocab = toks.groupBy(group_col, "term").agg(F.count(F.lit(1)).alias("c"))
    w = Window.partitionBy(group_col).orderBy(F.col("c").desc(), F.col("term").asc())
    ranked = vocab.withColumn("r", F.row_number().over(w)).filter(F.col("r") <= top_r)
    x = F.round(F.log(F.col("r").cast("double")), quantize)
    y = F.round(F.log(F.col("c").cast("double")), quantize)
    dsum = lambda col, p=22: F.sum(col.cast(f"decimal({p},{quantize})")).cast("double")  # noqa: E731
    s = ranked.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_ranked"),
        dsum(x).alias("_sx"),
        dsum(y).alias("_sy"),
        dsum(F.round(x * y, quantize), 24).alias("_sxy"),
        dsum(F.round(x * x, quantize), 24).alias("_sxx"),
    )
    slope = (F.col("n_ranked") * F.col("_sxy") - F.col("_sx") * F.col("_sy")) / (
        F.col("n_ranked") * F.col("_sxx") - F.col("_sx") * F.col("_sx")
    )
    return s.select(
        group_col,
        "n_ranked",
        slope.alias("zipf_slope"),
        ((F.col("_sy") - slope * F.col("_sx")) / F.col("n_ranked")).alias("zipf_intercept"),
    )


def vocab_coverage(
    df: DataFrame,
    text_col: str = "text",
    thresholds: tuple[float, ...] = (0.5, 0.9, 0.95, 0.99),
) -> DataFrame:
    """Vocabulary size needed to cover X% of corpus tokens — the curve a
    tokenizer-budget decision reads (how many types until 99% of running
    text is in-vocabulary).  Output: one row per threshold with the
    minimal frequency-ranked vocabulary size and the coverage actually
    attained there.

    Scale shape: token counts (one map-combined agg), then the
    cumulative-share curve over (count desc, term asc) via
    global_running_sum — range shuffle + map-only Arrow cumsum, NO
    single-partition window however large the vocabulary — and the
    threshold crossings collapse in ONE pass of conditional MINs (the
    share is monotone in rank, so min-rank-over-threshold is exact)."""
    from comlake_core_spark.operators.sampling import global_running_sum

    vocab = (
        df.select(F.explode(_clean_tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("c"))
    )
    cum = global_running_sum(
        vocab,
        [F.col("c").desc(), F.col("term").asc()],
        "c",
        out="_cum",
        rank_out="_rank",
    )
    # the grand total is a 1-row broadcast (the share predicate needs it
    # BEFORE aggregation, so it can't be folded into the same agg pass)
    one = vocab.agg(F.sum("c").alias("_total"))
    hits = cum.crossJoin(F.broadcast(one))
    aggs = []
    for i, t in enumerate(thresholds):
        hit = (F.col("_cum").cast("double") / F.col("_total").cast("double")) >= F.lit(t)
        aggs.append(F.min(F.when(hit, F.col("_rank"))).alias(f"_v{i}"))
        aggs.append(
            F.min(F.when(hit, F.col("_cum").cast("double") / F.col("_total").cast("double"))).alias(
                f"_c{i}"
            )
        )
    row = hits.agg(*aggs)
    pairs = F.array(
        *[
            F.struct(
                F.lit(t).alias("threshold"),
                F.col(f"_v{i}").alias("vocab_needed"),
                F.col(f"_c{i}").alias("coverage"),
            )
            for i, t in enumerate(thresholds)
        ]
    )
    return row.select(F.explode(pairs).alias("_p")).select(
        F.col("_p.threshold").alias("threshold"),
        F.col("_p.vocab_needed").alias("vocab_needed"),
        F.col("_p.coverage").alias("coverage"),
    )


def mattr(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    window: int = 50,
    quantize: int = 9,
) -> DataFrame:
    """Moving-Average Type-Token Ratio (Covington & McFall 2010) per
    group, plus plain TTR for contrast.  Plain TTR collapses as documents
    grow (types saturate); MATTR slides a fixed ``window`` over the token
    sequence and averages per-window TTR, giving a length-independent
    lexical-diversity score — the repetition signal that catches looped
    generations and boilerplate that per-corpus distinct-n misses.

    Scale shape: entirely ROW-LOCAL array arithmetic (sequence +
    aggregate over array_distinct slices — no UDF, no explode): each doc
    costs O(len·window) inside codegen, and the group rollup is one
    map-combined agg on ``quantize``-decimal-grid values (exact sums,
    hash-comparable)."""
    toks = _clean_tokens(text_col)
    n = F.size(toks)
    n_windows = n - (window - 1)
    win_sum = F.aggregate(
        F.sequence(F.lit(1), n_windows),
        F.lit(0).cast("long"),
        lambda acc, i: acc + F.size(F.array_distinct(F.slice(toks, i, window))),
    )
    doc_mattr = F.when(
        n < window, F.size(F.array_distinct(toks)).cast("double") / n
    ).otherwise(win_sum.cast("double") / (n_windows * window).cast("double"))
    doc_ttr = F.size(F.array_distinct(toks)).cast("double") / n
    per_doc = df.select(
        F.col(group_col),
        F.round(doc_mattr, quantize).alias("_m"),
        F.round(doc_ttr, quantize).alias("_t"),
    ).filter(F.size(toks) > 0)
    dsum = lambda c: F.sum(F.col(c).cast(f"decimal(20,{quantize})")).cast("double")  # noqa: E731
    return per_doc.groupBy(group_col).agg(
        F.count(F.lit(1)).alias("n_docs"),
        (dsum("_m") / F.count(F.lit(1))).alias("avg_mattr"),
        (dsum("_t") / F.count(F.lit(1))).alias("avg_ttr"),
    )


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


def _kn_trigram_scores(
    score_df: DataFrame,
    lm_df: DataFrame,
    text_col: str,
    id_col: str,
    discount: float,
    quantize: int,
    floor: float,
) -> DataFrame:
    """Scored trigram frame behind kneser_ney_trigram_logprob: one row per
    scoring-side trigram with the interpolated-KN probability (quantized)
    and its log.  Split out so tests can audit token-level probabilities
    (e.g. sum-to-one over a context) without re-deriving the pipeline."""
    lowered = F.lower(F.col(text_col))
    toks_arr = F.filter(tokens(lowered), lambda x: x != "")
    D = float(discount)

    def grams(df: DataFrame, n: int, names: list[str]) -> DataFrame:
        ts = toks_arr.alias("_ts")
        idx = F.sequence(F.lit(0), F.size(ts) - n)
        g = F.transform(idx, lambda i: F.struct(*[ts[i + j].alias(names[j]) for j in range(n)]))
        return (
            df.filter(F.size(toks_arr) >= n)
            .select(F.col(id_col), F.explode(g).alias("_g"))
            .select(F.col(id_col), *[F.col(f"_g.{c}").alias(c) for c in names])
        )

    lm = ensure_parallelism(lm_df)
    tri = grams(lm, 3, ["w1", "w2", "w3"])
    # every model table below is a rollup of this aggregate; the persist
    # guarantees the LM corpus explode materializes ONCE regardless of
    # whether Catalyst's exchange-reuse happens to dedupe the repeated
    # subtree (it covers some but not all references here).  The
    # trigram-type table is O(distinct trigrams): big, but the bounded
    # artifact an LM build materializes anyway (at 100 TB: write it as a
    # table and reuse across scoring runs)
    c3 = tri.groupBy("w1", "w2", "w3").agg(F.count(F.lit(1)).alias("_c3")).persist()
    # highest-order context totals + distinct-continuation counts (both
    # rollups of the already-aggregated c3 — no second corpus pass)
    ctx = c3.groupBy("w1", "w2").agg(
        F.sum("_c3").alias("_c2tot"), F.count(F.lit(1)).alias("_n1fw12")
    )
    # middle order works on trigram TYPES (Kneser-Ney continuation counts)
    mid = c3.groupBy("w2", "w3").agg(F.count(F.lit(1)).alias("_n1mid_bc"))
    midtot = mid.groupBy("w2").agg(
        F.sum("_n1mid_bc").alias("_n1mid_tot"), F.count(F.lit(1)).alias("_n1fw_mid")
    )
    # unigram continuation from bigram types (persisted: feeds both the
    # continuation counts and the 1-row type total)
    big = grams(lm, 2, ["a", "b"]).select("a", "b").distinct().persist()
    cont = big.groupBy(F.col("b").alias("w3c")).agg(F.count(F.lit(1)).alias("_n1bw"))
    n1all = big.agg(F.count(F.lit(1)).cast("double").alias("_n1all"))

    # score TYPES, not tokens (VERDICT r8 #7): the corpus-sized scoring
    # stream previously rode through all five model joins — five big
    # shuffles.  Distinct scoring trigram types are vocab-sized (they
    # saturate as the corpus grows), so the five keyed model joins now
    # run on the type table and the big stream shuffles ONCE, in the
    # final type→token join.  Per-type arithmetic is unchanged, so the
    # quantized probabilities (and the SQL oracle) are identical.
    stream = grams(score_df, 3, ["w1", "w2", "w3"])
    stypes = stream.select("w1", "w2", "w3").distinct()
    scored = (
        stypes.join(c3, ["w1", "w2", "w3"], "left")
        .join(ctx, ["w1", "w2"], "left")
        .join(mid, ["w2", "w3"], "left")
        .join(midtot, ["w2"], "left")
        .join(cont, F.col("w3") == F.col("w3c"), "left")
        .drop("w3c")
        .crossJoin(F.broadcast(n1all))
    )
    pcont = F.coalesce(F.col("_n1bw"), F.lit(0)).cast("double") / F.col("_n1all")
    p2 = F.when(
        F.coalesce(F.col("_n1mid_tot"), F.lit(0)) > 0,
        (
            F.greatest(F.coalesce(F.col("_n1mid_bc"), F.lit(0)).cast("double") - F.lit(D), F.lit(0.0))
            + F.lit(D) * F.col("_n1fw_mid").cast("double") * pcont
        )
        / F.col("_n1mid_tot").cast("double"),
    ).otherwise(pcont)
    p3 = F.when(
        F.coalesce(F.col("_c2tot"), F.lit(0)) > 0,
        (
            F.greatest(F.coalesce(F.col("_c3"), F.lit(0)).cast("double") - F.lit(D), F.lit(0.0))
            + F.lit(D) * F.col("_n1fw12").cast("double") * p2
        )
        / F.col("_c2tot").cast("double"),
    ).otherwise(p2)
    p9 = F.round(p3, quantize)
    typed = scored.select(
        "w1",
        "w2",
        "w3",
        p9.alias("p"),
        F.round(F.log(F.greatest(p9, F.lit(float(floor)))), quantize).alias("lp"),
        (F.coalesce(F.col("_c2tot"), F.lit(0)) == 0).cast("int").alias("_bo"),
    )
    # inner join is lossless: typed was built from stream's own distinct
    return stream.join(typed, ["w1", "w2", "w3"]).select(
        F.col(id_col), "w1", "w2", "w3", "p", "lp", "_bo"
    )


def kneser_ney_trigram_logprob(
    score_df: DataFrame,
    lm_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    discount: float = 0.75,
    quantize: int = 9,
    floor: float = 1e-9,
) -> DataFrame:
    """Per-document average trigram log-probability under an interpolated
    Kneser-Ney LM (Kneser & Ney 1995; Chen & Goodman 1999 eq. 4.x family,
    single discount D) trained on `lm_df` — the model class behind the
    KenLM perplexity filter in CCNet/LLaMA-style data pipelines, one
    order and one discount up from bigram_backoff_logprob:

        P(c|a,b) = (max(c(abc)-D,0) + D·N1+(ab·)·P(c|b)) / c(ab·)
        P(c|b)   = (max(N1+(·bc)-D,0) + D·N1+(b·)·Pcont(c)) / N1+(·b·)
        Pcont(c) = N1+(·c) / N1+(··)        (over bigram TYPES)

    with hard backoff to the next order when a denominator is absent
    (unseen context), and a probability floor before ln for the
    never-seen-anywhere tail.  The continuation counts are what make KN
    the strong smoother: a word's unigram weight is how many CONTEXTS it
    completes, not how often it occurs ("San Francisco" inflates
    c(francisco) but not N1+(·francisco)).

    Engine-agreement discipline as everywhere: all counts are exact
    integers from aggregates; each interpolated probability is one
    double expression of identical inputs, rounded to the
    `quantize`-decimal grid before ln, which lands on the grid again;
    the per-doc sum is exact decimal — replayable by a SQL oracle
    (registers in r7; built under the r6 registry freeze).

    Plan: ONE trigram agg over the LM slice; every other model table
    (context totals, continuation counts) is a rollup of that
    aggregated frame, never a corpus re-scan; bigram types add one
    distinct.  Scoring is a map-only trigram explode + five keyed joins
    onto model tables (web-scale vocab shuffles, it does not broadcast)
    + a 1-row broadcast total.  Returns (doc_id, n_trigrams,
    n_backoff_ctx, avg_logprob)."""
    scored = _kn_trigram_scores(
        score_df, lm_df, text_col, id_col, discount, quantize, floor
    )
    return (
        scored.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_trigrams"),
            F.sum("_bo").cast("long").alias("n_backoff_ctx"),
            F.sum(F.col("lp").cast(f"decimal(28,{quantize})")).alias("_s"),
        )
        .select(
            id_col,
            "n_trigrams",
            "n_backoff_ctx",
            (F.col("_s").cast("double") / F.col("n_trigrams")).alias("avg_logprob"),
        )
    )


def _unigram_candidates(words: DataFrame, pieces: DataFrame, max_piece_len: int) -> DataFrame:
    """(word, freq) × piece vocabulary → one row per word with every
    in-vocabulary substring occurrence as (start, len, logp, piece),
    grouped for the per-word Viterbi DP.  Candidate generation is a
    map-only nested-sequence expand over the WORD DICTIONARY (which
    saturates as the corpus grows — the BPE-training scale argument), and
    the vocabulary attaches by one keyed join on the piece."""
    w = F.col("word")
    L = F.length(w)
    cand = F.flatten(
        F.transform(
            F.sequence(F.lit(1), L),
            lambda i: F.transform(
                F.sequence(F.lit(1), F.least(F.lit(max_piece_len), L - i + 1)),
                lambda l: F.struct(
                    w.substr(i, l).alias("piece"),
                    i.cast("int").alias("start"),
                    l.cast("int").alias("plen"),
                ),
            ),
        )
    )
    occ = words.select("word", "freq", F.explode(cand).alias("_c")).select(
        "word", "freq", F.col("_c.piece").alias("piece"),
        F.col("_c.start").alias("start"), F.col("_c.plen").alias("plen"),
    )
    return (
        occ.join(pieces.select("piece", "logp"), "piece")
        .groupBy("word", "freq")
        .agg(
            F.collect_list(
                F.struct(F.col("start"), F.col("plen"), F.col("logp"), F.col("piece"))
            ).alias("cands")
        )
    )


def _unigram_viterbi(cands, wlen: int):
    """Best segmentation of a word from candidate (start, plen, logp,
    piece) occurrences: maximize Σ logp; ties prefer FEWER pieces, then
    the lexicographically smaller piece sequence — total order, so the
    result is deterministic under any candidate ordering.  Returns
    (score_nanolog: int, -n_pieces: int, pieces: list[str]), or None if
    the word is not coverable.

    Scores accumulate EXACTLY in integer nanolog units (logp × 1e9,
    rounded): the model feeds logps from the 9-decimal grid, so the
    conversion is lossless, and integer sums are associative — float
    accumulation breaks Viterbi's optimal-substructure assumption when a
    sub-ulp score difference between two prefixes is later ABSORBED by
    adding a larger term, making totals tie where prefixes strictly
    differed (hypothesis found exactly that: a denormal-scale logp
    flipped the returned segmentation away from the true lexicographic
    optimum; tests/test_unigram_viterbi_property.py pins the fix against
    brute-force enumeration)."""
    by_end: dict = {}
    for c in cands:
        by_end.setdefault(c["start"] + c["plen"] - 1, []).append(c)
    # state: (nanolog score, -n_pieces) maximized, then sequence tiebreak
    best = [None] * (wlen + 1)
    best[0] = (0, 0, [])
    for end in range(1, wlen + 1):
        cur = None
        for c in by_end.get(end, ()):
            prev = best[c["start"] - 1]
            if prev is None:
                continue
            cand = (prev[0] + round(c["logp"] * 1e9), prev[1] - 1, prev[2] + [c["piece"]])
            if cur is None:
                cur = cand
            # higher score wins; then fewer pieces; then smaller sequence
            elif (cand[0], cand[1]) > (cur[0], cur[1]) or (
                (cand[0], cand[1]) == (cur[0], cur[1]) and cand[2] < cur[2]
            ):
                cur = cand
        best[end] = cur
    return None if best[wlen] is None else best[wlen]


def unigram_lm_train(
    docs: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
    seed_vocab: int = 200,
    em_rounds: int = 2,
    quantize: int = 9,
) -> DataFrame:
    """SentencePiece-style unigram-LM tokenizer training (Kudo 2018,
    arXiv:1804.10959), hard-EM variant: seed a substring vocabulary, then
    alternate Viterbi segmentation of the word dictionary (E-step) with
    count re-estimation (M-step); pieces that no best segmentation uses
    fall out of the vocabulary (the prune).  The complement of
    bpe_merges: BPE grows a vocabulary bottom-up by merging, unigram-LM
    shrinks a rich seed top-down by likelihood.

    Scale discipline — identical to BPE training: ONE corpus pass builds
    the (word, freq) dictionary; everything after runs on the dictionary,
    which saturates as data grows.  Candidate substrings are a map-only
    nested-sequence expand; the vocabulary attaches by a keyed join; the
    per-word Viterbi DP is an Arrow-batched mapInPandas over dictionary
    rows (bounded work per row: wlen × max_piece_len states).  No
    corpus-sized shuffle after the first aggregate.

    Determinism: seed selection orders by (count desc, piece); DP ties
    prefer fewer pieces then the lexicographically smaller sequence;
    every logp lands on the `quantize`-decimal grid.  Single-character
    pieces are always seeded, so every word is coverable at round 0.

    Returns the final vocabulary: (piece, count, logp), count being the
    freq-weighted usage in the last E-step (seed counts for
    em_rounds=0)."""
    from pyspark.sql import types as T

    lowered = F.lower(F.col(text_col))
    toks_arr = F.filter(tokens(lowered), lambda x: x != "")
    words = (
        ensure_parallelism(docs)
        .select(F.explode(toks_arr).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
        .localCheckpoint(eager=True)
    )

    w = F.col("word")
    L = F.length(w)
    cand = F.flatten(
        F.transform(
            F.sequence(F.lit(1), L),
            lambda i: F.transform(
                F.sequence(F.lit(1), F.least(F.lit(max_piece_len), L - i + 1)),
                lambda l: w.substr(i, l),
            ),
        )
    )
    sub_counts = (
        words.select(F.explode(cand).alias("piece"), F.col("freq"))
        .groupBy("piece")
        .agg(F.sum("freq").alias("count"))
    )
    chars = sub_counts.filter(F.length("piece") == 1)
    seeds = (
        sub_counts.orderBy(F.desc("count"), F.asc("piece"))
        .limit(int(seed_vocab))
        .unionByName(chars)
        .groupBy("piece")
        .agg(F.max("count").alias("count"))
    )

    def _with_logp(p: DataFrame) -> DataFrame:
        tot = p.agg(F.sum("count").cast("double").alias("_t"))
        return (
            p.crossJoin(F.broadcast(tot))
            .select(
                "piece",
                "count",
                F.round(F.log(F.col("count").cast("double") / F.col("_t")), quantize).alias("logp"),
            )
            .localCheckpoint(eager=True)
        )

    pieces = _with_logp(seeds)
    out_schema = T.StructType(
        [T.StructField("piece", T.StringType()), T.StructField("count", T.LongType())]
    )
    for _ in range(int(em_rounds)):
        grouped = _unigram_candidates(words, pieces, max_piece_len)

        def _estep(batches):
            import pandas as pd

            for pdf in batches:
                pc: dict = {}
                for word, freq, cands in zip(pdf["word"], pdf["freq"], pdf["cands"]):
                    seg = _unigram_viterbi(cands, len(word))
                    if seg is None:
                        continue
                    for p in seg[2]:
                        pc[p] = pc.get(p, 0) + int(freq)
                yield pd.DataFrame(
                    {"piece": list(pc.keys()), "count": list(pc.values())}
                )

        new_counts = (
            grouped.mapInPandas(_estep, out_schema)
            .groupBy("piece")
            .agg(F.sum("count").alias("count"))
        )
        pieces = _with_logp(new_counts)
    return pieces


def unigram_viterbi_segment(
    docs: DataFrame,
    pieces: DataFrame,
    text_col: str = "text",
    max_piece_len: int = 4,
) -> DataFrame:
    """Apply a unigram-LM vocabulary: best segmentation per dictionary
    word under Σ logp (same DP and tie-breaks as training).  Returns
    (word, freq, pieces array<string>, score) — score is the word's
    Viterbi log-likelihood; Σ freq·score over words is the corpus
    LL that hard-EM training must not decrease (pinned by test)."""
    from pyspark.sql import types as T

    lowered = F.lower(F.col(text_col))
    toks_arr = F.filter(tokens(lowered), lambda x: x != "")
    words = (
        ensure_parallelism(docs)
        .select(F.explode(toks_arr).alias("word"))
        .groupBy("word")
        .agg(F.count(F.lit(1)).alias("freq"))
    )
    grouped = _unigram_candidates(words, pieces, max_piece_len)
    out_schema = T.StructType(
        [
            T.StructField("word", T.StringType()),
            T.StructField("freq", T.LongType()),
            T.StructField("pieces", T.ArrayType(T.StringType())),
            T.StructField("score", T.DoubleType()),
        ]
    )

    def _seg(batches):
        import pandas as pd

        for pdf in batches:
            rows = []
            for word, freq, cands in zip(pdf["word"], pdf["freq"], pdf["cands"]):
                seg = _unigram_viterbi(cands, len(word))
                if seg is not None:
                    rows.append((word, int(freq), seg[2], seg[0] / 1e9))
            yield pd.DataFrame(rows, columns=["word", "freq", "pieces", "score"])

    return grouped.mapInPandas(_seg, out_schema)
