"""Training-data prep: fixed-size overlapping character chunking and
deterministic fixed-capacity sequence packing.  chunk_documents is a
map-only posexplode fanout; pack_sequences is one range-partitioned
running sum (pack WITHIN shards at 100 TB)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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

    The global prefix sum rides
    :func:`~comlake_core_spark.operators.sampling.global_running_sum`
    (range shuffle + O(P) offsets + map-only Arrow cumsum) — r12 replaced
    the original ``sum().over(Window.orderBy(...))``, which degenerates
    to a SINGLE-PARTITION window: fine at sf0.1, the textbook bottleneck
    at 100 TB.  Token counts accumulate as integers, so the values (and
    the SQL window oracle) are unchanged.  Construction runs an eager
    layout-pinning job (global_running_sum's contract)."""
    ids = [id_col] if isinstance(id_col, str) else list(id_col)
    tok = F.col(token_count) if isinstance(token_count, str) else token_count
    from comlake_core_spark.operators.sampling import global_running_sum

    staged = df.select(
        *[F.col(c) for c in ids], tok.cast("long").alias("n_tokens")
    )
    cum = global_running_sum(
        staged, [F.col(c).asc() for c in ids], "n_tokens", out="_cum"
    )
    before = F.col("_cum") - F.col("n_tokens")
    return cum.select(
        *[F.col(c) for c in ids],
        "n_tokens",
        (before / F.lit(budget)).cast("long").alias("pack_id"),
        before.cast("long").alias("tokens_before"),
    )
