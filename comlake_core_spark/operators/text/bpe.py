"""Byte-pair-encoding tokenizer training and application (Sennrich et
al. 2016): learn merge rules over the word-frequency dictionary (ONE
corpus pass; every round is dictionary-sized) and report per-group
fertility.  The unigram-LM complement lives in unigram_lm.py."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from comlake_core_spark.session import materialize


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
    cur = words.select("word", seq0.alias("seq"), "cnt").transform(materialize)
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
            ).transform(materialize)
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
