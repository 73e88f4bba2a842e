"""SentencePiece-style unigram-LM tokenizer training (Kudo 2018,
arXiv:1804.10959), hard-EM variant, and vocabulary application via the
same exact-integer Viterbi DP.  One corpus pass builds the word
dictionary; everything after runs on dictionary rows (Arrow-batched
mapInPandas for the DP — bounded work per row)."""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from comlake_core_spark.operators.text.core import tokens
from comlake_core_spark.session import ensure_parallelism


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
