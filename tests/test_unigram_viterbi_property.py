"""Property fuzz of the pure-Python Viterbi DP behind the unigram-LM
tokenizer (operators/text._unigram_viterbi) against brute-force
enumeration of ALL segmentations — Spark-free, so hundreds of examples
run in seconds (the qast interpreter fuzzing discipline applied to the
one imperative kernel in the tokenizer).

This fuzz CAUGHT a real defect in the first DP: float score
accumulation let a sub-ulp prefix advantage be absorbed by a later
larger term, so two totals tied where the prefixes had strictly
differed, and the DP's committed prefix was not the global lexicographic
optimum (falsifying logp: a denormal -2e-108).  The DP now accumulates
exact integer nanologs — lossless for the model's 9-grid logps and
associative, restoring optimal substructure."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from comlake_core_spark.operators.text.unigram_lm import _unigram_viterbi

MAX_LEN = 4


def brute_force(word: str, logp: dict) -> tuple | None:
    """All segmentations by recursion; best by (score, -pieces, seq).
    Scores in exact integer nanologs, mirroring the DP contract."""
    best = None

    def rec(i, score, seq):
        nonlocal best
        if i == len(word):
            cand = (score, -len(seq), seq)
            if best is None or (cand[0], cand[1]) > (best[0], best[1]) or (
                (cand[0], cand[1]) == (best[0], best[1]) and cand[2] < best[2]
            ):
                best = cand
            return
        for l in range(1, min(MAX_LEN, len(word) - i) + 1):
            p = word[i : i + l]
            if p in logp:
                rec(i + l, score + round(logp[p] * 1e9), seq + [p])

    rec(0, 0, [])
    return best


@st.composite
def word_and_vocab(draw):
    word = draw(st.text(alphabet="abc", min_size=1, max_size=8))
    # substrings of the word (so coverable segmentations usually exist),
    # possibly dropping some (so uncoverable cases are exercised too)
    subs = {word[i : i + l] for i in range(len(word)) for l in range(1, MAX_LEN + 1) if i + l <= len(word)}
    keep = draw(st.sets(st.sampled_from(sorted(subs)), min_size=0, max_size=len(subs)))
    logp = {p: draw(st.floats(min_value=-10, max_value=0, allow_nan=False)) for p in keep}
    return word, logp


@given(word_and_vocab())
@settings(max_examples=300, deadline=None)
def test_viterbi_matches_brute_force(case):
    word, logp = case
    cands = [
        {"start": i + 1, "plen": l, "logp": logp[word[i : i + l]], "piece": word[i : i + l]}
        for i in range(len(word))
        for l in range(1, MAX_LEN + 1)
        if i + l <= len(word) and word[i : i + l] in logp
    ]
    got = _unigram_viterbi(cands, len(word))
    want = brute_force(word, logp)
    if want is None:
        assert got is None
        return
    assert got is not None
    assert got[0] == want[0]          # same score
    assert got[2] == want[2]          # same sequence under the tie-break
    assert "".join(got[2]) == word    # exact cover


@given(word_and_vocab())
@settings(max_examples=100, deadline=None)
def test_viterbi_invariant_under_candidate_order(case):
    word, logp = case
    cands = [
        {"start": i + 1, "plen": l, "logp": logp[word[i : i + l]], "piece": word[i : i + l]}
        for i in range(len(word))
        for l in range(1, MAX_LEN + 1)
        if i + l <= len(word) and word[i : i + l] in logp
    ]
    a = _unigram_viterbi(cands, len(word))
    b = _unigram_viterbi(list(reversed(cands)), len(word))
    assert a == b
