"""Streaming near-dup index: continuous-ingest MinHash dedup against a
persistent banded signature index (streaming/neardup.py).

The contract under test: pairs found across micro-batches equal the
batch incremental operator's answer on the same split (new×old ∪
new×new, never old×old), the index accumulates exactly-once, and a
replayed batch (crash recovery) does not duplicate pairs or index rows.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from comlake_core_spark.operators.dedup import minhash_lsh_pairs_incremental
from comlake_core_spark.streaming.neardup import StreamingNearDupIndex

DOCS = [
    # base corpus: two exact near-dup families + singletons
    (1, "the quick brown fox jumps over the lazy dog in the morning sun"),
    (2, "the quick brown fox jumps over the lazy dog in the evening sun"),
    (3, "completely unrelated text about sparkling distributed computation"),
    # second batch: dup of 1, dup within batch, fresh singleton
    (10, "the quick brown fox jumps over the lazy dog in the morning sun"),
    (11, "streaming ingestion lands a brand new snapshot of crawl data today"),
    (12, "streaming ingestion lands a brand new snapshot of crawl data now"),
]


@pytest.fixture()
def corpus(spark):
    return spark.createDataFrame(DOCS, "doc_id long, text string")


def _run_two_batches(spark, corpus, tmp_path):
    src = str(tmp_path / "src")
    b1 = corpus.filter(F.col("doc_id") < 10)
    b2 = corpus.filter(F.col("doc_id") >= 10)
    idx = StreamingNearDupIndex(str(tmp_path / "index"), threshold=0.5)

    # micro-batch 1: base corpus lands
    b1.write.mode("append").parquet(src)
    stream = spark.readStream.schema(corpus.schema).parquet(src)
    q = idx.stream_into(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)

    # micro-batch 2: the new snapshot arrives
    b2.write.mode("append").parquet(src)
    stream = spark.readStream.schema(corpus.schema).parquet(src)
    q = idx.stream_into(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(120)
    return idx, b1, b2


def test_stream_matches_batch_incremental(spark, corpus, tmp_path):
    idx, b1, b2 = _run_two_batches(spark, corpus, tmp_path)
    got = {
        (r["new_id"], r["match_id"]): round(r["jaccard"], 9)
        for r in idx.pairs(spark).collect()
    }

    # batch-1-internal pairs: incremental with an empty old side
    empty = corpus.limit(0)
    want = {}
    for old, new in ((empty, b1), (b1, b2)):
        for r in minhash_lsh_pairs_incremental(old, new, threshold=0.5).collect():
            want[(r["new_id"], r["match_id"])] = round(r["jaccard"], 9)

    assert got == want
    assert (10, 1) in got  # cross-batch dup found via the INDEX, not a re-scan
    assert (11, 12) in got  # within-batch dup still caught (ordered new_id < match_id)


def test_index_accumulates_all_ids(spark, corpus, tmp_path):
    idx, b1, b2 = _run_two_batches(spark, corpus, tmp_path)
    ids = {r["doc_id"] for r in idx.indexed_ids(spark).collect()}
    assert ids == {d for d, _ in DOCS}


def test_batch_replay_is_idempotent(spark, corpus, tmp_path):
    idx, b1, b2 = _run_two_batches(spark, corpus, tmp_path)
    before_pairs = sorted(map(tuple, idx.pairs(spark).collect()))
    before_n = idx.indexed_ids(spark).count()
    # crash-replay of the LAST micro-batch: foreachBatch reruns with the
    # same batch_id; subdir overwrite must leave state unchanged
    idx.apply_batch(b2, batch_id=1)
    assert sorted(map(tuple, idx.pairs(spark).collect())) == before_pairs
    assert idx.indexed_ids(spark).count() == before_n


def test_compaction_preserves_semantics(spark, corpus, tmp_path):
    """compact() between stream restarts: the per-batch subdirs collapse
    into one segment, and a third micro-batch still finds its dups
    against the FULL accumulated corpus."""
    idx, b1, b2 = _run_two_batches(spark, corpus, tmp_path)
    idx.compact(spark)
    # subdirs gone, one compacted segment remains
    for path in (idx._bands_dir, idx._shingles_dir):
        entries = os.listdir(path)
        assert "_compacted" in entries
        assert not [e for e in entries if e.startswith("_batch=")]
    assert {r["doc_id"] for r in idx.indexed_ids(spark).collect()} == {d for d, _ in DOCS}

    # third batch: a dup of doc 3 (batch-1 era, now only in the segment)
    b3 = spark.createDataFrame(
        [(20, "completely unrelated text about sparkling distributed computing")],
        "doc_id long, text string",
    )
    idx.apply_batch(b3, batch_id=2)
    got = {(r["new_id"], r["match_id"]) for r in idx.pairs(spark).collect()}
    assert (20, 3) in got  # found via the compacted segment


def test_compact_after_uncommitted_batch_then_replay(spark, corpus, tmp_path):
    """Review-confirmed bug #1: batch N's writes land, the process dies
    BEFORE the checkpoint commit, an operator runs compact(), then the
    stream restarts and replays batch N.  Compacted rows keep their
    _batch id, so the replay must still exclude them — no self-pairs, no
    duplicated index rows."""
    idx, b1, b2 = _run_two_batches(spark, corpus, tmp_path)
    before_pairs = sorted(map(tuple, idx.pairs(spark).collect()))
    before_ids = sorted(r["doc_id"] for r in idx.indexed_ids(spark).collect())

    idx.compact(spark)          # absorbs batch 1's (uncommitted) rows
    idx.apply_batch(b2, batch_id=1)  # checkpoint replay after restart

    after_pairs = sorted(map(tuple, idx.pairs(spark).collect()))
    after_ids = sorted(r["doc_id"] for r in idx.indexed_ids(spark).collect())
    assert after_pairs == before_pairs  # no self-pairs, no reversed dups
    assert after_ids == before_ids      # batch rows not duplicated


def test_compact_swap_crash_windows_recoverable(spark, corpus, tmp_path):
    """Review-confirmed bug #2: the segment swap must never lose the old
    segment.  Simulate a kill between rename(final->trash) and
    rename(tmp->final): readers fall back to the trash copy, and the
    next compact() heals the layout."""
    import os as _os
    import shutil

    idx, b1, b2 = _run_two_batches(spark, corpus, tmp_path)
    idx.compact(spark)
    full_ids = {r["doc_id"] for r in idx.indexed_ids(spark).collect()}

    # simulate the crash window on the shingle store: final moved to
    # trash, replacement never promoted
    final = _os.path.join(idx._shingles_dir, "_compacted")
    trash = _os.path.join(idx._shingles_dir, "_trash")
    _os.rename(final, trash)
    assert {r["doc_id"] for r in idx.indexed_ids(spark).collect()} == full_ids

    idx.compact(spark)  # heals: trash promoted back to final
    assert _os.path.isdir(final) and not _os.path.isdir(trash)
    assert {r["doc_id"] for r in idx.indexed_ids(spark).collect()} == full_ids

    # stale-subdir window: segment promoted but absorbed subdirs survive a
    # crash before cleanup — readers must not double-count them
    b3 = spark.createDataFrame([(30, "some fresh text never seen before at all")],
                               "doc_id long, text string")
    idx.apply_batch(b3, batch_id=2)
    idx.compact(spark)
    # resurrect a stale copy of batch 2 as if cleanup had died — WITH its
    # commit marker, so the watermark (not the commit check) is what
    # skips it
    stale = _os.path.join(idx._shingles_dir, "_batch=2")
    shutil.copytree(
        _os.path.join(idx._shingles_dir, "_compacted"),
        stale,
        ignore=shutil.ignore_patterns("_absorbed_upto.json", "_SUCCESS*"),
    )
    with open(_os.path.join(stale, StreamingNearDupIndex._COMMIT_MARKER), "w") as f:
        f.write("2")
    n = idx.indexed_ids(spark).count()
    assert n == len(full_ids) + 1  # stale subdir skipped via the watermark


def test_compact_never_absorbs_uncommitted_batch(spark, corpus, tmp_path):
    """ADVICE r6 #1: a write that died MID-FLIGHT (no commit marker,
    possibly partial parquet) must not be absorbed — compacting before
    the restart previously advanced the watermark past the batch, so the
    replay's rewritten subdir was permanently skipped and the batch's
    rows silently lost."""
    idx, b1, b2 = _run_two_batches(spark, corpus, tmp_path)
    b3 = spark.createDataFrame(
        [(40, "the quick brown fox jumps over the lazy dog in the morning sun")],
        "doc_id long, text string",
    )
    # simulate the crash: batch 2's subdirs exist but are uncommitted —
    # write them fully, then strip the index's own commit markers and
    # corrupt the band store's data half to prove compact never reads it
    idx.apply_batch(b3, batch_id=2)
    for path in (idx._bands_dir, idx._shingles_dir, idx._pairs_dir):
        sub = os.path.join(path, "_batch=2")
        os.remove(os.path.join(sub, StreamingNearDupIndex._COMMIT_MARKER))
        s = os.path.join(sub, "_SUCCESS")
        if os.path.exists(s):  # a TRUE partial write has neither file
            os.remove(s)
    for e in os.listdir(os.path.join(idx._bands_dir, "_batch=2")):
        if e.endswith(".parquet"):
            with open(os.path.join(idx._bands_dir, "_batch=2", e), "wb") as f:
                f.write(b"partial garbage from a dying executor")

    idx.compact(spark)  # must neither crash on the garbage nor absorb it
    from comlake_core_spark.streaming.neardup import StreamingNearDupIndex as S

    upto = S._absorbed_upto(S._segment_dir(idx._bands_dir))
    assert upto == 1, "uncommitted batch 2 must not advance the watermark"

    # restart: the checkpoint replays batch 2, rewriting its subdirs
    idx.apply_batch(b3, batch_id=2)
    got = {(r["new_id"], r["match_id"]) for r in idx.pairs(spark).collect()}
    assert (40, 1) in got and (40, 10) in got  # batch 2's rows are all back
    assert 40 in {r["doc_id"] for r in idx.indexed_ids(spark).collect()}


def test_reader_skips_uncommitted_subdir(spark, corpus, tmp_path):
    """_read_or_empty must skip a partial (no commit-marker) subdir
    instead of failing the next micro-batch on unreadable parquet."""
    idx, b1, b2 = _run_two_batches(spark, corpus, tmp_path)
    before = idx.indexed_ids(spark).count()
    sub = os.path.join(idx._shingles_dir, "_batch=7")
    os.makedirs(sub)
    with open(os.path.join(sub, "part-00000.parquet"), "wb") as f:
        f.write(b"not parquet at all")
    assert idx.indexed_ids(spark).count() == before


def test_compact_refuses_while_stream_active(spark, corpus, tmp_path):
    """ADVICE r6 #2: compact() deletes files an in-flight micro-batch may
    still read lazily — it must refuse while the session has active
    streaming queries (offline-only contract)."""
    idx, b1, b2 = _run_two_batches(spark, corpus, tmp_path)
    q = (
        spark.readStream.format("rate").option("rowsPerSecond", 1).load()
        .writeStream.format("noop").start()
    )
    try:
        with pytest.raises(RuntimeError, match="offline-only"):
            idx.compact(spark)
    finally:
        q.stop()
    idx.compact(spark)  # stream stopped: proceeds normally
    assert {r["doc_id"] for r in idx.indexed_ids(spark).collect()} == {d for d, _ in DOCS}


def test_compact_with_only_uncommitted_subdirs(spark, corpus, tmp_path):
    """ADVICE r7 #3: a store whose ONLY contents are uncommitted _batch=
    subdirs and no compacted segment (the post-crash, pre-restart state)
    used to skip both early-continue guards and crash on parts[0] of an
    empty list.  compact() must be a no-op that leaves the subdirs for
    the replay to overwrite."""
    idx = StreamingNearDupIndex(str(tmp_path / "index"), threshold=0.5)
    b1 = corpus.filter(F.col("doc_id") < 10)
    idx.apply_batch(b1, batch_id=0)
    for path in (idx._bands_dir, idx._shingles_dir, idx._pairs_dir):
        os.remove(os.path.join(path, "_batch=0", StreamingNearDupIndex._COMMIT_MARKER))
        s = os.path.join(path, "_batch=0", "_SUCCESS")
        if os.path.exists(s):
            os.remove(s)

    idx.compact(spark)  # must not raise IndexError

    # the uncommitted subdirs survive for the checkpoint replay...
    assert os.path.isdir(os.path.join(idx._bands_dir, "_batch=0"))
    # ...and the replay restores the index in full
    idx.apply_batch(b1, batch_id=0)
    assert idx.indexed_ids(spark).count() == b1.count()


def test_committed_without_spark_success_marker(spark, corpus, tmp_path):
    """ADVICE r7 #2: commit detection must not depend on Spark's optional
    _SUCCESS file (absent when mapreduce.fileoutputcommitter
    .marksuccessfuljobs=false) — a deployment disabling it must not see
    committed batches vanish or compact() delete their data."""
    idx = StreamingNearDupIndex(str(tmp_path / "index"), threshold=0.5)
    b1 = corpus.filter(F.col("doc_id") < 10)
    idx.apply_batch(b1, batch_id=0)
    for path in (idx._bands_dir, idx._shingles_dir, idx._pairs_dir):
        s = os.path.join(path, "_batch=0", "_SUCCESS")
        if os.path.exists(s):
            os.remove(s)
    assert idx.indexed_ids(spark).count() == b1.count()
    idx.compact(spark)  # absorbs, does not delete
    assert idx.indexed_ids(spark).count() == b1.count()


def test_legacy_success_only_subdirs_stay_visible(spark, corpus, tmp_path):
    """Review r8 #1: an index written BEFORE the _COMLAKE_COMMITTED
    scheme has _SUCCESS-bearing, marker-less subdirs whose batches will
    never replay (the checkpoint advanced).  Readers must keep serving
    them and compact() must absorb — not delete — them."""
    idx = StreamingNearDupIndex(str(tmp_path / "index"), threshold=0.5)
    b1 = corpus.filter(F.col("doc_id") < 10)
    idx.apply_batch(b1, batch_id=0)
    # regress the on-disk layout to the legacy scheme
    for path in (idx._bands_dir, idx._shingles_dir, idx._pairs_dir):
        sub = os.path.join(path, "_batch=0")
        os.remove(os.path.join(sub, StreamingNearDupIndex._COMMIT_MARKER))
        assert os.path.exists(os.path.join(sub, "_SUCCESS"))
    assert idx.indexed_ids(spark).count() == b1.count()
    idx.compact(spark)  # absorbs the legacy batch
    assert idx.indexed_ids(spark).count() == b1.count()
    from comlake_core_spark.streaming.neardup import StreamingNearDupIndex as S

    assert S._absorbed_upto(S._segment_dir(idx._shingles_dir)) == 0


def test_string_doc_ids_supported(spark, tmp_path):
    """ADVICE r6 #4: a string id stream previously joined a hardcoded
    long-typed empty frame on the first batch; id_type now flows through
    every empty-index schema."""
    idx = StreamingNearDupIndex(str(tmp_path / "idx"), threshold=0.5, id_type="string")
    b1 = spark.createDataFrame(
        [("a-1", "the quick brown fox jumps over the lazy dog in the morning sun"),
         ("a-2", "totally different content about columnar storage formats")],
        "doc_id string, text string",
    )
    b2 = spark.createDataFrame(
        [("b-1", "the quick brown fox jumps over the lazy dog in the evening sun")],
        "doc_id string, text string",
    )
    idx.apply_batch(b1, batch_id=0)  # first batch: joins the EMPTY index
    idx.apply_batch(b2, batch_id=1)
    got = {(r["new_id"], r["match_id"]) for r in idx.pairs(spark).collect()}
    assert ("b-1", "a-1") in got
    assert idx.pairs(spark).schema["new_id"].dataType.simpleString() == "string"


def test_mismatched_id_type_raises(spark, tmp_path):
    idx = StreamingNearDupIndex(str(tmp_path / "idx"))  # default long
    batch = spark.createDataFrame([("x", "some text here")], "doc_id string, text string")
    with pytest.raises(TypeError, match="id_type"):
        idx.apply_batch(batch, batch_id=0)


def test_success_only_absorb_then_replay_is_invariant(spark, corpus, tmp_path):
    """ADVICE r8: the crash window the legacy `_SUCCESS` fallback leans on
    — a batch crashed BETWEEN its parquet writes and the marker loop, a
    compact() then ABSORBS the `_SUCCESS`-only subdirs into the segment,
    and the streaming engine later REPLAYS the batch (its checkpoint
    never advanced).  Safety rests on the replay rewriting the stores
    bit-identically and the absorbed-upto watermark masking the rewritten
    subdirs as stale duplicates.  This pins that end-to-end: index
    contents are unchanged through absorb + replay."""
    idx, b1, b2 = _run_two_batches(spark, corpus, tmp_path)

    def snap():
        pairs = {
            (r["new_id"], r["match_id"]): round(r["jaccard"], 9)
            for r in idx.pairs(spark).collect()
        }
        ids = sorted(r["doc_id"] for r in idx.indexed_ids(spark).collect())
        return pairs, ids

    before = snap()

    # simulate the crash: batch 1's subdirs are fully written with Spark's
    # _SUCCESS but the index's own marker never landed
    for store in (idx._pairs_dir, idx._bands_dir, idx._shingles_dir):
        sub = os.path.join(store, "_batch=1")
        marker = os.path.join(sub, idx._COMMIT_MARKER)
        assert os.path.exists(marker) and os.path.exists(os.path.join(sub, "_SUCCESS"))
        os.unlink(marker)

    # compact() takes the legacy fallback and absorbs the batch
    idx.compact(spark)
    assert snap() == before
    for store in (idx._bands_dir, idx._shingles_dir):  # pairs stay per-batch
        assert not os.path.isdir(os.path.join(store, "_batch=1"))  # absorbed

    # the engine replays the batch (checkpoint never saw it commit)
    idx.apply_batch(b2, 1)
    after = snap()
    assert after == before, "absorb-then-replay changed the index"

    # and a second compact() cleans the now-stale rewritten subdirs
    # without changing anything either
    idx.compact(spark)
    assert snap() == before
