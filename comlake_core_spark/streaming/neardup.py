"""Streaming near-duplicate detection against a PERSISTENT signature
index — the continuous-ingest form of the batch incremental dedup
(operators/dedup.minhash_lsh_pairs_incremental, whose docstring promises
exactly this: "band buckets from the OLD side are exactly what a
persisted signature index provides").

Each micro-batch:
  1. shingles + MinHash signatures for the batch docs (map-only),
  2. bands them and joins against the on-disk band index (new×old) and
     an ordered within-batch self-join (new×new) — never old×old,
  3. exact-Jaccard verifies candidates from stored shingle arrays,
  4. appends the batch's bands/shingles to the index and its verified
     duplicate pairs to the pairs table — all three written under a
     `_batch=<id>/` subdirectory with overwrite, so a foreachBatch replay
     after a crash rewrites the same files instead of duplicating them
     (idempotent ⇒ exactly-once downstream).

Scale: per-batch JOIN cost is |batch| × bucket-hit-rate — the corpus
never self-joins and old signatures are never recomputed.  The per-batch
index SCAN, however, grows with the number of accumulated `_batch=`
subdirs; the 100 TB posture is periodic compaction of the band index
into a table bucketed on (band, bkey) (operators/relational.
write_bucketed), which both collapses the small-file tail and makes the
per-batch band join shuffle-free on the index side.  The shingle store
should hold xxhash64 fingerprints instead of raw shingle strings at that
scale (8 bytes/shingle; verify runs on fingerprints with negligible
collision odds) — raw strings are kept here so the jaccard matches the
batch operator bit-for-bit.

Deployment contract (ADVICE r6 #3): the index root must be a
DRIVER-LOCAL POSIX path — the crash-safe segment swap and the reader's
subdir listing use os.listdir/os.rename, which assume atomic directory
rename.  HDFS/S3 deployments must route the listing and the swap
through the Hadoop FileSystem API with an object-store commit protocol
(rename-free: write to a versioned segment name + a last-committed
pointer file) before the 100 TB posture applies to the STORE itself;
the Spark compute plan is storage-agnostic either way.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from comlake_core_spark.operators.dedup.minhash import lsh_band_keys, lsh_doc_signatures


class StreamingNearDupIndex:
    def __init__(
        self,
        root: str,
        text_col: str = "text",
        id_col: str = "doc_id",
        k_shingle: int = 3,
        num_hashes: int = 32,
        bands: int = 8,
        threshold: float = 0.6,
        id_type: str = "long",
    ):
        if num_hashes % bands != 0:
            raise ValueError(f"num_hashes ({num_hashes}) must be divisible by bands ({bands})")
        self.root = root
        # the id column's Spark type (simpleString form, e.g. "long",
        # "string"): the empty-index frames must carry the STREAM's id
        # type or the first batch joins against a mistyped empty frame
        # and diverges from the parquet-inferred schema afterwards
        # (ADVICE r6 #4); apply_batch validates every batch against it
        self.id_type = id_type
        self.text_col = text_col
        self.id_col = id_col
        self.k_shingle = k_shingle
        self.num_hashes = num_hashes
        self.bands = bands
        self.threshold = threshold
        self._bands_dir = os.path.join(root, "bands")
        self._shingles_dir = os.path.join(root, "shingles")
        self._pairs_dir = os.path.join(root, "pairs")

    # -- model stages: the SHARED batch-operator pipeline (review r6 #4 —
    # one implementation, so streaming/batch parity is structural) -------

    def _sigs(self, df: DataFrame) -> DataFrame:
        return lsh_doc_signatures(
            df, self.text_col, self.id_col, self.k_shingle, self.num_hashes
        )

    def _banded(self, sigs: DataFrame) -> DataFrame:
        return lsh_band_keys(sigs.drop("_sh"), self.num_hashes, self.bands)

    def _read_or_empty(
        self, spark: SparkSession, path: str, schema: str, before_batch: int | None = None
    ) -> DataFrame:
        """Read an index table: the compacted segment (if ``compact()``
        ran) plus every remaining `_batch=<id>/` subdir; with
        ``before_batch`` keep only subdir rows from strictly EARLIER
        batches.  That filter is what makes a foreachBatch REPLAY
        correct: after a crash mid-commit the replayed batch's own rows
        may already sit in the index, and matching the batch against
        itself would emit self-pairs and reversed duplicates (caught by
        test_batch_replay_is_idempotent).  Compacted rows carry their
        original `_batch` id as a stored column, so the replay filter
        applies to them identically — compacting right after a crashed
        batch is safe.  Subdirs at or below the segment's absorbed
        watermark, and UNCOMMITTED subdirs (no `_COMLAKE_COMMITTED`
        marker and no legacy `_SUCCESS`; a mid-flight write with
        possibly unreadable partial parquet — see ``_committed``), are
        crash leftovers and are skipped — the replay rewrites the
        latter."""
        parts = []
        seg = self._segment_dir(path)
        upto = self._absorbed_upto(seg)
        if seg is not None:
            parts.append(spark.read.parquet(seg))  # stores _batch as a column
        live = [
            os.path.join(path, e)
            for e in (os.listdir(path) if os.path.isdir(path) else [])
            if e.startswith("_batch=")
            and int(e.split("=", 1)[1]) > upto
            and self._committed(os.path.join(path, e))
        ]
        if live:
            parts.append(
                spark.read.option("basePath", path)
                .parquet(*live)
                .withColumn("_batch", F.col("_batch").cast("long"))
            )
        if not parts:
            return spark.createDataFrame([], schema + ", _batch long").drop("_batch")
        out = parts[0]
        for p in parts[1:]:
            out = out.unionByName(p)
        if before_batch is not None:
            out = out.filter(F.col("_batch") < int(before_batch))
        return out.drop("_batch")

    #: the index's OWN commit marker, written by apply_batch after all
    #: three stores' parquet writes finish.  Spark's `_SUCCESS` marker is
    #: not trusted: it is only emitted when
    #: mapreduce.fileoutputcommitter.marksuccessfuljobs=true, so a
    #: deployment that disables it would make every committed batch look
    #: uncommitted — readers would return empty results and a later
    #: compact() would delete committed data (ADVICE r7 #2).  It is also
    #: per-store, while the batch's unit of commit is all THREE stores:
    #: the marker lands only after bands+shingles+pairs are all durable.
    _COMMIT_MARKER = "_COMLAKE_COMMITTED"

    @classmethod
    def _committed(cls, subdir: str) -> bool:
        """A `_batch=` subdir counts once apply_batch finished the whole
        batch (our own marker) — OR, legacy fallback, once Spark's
        `_SUCCESS` marker exists (indexes written before the
        _COMLAKE_COMMITTED scheme carry only `_SUCCESS`, and their
        checkpoints have advanced past those batches, so treating them
        as uncommitted would hide the data from readers and let
        compact() delete it permanently — review r8 #1).  The fallback
        is safe in the crash windows too: a subdir bearing `_SUCCESS`
        but no marker is a FULLY-written store whose batch will replay
        bit-identically (deterministic writes), so absorbing or reading
        it early changes nothing; a mid-flight partial write has
        NEITHER file and stays invisible (ADVICE r6 #1).  Deployments
        with marksuccessfuljobs=false simply never take the fallback —
        the index's own marker gates everything (ADVICE r7 #2)."""
        return os.path.exists(os.path.join(subdir, cls._COMMIT_MARKER)) or os.path.exists(
            os.path.join(subdir, "_SUCCESS")
        )

    @staticmethod
    def _segment_dir(path: str) -> str | None:
        """Resolve the compacted segment, healing a crashed swap: if the
        rename sequence died between moving the old segment to `_trash`
        and promoting `_compacting`, the trash copy IS the segment."""
        final = os.path.join(path, "_compacted")
        trash = os.path.join(path, "_trash")
        if os.path.isdir(final):
            return final
        if os.path.isdir(trash):
            return trash
        return None

    @staticmethod
    def _absorbed_upto(seg: str | None) -> int:
        """Highest batch id absorbed into the segment (marker file written
        before the swap).  `_batch=` subdirs at or below it are stale
        duplicates from a crash between the swap and the subdir cleanup —
        readers skip them, the next compact() removes them."""
        if seg is None:
            return -1
        marker = os.path.join(seg, "_absorbed_upto.json")
        try:
            import json

            with open(marker) as f:
                return int(json.load(f)["upto"])
        except (OSError, ValueError, KeyError):
            return -1

    # -- foreachBatch body ----------------------------------------------------

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        from pyspark.sql.types import _parse_datatype_string

        got = batch_df.schema[self.id_col].dataType
        if got != _parse_datatype_string(self.id_type):
            raise TypeError(
                f"stream id column {self.id_col!r} is {got.simpleString()}, "
                f"but this index was declared id_type={self.id_type!r} — "
                f"construct StreamingNearDupIndex(id_type="
                f"{got.simpleString()!r}) so the empty-index frames and the "
                "on-disk schema agree"
            )
        sigs = self._sigs(batch_df).persist()
        banded_new = self._banded(sigs).persist()

        idt = self.id_type
        idx_bands = self._read_or_empty(
            spark, self._bands_dir, f"_id {idt}, _band int, _bkey long", before_batch=batch_id
        ).withColumnsRenamed({"_id": "_oid"})
        idx_sh = self._read_or_empty(
            spark, self._shingles_dir, f"_id {idt}, _sh array<string>", before_batch=batch_id
        )

        vs_old = banded_new.join(
            idx_bands,
            (banded_new._band == idx_bands._band) & (banded_new._bkey == idx_bands._bkey),
        ).select(F.col("_id").alias("new_id"), F.col("_oid").alias("match_id"))
        r = banded_new.select(
            F.col("_id").alias("_nid2"),
            F.col("_band").alias("_band2"),
            F.col("_bkey").alias("_bkey2"),
        )
        vs_new = banded_new.join(
            r,
            (banded_new._band == F.col("_band2"))
            & (banded_new._bkey == F.col("_bkey2"))
            & (banded_new._id < F.col("_nid2")),
        ).select(F.col("_id").alias("new_id"), F.col("_nid2").alias("match_id"))
        candidates = vs_old.unionByName(vs_new).distinct()

        # exact-Jaccard verify: new-side shingles from this batch, match-side
        # from the index (old) or the batch (new×new) — candidates only
        sh_all = sigs.select("_id", "_sh").unionByName(idx_sh)
        pairs = (
            candidates.join(
                sigs.select(F.col("_id").alias("new_id"), F.col("_sh").alias("_sh_a")),
                "new_id",
            )
            .join(
                sh_all.select(F.col("_id").alias("match_id"), F.col("_sh").alias("_sh_b")),
                "match_id",
            )
            .withColumn(
                "jaccard",
                F.size(F.array_intersect("_sh_a", "_sh_b")).cast("double")
                / F.size(F.array_union("_sh_a", "_sh_b")),
            )
            .filter(F.col("jaccard") >= self.threshold)
            .select("new_id", "match_id", "jaccard")
        )

        # idempotent writes: a replayed batch overwrites its own subdirs
        sub = f"_batch={int(batch_id)}"
        subdirs = [
            os.path.join(self._pairs_dir, sub),
            os.path.join(self._bands_dir, sub),
            os.path.join(self._shingles_dir, sub),
        ]
        pairs.write.mode("overwrite").parquet(subdirs[0])
        banded_new.write.mode("overwrite").parquet(subdirs[1])
        sigs.select("_id", "_sh").write.mode("overwrite").parquet(subdirs[2])
        # commit point: the batch's unit of commit is all THREE stores, so
        # the index's own markers land only after every parquet write is
        # durable.  A crash before this loop leaves all three subdirs
        # uncommitted (readers skip, compact() won't absorb, the replay
        # overwrites); a crash inside it can leave a committed prefix, but
        # the replay's mode("overwrite") rewrite is bit-identical, so a
        # reader seeing the prefix sees exactly the rows the replay will
        # re-commit (ADVICE r7 #2 — do not depend on Spark's optional
        # _SUCCESS marker).
        for d in subdirs:
            with open(os.path.join(d, self._COMMIT_MARKER), "w") as f:
                f.write(str(int(batch_id)))
        sigs.unpersist()
        banded_new.unpersist()

    # -- wiring ----------------------------------------------------------------

    def stream_into(self, stream_df: DataFrame, checkpoint_dir: str):
        """Attach to a streaming DataFrame of documents; the index and the
        pairs table advance exactly-once per micro-batch."""
        return (
            stream_df.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    # -- maintenance -------------------------------------------------------------

    def compact(self, spark: SparkSession, allow_active: bool = False) -> None:
        """Collapse the accumulated `_batch=<id>/` subdirs of the band and
        shingle stores into one `_compacted/` segment each, sorted by the
        join key so parquet row-groups cluster by (band, bkey) / id.
        Per-batch scan cost resets to one segment; at 100 TB the same
        rewrite targets a table bucketed on the join key
        (operators/relational.write_bucketed) so the index side of the
        band join stops shuffling entirely.

        OFFLINE-ONLY: do NOT run while a stream is feeding this index.
        apply_batch enumerates `_batch=` subdirs at plan-build time and
        Spark reads the files lazily, so deleting absorbed subdirs
        mid-micro-batch fails the batch with FileNotFoundException
        (ADVICE r6 #2).  Guarded: raises if the session has ANY active
        streaming query (conservative — the session-level API cannot
        attribute a query to this index); pass allow_active=True only
        when the active queries are known not to touch this index.

        Crash-safety (both holes confirmed by review + reproduction):
        - rows KEEP their `_batch` id inside the segment, so a replayed
          micro-batch still excludes its own absorbed rows via the
          before_batch filter — compacting right after a crashed
          (uncommitted) batch no longer makes the replay match the batch
          against itself;
        - the swap is rename(final→_trash), rename(_compacting→final),
          THEN delete the absorbed subdirs and the trash — a kill at any
          point leaves either the old segment recoverable (_segment_dir
          falls back to _trash) or stale subdirs that readers skip via
          the `_absorbed_upto` marker and the next compact() removes."""
        import json
        import shutil

        if not allow_active and spark.streams.active:
            raise RuntimeError(
                "compact() is offline-only: the session has "
                f"{len(spark.streams.active)} active streaming quer(y/ies), and "
                "deleting absorbed _batch= subdirs under a running micro-batch "
                "fails it with FileNotFoundException; stop the stream first "
                "(or pass allow_active=True if none of them feed this index)"
            )
        for path, sort_cols in (
            (self._bands_dir, ["_band", "_bkey"]),
            (self._shingles_dir, ["_id"]),
        ):
            if not os.path.isdir(path):
                continue
            final = os.path.join(path, "_compacted")
            trash = os.path.join(path, "_trash")
            tmp = os.path.join(path, "_compacting")
            # heal prior crashes: a trash with no final IS the segment; a
            # trash beside a final is a completed swap's leftover
            if os.path.isdir(trash) and not os.path.isdir(final):
                os.rename(trash, final)
            shutil.rmtree(trash, ignore_errors=True)
            shutil.rmtree(tmp, ignore_errors=True)

            seg = self._segment_dir(path)
            upto = self._absorbed_upto(seg)
            batch_ids = sorted(
                int(e.split("=", 1)[1])
                for e in os.listdir(path)
                if e.startswith("_batch=")
            )
            # absorb only COMMITTED subdirs (ADVICE r6 #1): an uncommitted
            # _batch=N is a crash leftover whose batch WILL replay (the
            # checkpoint never advanced); absorbing it would set upto=N and
            # permanently skip the replay's rewritten rows.  Uncommitted
            # dirs are deleted below like any other leftover — the replay
            # rewrites them from scratch.
            live_ids = [
                b
                for b in batch_ids
                if b > upto and self._committed(os.path.join(path, f"_batch={b}"))
            ]
            if not live_ids:
                # Nothing new to absorb.  With a segment, the remaining
                # subdirs are stale (≤ upto) or uncommitted crash leftovers
                # — both safe to drop (the checkpoint never advanced past
                # an uncommitted batch, so its replay rewrites from
                # scratch).  WITHOUT a segment — e.g. the post-crash,
                # pre-restart state where the only subdirs are uncommitted
                # — there is nothing to compact and nothing worth deleting:
                # just skip, or parts[0] below reads an empty list
                # (ADVICE r7 #3, reproduced in
                # test_compact_with_only_uncommitted_subdirs).
                if seg is not None:
                    for b in batch_ids:
                        shutil.rmtree(os.path.join(path, f"_batch={b}"), ignore_errors=True)
                continue

            parts = []
            if seg is not None:
                parts.append(spark.read.parquet(seg))
            if live_ids:
                parts.append(
                    spark.read.option("basePath", path)
                    .parquet(*[os.path.join(path, f"_batch={b}") for b in live_ids])
                    .withColumn("_batch", F.col("_batch").cast("long"))
                )
            merged = parts[0]
            for p in parts[1:]:
                merged = merged.unionByName(p)
            merged.repartition(*[F.col(c) for c in sort_cols]).sortWithinPartitions(
                *sort_cols
            ).write.mode("overwrite").parquet(tmp)
            new_upto = max([upto] + live_ids)
            with open(os.path.join(tmp, "_absorbed_upto.json"), "w") as f:
                json.dump({"upto": new_upto}, f)

            if os.path.isdir(final):
                os.rename(final, trash)
            os.rename(tmp, final)
            for b in batch_ids:
                shutil.rmtree(os.path.join(path, f"_batch={b}"), ignore_errors=True)
            shutil.rmtree(trash, ignore_errors=True)

    # -- readers -----------------------------------------------------------------

    def pairs(self, spark: SparkSession) -> DataFrame:
        idt = self.id_type
        return self._read_or_empty(
            spark, self._pairs_dir, f"new_id {idt}, match_id {idt}, jaccard double"
        )

    def indexed_ids(self, spark: SparkSession) -> DataFrame:
        return self._read_or_empty(
            spark, self._shingles_dir, f"_id {self.id_type}, _sh array<string>"
        ).select(F.col("_id").alias(self.id_col))
