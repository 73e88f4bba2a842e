"""Incrementally-maintained aggregate views (materialized rollups).

The reference recomputes its catalog aggregates per query (SURVEY.md §2 —
aggregation operators over the lake); at 100 TB a dashboard-style rollup
cannot rescan history per refresh. `IncrementalRollup` keeps MERGEABLE
partial-aggregate state per group — count / non-null count / sum / min /
max, plus HLL sketches for approximate COUNT(DISTINCT) — so a refresh
costs one shuffle of the DELTA's partials plus a rewrite of state that is
O(#groups), never O(history).

Why these states: count/sum/min/max are commutative monoids (merge = sum /
sum / min / max), and the two classic aggregates that CANNOT be maintained
incrementally without the full value set ship as DataSketches sketches:
distinct-count as HLL (hll_sketch_agg / hll_union_agg, deterministic) and
quantiles as KLL (kll_sketch_agg_double / kll_sketch_merge_double —
randomized compaction, so estimates are accurate-but-not-bitwise-stable
across rebuilds).

State is versioned (`v=N` subdirectories) because Spark cannot atomically
overwrite a parquet path it is also reading; each refresh writes v=N+1 and
readers keep seeing v=N until the write commits. A `_LATEST` marker makes
reopen-from-disk pick the last committed version, so the view survives a
session restart. Old versions are pruned, keeping one back for in-flight
readers.

Finalization happens at read(): avg = sum / non-null-count (matching SQL
AVG's null semantics), distinct = hll_sketch_estimate(state). The
incremental result is pinned EXACTLY equal to a full recompute by the
`incremental_rollup_events` workload oracle. Sums are kept as EXACT
decimals (input cast to decimal(12,4), state capped at decimal(38,4) so
the schema is closed under merge): decimal addition is associative, so
the incrementally-merged sum is bitwise-identical to a full rescan —
double sums would drift with merge order and break both the oracle gate
and refresh-order reproducibility.
"""

from __future__ import annotations

import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class IncrementalRollup:
    def __init__(
        self,
        spark: SparkSession,
        path: str,
        keys: list[str],
        measures: list[str],
        distincts: list[str] | None = None,
        quantiles: dict[str, list[float]] | None = None,
    ):
        self.spark = spark
        self.path = path
        self.keys = list(keys)
        self.measures = list(measures)
        self.distincts = list(distincts or [])
        # column -> probed quantiles, maintained as mergeable KLL sketches —
        # like exact distinct, exact quantiles cannot be incrementally
        # maintained without the full value set; KLL is the sketch form
        self.quantiles = dict(quantiles or {})
        self.version = self._latest_on_disk()

    # -- state layout -------------------------------------------------------

    def _latest_on_disk(self) -> int:
        marker = os.path.join(self.path, "_LATEST")
        if os.path.exists(marker):
            with open(marker) as f:
                return int(f.read().strip())
        return -1

    def _state_path(self, version: int) -> str:
        return os.path.join(self.path, f"v={version}")

    def _read_state(self) -> DataFrame:
        return self.spark.read.parquet(self._state_path(self.version))

    def _partial(self, df: DataFrame) -> DataFrame:
        aggs = [F.count(F.lit(1)).alias("_cnt")]
        for m in self.measures:
            aggs += [
                F.count(m).alias(f"_nn_{m}"),
                F.sum(F.col(m).cast("decimal(12,4)")).cast("decimal(38,4)").alias(f"_sum_{m}"),
                F.min(m).alias(f"_min_{m}"),
                F.max(m).alias(f"_max_{m}"),
            ]
        for d in self.distincts:
            aggs.append(F.hll_sketch_agg(F.col(d).cast("string")).alias(f"_hll_{d}"))
        for q in self.quantiles:
            aggs.append(F.kll_sketch_agg_double(F.col(q).cast("double")).alias(f"_kll_{q}"))
        return df.groupBy(*self.keys).agg(*aggs)

    def _merge(self, a: DataFrame, b: DataFrame) -> DataFrame:
        aggs = [F.sum("_cnt").alias("_cnt")]
        for m in self.measures:
            aggs += [
                F.sum(f"_nn_{m}").alias(f"_nn_{m}"),
                F.sum(f"_sum_{m}").cast("decimal(38,4)").alias(f"_sum_{m}"),
                F.min(f"_min_{m}").alias(f"_min_{m}"),
                F.max(f"_max_{m}").alias(f"_max_{m}"),
            ]
        for d in self.distincts:
            aggs.append(F.hll_union_agg(f"_hll_{d}").alias(f"_hll_{d}"))
        for q in self.quantiles:
            # KLL has no union AGGREGATE (unlike HLL); merge is the scalar
            # kll_sketch_merge_double. A key here carries at most TWO
            # sketches (one from state, one from the delta partial), so
            # collect and pairwise-merge. (Not a fold via F.aggregate: a
            # binary accumulator through that higher-order function reads
            # corrupted sketch bytes — verified empirically.)
            aggs.append(F.collect_list(f"_kll_{q}").alias(f"_klls_{q}"))
        grouped = a.unionByName(b).groupBy(*self.keys).agg(*aggs)
        for q in self.quantiles:
            arr = F.col(f"_klls_{q}")
            merged = F.when(
                F.size(arr) >= 2,
                F.kll_sketch_merge_double(F.element_at(arr, 1), F.element_at(arr, 2)),
            ).otherwise(F.element_at(arr, 1))
            grouped = grouped.withColumn(f"_kll_{q}", merged).drop(f"_klls_{q}")
        return grouped

    # -- public API ---------------------------------------------------------

    def refresh(self, delta: DataFrame) -> int:
        """Fold `delta` into the view; returns the new version. Cost: one
        delta-sized partial aggregation (map-side combined) merged with
        O(#groups) state — history is never rescanned."""
        partial = self._partial(delta)
        merged = self._merge(self._read_state(), partial) if self.version >= 0 else partial
        new_version = self.version + 1
        merged.write.mode("overwrite").parquet(self._state_path(new_version))
        with open(os.path.join(self.path, "_LATEST"), "w") as f:
            f.write(str(new_version))
        # keep one version back for in-flight readers; prune older
        for v in range(new_version - 1):
            shutil.rmtree(self._state_path(v), ignore_errors=True)
        self.version = new_version
        return new_version

    def stream_into(self, stream_df: DataFrame, checkpoint_dir: str):
        """Maintain this view from a stream: each micro-batch is folded in
        via refresh(). Returns the started StreamingQuery (availableNow
        trigger — pass a continuous trigger in production).

        Exactly-once: Spark may REPLAY a micro-batch after a failure, and
        refresh() is additive (a replay would double-count), so the view
        records the last applied batch id and skips batches at or below
        it — refresh becomes idempotent per batch id, which composes with
        the checkpoint's at-least-once delivery to give effectively-once
        maintenance. The same pattern any foreachBatch sink without
        transactional writes needs."""
        return (
            stream_df.writeStream.foreachBatch(self.apply_batch)
            .option("checkpointLocation", checkpoint_dir)
            .trigger(availableNow=True)
            .start()
        )

    def apply_batch(self, batch_df: DataFrame, batch_id: int) -> None:
        """Idempotent-per-batch-id refresh (the foreachBatch body): a
        batch id at or below the last applied one is a replay and is
        skipped."""
        marker = os.path.join(self.path, "_LAST_BATCH")
        last = -1
        if os.path.exists(marker):
            with open(marker) as f:
                last = int(f.read().strip())
        if batch_id <= last:
            return
        self.refresh(batch_df)
        with open(marker, "w") as f:
            f.write(str(batch_id))

    def read(self) -> DataFrame:
        """Finalized view: n_rows, sum/avg/min/max per measure (avg over
        non-null rows, matching SQL AVG), approx_distinct per sketch."""
        cols = [*self.keys, F.col("_cnt").alias("n_rows")]
        for m in self.measures:
            sum_dbl = F.col(f"_sum_{m}").cast("double")
            cols += [
                sum_dbl.alias(f"sum_{m}"),
                F.when(F.col(f"_nn_{m}") > 0, sum_dbl / F.col(f"_nn_{m}")).alias(f"avg_{m}"),
                F.col(f"_min_{m}").alias(f"min_{m}"),
                F.col(f"_max_{m}").alias(f"max_{m}"),
            ]
        for d in self.distincts:
            cols.append(F.hll_sketch_estimate(f"_hll_{d}").alias(f"distinct_{d}"))
        for q, probes in self.quantiles.items():
            for p in probes:
                cols.append(
                    F.kll_sketch_get_quantile_double(f"_kll_{q}", F.lit(p)).alias(
                        f"p{int(p * 100):02d}_{q}"
                    )
                )
        return self._read_state().select(*cols)
