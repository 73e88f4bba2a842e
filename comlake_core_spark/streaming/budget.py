"""Token-budget admission control — the training-data-pipeline quota
operator: admit events (documents, samples) per key in event-time order
until a cumulative-value budget is exhausted, then drop the rest.

The policy is the *longest event-time prefix whose running total stays
within budget*: every row's value counts toward the running total, a row is
admitted iff the total through it is <= budget. With non-negative values
the admitted set is a prefix, so the batch form is a plain window-cumsum
filter — which makes the semantics SQL-expressible (DuckDB oracle) while
the streaming form keeps per-key state alive across micro-batches.

Two streaming implementations of the same state machine:
- `admit_within_budget_stream` — applyInPandasWithState (GroupState), the
  production path here; state survives across micro-batches, append mode.
- `BudgetProcessor` — the same logic on Spark 4's transformWithStateInPandas
  successor API (typed ValueState, timers, TTL). Its Python state-server
  protocol needs the google-protobuf runtime, which this container lacks,
  so its test skips unless protobuf is importable; the logic is shared.

The reference has no quota/admission operator (its back-pressure is byte-level
I/O flow control, thesis/main/meth.tex:347-359); this is extension surface
for capping per-source ingestion in a 100 TB crawl.

Scale design: batch = one shuffle on the key (window partition); streaming
state = ONE long per key in the state store (not per event), so state size
is |keys|, independent of history. Arithmetic is exact: running totals are
kept in integer ten-thousandths, bit-identical to the batch plan's
DECIMAL(14,4) running sum, so streamed admission decisions equal the batch
twin's exactly (pytest-pinned, including a multi-micro-batch replay).
"""

from __future__ import annotations

from decimal import ROUND_HALF_UP, Decimal
from typing import TYPE_CHECKING, Iterator

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)
from pyspark.sql.window import Window

if TYPE_CHECKING:  # pragma: no cover
    from pyspark.sql.streaming.stateful_processor import TimerValues

OUTPUT_SCHEMA = "event_id long, user_id long, cum_value double"

_QUANTUM = Decimal("0.0001")


def _to_ten_thousandths(v: float) -> int:
    """double -> integer ten-thousandths with the same rounding Spark's
    double->DECIMAL(14,4) cast applies (HALF_UP on the exact binary value:
    java BigDecimal(double).setScale(4, HALF_UP) == Python
    Decimal(float).quantize(HALF_UP) — both see the full double expansion).
    """
    return int(Decimal(v).quantize(_QUANTUM, rounding=ROUND_HALF_UP).scaleb(4))


def admit_within_budget(df: DataFrame, budget: float) -> DataFrame:
    """Batch twin: DECIMAL(14,4) running sum per user in (ts, event_id)
    order, keep rows whose running total <= budget. One shuffle (the window
    partition); the filter is a codegen'd post-window predicate."""
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = F.sum(F.col("value").cast("decimal(14,4)")).over(w)
    return (
        df.select("event_id", "user_id", "ts", "value")
        .withColumn("cum", cum)
        .where(F.col("cum") <= F.lit(budget).cast("decimal(14,4)"))
        .select("event_id", "user_id", F.col("cum").cast("double").alias("cum_value"))
    )


def _admit_batch_slice(
    pdf: pd.DataFrame, spent: int, budget_t: int
) -> tuple[pd.DataFrame, int]:
    """The shared state transition: fold one micro-batch slice of a key
    (sorted by ts, event_id) into the running total; return (admitted rows,
    new total). Pure function so both streaming APIs run identical logic."""
    pdf = pdf.sort_values(["ts", "event_id"], ignore_index=True)
    increments = np.array([_to_ten_thousandths(v) for v in pdf["value"]], dtype=np.int64)
    cums = spent + np.cumsum(increments)
    new_spent = int(cums[-1]) if len(cums) else spent
    keep = cums <= budget_t
    out = pd.DataFrame(
        {
            "event_id": pdf["event_id"][keep],
            "user_id": pdf["user_id"][keep],
            "cum_value": cums[keep] / 10_000.0,
        }
    )
    return out, new_spent


def admit_within_budget_stream(stream_df: DataFrame, budget: float) -> DataFrame:
    """Streaming form via applyInPandasWithState: GroupState holds one long
    per user (integer ten-thousandths spent so far). Append mode — admitted
    rows are final the moment they're emitted, budgets only grow toward the
    cap. Requires event-time-ordered arrival across micro-batches per key
    (file replay split on time boundaries; a Kafka source partitioned by
    key with in-order producers)."""
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    budget_t = _to_ten_thousandths(budget)

    def update(key, pdf_iter, state: GroupState):
        (spent,) = state.get if state.exists else (0,)
        pdf = pd.concat(list(pdf_iter), ignore_index=True)
        out, spent = _admit_batch_slice(pdf, int(spent), budget_t)
        state.update((spent,))
        yield out

    return stream_df.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=OUTPUT_SCHEMA,
        stateStructType="spent long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


class BudgetProcessor(StatefulProcessor):
    """Spark 4 transformWithStateInPandas successor form of the same state
    machine (typed ValueState instead of GroupState). The PySpark side of
    this operator speaks a protobuf protocol to the JVM state server
    (pyspark/sql/streaming/proto), so it needs google-protobuf at runtime —
    absent here; the guarded test skips unless it is importable. Requires
    spark.sql.streaming.stateStore.providerClass=RocksDBStateStoreProvider."""

    def __init__(self, budget: float):
        self._budget_t = _to_ten_thousandths(budget)

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._spent = handle.getValueState("spent", "spent long")

    def handleInputRows(self, key, rows, timerValues) -> Iterator[pd.DataFrame]:
        prev = self._spent.get()
        spent = int(prev[0]) if prev is not None else 0
        pdf = pd.concat(list(rows), ignore_index=True)
        out, spent = _admit_batch_slice(pdf, spent, self._budget_t)
        self._spent.update((spent,))
        yield out

    def close(self) -> None:
        pass


def admit_within_budget_stream_tws(stream_df: DataFrame, budget: float) -> DataFrame:
    """transformWithStateInPandas wiring for BudgetProcessor (see class doc
    for the runtime requirements)."""
    return stream_df.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=BudgetProcessor(budget),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
