"""Streaming stateful operators, joins and sinks."""

from __future__ import annotations

import uuid
from collections.abc import Callable, Iterator
from typing import Any

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout


def streaming_dedup(
    df: DataFrame,
    keys: list[str],
    ts_col: str | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """StreamingDeduplicationProcessor (StreamingDeduplicationProcessor.
    scala:12-35). The reference keeps an UNBOUNDED in-memory seen-set; with
    a watermark the state is bounded — strictly better at scale."""
    if ts_col is not None:
        return df.withWatermark(ts_col, watermark).dropDuplicatesWithinWatermark(keys)
    return df.dropDuplicates(keys)


def running_count_stateful(
    df: DataFrame, key_cols: list[str], out_schema: str | None = None
) -> DataFrame:
    """RunningCountProcessor (BaseProcessors.scala:184-208) as a custom
    stateful streaming operator: per-key monotonically increasing counter
    via applyInPandasWithState (the reference holds the counter in the
    actor; here it lives in the state store, fault-tolerant)."""
    out_schema = out_schema or (
        ", ".join(f"{k} string" for k in key_cols) + ", events bigint, total bigint"
    )

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        (total,) = state.get if state.exists else (0,)
        events = 0
        for pdf in pdfs:
            events += len(pdf)
        total += events
        state.update((total,))
        yield pd.DataFrame(
            [{**dict(zip(key_cols, key)), "events": events, "total": total}]
        )

    return df.groupBy(*key_cols).applyInPandasWithState(
        update,
        outputStructType=out_schema,
        stateStructType="total bigint",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_static_join(
    stream: DataFrame, static: DataFrame, on: list[str], how: str = "left"
) -> DataFrame:
    """Lookup join of a stream against a (broadcast) dimension table — the
    SQLProcessor/MongoDBFind per-row lookup pattern (sql.scala:46-111)."""
    return stream.join(F.broadcast(static), on, how)


def stream_stream_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """JoinGenerator (JoinGenerator.scala:29-151) equivalent: symmetric
    stream-stream equi-join; watermarks on both sides bound the hash state
    the reference kept unbounded."""
    lw = left.withWatermark(left_ts, watermark)
    rw = right.withWatermark(right_ts, watermark)
    return lw.join(rw, on, how)


def stream_stream_interval_join(
    left: DataFrame,
    right: DataFrame,
    on: list[str],
    left_ts: str,
    right_ts: str,
    lower: str,
    upper: str,
    watermark: str = "10 minutes",
    how: str = "inner",
) -> DataFrame:
    """Stream-stream join with an EVENT-TIME RANGE condition
    (right_ts in [left_ts - lower, left_ts + upper]): the form whose join
    state Spark can actually evict — watermark + time bound give the
    engine a provable horizon per side, so state is O(watermark window)
    regardless of stream length. Prefer this over ``stream_stream_join``
    for unbounded runs; a bare equi-join must retain every row forever.
    """
    lw = left.withWatermark(left_ts, watermark).alias("l")
    rw = right.withWatermark(right_ts, watermark).alias("r")
    cond = F.lit(True)
    for c in on:
        cond = cond & (F.col(f"l.{c}") == F.col(f"r.{c}"))
    cond = (
        cond
        & (F.col(f"r.{right_ts}") >= F.col(f"l.{left_ts}") - F.expr(f"INTERVAL {lower}"))
        & (F.col(f"r.{right_ts}") <= F.col(f"l.{left_ts}") + F.expr(f"INTERVAL {upper}"))
    )
    return lw.join(rw, cond, how)


def memory_sink(
    df: DataFrame,
    name: str | None = None,
    output_mode: str = "append",
    available_now: bool = True,
):
    """Into an in-memory table (sync-flow endpoint / test harness).
    Returns (query, table_name).

    ``available_now=True`` (default) runs to completion over the data that
    already exists — right for bounded replays. For LIVE sources (rate,
    kafka) pass False: availableNow would see an empty source and finish
    before the first tick ever fires."""
    name = name or f"mem_{uuid.uuid4().hex[:8]}"
    writer = df.writeStream.format("memory").queryName(name).outputMode(output_mode)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start(), name


def foreach_batch_sink(
    df: DataFrame,
    fn: Callable[[DataFrame, int], Any],
    checkpoint: str,
    output_mode: str = "update",
):
    """SizeBuffer / BulkUpserter patterns (BufferProcessors.scala:94-109;
    sql/BulkUpserter.scala): arbitrary per-micro-batch logic with
    exactly-once bookkeeping via the checkpoint."""
    return (
        df.writeStream.foreachBatch(fn)
        .option("checkpointLocation", checkpoint)
        .outputMode(output_mode)
        .trigger(availableNow=True)
        .start()
    )
