"""Event-time window aggregations.

The reference only has processing-time buffers (TimeBufferProcessor,
BufferProcessors.scala:114-144) — no event time, no watermark, no late
data handling (SURVEY.md §2.7). These builders are the event-time superset;
the watermark bounds state so a 100 TB/day stream doesn't accumulate
unbounded window state.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def tumbling_window_agg(
    df: DataFrame,
    ts_col: str,
    window_length: str,
    aggs: dict[str, Column],
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Tumbling event-time window — TimeBufferProcessor with event time."""
    wm = df.withWatermark(ts_col, watermark)
    group = [F.window(ts_col, window_length).alias("w"), *(keys or [])]
    out = wm.groupBy(*group).agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *(keys or []),
        *aggs.keys(),
    )


def sliding_window_agg(
    df: DataFrame,
    ts_col: str,
    window_length: str,
    slide: str,
    aggs: dict[str, Column],
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Sliding window — absent in the reference; free in Spark."""
    wm = df.withWatermark(ts_col, watermark)
    group = [F.window(ts_col, window_length, slide).alias("w"), *(keys or [])]
    out = wm.groupBy(*group).agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *(keys or []),
        *aggs.keys(),
    )


def session_window_agg(
    df: DataFrame,
    ts_col: str,
    gap: str,
    aggs: dict[str, Column],
    keys: list[str] | None = None,
    watermark: str = "10 minutes",
) -> DataFrame:
    """Session window (gap-based) — absent in the reference."""
    wm = df.withWatermark(ts_col, watermark)
    group = [F.session_window(ts_col, gap).alias("w"), *(keys or [])]
    out = wm.groupBy(*group).agg(*[c.alias(n) for n, c in aggs.items()])
    return out.select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        *(keys or []),
        *aggs.keys(),
    )
