"""Streaming queries on the driver surface: the events table is replayed
through the REAL Structured Streaming code path (file-stream micro-batches,
event-time windows, watermark) and the final state is oracle-checked
against the batch SQL truth — the strongest correctness statement a
bounded replay can make about the unbounded path.
"""

from __future__ import annotations

import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .. import streaming as STR
from ..tables import load_table
from . import query

_TUMBLING_ORACLE = """
SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS window_start,
       COUNT(*) AS n
FROM events GROUP BY 1
"""


@query("streaming_tumbling_replay", oracle=_TUMBLING_ORACLE, tags=("streaming",))
def streaming_tumbling_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly event counts computed BY THE STREAMING ENGINE: ordered
    4-chunk replay -> withWatermark -> window() groupBy -> update-mode
    memory sink; a window's final update is its count, so max() over the
    update log equals the batch answer exactly."""
    events = load_table(spark, sf_dir, "events")
    stage = tempfile.mkdtemp(prefix="tuktu_stream_replay_")
    stream = STR.replay_dataframe(events, stage, chunks=4, order_col="ts")
    windowed = STR.tumbling_window_agg(
        stream, "ts", "1 hour", {"n": F.count(F.lit(1))}, watermark="1 hour"
    )
    q, name = STR.memory_sink(windowed, output_mode="update")
    q.processAllAvailable()
    q.stop()
    return (
        spark.table(name)
        .groupBy("window_start")
        .agg(F.max("n").alias("n"))
    )
