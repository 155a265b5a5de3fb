"""Structured Streaming operators.

Tuktu's streaming model is processing-time push through actors with EOF
completion (SURVEY.md §2.11): time/count buffers, unbounded-state dedup,
streaming joins, per-packet counters. Here each maps to Structured
Streaming with *stronger* semantics — event time, watermarks bounding
state, exactly-once sinks via checkpointing:

| reference                               | here                          |
|-----------------------------------------|-------------------------------|
| TimeBufferProcessor (proc-time tumble)  | tumbling_window (event-time)  |
| SizeBufferProcessor (count buffer)      | foreach_batch coalescing      |
| StreamingDeduplicationProcessor         | streaming_dedup (+watermark)  |
| RunningCountProcessor                   | running_count_stateful        |
| JoinGenerator (stream-stream hash join) | stream_stream_join            |
| DummyGenerator ticks                    | rate_source                   |
| Kafka/Kinesis generators                | kafka_source (gated)          |
"""

from .sources import file_stream_source, rate_source, replay_dataframe
from .llm import (
    streaming_exact_dedup,
    streaming_minhash_candidates,
    streaming_paragraph_dedup,
)
from .windows import session_window_agg, sliding_window_agg, tumbling_window_agg
from .ops import (
    foreach_batch_sink,
    memory_sink,
    running_count_stateful,
    stream_static_join,
    stream_stream_interval_join,
    stream_stream_join,
    streaming_dedup,
)

__all__ = [
    "rate_source",
    "file_stream_source",
    "replay_dataframe",
    "tumbling_window_agg",
    "sliding_window_agg",
    "session_window_agg",
    "streaming_dedup",
    "running_count_stateful",
    "stream_static_join",
    "stream_stream_join",
    "stream_stream_interval_join",
    "memory_sink",
    "foreach_batch_sink",
]
