"""Date/time + event-time window queries (SURVEY.md §2.7/§2.9).

The reference only has processing-time buffers; these give the event-time
equivalents (date_trunc buckets, generalized N-unit normalization, tumbling
windows) that Structured Streaming shares with batch.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..operators import make_operator
from ..tables import load_table
from . import query

# ---------------------------------------------------------------------------
# date_trunc — TimestampNormalizerProcessor N=1
# (time/TimestampNormalizerProcessor.scala:17-105). Spark date_trunc returns
# TIMESTAMP; DuckDB returns DATE -> cast for parity.
# ---------------------------------------------------------------------------

_TRUNC_ORACLE = """
SELECT CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month,
       COUNT(*) AS n_orders
FROM orders GROUP BY 1
"""


@query("date_trunc_month", oracle=_TRUNC_ORACLE, tags=("time", "groupby"))
def date_trunc_month(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(F.date_trunc("month", "o_orderdate").alias("month")).agg(
        F.count(F.lit(1)).alias("n_orders")
    )


# ---------------------------------------------------------------------------
# Generalized normalization (N>1 units) — the TimestampNormalizer epoch
# bucketing, via the registered operator; 15-minute buckets over events.
# ---------------------------------------------------------------------------

_BUCKET_ORACLE = """
SELECT CAST(to_timestamp((epoch_us(CAST(ts AS TIMESTAMP)) // 1000000 // 900) * 900) AS TIMESTAMP) AS bucket,
       COUNT(*) AS n
FROM events GROUP BY 1
"""


@query("normalize_15min_buckets", oracle=_BUCKET_ORACLE, tags=("time", "groupby"))
def normalize_15min_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    norm = make_operator(
        "timestamp_normalize", {"field": "ts", "unit": "minutes", "n": 15, "as": "bucket"}
    )
    return norm(e).groupBy("bucket").agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# Tumbling event-time window — TimeBufferProcessor analogue
# (BufferProcessors.scala:114-144) on event time via window(); epoch-aligned
# 1h tumble == date_trunc('hour').
# ---------------------------------------------------------------------------

_WINDOW_ORACLE = """
SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS wstart,
       COUNT(*) AS n,
       CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE) AS value_sum
FROM events GROUP BY 1
"""


@query("tumbling_window_hourly", oracle=_WINDOW_ORACLE, tags=("time", "window", "streaming"), bench=True)
def tumbling_window_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "1 hour").alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("value_sum"),
        )
        .select(F.col("w.start").alias("wstart"), "n", "value_sum")
    )


# ---------------------------------------------------------------------------
# Period arithmetic — TimestampPeriodAdderProcessor
# (time/TimestampPeriodAdderProcessor.scala:18-65): both engines clamp
# month-end on add_months.
# ---------------------------------------------------------------------------

_PERIOD_ORACLE = """
SELECT o_orderkey,
       CAST(o_orderdate + INTERVAL 3 MONTH AS TIMESTAMP) AS due_date,
       CAST(o_orderdate + INTERVAL 10 DAY AS TIMESTAMP) AS followup
FROM orders
"""


@query("period_add_shift", oracle=_PERIOD_ORACLE, tags=("time",))
def period_add_shift(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    due = make_operator("period_add", {"field": "o_orderdate", "amounts": {"months": 3}, "as": "due_date"})
    fup = make_operator("period_add", {"field": "o_orderdate", "amounts": {"days": 10}, "as": "followup"})
    return fup(due(o)).select("o_orderkey", "due_date", "followup")


# ---------------------------------------------------------------------------
# Duration — DurationProcessor (time/DurationProcessor.scala:16-31): days
# between order and ship date; integral sums are exact in double.
# ---------------------------------------------------------------------------

_DURATION_ORACLE = """
SELECT o_orderpriority,
       CAST(SUM(datediff('day', o_orderdate, l_shipdate)) AS DOUBLE) / COUNT(*) AS avg_latency_days,
       MAX(datediff('day', o_orderdate, l_shipdate)) AS max_latency_days
FROM lineitem JOIN orders ON l_orderkey = o_orderkey
GROUP BY o_orderpriority
"""


@query("ship_latency_days", oracle=_DURATION_ORACLE, tags=("time", "join"))
def ship_latency_days(spark: SparkSession, sf_dir: str) -> DataFrame:
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    lat = F.datediff("l_shipdate", "o_orderdate")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            (F.sum(lat).cast("double") / F.count(F.lit(1))).alias("avg_latency_days"),
            F.max(lat).alias("max_latency_days"),
        )
    )


# ---------------------------------------------------------------------------
# Calendar part extraction — ConvertToDate-adjacent field math; isodow kept
# engine-portable (Spark weekday()+1 == DuckDB isodow).
# ---------------------------------------------------------------------------

_PARTS_ORACLE = """
SELECT CAST(extract(year FROM o_orderdate) AS INT) AS y,
       CAST(extract(month FROM o_orderdate) AS INT) AS m,
       CAST(isodow(o_orderdate) AS INT) AS dow,
       COUNT(*) AS n
FROM orders GROUP BY 1, 2, 3
"""


@query("calendar_parts", oracle=_PARTS_ORACLE, tags=("time", "groupby"))
def calendar_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy(
        F.year("o_orderdate").alias("y"),
        F.month("o_orderdate").alias("m"),
        (F.weekday("o_orderdate") + 1).alias("dow"),
    ).agg(F.count(F.lit(1)).alias("n"))


# ---------------------------------------------------------------------------
# Session windows (absent in the reference — SURVEY §2.7 notes no session
# windows exist there; Spark's session_window is the superset we expose).
# Oracle: classic gap-based sessionization via lag + running sum. A new
# session starts when the gap is >= 30 minutes, matching session_window's
# half-open [t, t+gap) extension semantics.
# ---------------------------------------------------------------------------

_SESSION_ORACLE = """
WITH ordered AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS t,
         CASE WHEN CAST(ts AS TIMESTAMP)
                   - lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP))
                   >= INTERVAL 30 MINUTE
              OR lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY CAST(ts AS TIMESTAMP)) IS NULL
              THEN 1 ELSE 0 END AS new_session
  FROM events
), sessions AS (
  SELECT user_id, t,
         SUM(new_session) OVER (PARTITION BY user_id ORDER BY t
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM ordered
)
SELECT user_id, MIN(t) AS session_start, COUNT(*) AS n_events
FROM sessions GROUP BY user_id, sid
"""


@query("session_window_per_user", oracle=_SESSION_ORACLE, tags=("time", "window", "streaming"))
def session_window_per_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy("user_id", F.session_window("ts", "30 minutes").alias("w"))
        .agg(F.count(F.lit(1)).alias("n_events"))
        .select("user_id", F.col("w.start").alias("session_start"), "n_events")
    )


# ---------------------------------------------------------------------------
# Sliding windows (2h length, 1h slide) — each event belongs to 2 windows;
# the oracle materializes both membership rows per event.
# ---------------------------------------------------------------------------

_SLIDING_ORACLE = """
WITH exploded AS (
  SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP)
           - to_hours(i) AS wstart,
         value
  FROM events, unnest([0, 1]) AS t(i)
)
SELECT wstart, COUNT(*) AS n
FROM exploded GROUP BY wstart
"""


@query("sliding_window_counts", oracle=_SLIDING_ORACLE, tags=("time", "window", "streaming"))
def sliding_window_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = load_table(spark, sf_dir, "events")
    return (
        e.groupBy(F.window("ts", "2 hours", "1 hour").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .select(F.col("w.start").alias("wstart"), "n")
    )
