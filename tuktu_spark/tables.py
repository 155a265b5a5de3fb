"""Loaders for the driver test corpus (TESTDATA.md).

One parquet file per table under ``{sf_dir}/{name}.parquet``. At cluster
scale these would be partitioned directories; ``spark.read.parquet`` is
identical either way and keeps predicate pushdown / column pruning intact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Confs the query layer depends on, applied to ANY session (the driver
# passes its own SparkSession, not ours — see session.py for the rationale
# behind each). All three are runtime-settable.
_SESSION_CONFS = {
    # events.ts is parquet TIMESTAMP(NANOS). Older Sparks need this legacy
    # conf to read it (as bigint nanos); Spark >= 4.1 ignores it and reads
    # nanos natively as timestamp_ntz truncated to micros. load_table
    # normalizes BOTH shapes to a plain (UTC) timestamp column.
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    # engine-portable timestamp semantics (oracle side is naive/UTC)
    "spark.sql.session.timeZone": "UTC",
    # Arrow transfer for the pandas-UDF seams
    "spark.sql.execution.arrow.pyspark.enabled": "true",
}


def ensure_session_confs(spark: SparkSession) -> None:
    """Make an externally-supplied session able to run every query.

    Idempotent and cheap; called from ``load_table`` and the query registry
    so the driver's vanilla session behaves like ``session.get_spark()``'s.
    """
    for k, v in _SESSION_CONFS.items():
        try:
            if spark.conf.get(k, None) != v:
                spark.conf.set(k, v)
        except Exception:
            spark.conf.set(k, v)


TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def table_path(sf_dir: str, name: str) -> str:
    return f"{sf_dir}/{name}.parquet"


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    ensure_session_confs(spark)
    df = spark.read.parquet(table_path(sf_dir, name))
    if name == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            # TIMESTAMP(NANOS) read via nanosAsLong -> microsecond
            # timestamp, matching DuckDB's CAST(ts AS TIMESTAMP) truncation.
            df = df.withColumn("ts", F.expr("timestamp_micros(ts DIV 1000)"))
        elif ts_type == "timestamp_ntz":
            # Spark >= 4.1 reads TIMESTAMP(NANOS) natively as timestamp_ntz
            # (already micros-truncated, byte-identical to DuckDB). Session
            # TZ is pinned to UTC, so the cast reinterprets the same instant.
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def register_views(spark: SparkSession, sf_dir: str, names=TABLES) -> None:
    """Register each table as a temp view so flows can use ``spark.sql``."""
    for name in names:
        load_table(spark, sf_dir, name).createOrReplaceTempView(name)
