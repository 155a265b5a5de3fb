"""Streaming sources."""

from __future__ import annotations

import os
import shutil
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def rate_source(
    spark: SparkSession, rows_per_second: int = 10, constant: dict | None = None
) -> DataFrame:
    """DummyGenerator / RandomGenerator analogue (DummyGenerator.scala:34-115):
    a tick stream, optionally with constant fields attached."""
    df = spark.readStream.format("rate").option("rowsPerSecond", rows_per_second).load()
    for name, value in (constant or {}).items():
        df = df.withColumn(name, F.lit(value))
    return df


def file_stream_source(
    spark: SparkSession,
    path: str,
    fmt: str = "parquet",
    schema=None,
    max_files_per_trigger: int | None = None,
    **options: str,
) -> DataFrame:
    """File-watch source (LineGenerator/CSVGenerator streaming analogue):
    new files under `path` become micro-batches."""
    reader = spark.readStream.format(fmt)
    if schema is not None:
        reader = reader.schema(schema)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", str(max_files_per_trigger))
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.load(path)


def replay_dataframe(
    df: DataFrame, stage_dir: str, chunks: int = 4, order_col: str | None = None
) -> DataFrame:
    """Test/backfill helper: stage a batch DataFrame as `chunks` parquet
    files and re-read them as a file stream (one file per micro-batch),
    replaying history through the exact streaming code path.

    When `order_col` is given, chunks are range-partitioned on it and their
    file modification times are spaced in range order: FileStreamSource picks
    files oldest-mtime-first, so micro-batches arrive in event-time order and
    a finite watermark never spuriously drops a whole chunk as late.
    """
    spark = df.sparkSession
    schema = df.schema
    staged = df.repartition(chunks) if order_col is None else df.repartitionByRange(
        chunks, order_col
    )
    tmp = os.path.join(stage_dir, "_replay_stage")
    staged.write.mode("overwrite").parquet(tmp)
    path = os.path.join(stage_dir, "replay")
    os.makedirs(path, exist_ok=True)
    # part-00000 is the lowest range partition under repartitionByRange, so
    # lexicographic part order == order_col order.
    parts = sorted(
        f for f in os.listdir(tmp) if f.startswith("part-") and not f.endswith(".crc")
    )
    base = time.time() - 2 * len(parts)
    for i, name in enumerate(parts):
        dst = os.path.join(path, f"chunk-{i:05d}.parquet")
        shutil.copyfile(os.path.join(tmp, name), dst)
        t = base + 2 * i
        os.utime(dst, (t, t))
    shutil.rmtree(tmp, ignore_errors=True)
    return file_stream_source(spark, path, "parquet", schema=schema, max_files_per_trigger=1)
