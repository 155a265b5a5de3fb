"""Multimodal-column queries: binary media plumbing exercised end-to-end
through the driver surface (rows-only checks — the decode step is the
documented deterministic stub; swap in PIL/ffmpeg and the plan is
unchanged)."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..llm import multimodal as MM
from ..tables import load_table
from . import query


@query("multimodal_decode_stats", tags=("llm", "multimodal"))
def multimodal_decode_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents.text bytes treated as opaque media -> typed media column
    (binary + checksum + length) -> Arrow-batched mapInPandas decode ->
    per-dimension histogram of decoded 'image' widths."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_binary(docs, "text", media_type="image/fake")
    feats = MM.decode_features(media)
    return (
        feats.groupBy("width")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.avg("byte_len").alias("avg_bytes"),
        )
        .orderBy("width")
    )


@query("multimodal_frame_sample", tags=("llm", "multimodal"))
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling plumbing: every 10th 'frame' of each
    media blob as (checksum, frame_idx) rows."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_binary(docs, "text", media_type="video/fake")
    frames = MM.frame_sample_plan(media, every_n=10)
    return frames.groupBy("checksum").agg(F.count(F.lit(1)).alias("n_frames"))
