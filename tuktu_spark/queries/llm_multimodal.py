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


_PROBE_ROUNDTRIP_ORACLE = """
SELECT CASE WHEN doc_id % 2 = 0 THEN 'png' ELSE 'wav' END AS format,
       CASE WHEN doc_id % 2 = 0 THEN CAST(1 + doc_id % 64 AS INT) END AS width,
       CASE WHEN doc_id % 2 = 0 THEN CAST(1 + doc_id % 32 AS INT) END AS height,
       CASE WHEN doc_id % 2 = 1 THEN CAST(1 + doc_id % 2 AS INT) END AS channels,
       CASE WHEN doc_id % 2 = 1 THEN CAST(8000 * (1 + doc_id % 3) AS INT) END
         AS sample_rate,
       CASE WHEN doc_id % 2 = 1 THEN
         CAST(((1 + doc_id % 10) * 100 * 1000) // (8000 * (1 + doc_id % 3))
              AS BIGINT) END AS duration_ms,
       COUNT(*) AS n
FROM documents
GROUP BY 1, 2, 3, 4, 5, 6
"""


@query(
    "multimodal_probe_roundtrip",
    oracle=_PROBE_ROUNDTRIP_ORACLE,
    tags=("llm", "multimodal"),
)
def multimodal_probe_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real-container round-trip, ORACLED: synthesize a spec-valid PNG
    (even doc_id) or RIFF/WAV (odd) whose parameters are arithmetic in
    doc_id, parse the real headers back with probe_media inside Arrow
    batches, and aggregate. The DuckDB oracle predicts the same metadata
    from doc_id alone — any header-layout or parser bug breaks the match."""
    import pandas as pd
    from pyspark.sql.functions import pandas_udf

    def synth(ids):
        return ids.map(
            lambda i: MM.make_png(1 + i % 64, 1 + i % 32)
            if i % 2 == 0
            else MM.make_wav(
                8000 * (1 + i % 3), 1 + i % 2, (1 + i % 10) * 100
            )
        )

    synth.__annotations__ = {"ids": pd.Series, "return": pd.Series}
    synth_udf = pandas_udf("binary")(synth)

    docs = load_table(spark, sf_dir, "documents").select("doc_id")
    media = docs.select(
        synth_udf(F.col("doc_id")).alias("media"),
        F.lit("media/real").alias("media_type"),
    ).select(
        "media",
        "media_type",
        F.length("media").cast("bigint").alias("byte_len"),
        F.sha2("media", 256).alias("checksum"),
    )
    probed = MM.probe_table(media)
    return probed.groupBy(
        "format", "width", "height", "channels", "sample_rate", "duration_ms"
    ).agg(F.count(F.lit(1)).alias("n"))


@query("multimodal_frame_sample", tags=("llm", "multimodal"))
def multimodal_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video-style frame sampling plumbing: every 10th 'frame' of each
    media blob as (checksum, frame_idx) rows."""
    docs = load_table(spark, sf_dir, "documents")
    media = MM.attach_binary(docs, "text", media_type="video/fake")
    frames = MM.frame_sample_plan(media, every_n=10)
    return frames.groupBy("checksum").agg(F.count(F.lit(1)).alias("n_frames"))
