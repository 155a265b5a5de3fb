"""Multimodal column plumbing: image/audio/video as opaque binary columns
with typed metadata, processed via Arrow-batched mapInPandas.

The Spark-side contract is real and tested — schemas, partition sizing,
UDF signatures, batch iteration. The actual media decode is STUBBED
(``decode_stub``) because media libraries aren't in this container; swap
``_decode_image_bytes`` for a PIL/ffmpeg call and nothing else changes.

Scale notes: binary payloads ride in Arrow record batches; keep
``spark.sql.files.maxPartitionBytes`` at default 128 MB so a partition of
images fits executor memory, and repartition by a size-aware key before
heavy decode so AQE can balance skewed media sizes.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

MEDIA_SCHEMA = (
    "media binary, media_type string, byte_len bigint, checksum string"
)

FEATURE_SCHEMA = (
    "checksum string, byte_len bigint, width int, height int, feature array<float>"
)


def attach_binary(df: DataFrame, src_col: str, media_type: str = "application/octet-stream") -> DataFrame:
    """Wrap a column's bytes as a typed media column + metadata (the
    binaryFile-source shape: content/length/path)."""
    media = F.col(src_col).cast("binary")
    return df.select(
        media.alias("media"),
        F.lit(media_type).alias("media_type"),
        F.length(media).cast("bigint").alias("byte_len"),
        F.sha2(media, 256).alias("checksum"),
    )


def _decode_image_bytes(data: bytes) -> tuple[int, int, list[float]]:
    """STUB decode. Real pipelines: PIL.Image.open(io.BytesIO(data)).

    Deterministic fake: 'dimensions' and a tiny 'feature vector' derived
    from the byte content, so tests exercise real data flow end-to-end.
    """
    if not data:
        raise NotImplementedError("empty media payload; no decoder available")
    width = 1 + data[0] % 64
    height = 1 + data[-1] % 64
    step = max(1, len(data) // 8)
    feature = [float(b) / 255.0 for b in data[::step][:8]]
    feature += [0.0] * (8 - len(feature))
    return width, height, feature


def decode_features(df: DataFrame, batch_hint: int = 1024) -> DataFrame:
    """mapInPandas decode: binary media -> (checksum, dims, feature vector).

    Arrow moves the bytes in columnar batches; the pandas function sees a
    chunk iterator, so peak memory is one batch, not one partition.
    """

    def decode(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for _, row in pdf.iterrows():
                data = bytes(row["media"]) if row["media"] is not None else b""
                w, h, feat = _decode_image_bytes(data)
                rows.append(
                    {
                        "checksum": row["checksum"],
                        "byte_len": int(row["byte_len"]),
                        "width": w,
                        "height": h,
                        "feature": feat,
                    }
                )
            yield pd.DataFrame(rows)

    return df.mapInPandas(decode, schema=FEATURE_SCHEMA)


def frame_sample_plan(df: DataFrame, every_n: int = 10) -> DataFrame:
    """Video frame-sampling plumbing: emit (checksum, frame_idx) rows for
    every n-th 'frame' (stub: byte_len/1000 frames). The explode keeps frame
    extraction embarrassingly parallel downstream."""
    n_frames = F.greatest((F.col("byte_len") / 1000).cast("int"), F.lit(1))
    idx = F.sequence(F.lit(0), n_frames - 1, F.lit(every_n))
    return df.select("checksum", F.explode(idx).alias("frame_idx"))
