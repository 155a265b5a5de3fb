"""Content-defined chunking (CDC) dedup for binary blobs.

Public technique (LBFS, Muthitacharoen et al. 2001; Gear/FastCDC, Xia et
al. 2016): chunk boundaries are chosen where a ROLLING hash of the
content hits a mask, so identical REGIONS of different blobs produce
identical chunks even when their offsets differ — the property fixed-size
chunking lacks (one inserted byte shifts every later fixed block). This
is the storage-level dedup primitive for 100 TB multimodal corpora:
near-identical media files (re-muxed videos, re-saved archives,
partially-updated tars) share most of their chunk set, and chunk-hash
dedup quantifies and removes that redundancy below the file level.

Determinism: the Gear table derives from the same seed-free LCG used by
the MinHash coefficients; the rolling hash is pure integer arithmetic —
the same bytes chunk the same way everywhere.

Scale shape: chunking + hashing is a zero-shuffle Arrow map (bytes never
leave the task; only (id, chunk_idx, offset, length, chunk_md5) rows
emerge — kilobyte-scale per blob); dedup is one groupBy(chunk_md5) over
those rows, the exact_dedup shape at chunk granularity.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gear_table() -> list[int]:
    out, x = [], 2654435769
    for _ in range(256):
        x = (x * 6364136223846793005 + 1442695040888963407) % (1 << 64)
        out.append(x)
    return out


_GEAR = _gear_table()
_MASK64 = (1 << 64) - 1


def cdc_boundaries(
    data: bytes, mask_bits: int = 6, min_size: int = 16, max_size: int = 256
) -> list[int]:
    """Chunk END offsets (exclusive) for ``data``: a boundary falls after
    byte i when the Gear rolling hash has ``mask_bits`` low zero bits and
    the current chunk is at least ``min_size`` long; a chunk is force-cut
    at ``max_size``. The expected chunk length is ~2^mask_bits + min_size.
    The hash resets at each boundary (FastCDC convention), so a chunk's
    cut depends only on its own bytes — the content-defined property."""
    mask = (1 << mask_bits) - 1
    ends: list[int] = []
    h = 0
    start = 0
    for i, b in enumerate(data):
        h = ((h << 1) + _GEAR[b]) & _MASK64
        size = i - start + 1
        if (size >= min_size and (h & mask) == 0) or size >= max_size:
            ends.append(i + 1)
            start = i + 1
            h = 0
    if start < len(data):
        ends.append(len(data))
    return ends


def cdc_chunks(
    data: bytes, mask_bits: int = 6, min_size: int = 16, max_size: int = 256
) -> list[tuple[int, int, str]]:
    """(offset, length, md5) per chunk."""
    out = []
    start = 0
    for end in cdc_boundaries(data, mask_bits, min_size, max_size):
        chunk = data[start:end]
        out.append((start, end - start, hashlib.md5(chunk).hexdigest()))
        start = end
    return out


CDC_SCHEMA = (
    "id bigint, chunk_idx int, offset bigint, length bigint, chunk_md5 string"
)


def cdc_chunk_table(
    df: DataFrame,
    id_col: str = "doc_id",
    media_col: str = "media",
    mask_bits: int = 6,
    min_size: int = 16,
    max_size: int = 256,
) -> DataFrame:
    """mapInPandas CDC over a binary column: (id, chunk_idx, offset,
    length, chunk_md5) rows. Bytes never leave the task."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for rec in pdf.to_dict("records"):
                if rec[id_col] is None:
                    # a null id cannot join back to anything — skip the
                    # row rather than TypeError inside the Arrow task
                    continue
                data = bytes(rec[media_col]) if rec[media_col] is not None else b""
                for k, (off, ln, md5) in enumerate(
                    cdc_chunks(data, mask_bits, min_size, max_size)
                ):
                    rows.append(
                        {
                            "id": int(rec[id_col]),
                            "chunk_idx": k,
                            "offset": off,
                            "length": ln,
                            "chunk_md5": md5,
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=["id", "chunk_idx", "offset", "length", "chunk_md5"],
            )

    return df.select(
        F.col(id_col).cast("bigint").alias(id_col), media_col
    ).mapInPandas(run, schema=CDC_SCHEMA)


def cdc_dedup_stats(chunks: DataFrame) -> DataFrame:
    """Corpus chunk-level dedup accounting from a cdc_chunk_table frame:
    one row — (total_chunks, unique_chunks, total_bytes, unique_bytes,
    saved_bytes). The groupBy(chunk_md5) is the exact_dedup shape at
    chunk granularity; lengths of equal-md5 chunks are equal, so
    unique_bytes sums one length per distinct hash."""
    per_hash = chunks.groupBy("chunk_md5").agg(
        F.count(F.lit(1)).alias("n_copies"), F.max("length").alias("length")
    )
    return per_hash.agg(
        F.sum("n_copies").cast("bigint").alias("total_chunks"),
        F.count(F.lit(1)).alias("unique_chunks"),
        F.sum(F.col("n_copies") * F.col("length")).cast("bigint").alias("total_bytes"),
        F.sum("length").cast("bigint").alias("unique_bytes"),
        (
            F.sum(F.col("n_copies") * F.col("length")) - F.sum("length")
        ).cast("bigint").alias("saved_bytes"),
    )
