"""Image classification operators (deeplearn module).

Reference capability: modules/deeplearn/app/tuktu/deeplearn/processors/
image/{InceptionClassifier,VGG16Classifier,InceptionTensorClassifier}
.scala — per-datum image -> top-n (label, score) pairs from a pretrained
CNN, with optional flatten-to-top-1 and label->category coarsening.

Spark-first shape: the CNN is an EMBEDDER seam (bytes -> float vector)
executed inside Arrow batches, and the classifier head is a broadcast
matrix of label centroids scored with one numpy matmul per batch — the
standard distributed-inference layout (weights ship once per executor,
images never shuffle). The container has no TF/Torch; three embedders:
``ml.cnn.cnn_embed_bytes`` (model='cnn' in the operator) is a REAL
from-scratch convolutional forward pass over the stdlib codec decode
(deterministic weights, .npz seam for trained ones); the default remains
the byte-sample feature from llm/multimodal._decode_image_bytes (real
header parsing, fake pixels — cheapest, plumbing-only); inject
``embedder`` (bytes -> list[float]) to wrap a real InceptionV3/VGG16
forward pass and nothing else changes.
"""

from __future__ import annotations

import math
from collections.abc import Callable, Iterator

import pandas as pd

from pyspark.sql import DataFrame


def _default_embedder(data: bytes) -> list[float]:
    """Deterministic stand-in for the CNN forward pass (see module doc)."""
    from ..llm.multimodal import _decode_image_bytes

    _w, _h, feature = _decode_image_bytes(data)
    return feature


def _cosine_scores(vec: list[float], centroids: list[tuple[str, list[float]]]):
    nv = math.sqrt(sum(x * x for x in vec)) or 1.0
    out = []
    for label, c in centroids:
        nc = math.sqrt(sum(x * x for x in c)) or 1.0
        dot = sum(a * b for a, b in zip(vec, c))
        out.append((label, dot / (nv * nc)))
    return out


def classify_images(
    df: DataFrame,
    media_col: str,
    centroids: dict[str, list[float]],
    top_n: int = 3,
    embedder: Callable[[bytes], list[float]] | None = None,
    categories: dict[str, str] | None = None,
    out_col: str = "labels",
) -> DataFrame:
    """Append ``out_col``: array<struct<label string, score double>> of the
    ``top_n`` cosine-nearest label centroids for each image. mapInPandas:
    the centroid table and embedder ride the closure (broadcast once per
    executor); each Arrow batch embeds + scores locally — zero shuffles.

    ``categories`` coarsens labels before ranking (use_categories in the
    reference): scores of labels mapping to the same category take the
    max."""
    emb = embedder or _default_embedder
    cents = sorted(centroids.items())
    cats = dict(categories or {})
    base = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = base + f", `{out_col}` array<struct<label:string,score:double>>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            labels = []
            for payload in pdf[media_col]:
                data = bytes(payload) if payload is not None else b""
                if not data:
                    labels.append([])
                    continue
                scored = _cosine_scores(emb(data), cents)
                if cats:
                    best: dict[str, float] = {}
                    for lb, sc in scored:
                        key = cats.get(lb, lb)
                        best[key] = max(best.get(key, -1e9), sc)
                    scored = list(best.items())
                scored.sort(key=lambda t: (-t[1], t[0]))
                labels.append(
                    [{"label": lb, "score": float(sc)} for lb, sc in scored[:top_n]]
                )
            pdf = pdf.copy()
            pdf[out_col] = labels
            yield pdf

    return df.mapInPandas(run, schema=schema)
