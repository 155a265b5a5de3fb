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

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame


def _default_embedder(data: bytes) -> list[float]:
    """Deterministic stand-in for the CNN forward pass (see module doc)."""
    from ..llm.multimodal import _decode_image_bytes

    _w, _h, feature = _decode_image_bytes(data)
    return feature


def _cosine_scores(vec: list[float], centroids: list[tuple[str, list[float]]]):
    """Reference single-vector scorer (kept for tests/callers; the batch
    path in classify_images is the vectorized equivalent)."""
    nv = math.sqrt(sum(x * x for x in vec)) or 1.0
    out = []
    for label, c in centroids:
        nc = math.sqrt(sum(x * x for x in c)) or 1.0
        dot = sum(a * b for a, b in zip(vec, c))
        out.append((label, dot / (nv * nc)))
    return out


def _cosine_score_matrix(
    vecs: "list[list[float]]", cmat: np.ndarray, cnorms: np.ndarray
) -> np.ndarray:
    """Batch cosine scores: (B embeddings) x (L centroids) in ONE numpy
    matmul (r7 verdict #8: per-row Python loops in the head do not hold
    against a 1000-label zoo at 100 TB; E @ C.T does).

    Matches _cosine_scores' zip semantics exactly: the dot runs over the
    overlap of the two vectors (embeddings shorter than the centroid
    width are zero-padded ≡ zip truncation of the centroid; longer ones
    are truncated for the dot but keep their FULL norm)."""
    d = cmat.shape[1] if cmat.size else 0
    e = np.zeros((len(vecs), d))
    norms = np.empty(len(vecs))
    for i, v in enumerate(vecs):
        a = np.asarray(v, dtype=np.float64)
        norms[i] = np.sqrt((a * a).sum()) or 1.0
        k = min(len(a), d)
        e[i, :k] = a[:k]
    return (e @ cmat.T) / (norms[:, None] * cnorms[None, :])


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
    cat_of = dict(categories or {})
    labels_l = [lb for lb, _ in cents]
    # centroid matrix built ONCE, rides the closure: rows may be ragged
    # (callers can mix widths); pad to the max like the zip semantics
    dmax = max((len(c) for _, c in cents), default=0)
    cmat = np.zeros((len(cents), dmax))
    cnorms = np.empty(len(cents))
    for i, (_, c) in enumerate(cents):
        a = np.asarray(c, dtype=np.float64)
        cmat[i, : len(a)] = a
        cnorms[i] = np.sqrt((a * a).sum()) or 1.0
    base = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in df.schema.fields
    )
    schema = base + f", `{out_col}` array<struct<label:string,score:double>>"

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            # embed per row (the conv forward is inherently per-image),
            # score the whole batch in one E @ C.T matmul
            vecs, live = [], []
            for j, payload in enumerate(pdf[media_col]):
                data = bytes(payload) if payload is not None else b""
                if data:
                    vecs.append(emb(data))
                    live.append(j)
            scores = _cosine_score_matrix(vecs, cmat, cnorms)
            labels: list[list] = [[] for _ in range(len(pdf))]
            for row, j in enumerate(live):
                scored = list(zip(labels_l, scores[row]))
                if cat_of:
                    best: dict[str, float] = {}
                    for lb, sc in scored:
                        key = cat_of.get(lb, lb)
                        best[key] = max(best.get(key, -1e9), sc)
                    scored = list(best.items())
                scored.sort(key=lambda t: (-t[1], t[0]))
                labels[j] = [
                    {"label": lb, "score": float(sc)} for lb, sc in scored[:top_n]
                ]
            pdf = pdf.copy()
            pdf[out_col] = labels
            yield pdf

    return df.mapInPandas(run, schema=schema)
