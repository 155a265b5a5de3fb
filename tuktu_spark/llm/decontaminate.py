"""Benchmark decontamination: flag training documents that overlap an
evaluation set by long n-grams.

No reference analogue — this is a first-class training-data-pipeline
operation (the GPT-3/PaLM papers' published recipe: a training doc is
contaminated if it shares any long word n-gram, typically 13-gram, with an
eval example; public literature).

Scale design: the EVAL side is small by definition (thousands of
examples), so its n-gram hash set broadcasts; the corpus side is one
narrow shingle pass (same single-scan tokenize->shingle->hash as
llm/dedup.py) followed by a broadcast semi/inner join — the 100 TB corpus
never shuffles, and the scan reads only (id, text). Counting matches per
doc shuffles only the (doc, matched-gram) hits, which contamination makes
rare by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .dedup import _shingles_from_tokens, _tokens


def _gram_table(df: DataFrame, text_col: str, id_col, n: int, gram_alias: str) -> DataFrame:
    """(id?, gram_hash) — one row per distinct n-gram per row of df,
    xxhash64-keyed (internal join key, never surfaced)."""
    cols = [F.col(id_col)] if id_col else []
    tokd = df.select(*cols, _tokens(F.col(text_col)).alias("__toks"))
    grams = F.transform(
        _shingles_from_tokens(F.col("__toks"), n), lambda s: F.xxhash64(s)
    )
    return tokd.select(*cols, F.explode(grams).alias(gram_alias))


def contamination_report(
    corpus: DataFrame,
    eval_set: DataFrame,
    corpus_text: str = "text",
    corpus_id: str = "doc_id",
    eval_text: str = "text",
    n: int = 13,
) -> DataFrame:
    """(doc_id, n_matched_grams) for corpus docs sharing at least one
    word n-gram with any eval example. The eval n-gram set is broadcast;
    docs with zero overlap never leave the map stage."""
    eval_grams = _gram_table(eval_set, eval_text, None, n, "gram").distinct()
    corpus_grams = _gram_table(corpus, corpus_text, corpus_id, n, "gram")
    hits = corpus_grams.join(F.broadcast(eval_grams), "gram")
    return hits.groupBy(corpus_id).agg(
        F.count_distinct("gram").alias("n_matched_grams")
    )


def decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    corpus_text: str = "text",
    corpus_id: str = "doc_id",
    eval_text: str = "text",
    n: int = 13,
) -> DataFrame:
    """Corpus minus contaminated docs (left-anti against the broadcast
    eval n-gram set — the production filter shape)."""
    eval_grams = _gram_table(eval_set, eval_text, None, n, "gram").distinct()
    corpus_grams = _gram_table(corpus, corpus_text, corpus_id, n, "gram")
    contaminated = corpus_grams.join(F.broadcast(eval_grams), "gram").select(
        corpus_id
    ).distinct()
    return corpus.join(contaminated, corpus_id, "left_anti")


def semantic_decontaminate(
    corpus: DataFrame,
    eval_set: DataFrame,
    threshold: float = 0.9,
    corpus_vec: str = "embedding",
    corpus_id: str = "doc_id",
    eval_vec: str = "embedding",
    report: bool = False,
) -> DataFrame:
    """Embedding-level decontamination: drop corpus rows whose vector is
    cosine-similar (>= threshold) to ANY eval example — the semantic
    complement of the 13-gram filter, catching paraphrased/reformatted
    eval leakage exact n-grams miss (public practice: e.g. the
    phi/GPT-3 appendix decontamination discussions).

    Scale shape: eval sets are small — the eval side BROADCASTS and the
    corpus never shuffles (a broadcast nested-loop with an early cosine
    filter, the same sanctioned shape as brute-force ANN's query side);
    the contaminated-id set is then a broadcast anti join. report=True
    returns (corpus_id, n_eval_hits, max_cos) for audit instead of
    filtering."""
    from .similarity import cosine

    ev = eval_set.select(F.col(eval_vec).alias("__ev"))
    pairs = corpus.select(F.col(corpus_id), F.col(corpus_vec).alias("__cv")).join(
        F.broadcast(ev)
    )
    cos = cosine(F.col("__cv"), F.col("__ev"))
    hits = pairs.select(F.col(corpus_id), cos.alias("__cos")).filter(
        F.col("__cos") >= float(threshold)
    )
    if report:
        return hits.groupBy(corpus_id).agg(
            F.count(F.lit(1)).alias("n_eval_hits"),
            F.max("__cos").alias("max_cos"),
        )
    contaminated = hits.select(corpus_id).distinct()
    return corpus.join(F.broadcast(contaminated), corpus_id, "left_anti")
