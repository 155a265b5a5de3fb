"""DSIR — Data Selection via Importance Resampling (Xie et al. 2023,
"Data Selection for Language Models via Importance Resampling",
NeurIPS 2023).

The standard pre-training data-selection stage this engine was still
missing: given a small TARGET corpus (the domain you want more of) and a
large RAW corpus (what you're selecting from), estimate importance
weights in a hashed bag-of-n-grams feature space and resample the raw
corpus toward the target distribution.

    features(x)   = multiset of hash(gram) mod B over unigrams+bigrams
    log w(x)      = sum_b  c_x[b] * ( log p_target[b] - log p_raw[b] )
    p_*[b]        = (count_*[b] + s) / (total_* + s*B)   (Laplace)
    selection     = Gumbel top-k over log w  (paper's sampling rule), or
                    deterministic top-k by log w (the argmax variant)

Spark-first shape, and why it survives 100 TB:

- Featurization is per-row column algebra (gram arrays built with
  transform/slice BEFORE the explode — no window, no shuffle), hashed
  with the engine-portable md5-60-bit hash shared with the dedup stack.
- The two bucket-count fits are plain groupBy(bucket).count() —
  partially aggregated map-side to at most B rows per task, so the
  shuffle is B-bounded regardless of corpus size.
- The learned log-likelihood-ratio table is B rows (a config knob, 2^16
  at scale) — a BOUNDED collect, quantized to 2^-20 units driver-side,
  then broadcast. Per-document weights are therefore exact BIGINT sums:
  one doc-keyed shuffle, whole-stage codegen, no Python in the hot path.
- Selection is TakeOrderedAndProject (partial per-partition top-k +
  driver merge of k-row heads), never a global sort.

Quantizing the llr to integers is the same exactness device as the ARPA
scorer's lp_q20 (see ngram_lm.py): the transcendental step happens ONCE
per bucket at the driver, everything corpus-sized stays exact integer
arithmetic, so results are bit-stable across runs, partitionings, and
engines.

Reference parity note: the reference repo has no DSIR (it predates the
paper); this is part of the training-data-pipeline surface the brief
asks for beyond reference parity.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

LLR_SCALE_BITS = 20  # llr quantum = 2^-20, matching the ARPA lp_q20 device


def _hash60(col):
    """md5-prefix 60-bit hash (portable: DuckDB
    CAST('0x'||substr(md5(s),1,15) AS BIGINT)) — same device as
    dedup._hash60; re-declared here to keep this module import-light."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def hashed_ngram_features(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    buckets: int = 4096,
    max_n: int = 2,
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """(id, bucket[, keep_cols]): one row per n-gram occurrence (orders
    1..max_n), bucket = md5-60bit(gram) mod buckets. Gram arrays are
    built per-row (slice + concat_ws over a sequence) before the explode
    — no window function, so the plan is shuffle-free until the caller
    aggregates and the operator is legal under Structured Streaming.
    ``keep_cols`` rides extra columns through (e.g. an is_target flag
    for the single-pass fit)."""
    t = F.col(tokens_col)

    def gram_at(k: int):
        # one-arg closure, NOT `lambda i, k=k: ...` — F.transform reads
        # the lambda's arity, so a defaulted second parameter silently
        # becomes the (element, index) form and k binds to the array index
        return lambda i: F.concat_ws(" ", F.slice(t, i, k))

    grams = t
    for k in range(2, max_n + 1):
        k_grams = F.when(
            F.size(t) >= k,
            F.transform(F.sequence(F.lit(1), F.size(t) - (k - 1)), gram_at(k)),
        ).otherwise(F.array().cast("array<string>"))
        grams = F.concat(grams, k_grams)
    extra = [F.col(c) for c in keep_cols]
    return df.select(
        F.col(id_col), *extra, F.explode(grams).alias("__g")
    ).select(
        F.col(id_col),
        *extra,
        F.pmod(_hash60(F.col("__g")), F.lit(buckets)).alias("bucket"),
    )


def fit_bucket_counts(feats: DataFrame) -> DataFrame:
    """(bucket, cnt) over a feature table — map-side combined, so the
    shuffle is bounded by B rows per task."""
    return feats.groupBy("bucket").agg(F.count(F.lit(1)).alias("cnt"))


def train_dsir_llr(
    target_feats: DataFrame,
    raw_feats: DataFrame,
    buckets: int,
    smoothing: float = 1.0,
) -> list[tuple[int, int]]:
    """[(bucket, llr_q)] for every bucket 0..B-1: the quantized
    log-likelihood ratio

        llr_q = floor( 2^20 * ( ln(ct[b]+s) - ln(Ct+s*B)
                              - ln(cr[b]+s) + ln(Cr+s*B) ) )

    computed term-by-term in that exact order (so an oracle evaluating
    the same four ln() calls against the same integer counts reproduces
    it bit-for-bit on the same libm). The collect is bounded by B — the
    model, like the BPE vocab and IVF centroids, is config-sized, never
    corpus-sized."""
    ct = {r["bucket"]: r["cnt"] for r in fit_bucket_counts(target_feats).collect()}
    cr = {r["bucket"]: r["cnt"] for r in fit_bucket_counts(raw_feats).collect()}
    tot_t = sum(ct.values()) + smoothing * buckets
    tot_r = sum(cr.values()) + smoothing * buckets
    scale = float(1 << LLR_SCALE_BITS)
    out = []
    for b in range(buckets):
        llr = (
            math.log(ct.get(b, 0) + smoothing)
            - math.log(tot_t)
            - math.log(cr.get(b, 0) + smoothing)
            + math.log(tot_r)
        )
        out.append((b, math.floor(llr * scale)))
    return out


def dsir_weights(
    raw_feats: DataFrame,
    llr_table: list[tuple[int, int]],
    id_col: str = "doc_id",
) -> DataFrame:
    """(id, n_feats, logw_q): per-document importance weight as an exact
    BIGINT sum of quantized per-bucket llrs — broadcast join on bucket,
    ONE doc-keyed shuffle for the aggregation. Smoothing gives every
    bucket an llr, so the join is total (inner == left)."""
    spark = raw_feats.sparkSession
    llr = spark.createDataFrame(llr_table, "bucket bigint, llr_q bigint")
    return (
        raw_feats.join(F.broadcast(llr), "bucket")
        .groupBy(id_col)
        .agg(
            F.count(F.lit(1)).alias("n_feats"),
            F.sum("llr_q").alias("logw_q"),
        )
    )


def dsir_select_topk(weights: DataFrame, k: int, id_col: str = "doc_id") -> DataFrame:
    """Deterministic DSIR variant: the k raw documents with the highest
    importance weight (ties broken by id — total order, engine-portable).
    Plans as TakeOrderedAndProject: per-partition top-k, driver merges k
    rows per partition — no global sort at any scale."""
    return weights.orderBy(F.col("logw_q").desc(), F.col(id_col)).limit(k)


def dsir_sample_gumbel(
    weights: DataFrame,
    k: int,
    id_col: str = "doc_id",
    seed: str = "dsir",
) -> DataFrame:
    """The paper's sampling rule: Gumbel top-k over log w, i.e. sample k
    documents WITHOUT replacement with P(doc) proportional to w. The
    Gumbel noise is seeded from md5(seed || id) so the draw is
    reproducible across runs and partitionings (run-deterministic like
    the ppl scores; the transcendental -ln(-ln(u)) keeps it out of the
    SQL-oracle gate — pinned in pytest instead). Adds ``gumbel_key``;
    same TakeOrderedAndProject selection shape as the top-k variant."""
    u = (
        (F.pmod(_hash60(F.concat(F.lit(seed), F.col(id_col).cast("string"))),
                F.lit(1 << 40)).cast("double") + F.lit(0.5))
        / F.lit(float(1 << 40))
    )
    key = (
        F.col("logw_q").cast("double") / F.lit(float(1 << LLR_SCALE_BITS))
        - F.log(-F.log(u))
    )
    scored = weights.withColumn("gumbel_key", key)
    return scored.orderBy(F.col("gumbel_key").desc(), F.col(id_col)).limit(k)


def dsir_select(
    raw: DataFrame,
    target: DataFrame,
    k: int,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    buckets: int = 4096,
    max_n: int = 2,
    smoothing: float = 1.0,
    method: str = "topk",
    seed: str = "dsir",
) -> DataFrame:
    """End-to-end DSIR: featurize both corpora, fit the llr table
    (B-bounded collect), weight the raw corpus, select k documents —
    method='topk' (deterministic, oracle-checkable) or 'gumbel' (the
    paper's sampler, run-deterministic). Returns the selected documents'
    (id, n_feats, logw_q[, gumbel_key]). The raw corpus is scanned twice
    (fit + weights); persist the feature table upstream to make it once
    if the scan dominates."""
    tf = hashed_ngram_features(target, tokens_col, id_col, buckets, max_n)
    rf = hashed_ngram_features(raw, tokens_col, id_col, buckets, max_n)
    llr = train_dsir_llr(tf, rf, buckets, smoothing)
    w = dsir_weights(rf, llr, id_col)
    if method == "gumbel":
        return dsir_sample_gumbel(w, k, id_col, seed)
    return dsir_select_topk(w, k, id_col)


def train_dsir_llr_flagged(
    raw_feats_flagged: DataFrame,
    buckets: int,
    smoothing: float = 1.0,
    flag_col: str = "is_target",
) -> list[tuple[int, int]]:
    """Single-pass llr fit for the common in-corpus-target case (target
    = a predicate over the raw corpus): one aggregation computes both
    bucket distributions (raw count + flagged count), so the corpus is
    featurized and scanned ONCE instead of once per side. Bit-identical
    llr to train_dsir_llr on the same counts (pinned in tests)."""
    rows = (
        raw_feats_flagged.groupBy("bucket")
        .agg(
            F.count(F.lit(1)).alias("cr"),
            F.count(F.when(F.col(flag_col), 1)).alias("ct"),
        )
        .collect()
    )
    cr = {r["bucket"]: r["cr"] for r in rows}
    ct = {r["bucket"]: r["ct"] for r in rows}
    tot_t = sum(ct.values()) + smoothing * buckets
    tot_r = sum(cr.values()) + smoothing * buckets
    scale = float(1 << LLR_SCALE_BITS)
    return [
        (
            b,
            math.floor(
                (
                    math.log(ct.get(b, 0) + smoothing)
                    - math.log(tot_t)
                    - math.log(cr.get(b, 0) + smoothing)
                    + math.log(tot_r)
                )
                * scale
            ),
        )
        for b in range(buckets)
    ]
