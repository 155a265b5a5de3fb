"""Training-mixture construction: deterministic weighted sampling and
token-budget sequence packing.

No reference analogue (the reference samples with java.util.Random —
nondeterministic under re-partitioning); both operators here are
DETERMINISTIC functions of the data, so runs are reproducible at any
parallelism and exactly verifiable against a SQL oracle:

- ``weighted_sample``: per-domain Bernoulli keep with rate w_d, decided
  by a content hash (md5(id) mod M < w_d * M) — the standard
  hash-bucket sampling that keeps the SAME rows at 1 or 1000 executors,
  lets a re-run reproduce the mixture bit-for-bit, and needs no shuffle.
- ``pack_sequences``: greedy sequential packing of documents into
  fixed-token-budget training chunks (chunk = floor(cumulative_tokens /
  budget) over a defined order) — one window scan; at scale partition by
  a stream key (e.g. domain) so each stream packs independently.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

HASH_MOD = 1_000_000


def _md5_key(id_col):
    """The sampling family's shared order/bucket key: first 15 md5 hex
    digits of the id as int64 (DuckDB: CAST('0x'||substr(md5(id),1,15)
    AS BIGINT)). ONE definition keeps weighted_sample, sample_exact_k
    and their SQL oracles pinned together."""
    return F.conv(
        F.substring(F.md5(F.col(id_col).cast("string")), 1, 15), 16, 10
    ).cast("long")


def epoch_shuffle(
    df: DataFrame,
    n_shards: int,
    id_col: str = "doc_id",
    seed: int = 0,
    epoch: int = 0,
) -> DataFrame:
    """Deterministic, epoch-varying global shuffle order — the training
    dataloader's 'reshuffle every epoch, reproducibly' contract as a
    data-parallel operator: every row gets a ``shard`` (which of
    ``n_shards`` reader streams serves it) and an ``epoch_pos`` (its
    position within that shard), both pure functions of
    (seed, epoch, id). Same (seed, epoch) -> bit-identical order at
    any parallelism and across re-runs (resumable training); a new
    epoch re-deals both assignments wholesale. The reference shuffles
    with scala.util.Random.shuffle (app/tuktu/processors/sample/
    StratifiedSamplingProcessor.scala:34 — nondeterministic under
    re-partitioning and unseeded); this is the deterministic,
    cluster-stable replacement.

    Scale shape: NO global sort. The order key is the sampling
    family's portable md5 int ('<seed>:<epoch>:<id>'); shard =
    pmod(key, n_shards) hash-partitions in one exchange, and
    positions come from a PARTITIONED window (row_number per shard,
    ordered by (key, id) — the id tie-break makes the order total even
    under 60-bit key collisions). A global ORDER BY at 100 TB would
    range-partition and resort the corpus; per-shard numbering is the
    shape shard-file writers actually need (choose n_shards ~
    corpus / target_shard_rows, never 1: one shard = one sort task).
    ``epoch_pos`` is long (shard populations at 100 TB exceed int32).
    """
    if int(n_shards) < 1:
        raise ValueError(
            f"epoch_shuffle needs n_shards >= 1, got {n_shards}: shards "
            "bound the per-task sort; a global order is n_shards=1 run "
            "at your own scale risk"
        )
    key = F.conv(
        F.substring(
            F.md5(
                F.concat_ws(
                    ":",
                    F.lit(int(seed)),
                    F.lit(int(epoch)),
                    F.col(id_col).cast("string"),
                )
            ),
            1,
            15,
        ),
        16,
        10,
    ).cast("long")
    out = df.withColumn("__ekey", key).withColumn(
        "shard", F.pmod(F.col("__ekey"), F.lit(int(n_shards))).cast("int")
    )
    w = Window.partitionBy("shard").orderBy(
        F.col("__ekey").asc(), F.col(id_col).asc()
    )
    return out.withColumn(
        "epoch_pos", F.row_number().over(w).cast("long")
    ).drop("__ekey")


def weighted_sample(
    df: DataFrame,
    weights: dict[str, float],
    domain_col: str = "lang",
    id_col: str = "doc_id",
    default_rate: float = 0.0,
) -> DataFrame:
    """Keep each row iff md5(id) mod 1e6 < rate(domain) * 1e6. Shuffle-free
    scan; the kept set is a pure function of (id, weights)."""
    rate = F.lit(float(default_rate))
    for dom, w in sorted(weights.items()):
        rate = F.when(F.col(domain_col) == dom, F.lit(float(w))).otherwise(rate)
    bucket = F.pmod(_md5_key(id_col), F.lit(HASH_MOD))
    return df.filter(bucket < (rate * HASH_MOD).cast("long"))


def pack_sequences(
    df: DataFrame,
    budget: int,
    token_count_col: str,
    order_col: str = "doc_id",
    stream_cols: list[str] | None = None,
    out_col: str = "chunk_id",
    max_global_rows: int | None = None,
) -> DataFrame:
    """Assign each document to a training chunk: chunk = floor((cumsum of
    token counts up to and including this doc, in ``order_col`` order) - 1
    / budget). Documents stay whole; a chunk may overflow the budget by at
    most one document (the standard greedy sequential packing).
    ``stream_cols`` partitions the packing into independent streams
    (per-domain packing — the window shuffle is by stream key).

    Without ``stream_cols`` the cumulative sum is GLOBAL. A naive global
    window would funnel every row through one task; instead the global
    form computes a DISTRIBUTED prefix sum — range-partitioned sort,
    per-partition cumsum (hash-clustered by partition id, fully
    parallel), plus broadcast per-partition token-total offsets (a
    partition-count-sized table). Exact integer arithmetic, identical
    chunk ids to the single-window form (pinned in tests), scales to the
    full corpus. ``max_global_rows`` is DEPRECATED and ignored (the
    r4-era single-partition funnel it guarded is gone); passing a value
    warns so callers relying on the old warn/raise guard get a signal."""
    if max_global_rows is not None:
        import warnings

        warnings.warn(
            "pack_sequences(max_global_rows=...) is deprecated and ignored: "
            "the global form is a distributed prefix sum with no "
            "single-partition funnel to guard",
            DeprecationWarning,
            stacklevel=2,
        )
    if not stream_cols:
        from ..operators.joins import _global_prefix_sum_auto

        cum_df = _global_prefix_sum_auto(df, [order_col], token_count_col, "__cum__")
        return cum_df.withColumn(
            out_col,
            F.floor((F.col("__cum__") - 1) / F.lit(int(budget))).cast("bigint"),
        ).drop("__cum__")
    w = Window.partitionBy(*stream_cols).orderBy(order_col)
    cum = F.sum(F.col(token_count_col)).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return df.withColumn(
        out_col, F.floor((cum - 1) / F.lit(int(budget))).cast("bigint")
    )


def sample_exact_k(
    df: DataFrame,
    k: int,
    id_col: str = "doc_id",
    stratify_col: str | None = None,
) -> DataFrame:
    """EXACT-k deterministic sample without replacement: the k rows with
    the smallest md5-derived key of ``id_col`` (optionally k PER STRATUM
    with ``stratify_col``). Complements ``weighted_sample`` (rate-based,
    size only in expectation) when a corpus subset must hit a hard size
    target — eval carve-outs, fixed-budget ablations.

    Scale shape: the unstratified form compiles to TakeOrderedAndProject
    — a per-partition partial top-k reduced on the driver-sized k, no
    global sort, no single-partition window. The stratified form is one
    window over hashpartitioning(stratum). Deterministic at any
    parallelism (the key is a pure function of the id), so the kept set
    is exactly reproducible and exactly SQL-oracle-checkable (same
    md5-prefix arithmetic in DuckDB)."""
    key = _md5_key(id_col)
    if stratify_col is None:
        return df.orderBy(key.asc(), F.col(id_col).asc()).limit(int(k))
    w = Window.partitionBy(stratify_col).orderBy(key.asc(), F.col(id_col).asc())
    return (
        df.withColumn("__srank__", F.row_number().over(w))
        .filter(F.col("__srank__") <= int(k))
        .drop("__srank__")
    )


def temperature_sample(
    df: DataFrame,
    alpha: float = 0.5,
    domain_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Temperature-based mixture rebalancing (the multilingual-LM
    alpha-sampling of Lample & Conneau 2019 / XLM-R): resample so final
    domain counts are proportional to p_d^alpha, keeping ALL of the
    smallest domain and hash-downsampling the rest with rate

        r_d = (n_min / n_d) ** (1 - alpha)     (alpha=1 keeps everything;
                                                alpha=0 equalizes domains)

    Rates are computed from one tiny per-domain count aggregate
    (bounded collect — domains are languages/sources, not corpus-sized)
    and applied with the same shuffle-free md5 Bernoulli rule as
    ``weighted_sample``, so the kept set is a pure function of
    (ids, corpus composition, alpha) at any parallelism.

    Exactness: at the default alpha=0.5 the rate is evaluated as
    sqrt(n_min / n_d) — IEEE sqrt and division are correctly rounded, so
    any engine reproduces the exact keep decisions (SQL-oracled). Other
    alphas go through pow(), which is only run-deterministic."""
    counts = {
        r[domain_col]: r["__n"]
        for r in df.groupBy(domain_col).agg(F.count(F.lit(1)).alias("__n")).collect()
    }
    if not counts:
        return df
    n_min = min(counts.values())
    if alpha == 0.5:
        weights = {d: math.sqrt(n_min / n) for d, n in counts.items()}
    else:
        weights = {d: (n_min / n) ** (1.0 - alpha) for d, n in counts.items()}
    return weighted_sample(df, weights, domain_col, id_col)


def chunk_documents(
    df: DataFrame,
    max_tokens: int,
    stride: int | None = None,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    keep_cols: tuple[str, ...] = (),
) -> DataFrame:
    """Split long documents into context-window-sized chunks — the
    complement of ``pack_sequences`` (which merges short ones): chunk i
    covers tokens [i*stride, i*stride + max_tokens). stride defaults to
    max_tokens (disjoint chunks); stride < max_tokens gives overlapping
    windows (the usual eval / long-context training prep). The final
    chunk is the remainder (never empty, never duplicated: a doc emits
    exactly ceil(max(n - max_tokens, 0) / stride) + 1 chunks; an empty
    token array emits one empty chunk so no document silently vanishes).

    Pure per-row array algebra (sequence of starts -> slice) — no
    window, no shuffle, stream-legal; output carries (id, chunk_idx,
    chunk tokens, n_chunk_tokens)."""
    if stride is None:
        stride = max_tokens
    if stride <= 0 or max_tokens <= 0:
        raise ValueError("max_tokens and stride must be positive")
    t = F.col(tokens_col)
    n = F.size(t)
    # starts: 0, stride, 2*stride, ... last start <= max(n - max_tokens, 0)
    last_start = F.greatest(n - max_tokens, F.lit(0))
    n_chunks = F.ceil(last_start / stride).cast("int") + F.lit(1)
    starts = F.sequence(F.lit(0), (n_chunks - 1) * stride, F.lit(stride))
    chunks = F.transform(
        starts,
        lambda s: F.struct(
            (s / stride).cast("int").alias("chunk_idx"),
            F.slice(t, s + 1, max_tokens).alias("chunk"),
        ),
    )
    return df.select(
        F.col(id_col), *[F.col(c) for c in keep_cols], F.explode(chunks).alias("__z")
    ).select(
        F.col(id_col),
        *[F.col(c) for c in keep_cols],
        F.col("__z.chunk_idx").alias("chunk_idx"),
        F.col("__z.chunk").alias("chunk"),
        F.size("__z.chunk").alias("n_chunk_tokens"),
    )


def budget_sample(
    df: DataFrame,
    budget_tokens: int | None = None,
    budgets: dict[str, int] | None = None,
    token_col: str = "n_tokens",
    domain_col: str = "lang",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token-budget mixture carve-out: per domain, keep documents in
    deterministic md5(id) order until the cumulative token count reaches
    the budget (greedy inclusive fill — the first doc whose tokens push
    the running sum PAST the budget is dropped, as are all later ones).
    ``budgets`` gives per-domain budgets; ``budget_tokens`` is the
    uniform fallback. The kept set is a pure function of (ids, token
    counts, budgets) — exact integer arithmetic, any parallelism, any
    engine.

    Scale shape: one shuffle keyed by domain; the cumsum window streams
    each domain's docs through one task — the same per-stream shape as
    pack_sequences, fine when domains are languages/sources. For very
    few, very large domains, carve sub-streams first (hash-prefix
    bucketing) and budget per sub-stream."""
    if budgets is None and budget_tokens is None:
        raise ValueError("pass budget_tokens or budgets")
    b = F.lit(int(budget_tokens)) if budget_tokens is not None else F.lit(0)
    if budgets:
        expr = F.lit(int(budget_tokens)) if budget_tokens is not None else F.lit(0)
        for dom, t in sorted(budgets.items()):
            expr = F.when(F.col(domain_col) == dom, F.lit(int(t))).otherwise(expr)
        b = expr
    w = (
        Window.partitionBy(domain_col)
        .orderBy(_md5_key(id_col), F.col(id_col))
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    cum = F.sum(F.col(token_col).cast("long")).over(w)
    return (
        df.withColumn("__cum", cum)
        .filter(F.col("__cum") <= b)
        .drop("__cum")
    )
