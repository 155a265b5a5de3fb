"""N-gram language-model quality filtering — the CCNet perplexity stage.

A real pre-training pipeline (CCNet, Wenzek et al. 2020; reused by
LLaMA/RedPajama data work) scores every document with a small n-gram
language model and keeps/buckets documents by perplexity. This module
implements that stage Spark-first:

- **Training** is pure distributed aggregation: token windows via LAG
  over (doc, pos), one groupBy per order, min-count pruning. The model
  IS a set of DataFrames — at 100 TB the counts never leave the cluster.
- **Scoring** is stupid backoff (Brants et al. 2007, "Large Language
  Models in Machine Translation" — the score designed for exactly this
  trillion-token counting regime):

      S(w | ctx_n) = count(ngram)/count(ctx)   if count(ngram) > 0
                   = alpha * S(w | ctx_{n-1})  otherwise
      S(w)         = count(w)/total            (unigram; OOV -> 1/total)

  expressed as COALESCE cascades over broadcast equi-joins — whole-stage
  codegen end to end, NO Python in the hot path. With one shared
  min_count prune, a context count always exists where its gram count
  does (count(ctx) >= count(gram)), so the divisions are total.
- **Bucketing** reproduces CCNet's head/middle/tail split: per-language
  perplexity terciles.

Scale shape: the corpus shuffles ONCE (hash by doc id — the LAG window
and the final per-doc aggregation both reuse that partitioning); count
tables are corpus-vocabulary-shaped, pruned by min_count, and broadcast
when small (the CCNet setting: a FIXED small LM scores everything);
pass broadcast_counts=False to shuffle-join against a huge model
instead. Exactness: the oracle-checked aggregate (mean in-context
probability) goes through decimal sums (see exactness.py); perplexity
(log10 sums) is run-deterministic the same way but pinned in pytest
rather than SQL-oracled, since libm/JVM log10 are not required to be
correctly rounded across engines.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..exactness import dsum


@dataclass
class NgramLM:
    """Stupid-backoff model: per-order gram-count DataFrames (gram text
    joined with single spaces -> count), the total token count, and the
    training params. ``counts[k]`` holds (k+1)-gram counts. ``fused``
    (method='fused' training) is the single (k, gram, cnt) table every
    ``counts`` entry filters — the one cacheable parent."""

    counts: list[DataFrame]
    total: int
    n: int
    min_count: int
    fused: DataFrame | None = None
    persisted: bool = False

    def order_table(self, k: int) -> DataFrame:
        return self.counts[k - 1]

    def persist(self) -> "NgramLM":
        """Pin the count tables via the dedup pipelines' scoped registry
        (released on the next pipeline's entry / run_flow boundary) so a
        train-then-score plan computes each order ONCE — unpinned, c1 and
        c2 are each rebuilt for their gram AND context join roles, i.e.
        the corpus is re-scanned 2n-1 times for training counts. A fused
        model pins the ONE parent table (a single cache-build job; the
        per-order tables become in-memory filters). No-op on a model
        already pinned by ``train_ngram_lm(..., persist=True)``."""
        from .dedup import _persist_scoped

        if self.persisted:
            return self
        self.persisted = True
        if self.fused is not None:
            f = _persist_scoped(self.fused)
            self.fused = f
            self.counts = [
                f.filter(F.col("k") == k).select("gram", "cnt")
                for k in range(1, self.n + 1)
            ]
        else:
            self.counts = [_persist_scoped(c) for c in self.counts]
        return self


def _positions(
    df: DataFrame,
    tokens_col: str,
    id_col: str,
    n: int,
    engine: str = "window",
) -> DataFrame:
    """(id, pos, w, g2..gn, ctx2..ctxn): every token position with its
    k-gram strings (g_k = w_{i-k+1}..w_i) and context strings
    (ctx_k = w_{i-k+1}..w_{i-1}).

    engine='window' (batch default): LAG over one doc-keyed shuffle that
    the caller's per-doc aggregation reuses. engine='array': grams built
    per-row from the token array (slice + concat_ws inside one struct
    transform) BEFORE the explode — no window, no shuffle until the
    caller aggregates; required under Structured Streaming (window
    functions are unsupported on streams) and pinned equal to the window
    form in tests."""
    if engine == "array":
        t = F.col(tokens_col)
        fields = [F.col("z.pos").alias("pos"), F.col("z.w").alias("w")]
        struct_cols = lambda i: [  # noqa: E731
            (i - 1).alias("pos"),
            F.element_at(t, i).alias("w"),
        ] + [
            c
            for k in range(2, n + 1)
            for c in (
                F.when(
                    i >= k, F.concat_ws(" ", F.slice(t, i - k + 1, k))
                ).otherwise(F.concat_ws(" ", F.slice(t, F.lit(1), i)))
                .alias(f"g{k}"),
                F.when(
                    i >= k, F.concat_ws(" ", F.slice(t, i - k + 1, k - 1))
                ).otherwise(F.concat_ws(" ", F.slice(t, F.lit(1), i - 1)))
                .alias(f"ctx{k}"),
            )
        ]
        structs = F.transform(
            F.sequence(F.lit(1), F.size(t)), lambda i: F.struct(*struct_cols(i))
        )
        out = df.select(F.col(id_col), F.explode(structs).alias("z"))
        for k in range(2, n + 1):
            fields += [
                F.col(f"z.g{k}").alias(f"g{k}"),
                F.col(f"z.ctx{k}").alias(f"ctx{k}"),
            ]
        return out.select(F.col(id_col), *fields)
    pos = df.select(
        F.col(id_col), F.posexplode(F.col(tokens_col)).alias("pos", "w")
    )
    w = Window.partitionBy(id_col).orderBy("pos")
    lags = [F.col("w")] + [F.lag("w", k).over(w) for k in range(1, n)]
    out = pos
    for k in range(2, n + 1):
        # tokens w_{i-k+1} .. w_i in order
        parts = [lags[j] for j in range(k - 1, -1, -1)]
        out = out.withColumn(f"g{k}", F.concat_ws(" ", *parts))
        out = out.withColumn(f"ctx{k}", F.concat_ws(" ", *parts[:-1]))
    return out


def _fused_counts(
    df: DataFrame, tokens_col: str, n: int, min_count: int,
    with_total: bool = False,
) -> DataFrame:
    """ALL orders' counts in one pass: every token position emits its
    (k, gram) pairs for k = 1..min(n, pos+1) straight from the token
    array (slice + concat_ws inside nested HOF transforms — no window,
    no doc shuffle, no per-order re-scan), then ONE map-side-combined
    groupBy(k, gram). The per-order method runs n independent jobs that
    each re-scan the corpus and re-shuffle (LAG window by doc + gram
    agg): 2n shuffles and n scans against this method's single shuffle
    and single scan. Counts are exact integers either way, so the two
    methods produce identical models (pinned in tests).

    ``with_total=True`` (optimization r13, guide §1.2 "fewer passes"):
    additionally emit one (k=0, '') pair per token position — the inner
    sequence simply starts at 0; slice(t, i+1, 0) is [] so concat_ws
    yields '' with no conditional in the lambda — so the aggregated
    table carries a single (0, '', total_tokens) row. The caller reads
    ``total`` (the unigram denominator, an exact integer) from that row
    of the SAME aggregation instead of running a second full corpus
    scan+tokenize job for sum(size(tokens)). Map-side partial
    aggregation collapses the hot (0, '') group per partition, so the
    extra cost is one struct per position pre-combine — far cheaper
    than a second corpus pass at any scale. The sentinel is exempt from
    min_count (its count IS the pre-prune position total) and filtered
    out of every per-order count table by the existing k == j filters."""
    t = F.col(tokens_col)
    k_lo = 0 if with_total else 1
    pairs = F.flatten(
        F.transform(
            F.sequence(F.lit(1), F.size(t)),
            lambda i: F.transform(
                F.sequence(F.lit(k_lo), F.least(F.lit(n), i)),
                lambda k: F.struct(
                    k.cast("int").alias("k"),
                    F.concat_ws(" ", F.slice(t, i - k + 1, k)).alias("gram"),
                ),
            ),
        )
    )
    fused = (
        # Empty-token guard (r10, advisor): sequence(1, size=0) yields
        # DESCENDING [1, 0], so the inner slice would throw
        # INVALID_PARAMETER_VALUE.START. Real corpora always contain
        # empty/short documents (same hazard _shingles_from_tokens
        # documents in dedup.py). Pre-FILTERING the rows keeps the
        # explode's generator path intact — wrapping the expression in
        # CASE WHEN instead measurably costs ~1.8x on the bench query
        # (the conditional blocks the nested-HOF evaluation shortcut) —
        # and an empty doc contributes no grams anyway (``total`` is
        # summed from the corpus by the caller, not from here).
        df.filter(F.size(t) > 0)
        .select(F.explode(pairs).alias("p"))
        .groupBy(F.col("p.k").alias("k"), F.col("p.gram").alias("gram"))
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    if min_count > 1:
        # min_count prunes every order identically, so one global filter
        # (total is counted from the corpus — or, with_total=True, from
        # the exempt k=0 sentinel row of this very table)
        pred = F.col("cnt") >= min_count
        if with_total:
            pred = pred | (F.col("k") == 0)
        fused = fused.filter(pred)
    return fused


def train_ngram_lm(
    df: DataFrame,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    n: int = 3,
    min_count: int = 1,
    positions: DataFrame | None = None,
    method: str = "fused",
    persist: bool = False,
) -> NgramLM:
    """Count tables for orders 1..n over the corpus. min_count prunes
    every order identically (the scale knob: at 100 TB raise it until
    the model fits the broadcast budget — or keep it 1 and shuffle-join).
    ``total`` (the unigram denominator) is counted BEFORE pruning so
    probabilities stay proper.

    ``method='fused'`` (default, r8 verdict #6) builds every order in ONE
    exploded (k, gram) aggregation — one corpus scan, one shuffle, no
    window — instead of n per-order jobs (see _fused_counts; identical
    model, measured ~2x faster training at sf0.1). ``method='per_order'``
    keeps the independent per-order aggregations (and is implied by
    ``positions``, which exists for callers that already materialized a
    position table).

    ``positions``: a prebuilt ``_positions`` table, for callers that
    already materialized one (e.g. scoring several models over one
    corpus). Measured honestly at sf0.1: persisting positions for a
    single train+score pass is NEUTRAL to slightly slower than lineage
    recompute (alternating A/B medians 1.02 s vs 1.17 s) — the explode
    is codegen-cheap against a cached scan, and at 100 TB caching an
    exploded corpus costs more memory than it saves, so the bench query
    deliberately does NOT use it.

    ``persist=True`` (optimization r13): pin the model via the scoped
    cache registry AND, on the fused path, derive ``total`` from the
    fused table's k=0 sentinel row (_fused_counts with_total) so the
    whole training is one corpus scan + one shuffle — no separate
    sum(size(tokens)) scan job. Prefer this over calling ``.persist()``
    on the returned model (which pins the same tables but has already
    paid the extra total-scan job)."""
    if method not in ("fused", "per_order"):
        raise ValueError(f"method={method!r}: expected 'fused' or 'per_order'")
    if method == "fused" and positions is None:
        if persist:
            # Optimization r13 (guide §1.2, fewer corpus passes): pin the
            # fused table FIRST, then read ``total`` from its k=0 sentinel
            # row (see _fused_counts with_total) — the one collect both
            # materializes the cache and returns the exact token total, so
            # training is ONE corpus scan + one shuffle total, with no
            # separate sum(size(tokens)) scan job. Bit-identical model:
            # the sentinel count is exactly the pre-prune position count.
            from .dedup import _persist_scoped

            fused = _persist_scoped(
                _fused_counts(df, tokens_col, n, min_count, with_total=True)
            )
            total = (
                fused.filter(F.col("k") == 0)
                .agg(F.sum("cnt"))
                .collect()[0][0]
                or 0
            )
            counts = [
                fused.filter(F.col("k") == k).select("gram", "cnt")
                for k in range(1, n + 1)
            ]
            return NgramLM(
                counts=counts, total=int(total), n=n, min_count=min_count,
                fused=fused, persisted=True,
            )
        fused = _fused_counts(df, tokens_col, n, min_count)
        counts = [
            fused.filter(F.col("k") == k).select("gram", "cnt")
            for k in range(1, n + 1)
        ]
        total = df.select(F.sum(F.size(tokens_col))).collect()[0][0] or 0
        return NgramLM(
            counts=counts, total=int(total), n=n, min_count=min_count,
            fused=fused,
        )
    pos = positions if positions is not None else _positions(
        df, tokens_col, id_col, n
    )
    counts = []
    for k in range(1, n + 1):
        gram = F.col("w") if k == 1 else F.col(f"g{k}")
        valid = F.lit(True) if k == 1 else F.col("pos") >= k - 1
        c = (
            pos.filter(valid)
            .groupBy(gram.alias("gram"))
            .agg(F.count(F.lit(1)).alias("cnt"))
        )
        if min_count > 1:
            c = c.filter(F.col("cnt") >= min_count)
        counts.append(c)
    if positions is not None:
        total = pos.count()  # one row per token; reuses the caller's cache
    else:
        total = df.select(F.sum(F.size(tokens_col))).collect()[0][0] or 0
    lm = NgramLM(counts=counts, total=int(total), n=n, min_count=min_count)
    return lm.persist() if persist else lm


def _backoff_prob(n: int, alpha: float, total: int):
    """The stupid-backoff column over the joined count columns c1..cn /
    cc2..ccn (gram / context counts), with doc-start truncation: position
    i uses the highest order that fits (min(i+1, n))."""
    a = F.lit(float(alpha))
    uni = (
        F.when(F.col("c1").isNotNull(), F.col("c1").cast("double") / F.lit(float(total)))
        .otherwise(F.lit(1.0 / total))
    )
    s = uni
    for k in range(2, n + 1):
        s_k = F.when(
            F.col(f"c{k}").isNotNull(),
            F.col(f"c{k}").cast("double") / F.col(f"cc{k}").cast("double"),
        ).otherwise(a * s)
        # highest applicable order at this position
        s = F.when(F.col("pos") >= k - 1, s_k).otherwise(s)
    return s


def score_ngram_lm(
    df: DataFrame,
    lm: NgramLM,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    alpha: float = 0.4,
    broadcast_counts: bool = True,
    engine: str = "window",
    positions: DataFrame | None = None,
) -> DataFrame:
    """(id, n_pos, hit counts per order, mean_prob, logprob10, ppl):
    per-document stupid-backoff scores.

    - ``mean_prob`` — arithmetic mean of per-position probabilities via
      EXACT decimal sums (SQL-oracle-checkable bit-for-bit).
    - ``logprob10`` / ``ppl`` — the KenLM-convention log10 score and
      perplexity 10^(-logprob10/n_pos); decimal-summed so run-to-run
      deterministic, but pinned in pytest (log10 is engine-internal).

    Plan: corpus shuffles once on the doc id (LAG window + final groupBy
    share it); count tables broadcast (CCNet's fixed-small-LM setting) or
    shuffle-joined when broadcast_counts=False."""
    n = lm.n
    pos = positions if positions is not None else _positions(
        df, tokens_col, id_col, n, engine=engine
    )
    maybe_b = F.broadcast if broadcast_counts else (lambda x: x)
    c1 = maybe_b(
        lm.counts[0].select(F.col("gram").alias("w"), F.col("cnt").alias("c1"))
    )
    scored = pos.join(c1, "w", "left")
    for k in range(2, n + 1):
        ck = maybe_b(
            lm.counts[k - 1].select(
                F.col("gram").alias(f"g{k}"), F.col("cnt").alias(f"c{k}")
            )
        )
        cck = maybe_b(
            lm.counts[k - 2].select(
                F.col("gram").alias(f"ctx{k}"), F.col("cnt").alias(f"cc{k}")
            )
        )
        scored = scored.join(ck, f"g{k}", "left").join(cck, f"ctx{k}", "left")
    s = _backoff_prob(n, alpha, lm.total)
    scored = scored.withColumn("s", s)
    hit_cols = [
        F.sum(
            (F.col(f"c{k}").isNotNull() & (F.col("pos") >= k - 1)).cast("long")
        ).alias(f"hits{k}")
        for k in range(2, n + 1)
    ]
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_pos"),
        F.sum(F.col("c1").isNotNull().cast("long")).alias("hits1"),
        *hit_cols,
        (dsum(F.col("s"), 18) / F.count(F.lit(1))).alias("mean_prob"),
        # engine-portable EXACT fingerprint of the probabilities: *2^30
        # only shifts the IEEE exponent (no rounding), floor and the
        # bigint sum are unambiguous — unlike decimal casts of deep-
        # precision doubles, which round differently across engines
        F.sum(F.floor(F.col("s") * F.lit(1073741824.0)).cast("long")).alias(
            "prob_q30"
        ),
        dsum(F.log10("s"), 12).alias("logprob10"),
    )
    return agg.withColumn(
        "ppl", F.pow(F.lit(10.0), -F.col("logprob10") / F.col("n_pos"))
    )


def perplexity_buckets(
    scored: DataFrame,
    lang_df: DataFrame | None = None,
    id_col: str = "doc_id",
    lang_col: str = "lang",
    ppl_col: str = "ppl",
) -> DataFrame:
    """CCNet head/middle/tail: per-language perplexity terciles (head =
    lowest-perplexity third — the cleanest text). ``lang_df`` supplies
    (id, lang); omit it to bucket globally.

    The tercile cutoffs are tiny (2 rows per language) — computed with
    exact percentile_approx at full accuracy per language group, joined
    back broadcast; the corpus itself is scanned once."""
    if lang_df is not None:
        scored = scored.join(lang_df.select(id_col, lang_col), id_col)
        grp = scored.groupBy(lang_col)
        key = [lang_col]
    else:
        scored = scored.withColumn("__g", F.lit(1))
        grp = scored.groupBy("__g")
        key = ["__g"]
    cuts = grp.agg(
        F.percentile_approx(ppl_col, 1.0 / 3, 1_000_000).alias("__t1"),
        F.percentile_approx(ppl_col, 2.0 / 3, 1_000_000).alias("__t2"),
    )
    out = scored.join(F.broadcast(cuts), key).withColumn(
        "bucket",
        F.when(F.col(ppl_col) <= F.col("__t1"), F.lit("head"))
        .when(F.col(ppl_col) <= F.col("__t2"), F.lit("middle"))
        .otherwise(F.lit("tail")),
    )
    return out.drop("__t1", "__t2", "__g")


def perplexity_filter(
    df: DataFrame,
    lm: NgramLM,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    max_ppl: float = 1e6,
    alpha: float = 0.4,
) -> DataFrame:
    """Keep documents whose stupid-backoff perplexity is at most
    ``max_ppl`` (the CCNet keep-the-head move as a hard threshold)."""
    scored = score_ngram_lm(df, lm, tokens_col, id_col, alpha=alpha)
    keep = scored.filter(F.col("ppl") <= float(max_ppl)).select(id_col)
    # keep-set is corpus-sized: semi-join on the id key (no broadcast)
    return df.join(keep, id_col, "left_semi")


# ---------------------------------------------------------------------------
# ARPA model loading — score with a PRETRAINED LM (the real CCNet setting:
# a fixed KenLM-trained model scores every corpus). The .arpa text format
# is public (Paul & Baker 1992, the ARPA-MIT LM format; emitted by
# KenLM/SRILM): "\\data\\" section with per-order counts, then per-order
# "\\k-grams:" sections of "log10prob <TAB> gram [<TAB> log10backoff]".
# Backoff scoring (Katz): P(w|ctx) = P_k(gram) if the k-gram is listed,
# else 10^bow(ctx) * P(w|shorter ctx) — same cascade shape as stupid
# backoff with the alpha replaced by the context's learned backoff
# weight, so the scoring plan is identical: broadcast equi-joins,
# whole-stage codegen, one corpus shuffle.
# ---------------------------------------------------------------------------


@dataclass
class ArpaLM:
    """Per-order (gram, log10p, bow) DataFrames; <unk> log-prob."""

    tables: list[DataFrame]
    n: int
    unk_log10: float

    def persist(self) -> "ArpaLM":
        from .dedup import _persist_scoped

        self.tables = [_persist_scoped(t) for t in self.tables]
        return self


def read_arpa(spark, path: str) -> ArpaLM:
    """Parse an .arpa file DISTRIBUTED (spark.read.text; each executor
    parses its own split): a gram line is recognized by its shape
    (leading float, tab-separated), its order by token count — so no
    section state is needed and huge models never touch the driver.
    OOV probability comes from the listed <unk> unigram (fallback 1e-7
    if the model omits it)."""
    lines = spark.read.text(path)
    parts = F.split(F.col("value"), "\t")
    # gram rows: "<float>\t<gram>[\t<float>]"
    rows = lines.select(parts.alias("p")).filter(
        (F.size("p").isin(2, 3))
        & F.element_at("p", 1).cast("double").isNotNull()
    )
    parsed = rows.select(
        F.element_at("p", 1).cast("double").alias("log10p"),
        F.element_at("p", 2).alias("gram"),
        F.when(F.size("p") >= 3, F.element_at("p", 3).cast("double"))
        .otherwise(F.lit(0.0))
        .alias("bow"),
        (F.size(F.split(F.element_at("p", 2), " "))).alias("__k"),
    )
    n = parsed.agg(F.max("__k")).collect()[0][0] or 1
    tables = [
        parsed.filter(F.col("__k") == k).select("gram", "log10p", "bow")
        for k in range(1, n + 1)
    ]
    unk = (
        tables[0].filter(F.col("gram") == "<unk>").select("log10p").collect()
    )
    unk_log10 = float(unk[0][0]) if unk else -7.0
    return ArpaLM(tables=tables, n=int(n), unk_log10=unk_log10)


def score_arpa(
    df: DataFrame,
    lm: ArpaLM,
    tokens_col: str = "tokens",
    id_col: str = "doc_id",
    broadcast_tables: bool = True,
    engine: str = "window",
) -> DataFrame:
    """(id, n_pos, logprob10, ppl) under a pretrained ARPA model with full
    Katz backoff: listed k-gram -> its log10 prob; else the CONTEXT's
    backoff weight (0 when the context itself is unlisted — the ARPA
    convention) plus the (k-1)-order score, recursing to the unigram /
    <unk> floor. Same plan shape as score_ngram_lm: one doc-keyed corpus
    shuffle, per-order broadcast joins, codegen end to end."""
    n = lm.n
    pos = _positions(df, tokens_col, id_col, n, engine=engine)
    maybe_b = F.broadcast if broadcast_tables else (lambda x: x)
    t1 = maybe_b(
        lm.tables[0].select(
            F.col("gram").alias("w"),
            F.col("log10p").alias("p1"),
            F.col("bow").alias("b1"),
        )
    )
    scored = pos.join(t1, "w", "left")
    for k in range(2, n + 1):
        tk = maybe_b(
            lm.tables[k - 1].select(
                F.col("gram").alias(f"g{k}"), F.col("log10p").alias(f"p{k}")
            )
        )
        # context backoff weights live in the (k-1)-order table
        bk = maybe_b(
            lm.tables[k - 2].select(
                F.col("gram").alias(f"ctx{k}"), F.col("bow").alias(f"cb{k}")
            )
        )
        scored = scored.join(tk, f"g{k}", "left").join(bk, f"ctx{k}", "left")
    # log10 score cascade: unigram floor first
    s = F.coalesce(F.col("p1"), F.lit(lm.unk_log10))
    for k in range(2, n + 1):
        bow = F.coalesce(F.col(f"cb{k}"), F.lit(0.0))
        s_k = F.coalesce(F.col(f"p{k}"), bow + s)
        s = F.when(F.col("pos") >= k - 1, s_k).otherwise(s)
    scored = scored.withColumn("lp", s)
    agg = scored.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_pos"),
        dsum(F.col("lp"), 12).alias("logprob10"),
        # engine-exact fingerprint (see prob_q30): log10 values are plain
        # parsed literals summed after *2^20 exact scaling + floor
        F.sum(F.floor(F.col("lp") * F.lit(1048576.0)).cast("long")).alias(
            "lp_q20"
        ),
    )
    return agg.withColumn(
        "ppl", F.pow(F.lit(10.0), -F.col("logprob10") / F.col("n_pos"))
    )


def write_arpa(path: str, tables: list[list[tuple]], n: int) -> None:
    """Minimal .arpa writer (model export + test fixtures): ``tables[k-1]``
    holds (gram, log10p, bow) tuples for order k."""
    with open(path, "w", encoding="utf-8") as f:
        f.write("\\data\\\n")
        for k in range(1, n + 1):
            f.write(f"ngram {k}={len(tables[k - 1])}\n")
        for k in range(1, n + 1):
            f.write(f"\n\\{k}-grams:\n")
            for row in tables[k - 1]:
                gram, lp = row[0], row[1]
                bow = row[2] if len(row) > 2 else None
                if bow is None or k == n:
                    f.write(f"{lp}\t{gram}\n")
                else:
                    f.write(f"{lp}\t{gram}\t{bow}\n")
        f.write("\n\\end\\\n")


def lm_score_buckets_exact(
    scored: DataFrame,
    id_col: str = "doc_id",
    lang_col: str | None = None,
    score_col: str = "lp_q20",
    n_col: str = "n_pos",
) -> DataFrame:
    """CCNet head/middle/tail with EXACT, engine-portable terciles.

    ``perplexity_buckets`` (above) cuts on percentile_approx — the right
    tool at scale but its tie/rank semantics are engine-specific, so it
    can't face the SQL-oracle gate. This variant buckets on the exact
    integer per-token score lpt_q = floordiv(score, n) (score = the
    2^20-quantized log-prob sum the ARPA/backoff scorers emit — higher
    is better, i.e. lower perplexity):

        head    lpt_q >= v1,  v1 = the ceil(n/3)-th largest lpt_q
        middle  v2 <= lpt_q < v1,  v2 = the ceil(2n/3)-th largest
        tail    otherwise

    Tie groups never split across buckets (the cutoffs are VALUES, not
    row ranks), so the assignment is deterministic and identical in any
    engine. Shape: one map-side-combined groupBy(lang, lpt_q) to
    distinct-value rows, a cumsum window over those SMALL rows (per-lang
    distinct score values, not documents), two tiny cutoff aggregates
    broadcast back — the corpus itself is never re-shuffled. Without
    ``lang_col`` the cumsum window is a single task over the distinct
    quantized values — fine when the score range bounds them, but at
    corpus scale pass the partitioning column (the CCNet setting)."""
    s, n = F.col(score_col), F.col(n_col)
    # exact floor division for possibly-negative scores: subtract the
    # non-negative pmod first, then the division is exact in any engine
    lpt = ((s - F.pmod(s, n)) / n).cast("long")
    scored = scored.withColumn("lpt_q", lpt)
    key = [lang_col] if lang_col else []
    grp = scored.groupBy(*key, "lpt_q").agg(F.count(F.lit(1)).alias("__c"))
    w = (
        Window.partitionBy(*key).orderBy(F.desc("lpt_q"))
        if key
        else Window.orderBy(F.desc("lpt_q"))
    )
    tot = grp.groupBy(*key).agg(F.sum("__c").alias("__n"))
    cum = grp.withColumn("__cum", F.sum("__c").over(w))
    cum = cum.join(tot, key) if key else cum.crossJoin(F.broadcast(tot))
    cuts = cum.groupBy(*key).agg(
        F.max(F.when(F.col("__cum") >= F.ceil(F.col("__n") / 3), F.col("lpt_q"))).alias("__v1"),
        F.max(F.when(F.col("__cum") >= F.ceil(F.col("__n") * 2 / 3), F.col("lpt_q"))).alias("__v2"),
    )
    out = scored.join(F.broadcast(cuts), key) if key else scored.crossJoin(
        F.broadcast(cuts)
    )
    return out.withColumn(
        "bucket",
        F.when(F.col("lpt_q") >= F.col("__v1"), F.lit("head"))
        .when(F.col("lpt_q") >= F.col("__v2"), F.lit("middle"))
        .otherwise(F.lit("tail")),
    ).drop("__v1", "__v2")
