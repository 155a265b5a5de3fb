"""ShortTextClassifier — seed-word/negation features + linear SVM.

Reference capability: modules/nlp/app/tuktu/nlp/models/
ShortTextClassifier.scala:14-220 and the train/apply processor pair
(processors/ShortTextClassifierProcessor.scala). The reference builds, per
sentence, (a) word 1-3-grams over seed-substituted/negated tokens joined
WITHOUT separator, (b) char 3-5-grams over the raw sentence, (c) ten static
style features, and trains liblinear MCSVM_CS on counts scaled by sentence
char length. Here the same feature semantics are column algebra end-to-end:

- seed substitution + negation flips: one ``F.transform`` over the token
  array (no Python);
- n-gram vocabulary with ``min_count`` pruning: explode + groupBy — the
  corpus-scaled part stays distributed, only the pruned vocabulary (further
  capped at ``vocab_size``, a scale guard the reference lacks) is
  collected/broadcast;
- classifier: pyspark.ml ``LinearSVC`` under ``OneVsRest`` (the Spark
  analogue of MCSVM_CS multi-class);
- scoring: per-class broadcast weight join + one groupBy — JVM-side, no
  Python in the scan path (same shape as ml/nbsvm.py).

Deviation from the reference, by intent: the reference's left-flip branch
tests ``seedIndices.contains(index + offset)`` while mutating position
``index - offset`` (ShortTextClassifier.scala:60-66), so left flips fire
only in the rare overlap of both windows. Implemented here as the
documented intent: a left-flip token negates seed words 1-2 positions to
its LEFT, symmetric with right flips. Each flip TOGGLES the _NEG suffix,
so two flips cancel — matching the reference's add/remove behavior.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .nlp import _EMOJI_RANGES

#: punctuation set from ShortTextClassifier.getStaticFeatures
_PUNCT_CLASS = r"""[!.,?:;'"\[\]{}()\-+=&%$€]"""
#: vowels incl. the reference's accented list
_VOWEL_CLASS = "[aeoiuyäáàâãëéèêöóòôõïíìîüúùûÿý]"
N_STATIC = 10


def process_tokens(
    tokens,
    seed_words: dict[str, list[str]],
    right_flips: list[str] | None = None,
    left_flips: list[str] | None = None,
):
    """Seed-substituted, negation-flipped token array (processTokens).

    Every token belonging to a seed list is replaced by its label; a
    right-flip token toggles _NEG on seed labels 1-2 positions to its
    right, a left-flip token on seed labels 1-2 positions to its left
    (see module docstring for the documented intent deviation). Pure
    array algebra — evaluated per row with zero shuffles."""
    right = list(right_flips or [])
    left = list(left_flips or [])

    def seed_label(t):
        expr = None
        for label in sorted(seed_words):
            cond = t.isin(*seed_words[label]) if seed_words[label] else F.lit(False)
            expr = F.when(cond, F.lit(label)) if expr is None else expr.when(cond, F.lit(label))
        return expr.otherwise(t) if expr is not None else t

    def is_seed(t):
        all_seeds = [w for ws in seed_words.values() for w in ws]
        return t.isin(*all_seeds) if all_seeds else F.lit(False)

    def flip_count(toks, i):
        # number of flip triggers acting on position i (0-based):
        # right-flips at i-1/i-2, left-flips at i+1/i+2
        def hit(idx, words):
            if not words:
                return F.lit(0)
            return F.when(F.get(toks, idx).isin(*words), 1).otherwise(0)

        return (
            hit(i - 1, right) + hit(i - 2, right) + hit(i + 1, left) + hit(i + 2, left)
        )

    def one(toks):
        def fn(t, i):
            base = seed_label(t)
            negated = is_seed(t) & (flip_count(toks, i) % 2 == 1)
            return F.when(negated, F.concat(base, F.lit("_NEG"))).otherwise(base)

        return F.transform(toks, fn)

    return one(tokens)


def feature_ngrams(tokens, processed):
    """Feature n-gram array (getNgramFeatures): word 1-3-grams over the
    processed tokens joined WITHOUT separator (the reference's
    ``mkString``), plus char 3-5-grams over the raw space-joined sentence.
    Duplicates are kept — the trainer counts occurrences, not presence."""
    def positions(cnt):
        # F.sequence(1, 0) yields a DESCENDING [1, 0] — guard short inputs
        # to an empty array instead
        return F.when(cnt >= 1, F.sequence(F.lit(1), cnt)).otherwise(
            F.array().cast("array<int>")
        )

    # The lambdas MUST be single-parameter: pyspark inspects the signature,
    # and a `lambda i, n=n` two-parameter form is bound as an
    # (element, index) lambda — n silently becomes the array index.
    def word_lambda(n):
        return lambda i: F.array_join(F.slice(processed, i, n), "")

    word_grams = [
        F.transform(positions(F.size(processed) - (n - 1)), word_lambda(n))
        for n in (1, 2, 3)
    ]
    sentence = F.concat_ws(" ", tokens)

    def char_lambda(n):
        return lambda i: sentence.substr(i, F.lit(n))

    char_grams = [
        F.transform(positions(F.length(sentence) - (n - 1)), char_lambda(n))
        for n in (3, 4, 5)
    ]
    return F.concat(*word_grams, *char_grams)


def static_features(tokens):
    """The ten per-sentence style ratios (getStaticFeatures), as an
    array<double>: punctuation / caps / vowel char ratios, cap-started and
    double-cap-started word ratios, first-char-capital flag, emoji char
    count, and the short/mid/long length one-hots. Ratios guard the empty
    sentence with 0.0 (the reference yields NaN there)."""
    s = F.concat_ws(" ", tokens)
    slen = F.length(s).cast("double")
    ntok = F.size(tokens).cast("double")

    def char_ratio(cls):
        stripped = F.regexp_replace(s, cls, "")
        return F.when(slen > 0, (slen - F.length(stripped)) / slen).otherwise(0.0)

    def tok_ratio(pred):
        return F.when(
            ntok > 0, F.size(F.filter(tokens, pred)).cast("double") / ntok
        ).otherwise(0.0)

    punct = char_ratio(_PUNCT_CLASS)
    caps = char_ratio(r"\p{Lu}")
    vowels = char_ratio(_VOWEL_CLASS)
    cap_words = tok_ratio(lambda t: t.rlike(r"^\p{Lu}"))
    slow_release = tok_ratio(
        lambda t: (F.length(t) > 2) & t.rlike(r"^\p{Lu}\p{Lu}")
    )
    first_cap = F.when(F.substring(s, 1, 1).rlike(r"^\p{Lu}"), 1.0).otherwise(0.0)
    emojis = slen - F.length(F.regexp_replace(s, f"[{_EMOJI_RANGES}]", ""))
    short_len = F.when(F.length(s) <= 10, 1.0).otherwise(0.0)
    mid_len = F.when((F.length(s) > 10) & (F.length(s) <= 80), 1.0).otherwise(0.0)
    long_len = F.when(F.length(s) > 80, 1.0).otherwise(0.0)
    return F.array(
        punct, caps, vowels, cap_words, slow_release, first_cap,
        emojis.cast("double"), short_len, mid_len, long_len,
    )


def ngram_vocabulary(
    df: DataFrame,
    tokens_col: str,
    seed_words: dict[str, list[str]],
    right_flips: list[str] | None = None,
    left_flips: list[str] | None = None,
    min_count: int = 2,
) -> DataFrame:
    """(ngram, count) over the whole corpus, pruned to count >= min_count
    (trainClassifier's featureMap.retain). One explode + one groupBy; the
    result is vocabulary-sized."""
    toks = F.col(tokens_col)
    feats = feature_ngrams(
        toks, process_tokens(toks, seed_words, right_flips, left_flips)
    )
    return (
        df.select(F.explode(feats).alias("ngram"))
        .groupBy("ngram")
        .agg(F.count(F.lit(1)).alias("count"))
        .filter(F.col("count") >= min_count)
    )


@dataclass
class ShortTextModel:
    """Pruned vocabulary + per-class linear weights. Weight layout:
    index 0..9 the static features, 10.. the vocabulary n-grams (the
    reference reserves the same 10 leading slots)."""

    vocab: dict[str, int]
    classes: list[float]
    weights: list[list[float]]  # per class, length N_STATIC + len(vocab)
    intercepts: list[float]
    min_count: int
    seed_words: dict[str, list[str]]
    right_flips: list[str]
    left_flips: list[str]
    default_class: float = -1.0

    def to_dict(self) -> dict:
        return {
            "vocab": self.vocab,
            "classes": self.classes,
            "weights": self.weights,
            "intercepts": self.intercepts,
            "min_count": self.min_count,
            "seed_words": self.seed_words,
            "right_flips": self.right_flips,
            "left_flips": self.left_flips,
            "default_class": self.default_class,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "ShortTextModel":
        return cls(
            vocab=dict(d["vocab"]),
            classes=[float(c) for c in d["classes"]],
            weights=[[float(w) for w in ws] for ws in d["weights"]],
            intercepts=[float(b) for b in d["intercepts"]],
            min_count=int(d["min_count"]),
            seed_words={k: list(v) for k, v in d["seed_words"].items()},
            right_flips=list(d["right_flips"]),
            left_flips=list(d["left_flips"]),
            default_class=float(d["default_class"]),
        )

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f)

    @classmethod
    def load(cls, path: str) -> "ShortTextModel":
        with open(path) as f:
            return cls.from_dict(json.load(f))


def _doc_features(
    df: DataFrame,
    tokens_col: str,
    model_ngrams: DataFrame,
    seed_words,
    right_flips,
    left_flips,
):
    """Per-row: array of static features + sorted (idx, weight) pairs for
    vocabulary n-grams (count / sentence char length). Broadcast join on
    the pruned vocabulary; the corpus side never shuffles by value."""
    toks = F.col(tokens_col)
    base = df.withColumn("__rid", F.monotonically_increasing_id()).withColumn(
        "__statics", static_features(toks)
    ).withColumn("__slen", F.length(F.concat_ws(" ", toks)).cast("double"))
    feats = feature_ngrams(
        toks, process_tokens(toks, seed_words, right_flips, left_flips)
    )
    exploded = base.withColumn("__ng", F.explode_outer(feats))
    return (
        exploded.join(
            F.broadcast(model_ngrams), F.col("__ng") == F.col("ngram"), "left"
        )
        .groupBy(*base.columns)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("idx").isNotNull(),
                        F.struct(F.col("idx"), F.lit(1.0).alias("c")),
                    )
                )
            ).alias("__raw")
        )
        # occurrences of the same ngram collapse to one (idx, count) pair
        .withColumn(
            "__pairs",
            F.transform(
                F.array_distinct(F.transform("__raw", lambda p: p["idx"])),
                lambda i: F.struct(
                    i.alias("idx"),
                    (
                        F.size(F.filter("__raw", lambda p: p["idx"] == i))
                        / F.col("__slen")
                    ).alias("v"),
                ),
            ),
        )
        .drop("__raw", "__rid")
    )


def shorttext_train(
    df: DataFrame,
    tokens_col: str = "tokens",
    label_col: str = "label",
    seed_words: dict[str, list[str]] | None = None,
    right_flips: list[str] | None = None,
    left_flips: list[str] | None = None,
    min_count: int = 2,
    vocab_size: int = 50_000,
    # count/slen features are ~1e-2 scale, so the SVM needs a much
    # weaker L2 than unit-scale features (liblinear C ~ 1/reg_param)
    reg_param: float = 0.001,
    max_iter: int = 30,
    standardization: bool = True,
    default_class: float = -1.0,
) -> ShortTextModel:
    """Train: distributed vocabulary -> per-doc sparse features -> OneVsRest
    LinearSVC. Only the pruned vocabulary and the k weight vectors ever
    reach the driver."""
    from pyspark.ml.classification import LinearSVC, OneVsRest
    from pyspark.ml.linalg import Vectors

    seed_words = seed_words or {}
    spark = df.sparkSession
    vocab_rows = (
        ngram_vocabulary(df, tokens_col, seed_words, right_flips, left_flips, min_count)
        .orderBy(F.col("count").desc(), F.col("ngram").asc())
        .limit(vocab_size)
        .collect()
    )
    vocab = {r["ngram"]: N_STATIC + i for i, r in enumerate(vocab_rows)}
    model_ngrams = spark.createDataFrame(
        [(t, i) for t, i in vocab.items()] or [("", -1)], "ngram string, idx int"
    )
    n_features = N_STATIC + len(vocab)

    feats = _doc_features(
        df.select(F.col(tokens_col), F.col(label_col)),
        tokens_col, model_ngrams, seed_words, right_flips, left_flips,
    )
    classes = sorted(
        r[0] for r in df.select(F.col(label_col).cast("double")).distinct().collect()
    )
    class_idx = {c: i for i, c in enumerate(classes)}

    def to_vec(row):
        idx = list(range(N_STATIC)) + [p["idx"] for p in (row["__pairs"] or [])]
        val = list(row["__statics"]) + [p["v"] for p in (row["__pairs"] or [])]
        pairs = sorted(
            (i, v) for i, v in zip(idx, val) if v is not None and v != 0.0
        )
        return (
            float(class_idx[float(row[label_col])]),
            Vectors.sparse(n_features, [i for i, _ in pairs], [v for _, v in pairs]),
        )

    # RDD map is the sanctioned seam for sparse-VectorUDT construction
    # (same as ml/nbsvm.py); it touches only the training corpus.
    train_df = spark.createDataFrame(feats.rdd.map(to_vec), ["label", "features"])
    svc = LinearSVC(
        regParam=reg_param, maxIter=max_iter, standardization=standardization
    )
    if len(classes) <= 2:
        fitted = svc.fit(train_df)
        w = [float(x) for x in fitted.coefficients.toArray()]
        # binary: one margin vector; encode as class-1 weights, class-0 zero
        weights = [[0.0] * n_features, w]
        intercepts = [0.0, float(fitted.intercept)]
    else:
        ovr = OneVsRest(classifier=svc).fit(train_df)
        weights = [
            [float(x) for x in m.coefficients.toArray()] for m in ovr.models
        ]
        intercepts = [float(m.intercept) for m in ovr.models]
    return ShortTextModel(
        vocab=vocab,
        classes=[float(c) for c in classes],
        weights=weights,
        intercepts=intercepts,
        min_count=min_count,
        seed_words=seed_words,
        right_flips=list(right_flips or []),
        left_flips=list(left_flips or []),
        default_class=default_class,
    )


def shorttext_predict(
    df: DataFrame,
    model: ShortTextModel,
    tokens_col: str = "tokens",
    out_col: str = "prediction",
) -> DataFrame:
    """Score: per class, margin = statics . w[:10] + sum over matched
    n-grams of (count/slen) * w[idx] + intercept; prediction = argmax.
    Sentences shorter than 10 chars get ``default_class`` (the
    reference's guard). One broadcast join + one groupBy per corpus —
    fully JVM-side regardless of class count."""
    spark = df.sparkSession
    k = len(model.classes)
    rows = [
        (ng, *[model.weights[c][i] for c in range(k)])
        for ng, i in model.vocab.items()
    ] or [("", *([0.0] * k))]
    wcols = ", ".join(f"w{c} double" for c in range(k))
    wtab = spark.createDataFrame(rows, f"ngram string, {wcols}")

    toks = F.col(tokens_col)
    base = df.withColumn("__rid", F.monotonically_increasing_id()).withColumn(
        "__statics", static_features(toks)
    ).withColumn("__slen", F.length(F.concat_ws(" ", toks)).cast("double"))
    feats = feature_ngrams(
        toks,
        process_tokens(toks, model.seed_words, model.right_flips, model.left_flips),
    )
    scored = (
        base.withColumn("__ng", F.explode_outer(feats))
        .join(F.broadcast(wtab), F.col("__ng") == F.col("ngram"), "left")
        .groupBy(*base.columns)
        .agg(
            *[
                F.sum(F.coalesce(F.col(f"w{c}"), F.lit(0.0))).alias(f"__m{c}")
                for c in range(k)
            ]
        )
    )
    margins = [
        (
            F.col(f"__m{c}") / F.when(F.col("__slen") > 0, F.col("__slen")).otherwise(1.0)
            + F.aggregate(
                F.zip_with(
                    F.col("__statics"),
                    F.array(*[F.lit(w) for w in model.weights[c][:N_STATIC]]),
                    lambda a, b: a * b,
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            )
            + F.lit(model.intercepts[c])
        ).alias(f"__margin{c}")
        for c in range(k)
    ]
    with_margins = scored.select(*scored.columns, *margins)
    # argmax over the k margin columns (k is tiny: column algebra);
    # array_position is 1-based and 0 when no max exists (all-NULL margins)
    marr = F.array(*[F.col(f"__margin{c}") for c in range(k)])
    best = F.array_position(marr, F.array_max(marr)).cast("int")
    pred = F.when(
        (F.col("__slen") < 10) | (best <= 0), F.lit(model.default_class)
    ).otherwise(
        F.element_at(F.array(*[F.lit(c) for c in model.classes]), best)
    )
    return with_margins.select(*df.columns, pred.alias(out_col))
