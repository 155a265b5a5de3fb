"""NBSVM short-text classifier (Wang & Manning 2012, public literature).

Reference: modules/nlp/app/tuktu/nlp/models/NBSVM.scala:10-41 and the
train/apply/deserialize processor trio (NBSVMProcessor.scala:13-77). The
reference wraps a liblinear/SGD NBSVM; here the pieces are Spark-native:

- **NB log-count ratios** r_w = log( (n1_w+1)/(N1+V) / ((n0_w+1)/(N0+V)) )
  are pure DataFrame algebra over an exploded token table — one groupBy,
  SQL-oracle-able, and the part that scales with corpus size.
- **Features**: binarized token presence scaled by r (the paper's best
  variant for short text), assembled per doc by joining the (tiny,
  broadcast) ratio table and collecting to a sparse vector.
- **Classifier**: pyspark.ml LinearSVC on the r-weighted vectors, then the
  paper's interpolation w' = (1-beta)*w_bar + beta*w (w_bar = mean |w|)
  applied to the learned weights; scoring is a broadcast sparse dot
  product — no Python in the scan path.
"""

from __future__ import annotations

import json
from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def nb_log_count_ratios(
    df: DataFrame,
    tokens_col: str = "tokens",
    label_col: str = "label",
    smoothing: float = 1.0,
    log: bool = True,
) -> DataFrame:
    """(token, r) — Naive-Bayes log-count ratios for binary labels {0,1}.

    Token presence is binarized per document (array_distinct), counts are
    Laplace-smoothed over the joint vocabulary. Everything is one explode +
    one groupBy; the result is vocabulary-sized (tiny vs the corpus).

    ``log=False`` returns the raw smoothed odds ratio instead of its log —
    multiplication/division are IEEE-exact so the value is bit-identical
    across engines (ln() is not), which is what the DuckDB oracle checks;
    ranking by odds equals ranking by log-odds."""
    toks = df.select(
        F.col(label_col).cast("int").alias("y"),
        F.explode(F.array_distinct(F.col(tokens_col))).alias("token"),
    )
    counts = toks.groupBy("token").agg(
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).alias("n1"),
        F.sum(F.when(F.col("y") == 0, 1).otherwise(0)).alias("n0"),
    )
    tot = toks.groupBy().agg(
        F.sum(F.when(F.col("y") == 1, 1).otherwise(0)).alias("t1"),
        F.sum(F.when(F.col("y") == 0, 1).otherwise(0)).alias("t0"),
        F.count_distinct("token").alias("v"),
    )
    s = F.lit(float(smoothing))
    p1 = (F.col("n1") + s) / (F.col("t1") + s * F.col("v"))
    p0 = (F.col("n0") + s) / (F.col("t0") + s * F.col("v"))
    r = (F.log(p1) - F.log(p0)) if log else (p1 / p0)
    return counts.crossJoin(F.broadcast(tot)).select("token", r.alias("r"))


@dataclass
class NbsvmModel:
    """token -> (index, r); learned weights + intercept after interpolation."""

    vocab: dict[str, int]
    ratios: list[float]
    weights: list[float]
    intercept: float
    beta: float

    def to_dict(self) -> dict:
        return {
            "vocab": self.vocab,
            "ratios": self.ratios,
            "weights": self.weights,
            "intercept": self.intercept,
            "beta": self.beta,
        }

    @classmethod
    def from_dict(cls, d: dict) -> "NbsvmModel":
        return cls(
            vocab=dict(d["vocab"]),
            ratios=list(d["ratios"]),
            weights=list(d["weights"]),
            intercept=float(d["intercept"]),
            beta=float(d["beta"]),
        )

    def save(self, path: str) -> None:
        with open(path, "w") as f:
            json.dump(self.to_dict(), f)

    @classmethod
    def load(cls, path: str) -> "NbsvmModel":
        with open(path) as f:
            return cls.from_dict(json.load(f))


def _featurize(df: DataFrame, model_df: DataFrame, tokens_col: str) -> DataFrame:
    """Join each doc's distinct tokens against the broadcast (token, idx, r)
    table and collect (idx, r) pairs per doc — the sparse r-weighted
    binarized feature vector, built with zero Python in the hot path."""
    base = df.withColumn("__rid", F.monotonically_increasing_id())
    return (
        base.withColumn("__tok", F.explode_outer(F.array_distinct(F.col(tokens_col))))
        .join(F.broadcast(model_df), F.col("__tok") == F.col("token"), "left")
        .groupBy(*base.columns)
        .agg(
            F.sort_array(
                F.collect_list(
                    F.when(
                        F.col("idx").isNotNull(),
                        F.struct(F.col("idx"), F.col("r")),
                    )
                )
            ).alias("__feats")
        )
        .drop("__rid")
    )


def nbsvm_train(
    df: DataFrame,
    tokens_col: str = "tokens",
    label_col: str = "label",
    vocab_size: int = 20_000,
    beta: float = 0.25,
    reg_param: float = 0.1,
    max_iter: int = 50,
    smoothing: float = 1.0,
) -> NbsvmModel:
    """Train NBSVM: ratios (DataFrame algebra) -> LinearSVC on r-weighted
    binarized features -> weight interpolation. The vocabulary is capped at
    ``vocab_size`` most-frequent tokens (the model itself is driver-sized:
    one float per vocab entry)."""
    import numpy as np
    from pyspark.ml.classification import LinearSVC
    from pyspark.ml.linalg import Vectors

    ratios = nb_log_count_ratios(df, tokens_col, label_col, smoothing)
    freq = (
        df.select(F.explode(F.array_distinct(F.col(tokens_col))).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("df"))
    )
    vocab_rows = (
        ratios.join(freq, "token")
        .orderBy(F.col("df").desc(), F.col("token").asc())
        .limit(vocab_size)
        .select("token", "r")
        .collect()
    )
    vocab = {r["token"]: i for i, r in enumerate(vocab_rows)}
    rvec = [float(r["r"]) for r in vocab_rows]
    spark = df.sparkSession
    model_df = spark.createDataFrame(
        [(t, i, rvec[i]) for t, i in vocab.items()], "token string, idx int, r double"
    )
    n_features = len(vocab)
    feats = _featurize(df.select(F.col(tokens_col), F.col(label_col)), model_df, tokens_col)

    def to_vec(row):
        pairs = [(p["idx"], p["r"]) for p in row["__feats"] if p is not None]
        return (
            float(row[label_col]),
            Vectors.sparse(n_features, [i for i, _ in pairs], [v for _, v in pairs]),
        )

    # RDD map is the one sanctioned seam for building sparse-VectorUDT
    # rows (Arrow/pandas UDFs cannot emit VectorUDT); it touches only the
    # TRAINING corpus — scoring (nbsvm_predict) never leaves column algebra.
    train_df = spark.createDataFrame(
        feats.rdd.map(to_vec), ["label", "features"]
    )
    svc = LinearSVC(regParam=reg_param, maxIter=max_iter, standardization=False)
    fitted = svc.fit(train_df)
    w = np.asarray(fitted.coefficients.toArray())
    w_bar = float(np.abs(w).mean()) if len(w) else 0.0
    w_prime = (1.0 - beta) * w_bar + beta * w  # Wang & Manning interpolation
    return NbsvmModel(
        vocab=vocab,
        ratios=rvec,
        weights=[float(x) for x in w_prime],
        intercept=float(fitted.intercept),
        beta=beta,
    )


def nbsvm_predict(
    df: DataFrame, model: NbsvmModel, tokens_col: str = "tokens", out_col: str = "prediction"
) -> DataFrame:
    """Score: sum over present vocab tokens of r_w * w'_w, plus intercept;
    label 1 iff margin > 0. One broadcast join + one groupBy — fully
    JVM-side, linear in corpus size."""
    spark = df.sparkSession
    rows = [
        (t, model.ratios[i] * model.weights[i]) for t, i in model.vocab.items()
    ]
    wtab = spark.createDataFrame(rows, "token string, rw double")
    base = df.withColumn("__rid", F.monotonically_increasing_id())
    scored = (
        base.withColumn("__tok", F.explode_outer(F.array_distinct(F.col(tokens_col))))
        .join(F.broadcast(wtab), F.col("__tok") == F.col("token"), "left")
        .groupBy(*base.columns)
        .agg(F.sum(F.coalesce(F.col("rw"), F.lit(0.0))).alias("__margin"))
    )
    return scored.select(
        *df.columns,
        (F.col("__margin") + F.lit(model.intercept)).alias("margin"),
        F.when(F.col("__margin") + F.lit(model.intercept) > 0, 1)
        .otherwise(0)
        .alias(out_col),
    )
