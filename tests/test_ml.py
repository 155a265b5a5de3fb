"""ML / NLP / time-series layer tests (SURVEY.md §2.12)."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tuktu_spark.ml import features as FE
from tuktu_spark.ml import models as M
from tuktu_spark.ml import nlp as NLP
from tuktu_spark.ml import timeseries as TS


@pytest.fixture(scope="module")
def nums(spark):
    return spark.createDataFrame(
        [("a", 0.0), ("a", 5.0), ("a", 10.0), ("b", 2.0), ("b", 4.0), ("b", None)],
        "k string, x double",
    )


def test_normalize_minmax_grouped(nums):
    out = FE.normalize_minmax(nums.dropna(), ["x"], keys=["k"])
    got = {(r["k"], r["x"]): r["x_norm"] for r in out.collect()}
    assert got[("a", 0.0)] == 0.0 and got[("a", 5.0)] == 0.5 and got[("a", 10.0)] == 1.0
    assert got[("b", 2.0)] == 0.0 and got[("b", 4.0)] == 1.0


def test_normalize_zscore_global(nums):
    out = FE.normalize_zscore(nums.dropna().filter("k = 'a'"), ["x"])
    vals = sorted(r["x_z"] for r in out.collect())
    # mean 5, sd_pop sqrt(50/3)
    sd = math.sqrt(50.0 / 3.0)
    assert vals == pytest.approx([-5 / sd, 0.0, 5 / sd])


def test_impute_mean_per_key(nums):
    out = FE.impute_mean(nums, ["x"], keys=["k"])
    got = sorted(r["x"] for r in out.filter("k = 'b'").collect())
    assert got == [2.0, 3.0, 4.0]  # null filled with mean(2,4)


def test_dummy_variables_explicit_and_inferred(nums):
    out = FE.dummy_variables(nums, "k", categories=["a", "b", "c"])
    assert {"k_a", "k_b", "k_c"}.issubset(out.columns)
    row = out.filter("x = 5.0").collect()[0]
    assert (row["k_a"], row["k_b"], row["k_c"]) == (1, 0, 0)
    inferred = FE.dummy_variables(nums, "k")
    assert {"k_a", "k_b"}.issubset(inferred.columns)


def test_nlp_tokenize_ngrams_stopwords(spark):
    df = spark.createDataFrame([("The quick brown fox the end",)], "text string")
    toks = df.select(NLP.remove_stopwords(NLP.tokenize(F.col("text"))).alias("t"))
    assert toks.collect()[0]["t"] == ["quick", "brown", "fox", "end"]
    grams = df.select(NLP.ngrams(NLP.tokenize(F.col("text")), 2).alias("g"))
    assert grams.collect()[0]["g"][0] == "the quick"


def test_tf_idf_exact(spark):
    df = spark.createDataFrame(
        [(1, "cat dog"), (2, "cat cat fish")], "doc_id long, text string"
    )
    out = NLP.tf_idf(df, use_log=False).collect()
    scores = {(r["doc_id"], r["term"]): r["tfidf"] for r in out}
    assert scores[(2, "cat")] == pytest.approx(2 * 2 / 2)  # tf=2, N=2, df=2
    assert scores[(2, "fish")] == pytest.approx(1 * 2 / 1)


def test_model_trio_train_apply_persist(spark, tmp_path):
    df = spark.createDataFrame(
        [(0.0, 1.0, 0.0), (1.0, 10.0, 1.0), (0.0, 2.0, 0.0), (1.0, 9.0, 1.0)] * 5,
        "f1 double, f2 double, y double",
    )
    model = M.train(df, "logistic_regression", feature_cols=["f1", "f2"], label_col="y")
    scored = M.apply_model(df, model)
    acc = scored.filter(F.col("prediction") == F.col("y")).count() / df.count()
    assert acc == 1.0
    path = str(tmp_path / "m")
    M.save_model(model, path)
    again = M.load_model(path)
    assert M.apply_model(df, again).filter(
        F.col("prediction") == F.col("y")
    ).count() == df.count()


def test_estimator_registry_covers_reference_models():
    for name in [
        "linear_regression", "ridge_regression", "logistic_regression",
        "decision_tree_classifier", "gradient_boosted_trees", "linear_svm",
        "naive_bayes", "kmeans", "lda", "fpgrowth",
    ]:
        assert name in M.ESTIMATORS


def test_ar_forecast_learns_linear_trend(spark):
    rows = [("s", i, float(2 * i)) for i in range(30)]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    out = TS.ar_forecast(df, ["k"], "t", "v", p=2, horizon=3).collect()
    got = {r["step"]: r["forecast"] for r in out}
    # AR(2)+intercept fits x_t = x_{t-1} + 2 exactly on a linear series
    assert got[1] == pytest.approx(60.0, abs=1e-6)
    assert got[3] == pytest.approx(64.0, abs=1e-6)


def test_changepoint_cusum_finds_shift(spark):
    rows = [("s", i, 0.0) for i in range(50)] + [("s", i, 10.0) for i in range(50, 100)]
    df = spark.createDataFrame(rows, "k string, t int, v double")
    out = TS.changepoint_cusum(df, ["k"], "t", "v").collect()[0]
    assert out["position"] == 50  # boundary of the level shift


def test_sentence_split_and_case_fold(spark):
    df = spark.createDataFrame(
        [("Hello world. How are you? fine!",)], "text string"
    )
    out = df.select(NLP.sentence_split(F.col("text")).alias("s")).collect()[0]["s"]
    assert out == ["Hello world.", "How are you?", "fine!"]
    folded = df.select(NLP.case_fold(F.col("text"), "upper").alias("u")).collect()[0]["u"]
    assert folded.startswith("HELLO")


def test_stemmer_suffix_rules(spark):
    df = spark.createDataFrame(
        [("running",), ("nations",), ("cat",), ("ed",)], "w string"
    )
    got = [r["s"] for r in df.select(NLP.stem(F.col("w")).alias("s")).collect()]
    assert got == ["runn", "nation", "cat", "ed"]  # 'ed' too short to strip
