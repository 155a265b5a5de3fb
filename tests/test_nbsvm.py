"""NBSVM tests: log-count ratios vs hand computation, accuracy floor on a
separable synthetic corpus, model round-trip, empty-doc handling."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from tuktu_spark.ml.nbsvm import (
    NbsvmModel,
    nb_log_count_ratios,
    nbsvm_predict,
    nbsvm_train,
)


@pytest.fixture(scope="module")
def corpus(spark):
    """Separable synthetic sentiment corpus: positive docs use 'good great
    fine', negative use 'bad awful poor'; shared filler words."""
    import random

    rng = random.Random(42)
    pos_vocab = ["good", "great", "fine", "nice", "super"]
    neg_vocab = ["bad", "awful", "poor", "wrong", "broken"]
    filler = ["the", "movie", "was", "very", "and", "it", "acting"]
    rows = []
    for i in range(200):
        label = i % 2
        core = rng.choices(pos_vocab if label else neg_vocab, k=3)
        words = rng.choices(filler, k=5) + core
        rng.shuffle(words)
        rows.append((i, words, label))
    return spark.createDataFrame(rows, "id int, tokens array<string>, label int")


class TestRatios:
    def test_hand_computed(self, spark):
        df = spark.createDataFrame(
            [
                (["good", "fun"], 1),
                (["good", "good", "great"], 1),  # binarized: good counts once
                (["bad", "awful"], 0),
                (["bad", "fun"], 0),
            ],
            "tokens array<string>, label int",
        )
        got = {r["token"]: r["r"] for r in nb_log_count_ratios(df).collect()}
        # vocabulary: good fun great bad awful -> v=5
        # t1 = distinct (doc,token) with y=1 = 2+2 = 4; t0 = 2+2 = 4
        def r(n1, n0):
            return math.log((n1 + 1) / (4 + 5)) - math.log((n0 + 1) / (4 + 5))

        assert got["good"] == pytest.approx(r(2, 0))
        assert got["bad"] == pytest.approx(r(0, 2))
        assert got["fun"] == pytest.approx(r(1, 1))

    def test_log_free_odds_matches_exp_of_log(self, spark):
        df = spark.createDataFrame(
            [(["a", "b"], 1), (["b", "c"], 0)], "tokens array<string>, label int"
        )
        logs = {r["token"]: r["r"] for r in nb_log_count_ratios(df, log=True).collect()}
        odds = {r["token"]: r["r"] for r in nb_log_count_ratios(df, log=False).collect()}
        for t in logs:
            assert odds[t] == pytest.approx(math.exp(logs[t]), rel=1e-12)


class TestTrainPredict:
    def test_accuracy_floor_on_separable_corpus(self, corpus):
        model = nbsvm_train(corpus, vocab_size=100, max_iter=30)
        scored = nbsvm_predict(corpus, model)
        acc = scored.agg(
            F.avg((F.col("prediction") == F.col("label")).cast("double"))
        ).first()[0]
        assert acc >= 0.95

    def test_round_trip_same_predictions(self, corpus, tmp_path):
        model = nbsvm_train(corpus, vocab_size=100, max_iter=10)
        p = str(tmp_path / "nbsvm.json")
        model.save(p)
        loaded = NbsvmModel.load(p)
        a = {r["id"]: r["prediction"] for r in nbsvm_predict(corpus, model).collect()}
        b = {r["id"]: r["prediction"] for r in nbsvm_predict(corpus, loaded).collect()}
        assert a == b

    def test_empty_and_oov_docs_survive(self, corpus, spark):
        model = nbsvm_train(corpus, vocab_size=100, max_iter=10)
        odd = spark.createDataFrame(
            [(1000, []), (1001, ["zzz", "qqq"])], "id int, tokens array<string>"
        )
        rows = nbsvm_predict(odd, model).collect()
        assert len(rows) == 2  # neither row dropped
        for r in rows:
            assert r["prediction"] in (0, 1)
