"""ShortTextClassifier (ml/shorttext.py) — semantics + accuracy floor.

Reference: modules/nlp/app/tuktu/nlp/models/ShortTextClassifier.scala,
processors/ShortTextClassifierProcessor.scala. Feature construction is
additionally oracle-checked end-to-end by the nlp_shorttext_statics /
nlp_shorttext_vocab queries (tests/test_oracle_parity.py).
"""

import pytest
from pyspark.sql import functions as F

from tuktu_spark.ml import shorttext as ST

SEEDS = {"pos": ["fast", "good"], "neg": ["slow"]}


def proc(spark, toks, right=None, left=None):
    df = spark.createDataFrame([(toks,)], "t array<string>")
    return df.select(
        ST.process_tokens(F.col("t"), SEEDS, right, left).alias("p")
    ).first()["p"]


class TestProcessTokens:
    def test_seed_substitution(self, spark):
        assert proc(spark, ["a", "fast", "slow", "good"]) == [
            "a", "pos", "neg", "pos",
        ]

    def test_right_flip_negates_next_two(self, spark):
        assert proc(spark, ["not", "fast", "slow", "x"], right=["not"]) == [
            "not", "pos_NEG", "neg_NEG", "x",
        ]

    def test_left_flip_negates_previous_two(self, spark):
        assert proc(spark, ["fast", "slow", "but", "x"], left=["but"]) == [
            "pos_NEG", "neg_NEG", "but", "x",
        ]

    def test_double_flip_cancels(self, spark):
        # two right-flips both in range: parity 2 -> no negation
        assert proc(spark, ["not", "not", "fast"], right=["not"]) == [
            "not", "not", "pos",
        ]

    def test_flip_only_touches_seeds(self, spark):
        assert proc(spark, ["not", "plain", "words"], right=["not"]) == [
            "not", "plain", "words",
        ]


class TestFeatureNgrams:
    def grams(self, spark, toks):
        df = spark.createDataFrame([(toks,)], "t array<string>")
        feats = ST.feature_ngrams(F.col("t"), F.col("t"))
        return df.select(feats.alias("f")).first()["f"]

    def test_word_and_char_grams(self, spark):
        got = self.grams(spark, ["ab", "cd"])
        # word 1/2-grams (no separator), char 3-5 grams of "ab cd"
        assert got == [
            "ab", "cd", "abcd",
            "ab ", "b c", " cd",
            "ab c", "b cd",
            "ab cd",
        ]

    def test_short_input_yields_no_bogus_grams(self, spark):
        # fewer tokens/chars than n must yield EMPTY gram lists, not a
        # descending-sequence artifact (F.sequence(1, 0) == [1, 0])
        assert self.grams(spark, ["ab"]) == ["ab"]
        assert self.grams(spark, []) == []


class TestStaticFeatures:
    def test_values(self, spark):
        df = spark.createDataFrame(
            [(["The", "DOG", "ran!"],)], "t array<string>"
        )
        s = df.select(ST.static_features(F.col("t")).alias("s")).first()["s"]
        sentence = "The DOG ran!"  # 12 chars
        assert s[0] == pytest.approx(1 / 12)  # punct: '!'
        assert s[1] == pytest.approx(4 / 12)  # caps: T,D,O,G
        assert s[2] == pytest.approx(2 / 12)  # vowels: e,a (o is upper)
        assert s[3] == pytest.approx(2 / 3)  # cap-started words
        assert s[4] == pytest.approx(1 / 3)  # double-cap words len>2: DOG
        assert s[5] == 1.0  # first char capital
        assert s[6] == 0.0  # emojis
        assert s[7:] == [0.0, 1.0, 0.0]  # 10 < len <= 80
        assert len(sentence) == 12

    def test_empty_guard(self, spark):
        df = spark.createDataFrame([([],)], "t array<string>")
        s = df.select(ST.static_features(F.col("t")).alias("s")).first()["s"]
        assert s == [0.0] * 6 + [0.0, 1.0, 0.0, 0.0]


class TestVocabulary:
    def test_min_count_prunes(self, spark):
        df = spark.createDataFrame(
            [(["aaa", "bbb"],), (["aaa", "ccc"],)], "tokens array<string>"
        )
        vocab = {
            r["ngram"]: r["count"]
            for r in ST.ngram_vocabulary(
                df, "tokens", {}, min_count=2
            ).collect()
        }
        # word-1-gram "aaa" twice + char-3-gram "aaa" once per sentence = 4
        assert vocab["aaa"] == 4
        # "bbb"/"ccc" reach count 2 (word + char gram in the same doc)
        assert vocab["bbb"] == 2 and vocab["ccc"] == 2
        # cross-word char grams appear only once per doc -> pruned
        assert "aa b" not in vocab and "a cc" not in vocab


class TestTrainPredict:
    @pytest.fixture(scope="class")
    def corpus(self, spark):
        import random

        random.seed(11)
        vocab = {
            0.0: ["alpha", "beta", "gamma"],
            1.0: ["delta", "epsilon", "zeta"],
            2.0: ["eta", "theta", "iota"],
        }
        rows = []
        for i in range(240):
            lbl = float(i % 3)
            toks = [
                random.choice(vocab[lbl] + ["common", "filler"])
                for _ in range(10)
            ]
            rows.append((toks, lbl))
        return spark.createDataFrame(
            rows, "tokens array<string>, label double"
        ).cache()

    def test_multiclass_accuracy_floor(self, spark, corpus):
        model = ST.shorttext_train(
            corpus, min_count=2, vocab_size=5000, max_iter=20
        )
        pred = ST.shorttext_predict(corpus, model)
        acc = pred.agg(
            F.avg((F.col("prediction") == F.col("label")).cast("double"))
        ).first()[0]
        assert acc >= 0.9
        assert sorted(model.classes) == [0.0, 1.0, 2.0]

    def test_short_sentence_gets_default_class(self, spark, corpus):
        model = ST.shorttext_train(
            corpus, min_count=2, vocab_size=1000, max_iter=5
        )
        tiny = spark.createDataFrame([(["ab"],)], "tokens array<string>")
        assert ST.shorttext_predict(tiny, model).first()["prediction"] == -1.0

    def test_model_roundtrip(self, spark, corpus, tmp_path):
        model = ST.shorttext_train(
            corpus, min_count=2, vocab_size=1000, max_iter=5
        )
        p = str(tmp_path / "st.json")
        model.save(p)
        loaded = ST.ShortTextModel.load(p)
        assert loaded.vocab == model.vocab
        assert loaded.weights == model.weights
        assert loaded.classes == model.classes

    def test_operator_registered(self, spark, corpus):
        from tuktu_spark.operators.registry import make_operator

        out = make_operator(
            "shorttext",
            {"min_count": 2, "vocab_size": 1000},
        )(corpus)
        assert "prediction" in out.columns
        assert out.count() == 240

    def test_binary_case(self, spark):
        import random

        random.seed(3)
        rows = []
        for i in range(160):
            lbl = float(i % 2)
            words = ["yes", "aye", "yep"] if lbl else ["no", "nah", "nope"]
            toks = [random.choice(words + ["hm"]) for _ in range(8)]
            rows.append((toks, lbl))
        d = spark.createDataFrame(rows, "tokens array<string>, label double")
        model = ST.shorttext_train(d, min_count=2, vocab_size=2000, max_iter=20)
        acc = (
            ST.shorttext_predict(d, model)
            .agg(F.avg((F.col("prediction") == F.col("label")).cast("double")))
            .first()[0]
        )
        assert acc >= 0.9
