"""Unigram-LM tokenizer (llm/unigram.py — Kudo 2018 hard-EM variant)."""

from __future__ import annotations

import math

from tuktu_spark.llm.unigram import (
    UnigramModel,
    train_unigram,
    unigram_encode,
    viterbi_segment,
)


class TestViterbi:
    def test_prefers_high_probability_pieces(self):
        logp = {"ab": math.log(0.4), "a": math.log(0.1), "b": math.log(0.1),
                "c": math.log(0.1)}
        assert viterbi_segment("abab", logp) == ["ab", "ab"]
        assert viterbi_segment("abc", logp) == ["ab", "c"]
        # two singles beat one rare long piece
        logp2 = {"ab": math.log(0.01), "a": math.log(0.3), "b": math.log(0.3)}
        assert viterbi_segment("ab", logp2) == ["a", "b"]

    def test_tie_breaks_are_deterministic(self):
        # equal scores: longer last piece wins
        logp = {"ab": math.log(0.25), "a": math.log(0.5), "b": math.log(0.5)}
        # score("ab") = log .25; score("a")+score("b") = log .25 — tie
        assert viterbi_segment("ab", logp) == ["ab"]

    def test_unseen_chars_fall_back_lossless(self):
        logp = {"a": math.log(0.5)}
        assert viterbi_segment("axa", logp) == ["a", "x", "a"]

    def test_roundtrip_always(self):
        logp = {"ab": -1.0, "ba": -1.0, "a": -3.0, "b": -3.0}
        for w in ("ababab", "bababa", "aab", "b", "abba"):
            assert "".join(viterbi_segment(w, logp)) == w


class TestTraining:
    def test_learns_repeated_pieces(self, spark):
        df = spark.createDataFrame(
            [(i, "lowlow waterwater low water") for i in range(20)],
            ["doc_id", "text"],
        )
        model = train_unigram(df, vocab_size=10, seed_size=100, em_rounds=2)
        multi = {p for p in model.logp if len(p) > 1}
        assert "low" in multi and "water" in multi
        enc = unigram_encode(df.limit(1), model).collect()[0]
        assert "".join(enc["pieces"]) == "lowlowwaterwaterlowwater"
        assert "low" in enc["pieces"] and "water" in enc["pieces"]

    def test_vocab_cap_and_char_coverage(self, spark):
        df = spark.createDataFrame(
            [(1, "abc def ghi jkl mno pqr stu vwx yz")], ["doc_id", "text"]
        )
        model = train_unigram(df, vocab_size=3, seed_size=50, em_rounds=2)
        assert sum(1 for p in model.logp if len(p) > 1) <= 3
        # every corpus character survives (coverage guarantee)
        for ch in "abcdefghijklmnopqrstuvwxyz":
            assert ch in model.logp

    def test_json_roundtrip_and_determinism(self, spark):
        df = spark.createDataFrame(
            [(i, "spark scan merge join scan") for i in range(5)],
            ["doc_id", "text"],
        )
        m1 = train_unigram(df, vocab_size=20, seed_size=100)
        m2 = train_unigram(df, vocab_size=20, seed_size=100)
        assert m1.logp == m2.logp
        m3 = UnigramModel.from_json(m1.to_json())
        assert m3.logp == m1.logp


def test_unigram_operator_save_load(spark, tmp_path):
    from tuktu_spark.operators import make_operator

    df = spark.createDataFrame(
        [(i, "table scan table scan window") for i in range(10)],
        ["doc_id", "text"],
    )
    path = str(tmp_path / "uni.json")
    out1 = make_operator(
        "unigram_tokenize",
        {"vocab_size": 10, "seed_size": 60, "save_path": path},
    )(df)
    r1 = out1.orderBy("doc_id").first()["pieces"]
    out2 = make_operator("unigram_tokenize", {"model_path": path})(df)
    r2 = out2.orderBy("doc_id").first()["pieces"]
    assert r1 == r2 and "".join(r1) == "tablescantablescanwindow"


def test_cased_corpus_and_model_settings_roundtrip(spark, tmp_path):
    """Round-7 review findings: a CASED corpus must still hit the
    lowercased vocabulary at encode time, and max_piece_len must ride
    the saved model."""
    from tuktu_spark.llm.unigram import (
        UnigramModel,
        train_unigram,
        unigram_encode,
    )

    df = spark.createDataFrame(
        [(i, "Hello HELLO hello WorldWord") for i in range(10)],
        ["doc_id", "text"],
    )
    model = train_unigram(df, vocab_size=10, seed_size=100, max_piece_len=12)
    assert model.lowercase and model.max_piece_len == 12
    enc = unigram_encode(df.limit(1), model).collect()[0]
    assert "".join(enc["pieces"]) == "hellohellohelloworldword"
    assert "hello" in enc["pieces"]  # cased inputs reach the lowercased vocab
    m2 = UnigramModel.from_json(model.to_json())
    assert m2.max_piece_len == 12 and m2.lowercase is True
    # unicode whitespace: NBSP is NOT a separator for the encoder (ASCII
    # \s class, matching Java/Spark \s) — the pieces keep the char via the
    # single-char fallback, so SQL-side de-\s comparisons stay consistent
    df2 = spark.createDataFrame([(1, "ab cd ef")], ["doc_id", "text"])
    enc2 = unigram_encode(df2, model).collect()[0]
    assert "".join(enc2["pieces"]) == "ab cdef"


def test_distributed_e_step_bit_identical(spark):
    """r8 (verdict #6): e_step='distributed' (partition-parallel Viterbi
    counts + piece-keyed reduce) must produce the BIT-IDENTICAL model to
    the driver walk — piece counts are exact integer sums, so partial
    sums are associative with no float drift. Exercised across multiple
    partitions and EM rounds, including pruning."""
    rows = [
        (i, ("banana bandana ana " * (1 + i % 3)) + f"w{i % 17} quux")
        for i in range(60)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(7)
    kw = dict(vocab_size=15, seed_size=120, em_rounds=3, max_piece_len=6)
    m_driver = train_unigram(df, e_step="driver", **kw)
    m_dist = train_unigram(df, e_step="distributed", **kw)
    assert m_driver.to_json() == m_dist.to_json()


def test_e_step_rejects_unknown_mode(spark):
    import pytest

    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError, match="e_step"):
        train_unigram(df, e_step="cluster")


def test_auto_e_step_dispatches_on_word_table_size(spark, monkeypatch):
    """r9 (verdict #8): e_step='auto' (the new default) dispatches on the
    measured distinct-word count — driver EM at or below
    auto_driver_max_words, distributed above — and yields the identical
    model on BOTH sides of the threshold (the dispatch is a pure
    performance knob)."""
    from tuktu_spark.llm import unigram as U

    rows = [
        (i, ("banana bandana ana " * (1 + i % 3)) + f"w{i % 17} quux")
        for i in range(40)
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string").repartition(5)
    kw = dict(vocab_size=12, seed_size=100, em_rounds=2, max_piece_len=6)

    calls = {"driver": 0, "distributed": 0}
    real_driver, real_dist = U._em_counts_driver, U._em_counts_distributed

    def spy_driver(*a, **k):
        calls["driver"] += 1
        return real_driver(*a, **k)

    def spy_dist(*a, **k):
        calls["distributed"] += 1
        return real_dist(*a, **k)

    monkeypatch.setattr(U, "_em_counts_driver", spy_driver)
    monkeypatch.setattr(U, "_em_counts_distributed", spy_dist)

    # word table is small — a huge threshold routes to the driver walk
    m_small = U.train_unigram(df, e_step="auto", auto_driver_max_words=10**9, **kw)
    assert calls == {"driver": kw["em_rounds"], "distributed": 0}

    # threshold 0 forces the distributed E-step on the same corpus
    calls.update(driver=0, distributed=0)
    m_big = U.train_unigram(df, e_step="auto", auto_driver_max_words=0, **kw)
    assert calls == {"driver": 0, "distributed": kw["em_rounds"]}

    # both sides of the threshold: bit-identical model
    assert m_small.to_json() == m_big.to_json()
