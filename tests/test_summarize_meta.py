"""Summarize operator + %{} meta substitution tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tuktu_spark.expressions import substitute_meta
from tuktu_spark.expressions.lexer import ExpressionError
from tuktu_spark.ml.nlp import summarize


@pytest.fixture()
def doc_df(spark):
    text = (
        "alpha beta gamma alpha. filler one two. "
        "alpha alpha beta. tiny a b"
    )
    tf = {
        "alpha": 4.0, "beta": 2.0, "gamma": 1.0,
        "filler": 1.0, "one": 1.0, "two": 1.0, "tiny": 1.0,
    }
    return spark.createDataFrame([(1, text, tf)], "id int, text string, tf map<string,double>")


class TestSummarize:
    def test_top_sentence_by_mean_score(self, doc_df):
        out = summarize(
            doc_df, "text", "tf", num_lines=1, optimal_length=3, base=2.0
        ).collect()[0]
        # sentence scores (len>=3 tokens):
        #  s0 "alpha beta gamma alpha": mean(4+2+1+4)/4 = 2.75, len 4 -> damp 1/2 = 1.375
        #  s1 "filler one two": mean 1, len 3 -> damp 1 = 1.0
        #  s2 "alpha alpha beta": mean (4+4+2)/3 = 10/3, len 3 -> 3.333
        #  s3 "tiny a b": only "tiny" long enough -> mean 1, len 1 -> damp 1/4
        assert out["summary"] == "alpha alpha beta"

    def test_num_lines_and_preserve_order(self, doc_df):
        out = summarize(
            doc_df, "text", "tf", num_lines=2, optimal_length=3, base=2.0,
            preserve_order=True,
        ).collect()[0]
        # top-2 by score: s2 (3.33) and s0 (1.375); preserve_order -> s0 first
        assert out["summary"] == "alpha beta gamma alpha. alpha alpha beta"

    def test_rank_order_when_not_preserving(self, doc_df):
        out = summarize(
            doc_df, "text", "tf", num_lines=2, optimal_length=3, base=2.0,
            preserve_order=False,
        ).collect()[0]
        assert out["summary"] == "alpha alpha beta. alpha beta gamma alpha"

    def test_as_list(self, doc_df):
        out = summarize(
            doc_df, "text", "tf", num_lines=2, optimal_length=3, base=2.0,
            as_text=False,
        ).collect()[0]
        assert out["summary"] == ["alpha beta gamma alpha", "alpha alpha beta"]

    def test_doc_without_scored_tokens(self, spark):
        df = spark.createDataFrame(
            [(1, "xx yy zz", {"other": 1.0})], "id int, text string, tf map<string,double>"
        )
        out = summarize(df, "text", "tf", num_lines=1).collect()
        assert len(out) == 1  # zero-score sentences still rank


class TestMetaSubstitution:
    def test_meta_and_config_are_independent(self):
        obj = {"a": "#{p}", "b": "%{m}", "c": "x #{p} y %{m} z", "d": "${field}"}
        from tuktu_spark.expressions import substitute_config

        step1 = substitute_config(obj, {"p": 10})
        assert step1 == {"a": 10, "b": "%{m}", "c": "x 10 y %{m} z", "d": "${field}"}
        step2 = substitute_meta(step1, {"m": "zz"})
        assert step2 == {"a": 10, "b": "zz", "c": "x 10 y zz z", "d": "${field}"}

    def test_native_type_passthrough(self):
        assert substitute_meta({"k": "%{v}"}, {"v": [1, 2]}) == {"k": [1, 2]}

    def test_missing_meta_raises(self):
        with pytest.raises(ExpressionError, match="meta"):
            substitute_meta({"k": "%{nope}"}, {})

    def test_flow_compiler_applies_meta(self, spark):
        from tuktu_spark.flow.compiler import compile_flow

        flow = {
            "generators": [
                {
                    "id": "gen",
                    "name": "inline",
                    "config": {"rows": [[1], [2], [3]], "columns": ["k"]},
                    "next": ["filt"],
                }
            ],
            "processors": [
                {
                    "id": "filt",
                    "name": "filter",
                    "config": {"expression": "${k} >= %{lo}"},
                    "next": [],
                }
            ],
        }
        out = compile_flow(spark, flow, meta={"lo": 2})["filt"]
        assert sorted(r["k"] for r in out.collect()) == [2, 3]

    def test_include_flow_forwards_meta(self, spark, tmp_path):
        import json

        inner = {
            "generators": [
                {
                    "id": "g",
                    "name": "inline",
                    "config": {"rows": [[1], [2], [3], [4]], "columns": ["k"]},
                    "next": ["f"],
                }
            ],
            "processors": [
                {
                    "id": "f",
                    "name": "filter",
                    "config": {"expression": "${k} > %{cut}"},
                    "next": [],
                }
            ],
        }
        path = tmp_path / "inner.json"
        path.write_text(json.dumps(inner))
        from tuktu_spark.operators import make_source

        df = make_source(
            spark, "include_flow", {"path": str(path), "node": "f", "meta": {"cut": 2}}
        )
        assert sorted(r["k"] for r in df.collect()) == [3, 4]
