"""Subword-hash (fastText fallback) tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tuktu_spark.ml.fasttext import (
    doc_bucket_vectors,
    doc_cosine_pairs,
    subword_ngrams,
)


class TestSubwordNgrams:
    def test_boundary_marked_trigrams(self, spark):
        df = spark.createDataFrame([("cat",)], "t string")
        got = df.select(subword_ngrams(F.col("t")).alias("g")).first()["g"]
        assert got == ["<ca", "cat", "at>"]

    def test_short_token(self, spark):
        df = spark.createDataFrame([("a",)], "t string")
        got = df.select(subword_ngrams(F.col("t")).alias("g")).first()["g"]
        assert got == ["<a>"]


class TestDocVectors:
    def test_unit_norm(self, spark):
        df = spark.createDataFrame(
            [(1, ["hello", "world"]), (2, ["x"])], "doc_id int, tokens array<string>"
        )
        vec = doc_bucket_vectors(df, dim=16)
        norms = (
            vec.groupBy("doc_id")
            .agg(F.sum(F.col("weight") * F.col("weight")).alias("n2"))
            .collect()
        )
        for r in norms:
            assert r["n2"] == pytest.approx(1.0, rel=1e-12)

    def test_identical_docs_same_vector(self, spark):
        df = spark.createDataFrame(
            [(1, ["same", "words"]), (2, ["same", "words"])],
            "doc_id int, tokens array<string>",
        )
        vec = doc_bucket_vectors(df, dim=32)
        a = {(r["bucket"], r["weight"]) for r in vec.filter("doc_id = 1").collect()}
        b = {(r["bucket"], r["weight"]) for r in vec.filter("doc_id = 2").collect()}
        assert a == b and len(a) > 0


class TestCosinePairs:
    def test_identical_docs_cosine_one(self, spark):
        df = spark.createDataFrame(
            [(1, ["alpha", "beta"]), (2, ["alpha", "beta"]), (3, ["zzz", "qqq"])],
            "doc_id int, tokens array<string>",
        )
        vec = doc_bucket_vectors(df, dim=64)
        pairs = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in doc_cosine_pairs(vec, min_cosine=0.99).collect()
        }
        assert (1, 2) in pairs
        assert pairs[(1, 2)] == pytest.approx(1.0, rel=1e-12)
        assert (1, 3) not in pairs and (2, 3) not in pairs

    def test_near_spelling_more_similar_than_unrelated(self, spark):
        df = spark.createDataFrame(
            [(1, ["processing"]), (2, ["processed"]), (3, ["zebra"])],
            "doc_id int, tokens array<string>",
        )
        vec = doc_bucket_vectors(df, dim=64)
        pairs = {
            (r["id_a"], r["id_b"]): r["cosine"]
            for r in doc_cosine_pairs(vec, min_cosine=-1.0).collect()
        }
        assert pairs[(1, 2)] > pairs.get((1, 3), 0.0)
        assert pairs[(1, 2)] > pairs.get((2, 3), 0.0)
