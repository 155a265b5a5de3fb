"""Exact CCNet tercile bucketing (ngram_lm.lm_score_buckets_exact):
floordiv semantics on negative scores, hand-computed cutoffs, tie groups
never splitting, per-language independence, and the Python // reference.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tuktu_spark.llm.ngram_lm import lm_score_buckets_exact


def _mk(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id int, lang string, lp_q20 long, n_pos long"
    )


def _buckets(df, lang_col="lang"):
    return {
        r["doc_id"]: (r["lpt_q"], r["bucket"])
        for r in lm_score_buckets_exact(df, lang_col=lang_col).collect()
    }


class TestFloorDiv:
    def test_matches_python_floordiv(self, spark):
        rows = [
            (1, "en", -100, 7),
            (2, "en", -1, 3),
            (3, "en", 10, 3),
            (4, "en", -9, 3),
            (5, "en", 0, 5),
            (6, "en", -1048577, 54),
        ]
        got = _buckets(_mk(spark, rows))
        for d, _, s, n in rows:
            assert got[d][0] == s // n, (d, s, n)


class TestCutoffs:
    def test_hand_computed_terciles(self, spark):
        # 9 docs, lpt_q = 9..1 → head {9,8,7}, middle {6,5,4}, tail {3,2,1}
        rows = [(i, "en", i * 10, 10) for i in range(1, 10)]
        got = _buckets(_mk(spark, rows))
        want = {i: "head" if i >= 7 else "middle" if i >= 4 else "tail"
                for i in range(1, 10)}
        assert {d: b for d, (_, b) in got.items()} == want

    def test_tie_group_never_splits(self, spark):
        # 6 docs: scores [5,5,5,5,2,1] — ceil(6/3)=2nd largest is 5, so the
        # whole 4-doc tie group lands in head; middle cutoff = ceil(12/3)=4th
        # largest = 5 again → middle empty, rest tail
        rows = [(1, "en", 5, 1), (2, "en", 5, 1), (3, "en", 5, 1),
                (4, "en", 5, 1), (5, "en", 2, 1), (6, "en", 1, 1)]
        got = {d: b for d, (_, b) in _buckets(_mk(spark, rows)).items()}
        assert got == {1: "head", 2: "head", 3: "head", 4: "head",
                       5: "tail", 6: "tail"}

    def test_n_not_divisible_by_three(self, spark):
        # 4 docs: k1 = ceil(4/3) = 2, k2 = ceil(8/3) = 3
        rows = [(1, "en", 40, 1), (2, "en", 30, 1), (3, "en", 20, 1),
                (4, "en", 10, 1)]
        got = {d: b for d, (_, b) in _buckets(_mk(spark, rows)).items()}
        assert got == {1: "head", 2: "head", 3: "middle", 4: "tail"}

    def test_languages_bucket_independently(self, spark):
        rows = [(i, "en", i, 1) for i in range(1, 10)] + [
            (100 + i, "fr", 1000 + i, 1) for i in range(1, 4)
        ]
        got = {d: b for d, (_, b) in _buckets(_mk(spark, rows)).items()}
        assert got[101] == "tail" and got[102] == "middle" and got[103] == "head"
        assert got[9] == "head" and got[1] == "tail"  # en unaffected by fr

    def test_global_no_lang(self, spark):
        rows = [(i, "xx", i, 1) for i in range(1, 4)]
        got = {
            r["doc_id"]: r["bucket"]
            for r in lm_score_buckets_exact(_mk(spark, rows), lang_col=None).collect()
        }
        assert got == {1: "tail", 2: "middle", 3: "head"}


class TestPlanShape:
    def test_cutoffs_broadcast_back(self, spark):
        rows = [(i, "en", i, 1) for i in range(1, 10)]
        out = lm_score_buckets_exact(_mk(spark, rows), lang_col="lang")
        plan = out._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
