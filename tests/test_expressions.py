"""Expression-translator tests — mirrors the reference's ParsingTests
(test/tuktu/test/api/ParsingTests.scala): precedence/brackets/functions,
aggregate functions validated against independently computed truth over
random data, predicate comparisons/null/in/functions, template strings."""

from __future__ import annotations

import math
import random
import statistics

import pytest
from pyspark.sql import functions as F

from tuktu_spark.expressions import (
    arith_column,
    predicate_column,
    substitute_config,
    template_column,
)
from tuktu_spark.expressions.lexer import ExpressionError


@pytest.fixture(scope="module")
def df(spark):
    rows = [
        (1, 2.0, 10.0, "Alpha Beta", "a,b,c", None),
        (2, 3.0, 20.0, "gamma", "x,y", 5.0),
        (3, 4.0, 30.0, "DELTA", "one", 7.0),
        (4, 5.0, 40.0, "epsilon zeta", "p,q,r,s", None),
    ]
    return spark.createDataFrame(rows, ["id", "x", "y", "name", "csv", "maybe"])


def _eval1(df, col):
    return [r[0] for r in df.select(col).orderBy("id").collect()]


def _scalar(df, col):
    return df.select(col).first()[0]


class TestArithmetic:
    @pytest.mark.parametrize(
        "expr,expected",
        [
            ("1 + 2 * 3", 7.0),
            ("(1 + 2) * 3", 9.0),
            ("2 ^ 3 ^ 2", 512.0),  # right-assoc power
            ("-3 + 5", 2.0),
            ("10 / 4", 2.5),
            ("2e2 + 1.5e-1", 200.15),
            ("abs(-3.5) + floor(2.9) + ceil(2.1)", 8.5),
            ("round(2.5)", 3.0),
            ("sqrt(16) + exp(0)", 5.0),
        ],
    )
    def test_constants(self, df, expr, expected):
        assert _scalar(df, arith_column(expr)) == pytest.approx(expected, rel=1e-12)

    def test_fields(self, df):
        got = _eval1(df, arith_column("${x} * 2 + ${y}"))
        assert got == [14.0, 26.0, 38.0, 50.0]

    def test_agg_window_mode(self, df):
        got = _eval1(df, arith_column("avg(${x}) + count()", mode="window"))
        assert got == [7.5] * 4  # avg 3.5 + count 4, attached to every row

    def test_agg_mode_groupby(self, spark):
        sdf = spark.createDataFrame(
            [("a", 1.0), ("a", 3.0), ("b", 10.0)], ["k", "v"]
        )
        out = {
            r["k"]: (r["s"], r["m"])
            for r in sdf.groupBy("k")
            .agg(
                arith_column("sum(${v})", mode="agg").alias("s"),
                arith_column("median(${v})", mode="agg").alias("m"),
            )
            .collect()
        }
        assert out == {"a": (4.0, 2.0), "b": (10.0, 10.0)}

    def test_agg_functions_against_python(self, spark):
        rng = random.Random(42)
        data = [(float(rng.randint(0, 20)),) for _ in range(200)]
        vals = [v for (v,) in data]
        sdf = spark.createDataFrame(data, ["v"])
        row = sdf.select(
            arith_column("sum(${v})", mode="window").alias("s"),
            arith_column("avg(${v})", mode="window").alias("a"),
            arith_column("min(${v})", mode="window").alias("mn"),
            arith_column("max(${v})", mode="window").alias("mx"),
            arith_column("count(${v})", mode="window").alias("c"),
            arith_column("distinct(${v})", mode="window").alias("d"),
            arith_column("median(${v})", mode="window").alias("md"),
            arith_column("stdev(${v})", mode="window").alias("sd"),
        ).first()
        assert row["s"] == pytest.approx(sum(vals))
        assert row["a"] == pytest.approx(sum(vals) / len(vals))
        assert row["mn"] == min(vals) and row["mx"] == max(vals)
        assert row["c"] == len(vals) and row["d"] == len(set(vals))
        assert row["md"] == pytest.approx(statistics.median(vals))
        assert row["sd"] == pytest.approx(statistics.pstdev(vals), rel=1e-9)

    def test_random_expressions_against_python(self, spark):
        rng = random.Random(7)

        def gen(depth: int) -> str:
            if depth == 0 or rng.random() < 0.3:
                return rng.choice(
                    ["${x}", "${y}", str(rng.randint(1, 9)), f"{rng.uniform(0.5, 5):.3f}"]
                )
            op = rng.choice(["+", "-", "*", "+", "-"])
            return f"({gen(depth - 1)} {op} {gen(depth - 1)})"

        exprs = [gen(3) for _ in range(40)]
        x, y = 3.25, -7.5
        sdf = spark.createDataFrame([(x, y)], ["x", "y"])
        row = sdf.select(
            *[arith_column(e).alias(f"e{i}") for i, e in enumerate(exprs)]
        ).first()
        for i, e in enumerate(exprs):
            truth = eval(e.replace("${x}", repr(x)).replace("${y}", repr(y)))
            assert row[f"e{i}"] == pytest.approx(truth, rel=1e-12), e

    def test_agg_rejected_in_scalar_mode(self):
        with pytest.raises(ExpressionError):
            arith_column("sum(${x})", mode="scalar")

    def test_unknown_function(self):
        with pytest.raises(ExpressionError):
            arith_column("nope(1)")


class TestPredicate:
    @pytest.mark.parametrize(
        "expr,ids",
        [
            ("${x} > 2.5", [2, 3, 4]),
            ("${x} >= 3 && ${y} < 40", [2, 3]),
            ("${x} == 2 || ${x} == 5", [1, 4]),
            ("!(${x} < 4)", [3, 4]),
            ("${name} == 'gamma'", [2]),
            ("${x} in (2, 4)", [1, 3]),
            ("${name} in ('gamma', 'DELTA')", [2, 3]),
            ("isNull(${maybe})", [1, 4]),
            ("!isNull(${maybe})", [2, 3]),
            ("containsFields(${maybe}, ${x})", [2, 3]),
            ("containsSubstring(${name}, 'a')", [1, 2, 4]),
            ("toLowerCase(${name}) == 'delta'", [3]),
            ("${x} + ${y} > 33", [3, 4]),
            ("abs(${y} - 25) < 6", [2, 3]),
            ("isNumeric(${x})", [1, 2, 3, 4]),
        ],
    )
    def test_filters(self, df, expr, ids):
        got = sorted(r["id"] for r in df.filter(predicate_column(expr)).collect())
        assert got == ids, expr

    def test_epsilon_equality(self, spark):
        sdf = spark.createDataFrame([(0.1 + 0.2,)], ["v"])
        strict = sdf.filter(predicate_column("${v} == 0.3")).count()
        eps = sdf.filter(predicate_column("${v} == 0.3", epsilon=1e-9)).count()
        assert (strict, eps) == (0, 1)

    def test_null_comparison(self, df):
        assert df.filter(predicate_column("${maybe} == null")).count() == 2
        assert df.filter(predicate_column("${maybe} != null")).count() == 2


class TestTemplates:
    def test_interpolation(self, df):
        col = template_column("user ${id}: ${name}!")
        got = _eval1(df, col)
        assert got[0] == "user 1: Alpha Beta!"

    def test_functions(self, df):
        assert _eval1(df, template_column("${toUpperCase(name)}"))[1] == "GAMMA"
        assert _eval1(df, template_column("${capitalize(name)}"))[1] == "Gamma"
        assert _eval1(df, template_column("${SplitGet(csv, ',', 2)}"))[0] == "b"

    def test_sql_escaping(self, spark):
        sdf = spark.createDataFrame([(1, "O'Brien")], ["id", "n"])
        assert _eval1(sdf, template_column("${SQL(n)}"))[0] == "O''Brien"

    def test_null_handling(self, df):
        got = _eval1(df, template_column("v=${maybe}"))
        assert got[0] == "v="
        got_null = _eval1(df, template_column("v=${maybe}", null_on_missing=True))
        assert got_null[0] is None

    def test_config_substitution(self):
        cfg = {
            "path": "/data/#{name}.parquet",
            "limit": "#{n}",
            "nested": [{"flag": "#{flag}"}],
        }
        out = substitute_config(cfg, {"name": "orders", "n": 10, "flag": True})
        assert out == {
            "path": "/data/orders.parquet",
            "limit": 10,
            "nested": [{"flag": True}],
        }

    def test_missing_param(self):
        with pytest.raises(ExpressionError):
            substitute_config("#{absent}", {})
