"""Property-based expression-translator tests — the pytest analogue of the
reference's randomized parser checks (test/tuktu/test/api/ParsingTests.
scala:81-107): random expression ASTs rendered to Tuktu syntax must
evaluate (through the Spark translator) to the Python-computed truth.
"""

from __future__ import annotations

import math

import pytest
from hypothesis import HealthCheck, given, settings, strategies as st

from tuktu_spark.expressions import arith_column, predicate_column

FIELDS = {"a": 3.5, "b": -2.25, "c": 7.0}


# ---- random arithmetic ASTs ------------------------------------------------

def _leaf():
    return st.one_of(
        st.floats(min_value=0.25, max_value=50.0, allow_nan=False).map(
            lambda v: (f"{round(v, 3)}", round(v, 3))
        ),
        st.sampled_from([(f"${{{k}}}", v) for k, v in FIELDS.items()]),
    )


def _combine(children):
    def binop(pair, op):
        (lt, lv), (rt, rv) = pair
        if op == "+":
            return (f"({lt} + {rt})", lv + rv)
        if op == "-":
            return (f"({lt} - {rt})", lv - rv)
        if op == "*":
            return (f"({lt} * {rt})", lv * rv)
        # division: shift the divisor away from zero (composite right-hand
        # sides can cancel to 0 even though leaves never are)
        return (f"({lt} / ({rt} + 100))", lv / (rv + 100))

    return st.tuples(children, children).flatmap(
        lambda pair: st.sampled_from(["+", "-", "*", "/"]).map(
            lambda op: binop(pair, op)
        )
    )


def _guarded_divide(pair):
    (lt, lv), (rt, rv) = pair
    return (f"({lt} / ({rt} + 100))", lv / (rv + 100))


ARITH = st.recursive(_leaf(), _combine, max_leaves=8)


@pytest.fixture(scope="module")
def row(spark):
    df = spark.createDataFrame([tuple(FIELDS.values())], list(FIELDS)).cache()
    df.count()
    return df


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(expr=ARITH)
def test_arithmetic_matches_python(row, expr):
    text, expected = expr
    got = row.select(arith_column(text, mode="scalar").alias("v")).collect()[0]["v"]
    assert got == pytest.approx(expected, rel=1e-9, abs=1e-9)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(expr=ARITH, fn=st.sampled_from(["abs", "floor", "ceil", "sqrt"]))
def test_functions_match_python(row, expr, fn):
    text, expected = expr
    pyfn = {
        "abs": abs,
        "floor": math.floor,
        "ceil": math.ceil,
        "sqrt": lambda x: math.sqrt(abs(x)),
    }[fn]
    inner = f"abs({text})" if fn == "sqrt" else text
    want = pyfn(abs(expected)) if fn == "sqrt" else pyfn(expected)
    got = row.select(arith_column(f"{fn}({inner})", mode="scalar").alias("v")).collect()[0]["v"]
    assert float(got) == pytest.approx(float(want), rel=1e-9, abs=1e-9)


@settings(max_examples=30, deadline=None, suppress_health_check=list(HealthCheck))
@given(left=ARITH, right=ARITH, op=st.sampled_from(["<", ">", "<=", ">=", "==", "!="]))
def test_predicates_match_python(row, left, right, op):
    lt, lv = left
    rt, rv = right
    pyop = {
        "<": lv < rv, ">": lv > rv, "<=": lv <= rv,
        ">=": lv >= rv, "==": lv == rv, "!=": lv != rv,
    }[op]
    got = row.select(
        predicate_column(f"{lt} {op} {rt}").alias("v")
    ).collect()[0]["v"]
    # epsilon-free comparison path: exact float comparison both sides
    assert bool(got) == pyop
