"""ArithmeticParser -> Column.

Grammar parity with the reference
(modules/api/app/tuktu/api/Parsing/Parsing.scala:13-170):
  expr   := term (('+'|'-') term)*
  term   := factor (('*'|'/'|'%') factor)*
  factor := base ('^' factor)?          -- right-assoc power
  base   := number | ${field.path} | fn '(' expr ')' | '(' expr ')' | '-' base

Scalar fns (Parsing.scala:44): abs floor ceil round sqrt log exp sin cos tan
asin acos atan sinh cosh tanh.
Aggregate fns over the current packet (Parsing.scala:50,114-166): count,
distinct, avg, median, sum, max, min, stdev.

Aggregates compile per mode:
  mode="agg"    -> plain aggregate Columns, for groupBy().agg(...)
                   (AggregateByValueProcessor semantics)
  mode="window" -> aggregate OVER an all-rows window, attached to every row
                   (ArithmeticAggregateProcessor semantics,
                   arithmetics/ArithmeticProcessor.scala:42-59)
  mode="scalar" -> aggregates are an error (plain per-row arithmetic,
                   ArithmeticProcessor.scala:16-37)

Median is EXACT (the reference sorts the packet): percentile(col, 0.5).
stdev is population (StatHelper.getVariances, statistics/StatHelper.scala).
"""

from __future__ import annotations

from pyspark.sql import Column, Window
from pyspark.sql import functions as F

from .lexer import ExpressionError, TokenStream

_SCALAR_FNS = {
    "abs": F.abs,
    "floor": lambda c: F.floor(c).cast("double"),
    "ceil": lambda c: F.ceil(c).cast("double"),
    "round": lambda c: F.round(c, 0),
    "sqrt": F.sqrt,
    "log": F.log,
    "exp": F.exp,
    "sin": F.sin,
    "cos": F.cos,
    "tan": F.tan,
    "asin": F.asin,
    "acos": F.acos,
    "atan": F.atan,
    "sinh": F.sinh,
    "cosh": F.cosh,
    "tanh": F.tanh,
}

_AGG_FNS = {
    "count": F.count,
    "distinct": F.count_distinct,
    "avg": F.avg,
    "median": lambda c: F.percentile(c, F.lit(0.5)),
    "sum": F.sum,
    "max": F.max,
    "min": F.min,
    "stdev": F.stddev_pop,
}


class _ArithParser:
    def __init__(self, text: str, mode: str):
        self.ts = TokenStream(text)
        self.mode = mode
        self.uses_agg = False

    def parse(self) -> Column:
        col = self.expr()
        self.ts.expect_eof()
        return col

    def expr(self) -> Column:
        col = self.term()
        while True:
            if self.ts.accept("OP", "+"):
                col = col + self.term()
            elif self.ts.accept("OP", "-"):
                col = col - self.term()
            else:
                return col

    def term(self) -> Column:
        col = self.factor()
        while True:
            if self.ts.accept("OP", "*"):
                col = col * self.factor()
            elif self.ts.accept("OP", "/"):
                col = col / self.factor()
            elif self.ts.accept("OP", "%"):
                col = col % self.factor()
            else:
                return col

    def factor(self) -> Column:
        col = self.base()
        if self.ts.accept("OP", "^"):
            return F.pow(col, self.factor())
        return col

    def base(self) -> Column:
        ts = self.ts
        if ts.accept("OP", "-"):
            return -self.base()
        if ts.accept("OP", "("):
            col = self.expr()
            ts.expect("OP", ")")
            return col
        tok = ts.accept("NUM")
        if tok:
            return F.lit(float(tok.value))
        tok = ts.accept("FIELD")
        if tok:
            return F.col(tok.value).cast("double")
        tok = ts.accept("IDENT")
        if tok:
            name = tok.value
            ts.expect("OP", "(")
            if name in _AGG_FNS:
                if ts.accept("OP", ")"):  # count() over the packet
                    arg = F.lit(1)
                else:
                    arg = self.expr()
                    ts.expect("OP", ")")
                return self._agg(name, arg)
            if name in _SCALAR_FNS:
                arg = self.expr()
                ts.expect("OP", ")")
                return _SCALAR_FNS[name](arg)
            raise ExpressionError(f"unknown function {name!r} in {ts.text!r}")
        raise ExpressionError(f"unexpected token {ts.cur.value!r} in {ts.text!r}")

    def _agg(self, name: str, arg: Column) -> Column:
        self.uses_agg = True
        if self.mode == "scalar":
            raise ExpressionError(
                f"aggregate {name}() not allowed in per-row arithmetic expression"
            )
        # count()/distinct() are cardinalities: keep them integral (bigint)
        # so results hash-match integer-typed oracles. The reference parser
        # is double-typed throughout (Parsing.scala:114-166) but arithmetic
        # over bigint promotes to double exactly, so composed expressions
        # like count()/2 are unchanged.
        out_type = "bigint" if name in ("count", "distinct") else "double"
        if self.mode == "window":
            w = Window.partitionBy()
            if name == "distinct":  # COUNT(DISTINCT) unsupported over windows
                return F.size(F.collect_set(arg).over(w)).cast(out_type)
            return _AGG_FNS[name](arg).over(w).cast(out_type)
        return _AGG_FNS[name](arg).cast(out_type)


def arith_column(text: str, mode: str = "scalar") -> Column:
    """Compile a Tuktu arithmetic expression to a Column.

    mode: "scalar" (per-row), "agg" (for groupBy().agg), "window"
    (packet-level aggregates attached to each row).
    """
    return _ArithParser(text, mode).parse()


def arith_agg_columns(exprs: dict[str, str]) -> list[Column]:
    """Compile {alias: expression} to aliased aggregate Columns for .agg()."""
    return [arith_column(e, mode="agg").alias(name) for name, e in exprs.items()]
