"""PredicateParser -> boolean Column.

Grammar parity with the reference (Parsing.scala:175-444):
  or   := and ('||' and)*
  and  := not ('&&' not)*
  not  := '!' not | cmp
  cmp  := operand (('<'|'>'|'<='|'>='|'=='|'!='|'in') operand)? | '(' or ')'
  operand := arithmetic-expression | string | null | true | false | ${field}

Predicate functions (Parsing.scala:239-289): containsFields, isNumeric,
isNull, isJSON, containsSubstring, isEmptyValue, isEmpty; string fns
toLowerCase/toUpperCase; numeric fn size().

Divergence from the reference, documented per SURVEY.md §4.2: equality is
exact by default; pass ``epsilon`` for Tuktu's nearlyEqual float equality
(utils.scala:583-597).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

from .arithmetic import _SCALAR_FNS
from .lexer import ExpressionError, TokenStream


class _PredParser:
    def __init__(self, text: str, epsilon: float | None = None):
        self.ts = TokenStream(text)
        self.epsilon = epsilon

    def parse(self) -> Column:
        col = self.or_expr()
        self.ts.expect_eof()
        return col

    def or_expr(self) -> Column:
        col = self.and_expr()
        while self.ts.accept("OP", "||"):
            col = col | self.and_expr()
        return col

    def and_expr(self) -> Column:
        col = self.not_expr()
        while self.ts.accept("OP", "&&"):
            col = col & self.not_expr()
        return col

    def not_expr(self) -> Column:
        if self.ts.accept("OP", "!"):
            return ~self.not_expr()
        return self.comparison()

    def comparison(self) -> Column:
        # Parenthesized boolean sub-expression vs parenthesized arithmetic:
        # try boolean first, fall back on arithmetic comparison.
        if self.ts.cur.kind == "OP" and self.ts.cur.value == "(":
            save = self.ts.i
            try:
                self.ts.advance()
                col = self.or_expr()
                self.ts.expect("OP", ")")
                # '(1 + 2) < x': the group parsed as a bare boolean operand
                # but a comparison operator follows — it was really a
                # parenthesized arithmetic operand. Reparse as one.
                nxt = self.ts.cur
                if nxt.kind == "OP" and nxt.value in ("<", ">", "<=", ">=", "==", "!="):
                    self.ts.i = save
                elif nxt.kind == "IDENT" and nxt.value == "in":
                    self.ts.i = save
                else:
                    return col
            except ExpressionError:
                self.ts.i = save
        left, left_is_str = self.operand()
        for op in ("<=", ">=", "==", "!=", "<", ">"):
            if self.ts.accept("OP", op):
                right, _ = self.operand()
                return self._compare(op, left, right, left_is_str)
        if self.ts.accept("IDENT", "in"):
            right = self.in_list()
            return left.isin(*right) if isinstance(right, list) else F.array_contains(right, left)
        # bare boolean operand (function call / field / literal)
        return left.cast("boolean")

    def _compare(self, op: str, left: Column, right: Column, is_str: bool) -> Column:
        if op == "<":
            return left < right
        if op == ">":
            return left > right
        if op == "<=":
            return left <= right
        if op == ">=":
            return left >= right
        if op == "==":
            if self.epsilon is not None and not is_str:
                return self._nearly_equal(left, right)
            return left.eqNullSafe(right)
        if self.epsilon is not None and not is_str:
            return ~self._nearly_equal(left, right)
        return ~left.eqNullSafe(right)

    def _nearly_equal(self, a: Column, b: Column) -> Column:
        # Tuktu nearlyEqual (utils.scala:583-597): relative-epsilon float
        # equality with absolute fallback near zero.
        eps = F.lit(self.epsilon)
        ad, bd = a.cast("double"), b.cast("double")
        diff = F.abs(ad - bd)
        return (
            ad.eqNullSafe(bd)
            | (diff <= eps)
            | (diff < F.greatest(F.abs(ad), F.abs(bd)) * eps)
        )

    def in_list(self):
        self.ts.expect("OP", "(")
        items = []
        if self.ts.cur.kind == "FIELD" and self.ts.tokens[self.ts.i + 1].value == ")":
            field = self.ts.advance().value
            self.ts.expect("OP", ")")
            return F.col(field)  # membership in an array field
        while True:
            items.append(self._literal())
            if not self.ts.accept("OP", ","):
                break
        self.ts.expect("OP", ")")
        return items

    def _literal(self):
        tok = self.ts.accept("STR")
        if tok:
            return tok.value
        tok = self.ts.accept("NUM")
        if tok:
            return float(tok.value)
        if self.ts.accept("OP", "-"):
            tok = self.ts.expect("NUM")
            return -float(tok.value)
        raise ExpressionError(f"expected literal in IN-list in {self.ts.text!r}")

    def operand(self) -> tuple[Column, bool]:
        """Returns (column, is_string_typed)."""
        ts = self.ts
        tok = ts.accept("STR")
        if tok:
            return F.lit(tok.value), True
        if ts.accept("IDENT", "null"):
            return F.lit(None), False
        if ts.accept("IDENT", "true"):
            return F.lit(True), False
        if ts.accept("IDENT", "false"):
            return F.lit(False), False
        if ts.cur.kind == "IDENT" and ts.tokens[ts.i + 1].value == "(":
            name = ts.advance().value
            ts.expect("OP", "(")
            return self._function(name)
        if ts.cur.kind == "FIELD":
            nxt = ts.tokens[ts.i + 1]
            if nxt.kind == "OP" and nxt.value in ("+", "-", "*", "/", "%", "^"):
                pass  # arithmetic over fields: fall through to sub-parser
            else:
                # untyped comparison: leave the column's native type so Spark
                # coerces against the literal on the other side
                field = ts.advance().value
                return F.col(field), False
        # fall back to arithmetic sub-expression (numbers, math, parens)
        from .arithmetic import _ArithParser

        sub = _ArithParser.__new__(_ArithParser)
        sub.ts = ts
        sub.mode = "scalar"
        sub.uses_agg = False
        return sub.expr(), False

    def _function(self, name: str) -> tuple[Column, bool]:
        ts = self.ts
        if name == "containsFields":
            fields = [ts.expect("FIELD").value]
            while ts.accept("OP", ","):
                fields.append(ts.expect("FIELD").value)
            ts.expect("OP", ")")
            col = F.col(fields[0]).isNotNull()
            for f in fields[1:]:
                col = col & F.col(f).isNotNull()
            return col, False
        if name == "isNumeric":
            field = ts.expect("FIELD").value
            ts.expect("OP", ")")
            return F.col(field).cast("double").isNotNull(), False
        if name == "isNull":
            field = ts.expect("FIELD").value
            ts.expect("OP", ")")
            return F.col(field).isNull(), False
        if name == "isJSON":
            fields = [ts.expect("FIELD").value]
            while ts.accept("OP", ","):
                fields.append(ts.expect("FIELD").value)
            ts.expect("OP", ")")
            col = F.lit(True)
            for f in fields:
                col = col & F.get_json_object(F.col(f).cast("string"), "$").isNotNull()
            return col, False
        if name == "containsSubstring":
            # containsSubstring(${field}, 'sub' [, 'sub2' ...]) or two strings
            first, _ = self.operand()
            subs = []
            while ts.accept("OP", ","):
                subs.append(self.operand()[0])
            ts.expect("OP", ")")
            col = F.lit(True)
            for s in subs:
                col = col & first.contains(s)
            return col, False
        if name == "isEmptyValue":
            field = ts.expect("FIELD").value
            ts.expect("OP", ")")
            c = F.col(field)
            return c.isNull() | (c.cast("string") == ""), False
        if name == "isEmpty":
            ts.expect("OP", ")")
            # packet-emptiness: no rows in the frame — window count == 0 is
            # vacuous per-row; retained for API parity (always false on rows).
            return F.lit(False), False
        if name == "size":
            field = ts.expect("FIELD").value
            ts.expect("OP", ")")
            return F.size(F.col(field)).cast("double"), False
        if name in ("toLowerCase", "toUpperCase"):
            inner, _ = self.operand()
            ts.expect("OP", ")")
            return (F.lower(inner) if name == "toLowerCase" else F.upper(inner)), True
        if name in _SCALAR_FNS:
            from .arithmetic import _ArithParser

            sub = _ArithParser.__new__(_ArithParser)
            sub.ts = ts
            sub.mode = "scalar"
            sub.uses_agg = False
            arg = sub.expr()
            ts.expect("OP", ")")
            return _SCALAR_FNS[name](arg), False
        raise ExpressionError(f"unknown predicate function {name!r} in {ts.text!r}")


def predicate_column(text: str, epsilon: float | None = None) -> Column:
    """Compile a Tuktu predicate expression to a boolean Column."""
    return _PredParser(text, epsilon=epsilon).parse()
