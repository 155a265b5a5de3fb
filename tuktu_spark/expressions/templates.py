"""Tuktu string templates -> Column / config substitution.

``${field}`` runtime interpolation with dot-paths and string functions
(utils.scala:48-191): toLowerCase, toUpperCase, capitalize, JSON.stringify,
SQL (SQL-literal escaping), SplitGet, GetOrNull.

``#{param}`` is CONFIG-time substitution (utils.scala:150-162) — plain
Python string replacement performed by the flow compiler before any Spark
code runs (prepareTuktuJsValue, utils.scala:280-333).

``%{var}`` is META substitution (utils.scala:157-162 "Meta strings") —
the same grammar with a third special char, evaluated against the
DISPATCH-level variable map (the reference evaluates these when a flow is
instantiated by another flow, e.g. GeneratorConfigStream): our flow
compiler applies it after ``#{}`` using the ``meta`` map passed by the
caller or the including flow.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from .lexer import ExpressionError

_INTERP_RE = re.compile(r"\$\{([^}]*)\}")
_CONFIG_RE = re.compile(r"#\{([^}]*)\}")

_FN_RE = re.compile(r"^(\w+(?:\.\w+)?)\((.*)\)$", re.DOTALL)


def _field_expr(body: str) -> Column:
    """Translate one ``${...}`` body: a dot-path or fn(path[, args])."""
    body = body.strip()
    m = _FN_RE.match(body)
    if not m:
        return F.col(body).cast("string")
    fn, argstr = m.group(1), m.group(2)
    if fn == "toLowerCase":
        return F.lower(_field_expr(argstr))
    if fn == "toUpperCase":
        return F.upper(_field_expr(argstr))
    if fn == "capitalize":
        inner = _field_expr(argstr)
        return F.concat(F.upper(F.substring(inner, 1, 1)), F.substring(inner, 2, 2**31 - 1))
    if fn == "JSON.stringify":
        return F.to_json(F.struct(F.col(argstr.strip())))
    if fn == "SQL":
        # SQL-literal escaping: double single quotes (utils.scala SQL fn)
        return F.regexp_replace(_field_expr(argstr), "'", "''")
    if fn == "SplitGet":
        # SplitGet(field, 'sep', index) — 1-based index in the reference
        parts = _split_args(argstr)
        if len(parts) != 3:
            raise ExpressionError(f"SplitGet needs (field, 'sep', index): {body!r}")
        field, sep, idx = parts
        sep = sep.strip().strip("'\"")
        # try_element_at: out-of-range index -> null (reference returns None)
        return F.try_element_at(
            F.split(F.col(field.strip()).cast("string"), re.escape(sep)), F.lit(int(idx))
        )
    if fn == "GetOrNull":
        return F.col(argstr.strip()).cast("string")
    raise ExpressionError(f"unknown template function {fn!r} in {body!r}")


def _split_args(argstr: str) -> list[str]:
    parts, depth, cur, in_str = [], 0, [], None
    for ch in argstr:
        if in_str:
            cur.append(ch)
            if ch == in_str:
                in_str = None
        elif ch in "'\"":
            in_str = ch
            cur.append(ch)
        elif ch == "(":
            depth += 1
            cur.append(ch)
        elif ch == ")":
            depth -= 1
            cur.append(ch)
        elif ch == "," and depth == 0:
            parts.append("".join(cur))
            cur = []
        else:
            cur.append(ch)
    if cur:
        parts.append("".join(cur))
    return parts


def template_column(template: str, null_on_missing: bool = False) -> Column:
    """Compile ``"text ${a.b} more"`` to a string Column.

    Interpolated nulls become '' unless ``null_on_missing`` (GetOrNull
    semantics: any null part nulls the whole result).
    """
    pieces: list[Column] = []
    last = 0
    for m in _INTERP_RE.finditer(template):
        if m.start() > last:
            pieces.append(F.lit(template[last : m.start()]))
        expr = _field_expr(m.group(1))
        if not null_on_missing:
            expr = F.coalesce(expr, F.lit(""))
        pieces.append(expr)
        last = m.end()
    if last < len(template):
        pieces.append(F.lit(template[last:]))
    if not pieces:
        return F.lit("")
    if len(pieces) == 1:
        return pieces[0]
    return F.concat(*pieces)


_META_RE = re.compile(r"%\{([^}]*)\}")


def _substitute(obj, params: dict[str, object], regex: re.Pattern, kind: str):
    if isinstance(obj, str):
        whole = regex.fullmatch(obj)
        if whole:
            key = whole.group(1).strip()
            if key not in params:
                raise ExpressionError(f"missing {kind} parameter {key!r}")
            return params[key]

        def repl(m: re.Match) -> str:
            key = m.group(1).strip()
            if key not in params:
                raise ExpressionError(f"missing {kind} parameter {key!r}")
            return str(params[key])

        return regex.sub(repl, obj)
    if isinstance(obj, dict):
        return {k: _substitute(v, params, regex, kind) for k, v in obj.items()}
    if isinstance(obj, list):
        return [_substitute(v, params, regex, kind) for v in obj]
    return obj


def substitute_config(obj, params: dict[str, object]):
    """Config-time ``#{param}`` substitution over a JSON-ish tree.

    A string that is exactly one ``#{p}`` keeps the parameter's native type
    (number/bool/list), mirroring prepareTuktuJsValue.
    """
    return _substitute(obj, params, _CONFIG_RE, "config")


def substitute_meta(obj, meta_vars: dict[str, object]):
    """Dispatch-time ``%{var}`` substitution — identical grammar and typing
    rules to ``#{}``, evaluated against the meta variable map of the
    including/invoking flow (utils.scala metaString grammar)."""
    return _substitute(obj, meta_vars, _META_RE, "meta")
