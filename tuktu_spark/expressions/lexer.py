"""Shared tokenizer for the arithmetic and predicate languages.

Token inventory follows the reference grammars
(modules/api/app/tuktu/api/Parsing/Parsing.scala): numbers with scientific
notation, single/double-quoted strings, ``${...}`` field paths, identifiers,
and the operator set of both languages.
"""

from __future__ import annotations

import re
from dataclasses import dataclass


class ExpressionError(ValueError):
    pass


@dataclass(frozen=True)
class Token:
    kind: str  # NUM STR FIELD IDENT OP EOF
    value: str
    pos: int


_TOKEN_RE = re.compile(
    r"""
    (?P<ws>\s+)
  | (?P<num>(\d+\.\d*|\.\d+|\d+)([eE][+-]?\d+)?)
  | (?P<str>'(?:[^'\\]|\\.)*'|"(?:[^"\\]|\\.)*")
  | (?P<field>\$\{[^}]*\})
  | (?P<ident>[A-Za-z_][A-Za-z0-9_.]*)
  | (?P<op>&&|\|\||<=|>=|==|!=|[-+*/%^()<>!,=])
    """,
    re.VERBOSE,
)


def tokenize(text: str) -> list[Token]:
    tokens: list[Token] = []
    pos = 0
    while pos < len(text):
        m = _TOKEN_RE.match(text, pos)
        if not m:
            raise ExpressionError(f"unexpected character {text[pos]!r} at {pos} in {text!r}")
        pos = m.end()
        if m.lastgroup == "ws":
            continue
        kind = {"num": "NUM", "str": "STR", "field": "FIELD", "ident": "IDENT", "op": "OP"}[
            m.lastgroup
        ]
        value = m.group()
        if kind == "STR":
            value = value[1:-1].replace("\\'", "'").replace('\\"', '"').replace("\\\\", "\\")
        elif kind == "FIELD":
            value = value[2:-1]
        tokens.append(Token(kind, value, m.start()))
    tokens.append(Token("EOF", "", len(text)))
    return tokens


class TokenStream:
    def __init__(self, text: str):
        self.text = text
        self.tokens = tokenize(text)
        self.i = 0

    @property
    def cur(self) -> Token:
        return self.tokens[self.i]

    def advance(self) -> Token:
        tok = self.tokens[self.i]
        if tok.kind != "EOF":
            self.i += 1
        return tok

    def accept(self, kind: str, value: str | None = None) -> Token | None:
        tok = self.cur
        if tok.kind == kind and (value is None or tok.value == value):
            return self.advance()
        return None

    def expect(self, kind: str, value: str | None = None) -> Token:
        tok = self.accept(kind, value)
        if tok is None:
            raise ExpressionError(
                f"expected {value or kind} at pos {self.cur.pos} in {self.text!r}, "
                f"got {self.cur.value!r}"
            )
        return tok

    def expect_eof(self) -> None:
        if self.cur.kind != "EOF":
            raise ExpressionError(
                f"trailing input at pos {self.cur.pos} in {self.text!r}: {self.cur.value!r}"
            )
