"""Tuktu expression languages -> Spark Column translator.

The reference has three fastparse-based little languages over a datum
(SURVEY.md §1.3; modules/api/app/tuktu/api/Parsing/Parsing.scala and
utils.scala:48-191):

1. Tuktu strings  — ``${field}`` interpolation with dot-paths + string fns.
2. ArithmeticParser — ``+ - * / ^``, parens, unary minus, scientific
   notation, scalar math fns, and aggregate fns over the current packet.
3. PredicateParser — comparisons, ``&& || !``, membership ``in``, predicate
   functions.

Here they compile to *Spark Column expressions*, so Catalyst sees through
them (constant folding, pushdown, codegen) — the packet-interpreter of the
reference disappears into the optimizer. Aggregate functions over "the
current packet" compile either to grouped aggregates (``agg`` mode) or to
whole-frame/partition window aggregates attached to every row (``window``
mode), mirroring ArithmeticProcessor vs AggregateByValueProcessor.
"""

from .arithmetic import arith_column, arith_agg_columns
from .predicate import predicate_column
from .templates import template_column, substitute_config, substitute_meta

__all__ = [
    "arith_column",
    "arith_agg_columns",
    "predicate_column",
    "template_column",
    "substitute_config",
    "substitute_meta",
]
