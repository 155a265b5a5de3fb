"""Operator library.

Every Tuktu processor that transforms data (SURVEY.md §2) becomes a pure
``DataFrame -> DataFrame`` transform built from a JSON-ish config, held in a
name registry — the analogue of Tuktu's ``Class.forName`` plugin surface
(app/controllers/Dispatcher.scala:127,211-239). Import this package to
populate the registry.
"""

from .registry import OPERATORS, SOURCES, operator, source, make_operator, make_source

from . import projection  # noqa: E402,F401
from . import filters  # noqa: E402,F401
from . import reshape  # noqa: E402,F401
from . import convert  # noqa: E402,F401
from . import timeops  # noqa: E402,F401
from . import aggregates  # noqa: E402,F401
from . import sort_sample  # noqa: E402,F401
from . import joins  # noqa: E402,F401
from . import sources  # noqa: E402,F401
from . import sinks  # noqa: E402,F401
from . import meta  # noqa: E402,F401
from . import xmljson  # noqa: E402,F401
from . import connectors  # noqa: E402,F401
from . import iterative  # noqa: E402,F401
from . import approx  # noqa: E402,F401
from . import llm_ops  # noqa: E402,F401
from . import mlops  # noqa: E402,F401

__all__ = [
    "OPERATORS",
    "SOURCES",
    "operator",
    "source",
    "make_operator",
    "make_source",
]
