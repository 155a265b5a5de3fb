"""Query registry — the driver correctness/bench contract.

Every implemented operator from SURVEY.md §2 gets a named query here: a
Spark callable ``(spark, sf_dir) -> DataFrame`` plus (where SQL-expressible)
a DuckDB oracle SQL string computing the same result with the same column
names. ``__spark_entry__`` re-exports this registry.
"""

from __future__ import annotations

import functools
import importlib
from collections.abc import Callable
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from tuktu_spark.tables import ensure_session_confs


@dataclass
class QueryDef:
    name: str
    fn: Callable[[SparkSession, str], DataFrame]
    oracle: str | None = None
    tags: tuple[str, ...] = field(default_factory=tuple)
    bench: bool = False  # include in bench.py headline set


REGISTRY: dict[str, QueryDef] = {}


def query(name: str, oracle: str | None = None, tags: tuple[str, ...] = (), bench: bool = False):
    """Register a query. ``oracle`` is ANSI SQL runnable by DuckDB over the
    pre-registered views (region nation customer supplier part orders
    lineitem events documents embeddings)."""

    def deco(fn):
        @functools.wraps(fn)
        def wrapped(spark: SparkSession, sf_dir: str) -> DataFrame:
            # the driver supplies its OWN session; normalize it first
            ensure_session_confs(spark)
            return fn(spark, sf_dir)

        REGISTRY[name] = QueryDef(name=name, fn=wrapped, oracle=oracle, tags=tags, bench=bench)
        return fn

    return deco


_MODULES = (
    "relational",
    "reshape",
    "timeops",
    "llm_dedup",
    "llm_text",
    "llm_similarity",
    "llm_multimodal",
    "flows",
    "ml",
    "streaming",
)


def load_all() -> dict[str, QueryDef]:
    """Import all query modules (idempotent) and return the registry."""
    for mod in _MODULES:
        importlib.import_module(f"tuktu_spark.queries.{mod}")
    return REGISTRY
