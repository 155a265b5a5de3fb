"""Operator / source registries.

An *operator* factory takes a config dict and returns a transform
``DataFrame -> DataFrame`` (mergers take ``list[DataFrame]``). A *source*
factory takes ``(spark, config)`` and returns a DataFrame. The flow
compiler resolves names through these tables — the Spark-side analogue of
Tuktu's reflective processor instantiation (Dispatcher.scala:211-239).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any

from pyspark.sql import DataFrame, SparkSession

Transform = Callable[[DataFrame], DataFrame]

OPERATORS: dict[str, Callable[[dict], Transform]] = {}
SOURCES: dict[str, Callable[[SparkSession, dict], DataFrame]] = {}


class UnknownOperatorError(KeyError):
    pass


def operator(name: str, *aliases: str):
    def deco(factory: Callable[[dict], Transform]):
        for n in (name, *aliases):
            OPERATORS[n] = factory
        return factory

    return deco


def source(name: str, *aliases: str):
    def deco(factory: Callable[[SparkSession, dict], DataFrame]):
        for n in (name, *aliases):
            SOURCES[n] = factory
        return factory

    return deco


def make_operator(name: str, config: dict[str, Any] | None = None) -> Transform:
    if name not in OPERATORS:
        raise UnknownOperatorError(
            f"unknown operator {name!r}; known: {sorted(OPERATORS)}"
        )
    return OPERATORS[name](config or {})


def make_source(spark: SparkSession, name: str, config: dict[str, Any] | None = None) -> DataFrame:
    if name not in SOURCES:
        raise UnknownOperatorError(f"unknown source {name!r}; known: {sorted(SOURCES)}")
    return SOURCES[name](spark, config or {})
