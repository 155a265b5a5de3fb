"""Approximate (sketch) aggregates — absent from the reference, essential
at 100 TB.

Every aggregate in Tuktu is exact and materializes its bucket in memory
(SortProcessor.scala:25-45 et al.). At cluster scale the sketch versions
are the default tool: fixed-size state, map-side combinable, one pass.
Exposed as first-class registry operators:

- ``approx_distinct``  — HyperLogLog++ (`approx_count_distinct`), tunable
  relative standard deviation.
- ``approx_quantiles`` — Greenwald-Khanna (`percentile_approx`), tunable
  accuracy parameter.
- ``freq_items``       — heavy hitters per column (`DataFrame.stat.freqItems`).

Correctness story: sketches are estimate-valued, so there is no DuckDB
hash-parity; instead the `approx_sketch_accuracy` query emits exact and
approximate side by side with the relative error — self-certifying output
the driver row-checks and tests bound (<2% at default settings).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .registry import operator


@operator("approx_distinct")
def approx_distinct(config: dict):
    """HLL++ distinct count per group. config: {"fields": [...],
    "group": [...], "rsd": 0.05}."""
    fields = config["fields"]
    group = config.get("group", [])
    rsd = float(config.get("rsd", 0.05))

    def transform(df: DataFrame) -> DataFrame:
        aggs = [
            F.approx_count_distinct(f, rsd).alias(f"{f}_approx_ndv") for f in fields
        ]
        return df.groupBy(*group).agg(*aggs) if group else df.agg(*aggs)

    return transform


@operator("approx_quantiles")
def approx_quantiles(config: dict):
    """Greenwald-Khanna quantiles. config: {"field", "probabilities":
    [0.5, ...], "accuracy": 10000, "group": [...]}."""
    field = config["field"]
    probs = config.get("probabilities", [0.5, 0.95, 0.99])
    accuracy = int(config.get("accuracy", 10000))
    group = config.get("group", [])

    def transform(df: DataFrame) -> DataFrame:
        agg = F.percentile_approx(
            field, F.array(*[F.lit(p) for p in probs]), accuracy
        ).alias(f"{field}_quantiles")
        return df.groupBy(*group).agg(agg) if group else df.agg(agg)

    return transform


@operator("freq_items")
def freq_items(config: dict):
    """Heavy hitters: values occurring with frequency >= ``support`` in
    each listed column (one pass, bounded state)."""
    fields = config["fields"]
    support = float(config.get("support", 0.01))

    def transform(df: DataFrame) -> DataFrame:
        return df.stat.freqItems(fields, support)

    return transform
