"""Feature engineering — exact DataFrame algebra.

Reference: normalization / missing-value imputation / dummy variables
processors (SURVEY.md §2.12; modules/ml train+apply flows, golden flow
test configs/flowtests/normalization.json).

Scale design: global statistics (min/max/mean/stddev) are computed with a
regular aggregate and attached via a BROADCAST cross join — never with an
empty-partitionBy window, which would funnel every row through one task at
100 TB. Grouped variants shuffle once on the group key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..exactness import davg, dvar_pop


def _attach_stats(df: DataFrame, stats: DataFrame, keys: list[str] | None) -> DataFrame:
    """Join per-key (or global) stats back onto rows. Global stats are a
    1-row frame: broadcast cross join, zero shuffle of the fact side."""
    if keys:
        return df.join(F.broadcast(stats), keys, "left")
    return df.crossJoin(F.broadcast(stats))


def normalize_minmax(
    df: DataFrame,
    cols: list[str],
    keys: list[str] | None = None,
    suffix: str = "_norm",
) -> DataFrame:
    """(x - min) / (max - min) per column, globally or per key group.
    Min/max are exact (no summation), so results are engine-portable."""
    aggs = []
    for c in cols:
        aggs += [F.min(c).alias(f"__min_{c}"), F.max(c).alias(f"__max_{c}")]
    stats = df.groupBy(*(keys or [])).agg(*aggs) if keys else df.agg(*aggs)
    out = _attach_stats(df, stats, keys)
    for c in cols:
        lo, hi = F.col(f"__min_{c}"), F.col(f"__max_{c}")
        out = out.withColumn(c + suffix, (F.col(c) - lo) / (hi - lo))
    return out.drop(*[f"__{m}_{c}" for c in cols for m in ("min", "max")])


def normalize_zscore(
    df: DataFrame,
    cols: list[str],
    keys: list[str] | None = None,
    suffix: str = "_z",
) -> DataFrame:
    """(x - mean) / stddev_pop with exact decimal-sum mean/variance
    (see exactness.py) so the result hash-matches any engine computing
    the identical scalar expression."""
    aggs = []
    for c in cols:
        aggs += [
            davg(c).alias(f"__mean_{c}"),
            F.sqrt(dvar_pop(F.col(c))).alias(f"__sd_{c}"),
        ]
    stats = df.groupBy(*(keys or [])).agg(*aggs) if keys else df.agg(*aggs)
    out = _attach_stats(df, stats, keys)
    for c in cols:
        out = out.withColumn(
            c + suffix, (F.col(c) - F.col(f"__mean_{c}")) / F.col(f"__sd_{c}")
        )
    return out.drop(*[f"__{m}_{c}" for c in cols for m in ("mean", "sd")])


def impute_mean(
    df: DataFrame, cols: list[str], keys: list[str] | None = None
) -> DataFrame:
    """Fill NULLs with the (exact) column mean, globally or per key —
    the reference's missing-value imputation processor."""
    aggs = [davg(c).alias(f"__mean_{c}") for c in cols]
    stats = df.groupBy(*(keys or [])).agg(*aggs) if keys else df.agg(*aggs)
    out = _attach_stats(df, stats, keys)
    for c in cols:
        out = out.withColumn(c, F.coalesce(F.col(c), F.col(f"__mean_{c}")))
    return out.drop(*[f"__mean_{c}" for c in cols])


def dummy_variables(
    df: DataFrame,
    col: str,
    categories: list[str] | None = None,
    prefix: str | None = None,
    max_categories: int = 10_000,
) -> DataFrame:
    """One-hot 0/1 columns per category value — the reference's dummy
    variable processor. Pass ``categories`` for a fully lazy plan; when
    omitted the distinct values are collected once (metadata-scale action)
    and sorted for a deterministic column order.

    The implicit collect is capped at ``max_categories``: an unbounded-
    cardinality column (user ids, free text) would otherwise pull the
    whole domain to the driver AND emit one plan column per value — fail
    fast with a clear message instead."""
    if categories is None:
        rows = (
            df.select(col).distinct().limit(max_categories + 1).collect()
        )
        if len(rows) > max_categories:
            raise ValueError(
                f"dummy_variables({col!r}): more than {max_categories} distinct "
                "values — one-hot over an unbounded domain is a driver/plan "
                "bomb. Pass categories= explicitly or raise max_categories."
            )
        categories = sorted(r[0] for r in rows if r[0] is not None)
    p = prefix if prefix is not None else col
    out = df
    for v in categories:
        out = out.withColumn(
            f"{p}_{v}", F.when(F.col(col) == v, F.lit(1)).otherwise(F.lit(0))
        )
    return out
