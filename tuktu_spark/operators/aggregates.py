"""Bucket / aggregation operators (SURVEY.md §2.5).

A Tuktu "bucket" (materialized packet) maps to a grouped DataFrame; the
whole frame is the degenerate single group. Partial aggregation, spill and
the final exchange are Spark-native — the reference's Concurrent* variants
(bucket/concurrent/*) need zero code here.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..expressions import arith_agg_columns
from .registry import operator

_SIMPLE_AGGS = {
    "min": F.min,
    "max": F.max,
    "sum": F.sum,
    "count": F.count,
    "avg": F.avg,
    "mean": F.avg,
    "first": F.first,
    "last": F.last,
    "var": F.var_pop,
    "stdev": F.stddev_pop,
    "collect": F.collect_list,
    "collect_set": F.collect_set,
}


@operator("aggregate_by_value", "group_aggregate")
def aggregate_by_value(config: dict):
    """AggregateByValueProcessor (bucket/aggregate/AggregateByValue.scala:
    16-72): GROUP BY + Tuktu arithmetic expressions with aggregate
    functions. config: {"group": [keys], "aggregations": {alias: expr}}"""
    group = config.get("group", [])
    aggs = arith_agg_columns(config["aggregations"])

    def transform(df: DataFrame) -> DataFrame:
        if group:
            return df.groupBy(*group).agg(*aggs)
        return df.agg(*aggs)

    return transform


@operator("group_agg")
def group_agg(config: dict):
    """Plain named aggregates: Min/Max/Sum/Count/Mean/Var/StDev processors
    (bucket/aggregate/NumericProcessors.scala; statistics/
    StatisticsProcessors.scala). config.aggregations:
    [{"op": "sum", "field": f, "as": name}]"""
    group = config.get("group", [])
    specs = config["aggregations"]

    def transform(df: DataFrame) -> DataFrame:
        cols = [
            _SIMPLE_AGGS[s["op"]](F.col(s["field"])).alias(
                s.get("as", f"{s['op']}_{s['field']}")
            )
            for s in specs
        ]
        if group:
            return df.groupBy(*group).agg(*cols)
        return df.agg(*cols)

    return transform


@operator("median")
def median(config: dict):
    """MedianProcessor (StatisticsProcessors.scala:34-57) — EXACT median
    (the reference sorts the packet)."""
    group = config.get("group", [])
    field = config["field"]
    out = config.get("as", "median")

    def transform(df: DataFrame) -> DataFrame:
        agg = F.percentile(F.col(field), F.lit(0.5)).alias(out)
        if group:
            return df.groupBy(*group).agg(agg)
        return df.agg(agg)

    return transform


@operator("mode")
def mode(config: dict):
    """ModeProcessor (StatisticsProcessors.scala:62-83): most frequent value
    + count; deterministic smallest-value tiebreak."""
    group = config.get("group", [])
    field = config["field"]

    def transform(df: DataFrame) -> DataFrame:
        counted = df.groupBy(*group, field).agg(F.count(F.lit(1)).alias("n_mode"))
        w = Window.partitionBy(*group).orderBy(F.col("n_mode").desc(), F.col(field).asc())
        return (
            counted.withColumn("__rk__", F.row_number().over(w))
            .filter(F.col("__rk__") == 1)
            .drop("__rk__")
        )

    return transform


@operator("midrange")
def midrange(config: dict):
    """MidrangeProcessor (StatisticsProcessors.scala:88-112): (min+max)/2."""
    group = config.get("group", [])
    field = config["field"]
    out = config.get("as", "midrange")

    def transform(df: DataFrame) -> DataFrame:
        agg = ((F.min(field) + F.max(field)) / 2).alias(out)
        if group:
            return df.groupBy(*group).agg(agg)
        return df.agg(agg)

    return transform


@operator("count_values", "histogram")
def count_values(config: dict):
    """CountValuesProcessor (StatisticsProcessors.scala:257-269): value
    histogram."""
    field = config["field"]
    out = config.get("as", "amount")
    return lambda df: df.groupBy(field).agg(F.count(F.lit(1)).alias(out))


@operator("correlation")
def correlation(config: dict):
    """CorrelationProcessor (StatisticsProcessors.scala:154-186): pairwise
    Pearson correlation matrix over the listed fields."""
    fields = config["fields"]

    def transform(df: DataFrame) -> DataFrame:
        aggs = []
        for i, a in enumerate(fields):
            for b in fields[i + 1 :]:
                aggs.append(F.corr(F.col(a), F.col(b)).alias(f"corr_{a}_{b}"))
        return df.agg(*aggs)

    return transform


@operator("covariance")
def covariance(config: dict):
    """CovarianceProcessor (StatisticsProcessors.scala:191-210)."""
    fields = config["fields"]

    def transform(df: DataFrame) -> DataFrame:
        from ..exactness import dcovar_pop

        aggs = []
        for i, a in enumerate(fields):
            for b in fields[i + 1 :]:
                aggs.append(dcovar_pop(F.col(a), F.col(b)).alias(f"cov_{a}_{b}"))
        return df.agg(*aggs)

    return transform


@operator("group_by")
def group_by(config: dict):
    """GroupByProcessor (BufferProcessors.scala:58-89): per-group packets.
    With downstream aggregations it is groupBy; standalone it tags rows
    with their group (grouping itself is free in Spark)."""
    keys = config["keys"]
    return lambda df: df.repartition(*[F.col(k) for k in keys])


@operator("rollup_agg")
def rollup_agg(config: dict):
    """GROUP BY ROLLUP — absent in the reference (SURVEY §2.5 note:
    grouping sets/cube/rollup don't exist there; Spark gives them free and
    we expose them). Same config as aggregate_by_value."""
    group = config["group"]
    aggs = arith_agg_columns(config["aggregations"])
    return lambda df: df.rollup(*group).agg(*aggs)


@operator("cube_agg")
def cube_agg(config: dict):
    """GROUP BY CUBE — see rollup_agg."""
    group = config["group"]
    aggs = arith_agg_columns(config["aggregations"])
    return lambda df: df.cube(*group).agg(*aggs)


@operator("pivot")
def pivot(config: dict):
    """Pivot a categorical column into per-value aggregate columns —
    absent in the reference; declared values keep the plan single-pass
    (no distinct-collect job). config: {"group": [...], "pivot": col,
    "values": [...], "aggregations": {alias: expr}}."""
    group = config["group"]
    pivot_col = config["pivot"]
    values = config.get("values")
    aggs = arith_agg_columns(config["aggregations"])

    def transform(df: DataFrame) -> DataFrame:
        g = df.groupBy(*group)
        p = g.pivot(pivot_col, values) if values else g.pivot(pivot_col)
        return p.agg(*aggs)

    return transform


@operator("unpivot", "melt")
def unpivot(config: dict):
    """Unpivot/melt measure columns into (variable, value) rows.
    config: {"ids": [...], "values": [...], "var_name", "value_name"}."""
    ids = config["ids"]
    values = config["values"]
    var_name = config.get("var_name", "variable")
    value_name = config.get("value_name", "value")

    def transform(df: DataFrame) -> DataFrame:
        return df.unpivot(ids, values, var_name, value_name)

    return transform
