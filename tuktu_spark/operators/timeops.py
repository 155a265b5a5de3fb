"""Date/time operators (SURVEY.md §2.9) + per-row arithmetic (§2.5)."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..expressions import arith_column
from .registry import operator

_TRUNC_UNITS = {
    "years": "year",
    "year": "year",
    "months": "month",
    "month": "month",
    "weeks": "week",
    "week": "week",
    "days": "day",
    "day": "day",
    "hours": "hour",
    "hour": "hour",
    "minutes": "minute",
    "minute": "minute",
    "seconds": "second",
    "second": "second",
}


@operator("date_to_millis")
def date_to_millis(config: dict):
    """DateToMillisProcessor (time/DateToMillisProcessor.scala:15-32)."""
    field = config["field"]
    return lambda df: df.withColumn(
        config.get("as", field), F.unix_millis(F.col(field))
    )


@operator("timestamp_normalize", "date_trunc")
def timestamp_normalize(config: dict):
    """TimestampNormalizerProcessor (time/TimestampNormalizerProcessor.scala:
    17-105): floor a timestamp to the nearest N units — date_trunc when N=1,
    window-bucket arithmetic for N>1 (generalized date_trunc)."""
    field = config["field"]
    unit = _TRUNC_UNITS[config.get("unit", "day")]
    n = int(config.get("n", 1))
    out = config.get("as", field)

    def transform(df: DataFrame) -> DataFrame:
        if n == 1:
            return df.withColumn(out, F.date_trunc(unit, F.col(field)))
        # N>1: bucket epoch arithmetic, exact for second/minute/hour/day
        secs = {"second": 1, "minute": 60, "hour": 3600, "day": 86400}[unit] * n
        bucket = (F.unix_timestamp(F.col(field)) / secs).cast("long") * secs
        return df.withColumn(out, F.timestamp_seconds(bucket))

    return transform


@operator("period_add")
def period_add(config: dict):
    """TimestampPeriodAdderProcessor (time/TimestampPeriodAdderProcessor.
    scala:18-65): add y/m/w/d/h/min/s to a time field."""
    field = config["field"]
    out = config.get("as", field)
    amounts = {k: int(v) for k, v in config.get("amounts", {}).items()}

    def transform(df: DataFrame) -> DataFrame:
        col = F.col(field)
        months = amounts.get("years", 0) * 12 + amounts.get("months", 0)
        if months:
            col = F.add_months(col, months) .cast("timestamp")
        days = amounts.get("weeks", 0) * 7 + amounts.get("days", 0)
        secs = (
            amounts.get("hours", 0) * 3600
            + amounts.get("minutes", 0) * 60
            + amounts.get("seconds", 0)
        )
        total_secs = days * 86400 + secs
        if total_secs:
            col = F.timestamp_seconds(F.unix_timestamp(col) + total_secs)
        return df.withColumn(out, col)

    return transform


@operator("add_now")
def add_now(config: dict):
    """TimestampAdderProcessor (time/TimestampAdderProcessor.scala)."""
    return lambda df: df.withColumn(
        config.get("field", "timestamp"), F.current_timestamp()
    )


@operator("duration_days")
def duration_days(config: dict):
    """DurationProcessor (time/DurationProcessor.scala:16-31): whole days
    between two date fields."""
    start, end = config["start"], config["end"]
    return lambda df: df.withColumn(
        config.get("as", "duration"), F.datediff(F.col(end), F.col(start))
    )


@operator("arith_compute", "arithmetic")
def arith_compute(config: dict):
    """ArithmeticProcessor (arithmetics/ArithmeticProcessor.scala:16-37):
    per-row Tuktu arithmetic expression, optional rounding."""
    expr = config["expression"]
    out = config.get("field", "result")
    decimals = config.get("round")

    def transform(df: DataFrame) -> DataFrame:
        col = arith_column(expr, mode="scalar")
        if decimals is not None:
            col = F.round(col, int(decimals))
        return df.withColumn(out, col)

    return transform


@operator("arith_aggregate")
def arith_aggregate(config: dict):
    """ArithmeticAggregateProcessor (ArithmeticProcessor.scala:42-59):
    packet-level aggregate expression attached to every row (whole-frame
    window)."""
    expr = config["expression"]
    out = config.get("field", "result")
    return lambda df: df.withColumn(out, arith_column(expr, mode="window"))


@operator("max_field_by_value")
def max_field_by_value(config: dict):
    """MaxFieldByValueProcessor (arithmetics/MaxByFieldProcessor.scala:10-29):
    name of the field holding the row-wise max."""
    fields = config["fields"]
    out = config.get("as", "max_field")
    out_val = config.get("value_as")

    def transform(df: DataFrame) -> DataFrame:
        pairs = F.array(
            *[F.struct(F.col(f).cast("double").alias("v"), F.lit(f).alias("k")) for f in fields]
        )
        df = df.withColumn(out, F.array_max(pairs)["k"])
        if out_val:
            df = df.withColumn(out_val, F.array_max(pairs)["v"])
        return df

    return transform
