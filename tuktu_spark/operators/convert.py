"""Type-conversion operators (SURVEY.md §2.9) — thin wrappers over cast."""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .registry import operator

_NUMERIC_TYPES = {"byte", "short", "int", "integer", "long", "bigint", "float", "double"}


@operator("to_number", "cast_number")
def to_number(config: dict):
    """ConvertToNumber / NumberToNumberProcessor (ConvertToNumber.scala:16-58;
    arithmetics/NumericProcessors.scala:11-76). Maps over array fields too."""
    field = config["field"]
    target = config.get("type", "double")
    if target not in _NUMERIC_TYPES:
        raise ValueError(f"not a numeric type: {target!r}")

    def transform(df: DataFrame) -> DataFrame:
        dtype = dict(df.dtypes)[field]
        if dtype.startswith("array"):
            return df.withColumn(
                field, F.transform(F.col(field), lambda x: x.cast(target))
            )
        return df.withColumn(field, F.col(field).cast(target))

    return transform


@operator("to_string")
def to_string(config: dict):
    """ConvertAnyToStringProcessor (ConvertToString.scala)."""
    field = config["field"]
    return lambda df: df.withColumn(field, F.col(field).cast("string"))


@operator("to_decimal")
def to_decimal(config: dict):
    """ConvertToBigDecimal (ConvertToBigDecimal.scala) -> DecimalType."""
    field = config["field"]
    precision = int(config.get("precision", 38))
    scale = int(config.get("scale", 18))
    return lambda df: df.withColumn(
        field, F.col(field).cast(f"decimal({precision},{scale})")
    )


@operator("to_date", "parse_date")
def to_date(config: dict):
    """ConvertToDate (ConvertToDate.scala:19-41): parse string with pattern.

    The reference default is joda `EEE MMM dd HH:mm:ss zzz yyyy`; Spark uses
    java.time patterns — config.format takes a Spark pattern.
    """
    field = config["field"]
    fmt = config.get("format")
    out = config.get("as", field)

    def transform(df: DataFrame) -> DataFrame:
        col = F.to_timestamp(F.col(field), fmt) if fmt else F.to_timestamp(F.col(field))
        return df.withColumn(out, col)

    return transform
