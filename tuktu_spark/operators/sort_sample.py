"""Sort / limit / sample / dedup operators (SURVEY.md §2.6)."""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from .registry import operator


def _order_cols(spec) -> list:
    cols = []
    for s in spec:
        if isinstance(s, str):
            cols.append(F.col(s))
        else:
            c = F.col(s["field"])
            cols.append(c.desc() if s.get("desc") else c.asc())
    return cols


@operator("sort")
def sort(config: dict):
    """SortProcessor (bucket/SortProcessor.scala:13-46). Distributed
    range-partitioned sort — no single-node materialization."""
    return lambda df: df.orderBy(*_order_cols(config["by"]))


@operator("take", "limit")
def take(config: dict):
    """TakeProcessor (sample/TakeProcessor.scala:13-24)."""
    n = int(config["n"])
    by = config.get("by")
    if by:
        return lambda df: df.orderBy(*_order_cols(by)).limit(n)
    return lambda df: df.limit(n)


@operator("drop_first", "offset")
def drop_first(config: dict):
    """DropProcessor (sample/DropProcessor.scala:13-24): OFFSET over an
    explicit order."""
    n = int(config["n"])
    by = config["by"]

    def transform(df: DataFrame) -> DataFrame:
        from .joins import _global_row_number_auto

        # pass plain string orders through untouched so the auto dispatch
        # can pick the persist-free bounded kernel
        ob = list(by) if all(isinstance(s, str) for s in by) else _order_cols(by)
        return (
            _global_row_number_auto(df, ob, "__rn__")
            .filter(F.col("__rn__") > n)
            .drop("__rn__")
        )

    return transform


@operator("reverse")
def reverse(config: dict):
    """ReverseProcessor (sample/ReverseProcessor.scala:12-16): reverse of an
    explicit order column (implicit packet order doesn't distribute,
    SURVEY.md §7.3 hard part 5)."""
    by = config["by"]

    def transform(df: DataFrame) -> DataFrame:
        cols = []
        for s in by:
            if isinstance(s, str):
                cols.append(F.col(s).desc())
            else:
                c = F.col(s["field"])
                cols.append(c.asc() if s.get("desc") else c.desc())
        return df.orderBy(*cols)

    return transform


@operator("dedup")
def dedup(config: dict):
    """DeduplicationProcessor (bucket/DeduplicationProcessor.scala:13-35):
    first occurrence per key. With ``order_by``: deterministic first via
    row_number; without: dropDuplicates (any-row, cheapest — map-side
    partial dedup then exchange)."""
    keys = config["keys"]
    order_by = config.get("order_by")

    def transform(df: DataFrame) -> DataFrame:
        if not order_by:
            return df.dropDuplicates(keys)
        w = Window.partitionBy(*keys).orderBy(*_order_cols(order_by))
        return (
            df.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") == 1)
            .drop("__rn__")
        )

    return transform


@operator("stratified_sample")
def stratified_sample(config: dict):
    """StratifiedSamplingProcessor (sample/StratifiedSamplingProcessor.scala:
    14-41): cap every class at the same count. Deterministic when order_by
    given; otherwise sampleBy fractions."""
    keys = config["keys"]
    n = config.get("n")
    order_by = config.get("order_by")
    fractions = config.get("fractions")
    seed = int(config.get("seed", 42))

    def transform(df: DataFrame) -> DataFrame:
        if fractions is not None:
            return df.sampleBy(keys[0], fractions, seed)
        w = Window.partitionBy(*keys).orderBy(*_order_cols(order_by))
        return (
            df.withColumn("__rn__", F.row_number().over(w))
            .filter(F.col("__rn__") <= int(n))
            .drop("__rn__")
        )

    return transform


@operator("sample")
def sample(config: dict):
    """Random row sample (reference shuffles packets); seeded for
    reproducibility."""
    fraction = float(config["fraction"])
    seed = int(config.get("seed", 42))
    return lambda df: df.sample(fraction=fraction, seed=seed)


@operator("distinct")
def distinct(config: dict):
    """SELECT DISTINCT over all columns (dedup over full rows)."""
    return lambda df: df.distinct()
