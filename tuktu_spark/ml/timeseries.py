"""Time-series operators.

Reference: ARIMA (modules/ml/app/tuktu/ml/models/timeseries/ARIMA.scala:36-78,
forecast :404) and change-point detection
(timeseries/ChangePointDetection.scala:11-19).

- ``ar_forecast``: per-series AR(p) fit + forecast via ``applyInPandas``
  (one Arrow batch per series key — series fit is inherently per-group;
  the grouping shuffle partitions series across executors, so 1M series
  parallelize perfectly even when one series never would).
- ``changepoint_cusum``: exact CUSUM argmax as window algebra — fully
  JVM-side, engine-portable (decimal cumulative sums), SQL-oracle-able.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def ar_forecast(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    p: int = 3,
    horizon: int = 5,
) -> DataFrame:
    """Fit AR(p) per key by ordinary least squares (numpy lstsq —
    deterministic) and emit `horizon` future values per key."""
    import numpy as np

    keys = list(key_cols)
    schema = ", ".join(
        [f"`{k}` string" for k in keys] + ["step int", "forecast double"]
    )

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        x = pdf[value_col].to_numpy(dtype="float64")
        key_vals = {k: str(pdf[k].iloc[0]) for k in keys}
        if len(x) <= p + 1:
            return pd.DataFrame(columns=[*keys, "step", "forecast"])
        # design matrix of lagged values + intercept
        rows = [x[i - p : i][::-1] for i in range(p, len(x))]
        a = np.hstack([np.asarray(rows), np.ones((len(rows), 1))])
        coef, *_ = np.linalg.lstsq(a, x[p:], rcond=None)
        hist = list(x)
        preds = []
        for _ in range(horizon):
            lags = np.array(hist[-p:][::-1] + [1.0])
            nxt = float(lags @ coef)
            preds.append(nxt)
            hist.append(nxt)
        return pd.DataFrame(
            {
                **{k: [v] * horizon for k, v in key_vals.items()},
                "step": range(1, horizon + 1),
                "forecast": preds,
            }
        )

    return df.groupBy(*keys).applyInPandas(_fit, schema=schema)


def changepoint_cusum(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    scale: int = 6,
) -> DataFrame:
    """CUSUM change-point per key: the index t maximizing
    |sum(x[1..t]) - t * mean(x)| — the classic single-changepoint statistic.

    Exact decimal cumulative sums keep results engine-portable; the only
    shuffle is the partitionBy(key) sort the window needs.
    """
    keys = list(key_cols)
    w_order = Window.partitionBy(*keys).orderBy(order_col).rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    w_all = Window.partitionBy(*keys)
    dec = F.col(value_col).cast(f"decimal(38,{scale})")
    cum = F.sum(dec).over(w_order)
    total = F.sum(dec).over(w_all)
    n = F.count(F.lit(1)).over(w_all)
    t = F.row_number().over(Window.partitionBy(*keys).orderBy(order_col))
    # exact: |n*cum - t*total| in decimal avoids the mean division entirely
    stat = F.abs(n * cum - t * total)
    scored = df.select(
        *keys,
        F.col(order_col),
        stat.alias("__stat"),
        t.alias("__t"),
        (F.col(value_col).cast("double")).alias("__v"),
    )
    pick = Window.partitionBy(*keys).orderBy(
        F.col("__stat").desc(), F.col(order_col).asc()
    )
    return (
        scored.withColumn("__rk", F.row_number().over(pick))
        .filter(F.col("__rk") == 1)
        .select(
            *keys,
            F.col(order_col).alias("changepoint_at"),
            F.col("__t").alias("position"),
            (F.col("__stat").cast("double")).alias("cusum_stat"),
        )
    )
