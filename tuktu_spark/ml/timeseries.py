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


def ar_fit_diagnostics(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    p: int = 3,
) -> DataFrame:
    """Per-key AR(p) fit diagnostics for self-verifying correctness rows:
    (keys..., n_obs, sse_ar, sse_mean) where sse_ar is the in-sample
    residual sum of squares of the OLS AR(p)+intercept fit and sse_mean is
    the intercept-only (mean) model's SSE over the same targets. OLS with
    an intercept nests the mean model, so sse_ar <= sse_mean is a
    mathematical invariant any correct fit must satisfy — the driver
    oracle asserts it as a TRUE literal."""
    import numpy as np

    keys = list(key_cols)
    schema = ", ".join(
        [f"`{k}` string" for k in keys]
        + ["n_obs long", "sse_ar double", "sse_mean double"]
    )

    def _diag(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        x = pdf[value_col].to_numpy(dtype="float64")
        key_vals = {k: str(pdf[k].iloc[0]) for k in keys}
        if len(x) <= p + 1:
            return pd.DataFrame(columns=[*keys, "n_obs", "sse_ar", "sse_mean"])
        rows = [x[i - p : i][::-1] for i in range(p, len(x))]
        a = np.hstack([np.asarray(rows), np.ones((len(rows), 1))])
        y = x[p:]
        coef, *_ = np.linalg.lstsq(a, y, rcond=None)
        sse_ar = float(((y - a @ coef) ** 2).sum())
        sse_mean = float(((y - y.mean()) ** 2).sum())
        return pd.DataFrame(
            {
                **{k: [v] for k, v in key_vals.items()},
                "n_obs": [len(x)],
                "sse_ar": [sse_ar],
                "sse_mean": [sse_mean],
            }
        )

    return df.groupBy(*keys).applyInPandas(_diag, schema=schema)


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


# ---------------------------------------------------------------------------
# Full ARIMA(p, d, q) — reference modules/ml/app/tuktu/ml/models/timeseries/
# ARIMA.scala:36-78 (fit = Hannan-Rissanen init + conditional-sum-of-squares
# refinement), :140-155 (Hannan-Rissanen), :163-205 (size-preserving
# differencing / inverse differencing), :285-323 (iterateARMA), :404-436
# (forecast: 1-step-ahead historical fits, zero future errors, inverse
# differencing). The reference optimizes CSS with BOBYQA; this uses a
# dependency-free Nelder-Mead (same objective, same init) — both are local
# refinements of the same consistent Hannan-Rissanen estimate.
# ---------------------------------------------------------------------------


def differences(ts, order: int):
    """Size-preserving lag-`order` differencing (ARIMA.scala:163-180):
    first `order` elements are copied unchanged."""
    import numpy as np

    ts = np.asarray(ts, dtype="float64")
    if order == 0:
        return ts.copy()
    out = ts.copy()
    out[order:] = ts[order:] - ts[:-order]
    return out


def inv_differences(ts, order: int):
    """Inverse of ``differences`` (ARIMA.scala:182-205): cumulative add with
    stride `order`, first `order` elements unchanged."""
    import numpy as np

    ts = np.asarray(ts, dtype="float64")
    if order == 0:
        return ts.copy()
    out = ts.copy()
    for i in range(order, len(out)):
        out[i] = ts[i] + out[i - order]
    return out


def _lag_matrix(x, lags: int):
    """Rows t = lags..n-1 of [x[t-1], ..., x[t-lags]]."""
    import numpy as np

    n = len(x)
    if lags == 0:
        return np.zeros((n, 0))
    return np.column_stack([x[lags - j - 1 : n - j - 1] for j in range(lags)])


def _ols_ar(x, p: int):
    """AR(p) with intercept by least squares -> (c, phi[1..p])."""
    import numpy as np

    a = np.hstack([np.ones((len(x) - p, 1)), _lag_matrix(x, p)])
    coef, *_ = np.linalg.lstsq(a, x[p:], rcond=None)
    return float(coef[0]), coef[1:]


def _iterate_arma(ts, coeffs, p: int, q: int, init_errors=None):
    """1-step-ahead ARMA fits of ``ts`` under (intercept, AR, MA) ``coeffs``
    with errors from the gold standard (ARIMA.scala iterateARMA semantics:
    positions < max(p, q) stay zero)."""
    import numpy as np

    n = len(ts)
    dest = np.zeros(n)
    ma = list(init_errors) if init_errors is not None else [0.0] * q
    c, phi, theta = coeffs[0], coeffs[1 : 1 + p], coeffs[1 + p : 1 + p + q]
    for i in range(max(p, q), n):
        v = c
        for j in range(p):
            if i - j - 1 >= 0:
                v += ts[i - j - 1] * phi[j]
        for j in range(q):
            v += ma[j] * theta[j]
        dest[i] = v
        err = ts[i] - v
        ma = [err] + ma[: q - 1] if q else ma
    return dest


def _css_loglik(diffed, coeffs, p: int, q: int) -> float:
    """Conditional-sum-of-squares log-likelihood
    (ARIMAModel.logLikelihoodCSSARMA, ARIMA.scala:236-252)."""
    import numpy as np

    n = len(diffed)
    yhat = _iterate_arma(diffed, coeffs, p, q)
    maxlag = max(p, q)
    css = float(((diffed[maxlag:] - yhat[maxlag:]) ** 2).sum())
    sigma2 = css / n if css > 0 else 1e-12
    return (-n / 2) * np.log(2 * np.pi * sigma2) - css / (2 * sigma2)


def _hannan_rissanen(diffed, p: int, q: int):
    """Initial ARMA estimates (ARIMA.scala:130-155): fit AR(m), m =
    max(p, q)+1, estimate errors, then OLS of y on AR + lagged-error terms."""
    import numpy as np

    m = max(p, q) + 1
    c, phi_m = _ols_ar(diffed, m)
    y_trunc = diffed[m:]
    est = _lag_matrix(diffed, m) @ phi_m + c
    errors = y_trunc - est
    ar_terms = _lag_matrix(y_trunc, p)[max(q - p, 0) :]
    ma_terms = _lag_matrix(errors, q)[max(p - q, 0) :]
    k = min(len(ar_terms), len(ma_terms))
    y = y_trunc[max(p, q) :][:k]
    a = np.hstack([np.ones((k, 1)), ar_terms[:k], ma_terms[:k]])
    coef, *_ = np.linalg.lstsq(a, y, rcond=None)
    return coef


def _nelder_mead(f, x0, iters: int = 400, step: float = 0.1):
    """Minimal deterministic Nelder-Mead (no scipy in the runtime)."""
    import numpy as np

    n = len(x0)
    simplex = [np.asarray(x0, dtype="float64")]
    for i in range(n):
        v = simplex[0].copy()
        v[i] += step if v[i] == 0 else 0.15 * abs(v[i]) + 1e-3
        simplex.append(v)
    vals = [f(v) for v in simplex]
    for _ in range(iters):
        order = np.argsort(vals)
        simplex = [simplex[i] for i in order]
        vals = [vals[i] for i in order]
        if abs(vals[-1] - vals[0]) < 1e-10:
            break
        centroid = np.mean(simplex[:-1], axis=0)
        xr = centroid + (centroid - simplex[-1])
        fr = f(xr)
        if vals[0] <= fr < vals[-2]:
            simplex[-1], vals[-1] = xr, fr
        elif fr < vals[0]:
            xe = centroid + 2 * (centroid - simplex[-1])
            fe = f(xe)
            simplex[-1], vals[-1] = (xe, fe) if fe < fr else (xr, fr)
        else:
            xc = centroid + 0.5 * (simplex[-1] - centroid)
            fc = f(xc)
            if fc < vals[-1]:
                simplex[-1], vals[-1] = xc, fc
            else:
                for i in range(1, n + 1):
                    simplex[i] = simplex[0] + 0.5 * (simplex[i] - simplex[0])
                    vals[i] = f(simplex[i])
    best = int(np.argmin(vals))
    return simplex[best]


def arima_fit(ts, p: int, d: int, q: int):
    """Fit ARIMA(p, d, q) by CSS; returns coefficient array
    [intercept, phi_1..p, theta_1..q] (ARIMA.fitModel, ARIMA.scala:48-69:
    pure-AR shortcut when q == 0, else Hannan-Rissanen + CSS refinement)."""
    import numpy as np

    diffed = differences(ts, d)[d:]
    if p > 0 and q == 0:
        c, phi = _ols_ar(diffed, p)
        return np.concatenate([[c], phi])
    init = _hannan_rissanen(diffed, p, q)
    return _nelder_mead(lambda w: -_css_loglik(diffed, w, p, q), init)


def arima_forecast_series(ts, coeffs, p: int, d: int, q: int, n_future: int):
    """Fitted 1-step-ahead historicals + ``n_future`` forecasts
    (ARIMAModel.forecast, ARIMA.scala:404-436).

    Deviation: initial MA errors for the forward pass are ordered
    newest-first (theta_j pairs with e_{t-j}); the reference hands
    iterateARMA an ascending-time slice whose indexing convention is
    newest-first (updateMAErrors) — the standard ordering is used here."""
    import numpy as np

    ts = np.asarray(ts, dtype="float64")
    maxlag = max(p, q)
    diffed = differences(ts, d)[d:]
    n_diffed = len(diffed)
    hist = _iterate_arma(diffed, coeffs, p, q)
    ma_terms = [diffed[i] - hist[i] for i in range(n_diffed - 1, n_diffed - maxlag - 1, -1)]
    ma_terms = ma_terms[:q] if q else []
    forward = np.zeros(n_future + maxlag)
    forward[:maxlag] = hist[n_diffed - maxlag : n_diffed]
    c, phi, theta = coeffs[0], coeffs[1 : 1 + p], coeffs[1 + p : 1 + p + q]
    ma = list(ma_terms) + [0.0] * (q - len(ma_terms))
    for i in range(maxlag, len(forward)):
        v = c
        for j in range(p):
            if i - j - 1 >= 0:
                v += forward[i - j - 1] * phi[j]
        for j in range(q):
            v += ma[j] * theta[j]
        forward[i] = v
        # future gold standard = self -> error 0 (ARIMA.scala:415-418)
        ma = [0.0] + ma[: q - 1] if q else ma
    results = np.zeros(len(ts) + n_future)
    results[:d] = ts[:d]
    results[d : d + maxlag] = diffed[:maxlag]
    results[d + maxlag : n_diffed + d] = hist[maxlag:]
    results[n_diffed + d :] = forward[maxlag:]
    return inv_differences(results, d)


def arima_forecast(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    p: int = 2,
    d: int = 1,
    q: int = 1,
    horizon: int = 5,
) -> DataFrame:
    """Per-series ARIMA(p, d, q) fit + forecast via ``applyInPandas`` —
    same distribution strategy as ``ar_forecast`` (fit is inherently
    per-series; the groupBy shuffle spreads millions of series across
    executors; each fit is a few-KB numpy problem)."""
    keys = list(key_cols)
    schema = ", ".join(
        [f"`{k}` string" for k in keys] + ["step int", "forecast double"]
    )

    def _fit(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        x = pdf[value_col].to_numpy(dtype="float64")
        key_vals = {k: str(pdf[k].iloc[0]) for k in keys}
        min_len = max(p, q) * 2 + d + 5
        if len(x) < min_len:
            return pd.DataFrame(columns=[*keys, "step", "forecast"])
        coeffs = arima_fit(x, p, d, q)
        full = arima_forecast_series(x, coeffs, p, d, q, horizon)
        preds = full[len(x) :]
        return pd.DataFrame(
            {
                **{k: [v] * horizon for k, v in key_vals.items()},
                "step": range(1, horizon + 1),
                "forecast": preds,
            }
        )

    return df.groupBy(*keys).applyInPandas(_fit, schema=schema)


def arima_fit_diagnostics(
    df: DataFrame,
    key_cols: list[str],
    order_col: str,
    value_col: str,
    p: int = 2,
    d: int = 1,
    q: int = 1,
) -> DataFrame:
    """Per-key ARIMA(p,d,q) fit diagnostics for self-verifying rows:
    (keys..., n_obs, loglik_init, loglik_final) — the CSS log-likelihood at
    the Hannan-Rissanen initial estimate and at the Nelder-Mead refined
    coefficients. The refinement minimizes the negative log-likelihood
    starting FROM the init point, so loglik_final >= loglik_init is an
    invariant of any correct optimizer (NM keeps the best simplex vertex)."""
    keys = list(key_cols)
    schema = ", ".join(
        [f"`{k}` string" for k in keys]
        + ["n_obs long", "loglik_init double", "loglik_final double"]
    )

    def _diag(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(order_col)
        x = pdf[value_col].to_numpy(dtype="float64")
        key_vals = {k: str(pdf[k].iloc[0]) for k in keys}
        min_len = max(p, q) * 2 + d + 5
        if len(x) < min_len:
            return pd.DataFrame(
                columns=[*keys, "n_obs", "loglik_init", "loglik_final"]
            )
        diffed = differences(x, d)[d:]
        init = _hannan_rissanen(diffed, p, q)
        ll_init = _css_loglik(diffed, init, p, q)
        final = arima_fit(x, p, d, q)
        ll_final = _css_loglik(diffed, final, p, q)
        return pd.DataFrame(
            {
                **{k: [v] for k, v in key_vals.items()},
                "n_obs": [len(x)],
                "loglik_init": [float(ll_init)],
                "loglik_final": [float(ll_final)],
            }
        )

    return df.groupBy(*keys).applyInPandas(_diag, schema=schema)
