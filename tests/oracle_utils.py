"""Strict Spark-vs-DuckDB comparison used by the parity tests.

Mimics the driver gate (column-name-sorted, order-insensitive, value-level
compare) but STRICTER: exact equality including floats. If these tests pass,
any reasonable hashing scheme in the driver also passes.
"""

from __future__ import annotations

import pandas as pd


def canonicalize(df: pd.DataFrame) -> pd.DataFrame:
    out = df.copy()
    out = out.reindex(sorted(out.columns), axis=1)
    for col in out.columns:
        s = out[col]
        # decimal.Decimal / date objects -> comparable primitives
        if s.dtype == object:
            sample = s.dropna()
            if len(sample) and hasattr(sample.iloc[0], "as_tuple"):
                out[col] = s.astype(float)
        if str(s.dtype).startswith("datetime64") and getattr(s.dt, "tz", None) is not None:
            out[col] = s.dt.tz_localize(None)
    sort_cols = [c for c in out.columns if out[c].dtype != object or True]
    out = out.sort_values(by=list(out.columns), kind="mergesort", na_position="last")
    return out.reset_index(drop=True)


def assert_frames_match(spark_pdf: pd.DataFrame, duck_pdf: pd.DataFrame, name: str) -> None:
    a = canonicalize(spark_pdf)
    b = canonicalize(duck_pdf)
    assert list(a.columns) == list(b.columns), (
        f"{name}: column mismatch {list(a.columns)} vs {list(b.columns)}"
    )
    assert len(a) == len(b), f"{name}: row count {len(a)} vs {len(b)}"
    for col in a.columns:
        av, bv = a[col], b[col]
        if str(av.dtype).startswith("float") or str(bv.dtype).startswith("float"):
            pd.testing.assert_series_equal(
                av.astype(float), bv.astype(float), check_names=False, check_exact=True,
                obj=f"{name}.{col}",
            )
        else:
            pd.testing.assert_series_equal(
                av, bv, check_names=False, check_dtype=False, obj=f"{name}.{col}"
            )
