"""Oracle-dtype lint (round-4 verdict #2).

The driver's value-hash is dtype-sensitive: a DuckDB oracle that returns a
tz-aware TIMESTAMPTZ (e.g. bare ``to_timestamp``) or a decimal-object column
hash-mismatches a correct Spark result (naive timestamp / float64) even when
every value agrees — that is exactly how ``normalize_15min_buckets`` stayed
red for four rounds.  This lint executes EVERY registered oracle in DuckDB at
sf0.001 and asserts the result frame carries no tz-aware datetime and no
object-dtype Decimal column, so the bug class cannot re-enter the registry.
"""

from __future__ import annotations

import pytest

from tuktu_spark.queries import load_all

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_returns_driver_safe_dtypes(duck, name):
    pdf = duck.execute(REGISTRY[name].oracle).df()
    for col in pdf.columns:
        dt = pdf[col].dtype
        tz = getattr(dt, "tz", None)
        assert tz is None, (
            f"{name}.{col}: oracle returns tz-aware {dt} — wrap in "
            f"CAST(... AS TIMESTAMP) so it hashes like Spark's naive timestamp"
        )
        if dt == object:
            sample = pdf[col].dropna()
            if len(sample):
                assert not hasattr(sample.iloc[0], "as_tuple"), (
                    f"{name}.{col}: oracle returns decimal.Decimal objects — "
                    f"CAST(... AS DOUBLE) (or BIGINT) so the driver hash "
                    f"matches Spark's native dtype"
                )
