"""Every registered query with an oracle must match DuckDB EXACTLY at
sf0.001 — the local replica of the driver's t2 correctness gate."""

from __future__ import annotations

import pytest

from tuktu_spark.queries import load_all

from .oracle_utils import assert_frames_match

REGISTRY = load_all()
ORACLE_QUERIES = sorted(n for n, q in REGISTRY.items() if q.oracle)
NO_ORACLE = sorted(n for n, q in REGISTRY.items() if not q.oracle)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_query_matches_oracle(spark, duck, sf_dir, name):
    qd = REGISTRY[name]
    spark_pdf = qd.fn(spark, sf_dir).toPandas()
    duck_pdf = duck.execute(qd.oracle).df()
    assert_frames_match(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", NO_ORACLE)
def test_query_runs(spark, sf_dir, name):
    qd = REGISTRY[name]
    df = qd.fn(spark, sf_dir)
    assert df.count() >= 0
